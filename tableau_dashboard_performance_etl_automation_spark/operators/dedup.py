"""Deduplication operators over the ``documents`` table — the
training-data-pipeline layer (exact, MinHash+LSH, SimHash, n-gram
Jaccard). Embedding-based near-dup lives in ``operators/similarity``.

Scale design (100 TB of documents):

- every operator is explode → distinct → aggregate → equi-join —
  all shuffle-parallel, nothing touches the driver;
- pair generation never does a cross join: candidate pairs come only
  from equality joins on LSH band buckets / simhash bands / shared
  shingles, i.e. the blocking step IS the algorithm;
- hot blocks are bounded: n-gram Jaccard drops "stop shingles" whose
  document frequency exceeds a cap (the classic guard against a
  quadratic bucket), and simhash uses frequency-weighted bits so
  near-identical vocab sets don't collapse into one bucket.

Determinism for the DuckDB oracle: hashes are md5 hex strings (same
in both engines), Jaccard/hamming arithmetic is exact-integer, and
all floats are rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
    corpus_slug,
)
from tableau_dashboard_performance_etl_automation_spark.functions.text import (
    seeded_md5,
    shingles_sql_duckdb,
    word_shingles,
    words,
)
from tableau_dashboard_performance_etl_automation_spark.memo import register as _register_memo

#: MinHash signature size and LSH banding (8 hashes → 4 bands × 2).
MINHASH_HASHES = 8
MINHASH_BANDS = 4
#: SimHash banding: the band count is PINNED at MAX_HAMMING + 1 — the
#: pigeonhole bound that makes blocking EXACT (any pair within the
#: hamming radius must agree on at least one band) — so the scale
#: dial is the fingerprint width: ``simhash_fingerprint_bits(n)``
#: widens 64 → 128 bits once 2^(bits/4) bucket values per band would
#: go hotter than SIMHASH_TARGET_BUCKET docs deep. Word-aligned
#: widths only (bands must not straddle the BIGINT words the
#: fingerprint is packed into).
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3
SIMHASH_TARGET_BUCKET = 8


def simhash_fingerprint_bits(n_docs: int) -> int:
    """Fingerprint width for an ``n_docs`` corpus: 64-bit (16-bit
    bands, 65 536 values) while expected band-bucket depth
    n / 2^16 stays at or below SIMHASH_TARGET_BUCKET, else 128-bit
    (32-bit bands, 4.3e9 values — sub-quadratic past billions of
    docs)."""
    return 64 if n_docs <= SIMHASH_TARGET_BUCKET * (2 ** 16) else 128
#: n-gram Jaccard: drop shingles shared by more than this many docs
#: (stop-shingle guard against quadratic buckets).
JACCARD_MAX_DF = 100


#: Session memo of the distinct (doc_id, shingle) table — the
#: decomposition EVERY shingle-based diagnostic starts from (LSH
#: bands, Jaccard index, containment, estimator calibration).  Since
#: round 5 the memo holds a DISK-BACKED parquet scan
#: (``warehouse.persisted_table``), not checkpoint blocks: the table
#: is stored once per corpus (what a production pipeline does — the
#: build never amortizes per query) and costs zero executor heap.
#: Single-entry capped.
#: Session memo — assumes sf_dir data is immutable within the
#: application (see memo.py); registered for global invalidation.
_SHINGLES_CACHE: dict[tuple[str, str], DataFrame] = _register_memo({})


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle) pairs — the shared decomposition,
    PERSISTED as a warehouse parquet table (round-5: the prior
    ``localCheckpoint`` memo pinned the whole decomposition in
    executor storage, which is what exhausted the heap at the 256×+
    corpus decades; a disk-backed scan is both the production shape
    and O(1) heap). Deterministic, so a loaded table is bit-identical
    to a rebuild; tag-guarded per sf_dir."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SHINGLES_CACHE.get(key)
    if cached is None:

        def build() -> DataFrame:
            # doc_id is part of the distinct key, so "distinct
            # (doc_id, sh)" is pure WITHIN-doc dedup — array_distinct
            # on the per-doc shingle array before the explode computes
            # it narrowly, with NO corpus shuffle (the row-level
            # .distinct() spelling hash-shuffled the whole exploded
            # corpus; its sort-spill at fixed partition counts was the
            # round-10 superlinear residual, PERF.md)
            docs = load_table(spark, sf_dir, "documents")
            return docs.withColumn("w", words()).select(
                "doc_id",
                F.explode(F.array_distinct(word_shingles())).alias("sh"),
            )

        base = corpus_slug(sf_dir)
        cached = persisted_table(
            spark, f"doc_shingles/{base}", sf_dir, build
        )
        _SHINGLES_CACHE.clear()  # single-entry cap
        _SHINGLES_CACHE[key] = cached
    return cached


_SHINGLES_CTE = f"""
    doc_words AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    doc_shingles AS (
        SELECT DISTINCT doc_id,
               unnest({shingles_sql_duckdb(3)}) AS sh
        FROM doc_words
    )
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash group: one hash-shuffle on
    ``md5(text)``; ``keep_id`` is the canonical survivor (min doc_id),
    ``n_copies - 1`` the rows a dedup pass would drop."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
        )
        .orderBy("text_hash")
    )


#: Session memo of the band-signature table — since round 5 a
#: DISK-BACKED parquet scan (``warehouse.persisted_table``): stored
#: once per corpus, zero executor heap, shared across sessions; six
#: registered diagnostics consume it and re-shingling per query
#: never amortizes. Signatures are deterministic (md5 of shingle
#: text), so the loaded table is bit-identical to a recompute. The
#: incremental probe additionally keeps its bucketed ``_band_index``
#: variant for the zero-exchange probe join.
#: Session memo — assumes sf_dir data is immutable within the
#: application (see memo.py); registered for global invalidation.
_BANDS_CACHE: dict[tuple[str, str], DataFrame] = _register_memo({})

#: Session memo for the persisted full signature table (same
#: discipline; single-entry cap).
_SIGS_CACHE: dict[tuple[str, str], DataFrame] = _register_memo({})


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mh0..mh{H-1}) full MinHash signature table, persisted
    per corpus — feeds both the band decomposition (below) and the
    estimator-calibration diagnostic's signature comparison, which
    was re-running the H seeded-md5 aggregations per invocation.
    Deterministic md5s → loaded table is bit-identical to a rebuild."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SIGS_CACHE.get(key)
    if cached is not None:
        return cached

    def build() -> DataFrame:
        sh = _doc_shingles(spark, sf_dir)
        return sh.groupBy("doc_id").agg(
            *[
                F.min(seeded_md5(s, F.col("sh"))).alias(f"mh{s}")
                for s in range(MINHASH_HASHES)
            ]
        )

    base = corpus_slug(sf_dir)
    out = persisted_table(spark, f"minhash_sigs/{base}", sf_dir, build)
    _SIGS_CACHE.clear()  # single-entry cap
    _SIGS_CACHE[key] = out
    return out


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_id, band_val) MinHash LSH band signatures —
    shingle → 8-way minhash → 4 bands of 2. Shared by the full-corpus
    pair join and the incremental index probe. Persisted like the
    shingle decomposition (round-5): disk-backed parquet scan instead
    of pinned checkpoint blocks — heap-free at any corpus scale, and
    signatures are deterministic md5s so the loaded table is
    bit-identical to a rebuild."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BANDS_CACHE.get(key)
    if cached is not None:
        return cached

    def build() -> DataFrame:
        sig = _minhash_sigs(spark, sf_dir)
        per_band = MINHASH_HASHES // MINHASH_BANDS
        return sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.concat(
                                *[
                                    F.col(f"mh{b * per_band + j}")
                                    for j in range(per_band)
                                ]
                            ).alias("band_val"),
                        )
                        for b in range(MINHASH_BANDS)
                    ]
                )
            ).alias("band"),
        ).select("doc_id", "band.band_id", "band.band_val")

    base = corpus_slug(sf_dir)
    out = persisted_table(spark, f"minhash_bands/{base}", sf_dir, build)
    _BANDS_CACHE.clear()  # single-entry cap
    _BANDS_CACHE[key] = out
    return out


#: Session memo for the persisted LSH pair table (same discipline as
#: ``_BANDS_CACHE``): the pair set feeds ELEVEN registered consumers
#: (k-core, triangles, graph stats, degree histogram, link
#: prediction, BFS, CC labels, source-overlap matrix, recall
#: agreement, …) — re-running the band self-join + distinct per
#: consumer never amortizes. The set is deterministic (md5-seeded
#: minhash bands), so the loaded parquet is value-identical to a
#: rebuild; row ORDER is not part of the contract (every consumer is
#: a join/aggregate; the registered query re-sorts).
_LSH_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = _register_memo({})


def lsh_pair_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNORDERED MinHash-LSH candidate pair set (doc_a < doc_b),
    persisted per corpus as a warehouse parquet table — the graph
    queries' shared edge list. Disk-backed scan instead of a per-query
    band self-join or pinned ``localCheckpoint`` blocks: heap-free at
    any corpus scale, and the edge list is exactly the table a
    production dedup pipeline stores anyway."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _LSH_PAIRS_CACHE.get(key)
    if cached is not None:
        return cached

    def build() -> DataFrame:
        bands = _minhash_bands(spark, sf_dir)
        a, b = bands.alias("a"), bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )

    base = corpus_slug(sf_dir)
    out = persisted_table(spark, f"lsh_pairs/{base}", sf_dir, build)
    _LSH_PAIRS_CACHE.clear()  # single-entry cap
    _LSH_PAIRS_CACHE[key] = out
    return out


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: shingle → 8-way minhash signature
    → 4 bands of 2 → equality join on (band_id, band_value).

    The band join is the only pair-producing step and it's a plain
    equi-join (shuffle on band value) — no cross join at any scale.
    The pair set itself is served from the persisted per-corpus edge
    list (:func:`lsh_pair_table`); this registered query adds the
    deterministic output ordering.
    """
    return lsh_pair_table(spark, sf_dir).orderBy("doc_a", "doc_b")


#: Session memo for the two persisted shingle-intersection variants
#: (capped = JACCARD_MAX_DF stop-shingle cap applied). Keyed by
#: (applicationId, sf_dir, variant); both variants of the current
#: corpus may stay resident.
_INTER_CACHE: dict[tuple, DataFrame] = _register_memo({})


def _capped_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    keep = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= JACCARD_MAX_DF)
        .select("sh")
    )
    return sh.join(keep, "sh")


def shingle_pair_intersections(
    spark: SparkSession, sf_dir: str, capped: bool = True
) -> DataFrame:
    """(doc_a < doc_b, inter) exact shared-shingle counts, persisted
    per corpus — the expensive inverted-index self-join that FOUR
    registered queries were each re-running: the capped variant
    (stop-shingle DF cap, the quadratic guard) feeds the
    jaccard/containment scorers, the full variant feeds the two
    minhash calibration diagnostics (their exact-Jaccard ground
    truth is defined cap-free). Counts are exact integers, so the
    loaded parquet is value-identical to a rebuild."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    variant = "capped" if capped else "full"
    key = (spark.sparkContext.applicationId, sf_dir, variant)
    cached = _INTER_CACHE.get(key)
    if cached is not None:
        return cached

    def build() -> DataFrame:
        sh = (
            _capped_shingles(spark, sf_dir)
            if capped
            else _doc_shingles(spark, sf_dir)
        )
        a, b = sh.alias("a"), sh.alias("b")
        return (
            a.join(
                b,
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )

    base = corpus_slug(sf_dir)
    out = persisted_table(
        spark, f"shingle_inter_{variant}/{base}", sf_dir, build
    )
    # keep at most the current corpus' two variants resident
    for k in [k for k in _INTER_CACHE if k[:2] != key[:2]]:
        del _INTER_CACHE[k]
    _INTER_CACHE[key] = out
    return out


def shingle_doc_sizes(
    spark: SparkSession, sf_dir: str, capped: bool = True
) -> DataFrame:
    """(doc_id, sz) shingle-set sizes under the same cap regime as
    :func:`shingle_pair_intersections` — persisted alongside it (the
    capped variant must re-derive the DF census to know which
    shingles count, which is exactly the work worth storing)."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    variant = "capped" if capped else "full"
    key = (spark.sparkContext.applicationId, sf_dir, f"sz_{variant}")
    cached = _INTER_CACHE.get(key)
    if cached is not None:
        return cached

    def build() -> DataFrame:
        sh = (
            _capped_shingles(spark, sf_dir)
            if capped
            else _doc_shingles(spark, sf_dir)
        )
        return sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))

    base = corpus_slug(sf_dir)
    out = persisted_table(
        spark, f"shingle_sizes_{variant}/{base}", sf_dir, build
    )
    for k in [k for k in _INTER_CACHE if k[:2] != key[:2]]:
        del _INTER_CACHE[k]
    _INTER_CACHE[key] = out
    return out


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document best fuzzy match by 3-gram Jaccard.

    Inverted-index join on shared shingles (after the stop-shingle
    cap) → exact-integer intersection counts → |A∪B| from per-doc
    sizes → top-1 match per doc via a partitioned window. Jaccard is
    a ratio of exact ints, so cross-engine values are bit-identical.
    """
    # the capped intersection table and sizes are persisted per-corpus
    # intermediates shared with dedup_containment (and the production
    # shape: a dedup pipeline stores its candidate-pair scores once)
    sizes = shingle_doc_sizes(spark, sf_dir, capped=True)
    inter = shingle_pair_intersections(spark, sf_dir, capped=True)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    scored = inter.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
        ).alias("jaccard"),
    )
    # symmetrize so every doc gets a best-match row, then top-1 —
    # via a 2-element struct-array explode (plain array construction,
    # codegen'd): a self-UNION would re-execute the whole
    # inter⋈sizes⋈sizes join subtree once per branch
    sym = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("a"),
                    F.col("doc_b").alias("b"),
                    F.col("jaccard").alias("j"),
                ),
                F.struct(
                    F.col("doc_b").alias("a"),
                    F.col("doc_a").alias("b"),
                    F.col("jaccard").alias("j"),
                ),
            )
        ).alias("p")
    ).select(
        F.col("p.a").alias("doc_a"),
        F.col("p.b").alias("doc_b"),
        F.col("p.j").alias("jaccard"),
    )
    # top-1 as a MAX(struct) argmax — hash aggregate with map-side
    # partial combine over the pair set, instead of sorting every
    # doc's candidate list in a rank window. Tie order matches the
    # oracle's ROW_NUMBER (jaccard DESC, doc_b ASC) via -doc_b.
    best = sym.groupBy("doc_a").agg(
        F.max(
            F.struct("jaccard", (-F.col("doc_b")).alias("neg_b"))
        ).alias("b")
    )
    return best.select(
        F.col("doc_a").alias("doc_id"),
        (-F.col("b.neg_b")).alias("best_match"),
        F.col("b.jaccard").alias("jaccard"),
    ).orderBy("doc_id")


def _simhash_signed_bit(bit: int) -> F.Column:
    """±1 pseudo-random bit for (bit_index, token): md5 first hex char
    in [8..f] → +1 else -1. Pure string compare, identical in DuckDB."""
    return F.when(
        F.substring(seeded_md5(bit, F.col("word")), 1, 1) >= "8", F.lit(1)
    ).otherwise(F.lit(-1))


def simhash_signatures(docs: DataFrame, fingerprint_bits: int) -> DataFrame:
    """Per-document SimHash fingerprints (doc_id, sh0[, sh1]) at an
    arbitrary word-aligned width — the EXPENSIVE half of the simhash
    pipeline (token counts, per-vocab-word md5 bit hashing, the
    width-many weighted sums). Split out so it can persist as a
    corpus artifact; :func:`simhash_pairs_from_signatures` is the
    cheap recurring half."""
    n_words = fingerprint_bits // 64
    assert fingerprint_bits % 64 == 0 and n_words >= 1
    tokens = (
        docs.withColumn("w", words())
        .select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # materialized once: both the vocabulary pass and the
        # weighted-sum join consume it — without this the explode +
        # count runs twice (same sharing pattern as ngram_jaccard)
        .localCheckpoint()
    )
    # Hash each DISTINCT word once (the vocabulary is tiny relative to
    # the corpus — this is a broadcast-joined lookup, not a per-row
    # per-bit md5), then weight by per-doc counts. Numerically
    # identical to hashing inline; ~|vocab|/|corpus| of the hash work.
    word_bits = tokens.select("word").distinct().select(
        "word",
        *[
            _simhash_signed_bit(j).alias(f"b{j}")
            for j in range(fingerprint_bits)
        ],
    )
    sums = (
        tokens.join(F.broadcast(word_bits), "word")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.col("cnt") * F.col(f"b{j}")).alias(f"s{j}")
                for j in range(fingerprint_bits)
            ]
        )
    )
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    return sums.select(
        "doc_id",
        *[
            sum(
                [
                    # shiftleft, not 2**j literals: 1<<63 only exists
                    # as the (negative) min-long bit pattern
                    F.when(
                        F.col(f"s{64 * w + j}") > 0, F.shiftleft(one, j)
                    ).otherwise(zero)
                    for j in range(64)
                ]
            )
            .cast("bigint")
            .alias(f"sh{w}")
            for w in range(n_words)
        ],
    )


def simhash_pairs_from_signatures(
    simhash: DataFrame, fingerprint_bits: int
) -> DataFrame:
    """Banding + hamming-confirm over a precomputed signature table —
    the recurring half of the simhash pipeline (cheap: the signature
    table is doc_id + 1-2 BIGINTs)."""
    n_words = fingerprint_bits // 64
    bits_per_band = fingerprint_bits // SIMHASH_BANDS
    assert 64 % bits_per_band == 0 or bits_per_band % 64 == 0
    bands = simhash.select(
        "doc_id",
        *[F.col(f"sh{w}") for w in range(n_words)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(
                            F.col(f"sh{(b * bits_per_band) // 64}"),
                            (b * bits_per_band) % 64,
                        )
                        .bitwiseAND(2**bits_per_band - 1)
                        .alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select(
        "doc_id",
        *[F.col(f"sh{w}") for w in range(n_words)],
        "band.band_id",
        "band.band_val",
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[
                F.col(f"a.sh{w}")
                .bitwiseXOR(F.col(f"b.sh{w}"))
                .alias(f"x{w}")
                for w in range(n_words)
            ],
        )
        .distinct()
    )
    hamming = sum([F.bit_count(F.col(f"x{w}")) for w in range(n_words)])
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def simhash_pairs(docs: DataFrame, fingerprint_bits: int) -> DataFrame:
    """Frequency-weighted SimHash near-dup pairs at an arbitrary
    word-aligned fingerprint width (64 → one BIGINT word, 128 → two).

    Per (doc, token) counts weight the ±1 bit contributions; the
    fingerprint's ``SIMHASH_BANDS`` bands block candidate pairs
    (equality join), then exact hamming distance ≤ 3 confirms.
    Weighting by term frequency keeps documents with identical vocab
    *sets* but different word counts from collapsing into one
    quadratic bucket. The top bit of each word makes that BIGINT
    negative in two's complement — harmless: xor/bit_count/masked
    band extraction are bit-pattern operations, identical in both
    engines. Bands are word-aligned by construction (bits/4 is 16 or
    32), so a band never straddles words."""
    return simhash_pairs_from_signatures(
        simhash_signatures(docs, fingerprint_bits), fingerprint_bits
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the fingerprint width derived from
    the corpus count (``simhash_fingerprint_bits``) — one COUNT(*)
    prices the dial; the test corpora land on 64-bit (the regime the
    static DuckDB oracle replays), a >512k-doc corpus widens to
    128-bit automatically (pytest-exercised on a synthetic corpus).

    The SIGNATURE table persists as a corpus artifact (round-5 —
    tagged with the width dial, so a corpus crossing the 64→128-bit
    threshold rebuilds): the expensive half (token counts, vocab
    hashing, width-many weighted sums — 208 s of the 258 s at the
    512× decade) runs once per corpus; the recurring cost is the
    banding join + hamming confirm over doc_id + 1-2 BIGINTs."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    bits = simhash_fingerprint_bits(docs.count())
    base = corpus_slug(sf_dir)
    sig = persisted_table(
        spark,
        f"simhash_sigs/{base}",
        f"{sf_dir}|bits={bits}",
        lambda: simhash_signatures(docs, bits),
    )
    return simhash_pairs_from_signatures(sig, bits)


#: Jaccard level a MinHash candidate must reach to count as a true
#: near-dup in the banding-precision diagnostic.
BANDING_CONFIRM_JACCARD = 0.5


def minhash_banding_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding quality diagnostic: for every MinHash candidate pair,
    confirm with the EXACT shingle Jaccard and report the confirm
    rate per shared-band count — the LSH analog of the IVF recall
    table (PERF.md): it tells you whether the 4×2 banding geometry is
    tuned to the duplication structure you actually have, and it is
    the number you would watch when turning the band dials.

    Scale shape: candidates come from the band equi-join (never a
    cross join); the exact intersection is the shingle inverted-index
    join — at true corpus scale you would co-group each candidate
    pair's shingle sets instead of joining the full index, but the
    diagnostic's aggregate output (≤ #bands rows) is identical either
    way. Jaccard is a ratio of exact integers, so cross-engine
    confirmation decisions cannot diverge at the threshold."""
    bands = _minhash_bands(spark, sf_dir)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("int").alias("band_overlap"))
    )
    sizes = shingle_doc_sizes(spark, sf_dir, capped=False)
    inter = shingle_pair_intersections(spark, sf_dir, capped=False)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    # LEFT join + COALESCE(inter, 0): a band collision normally implies
    # >=1 shared shingle, but if that invariant ever broke (md5
    # collision, future band_val change) the pair must count as
    # UNCONFIRMED (Jaccard 0), not vanish from n_pairs — the
    # partition-of-candidates property holds unconditionally.
    inter0 = F.coalesce(F.col("inter"), F.lit(0))
    jac = inter0 / (F.col("sza") + F.col("szb") - inter0)
    confirmed = (jac >= BANDING_CONFIRM_JACCARD).cast("int")
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy("band_overlap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(confirmed).cast("bigint").alias("n_confirmed"),
        )
        .withColumn(
            "confirm_rate",
            F.round(F.col("n_confirmed") * F.lit(1.0) / F.col("n_pairs"), 6),
        )
        .orderBy("band_overlap")
    )


def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-calibration diagnostic for the MinHash sketch: per
    matching-signature count k (the sketch's Jaccard estimate k/H),
    the average EXACT Jaccard of the candidate pairs and the mean
    absolute estimation error. Together with
    ``minhash_banding_precision`` this is the full quality card for
    the sketch: banding precision grades candidate GENERATION, this
    grades the ESTIMATE a dedup policy would threshold on.

    Scale shape: same equi-join candidate set and inverted-index
    exact intersection as the precision diagnostic (LEFT +
    COALESCE(0) keeps the partition-of-candidates property
    unconditional); the signature comparison is a broadcast-friendly
    join against the H-column signature table. Output is ≤ H+1 rows.
    """
    sig = _minhash_sigs(spark, sf_dir)
    # the candidate set IS the persisted per-corpus edge list
    cand = lsh_pair_table(spark, sf_dir)
    matching = sum(
        (F.col(f"sa.mh{s}") == F.col(f"sb.mh{s}")).cast("int")
        for s in range(MINHASH_HASHES)
    )
    sizes = shingle_doc_sizes(spark, sf_dir, capped=False)
    inter = shingle_pair_intersections(spark, sf_dir, capped=False)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    inter0 = F.coalesce(F.col("inter"), F.lit(0))
    exact = inter0 / (F.col("sza") + F.col("szb") - inter0)
    est = F.col("matching") / F.lit(float(MINHASH_HASHES))
    return (
        cand.join(sig.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sig.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", matching.alias("matching"))
        .join(inter, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy("matching")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.avg(exact), 6).alias("avg_exact_jaccard"),
            F.round(F.avg(F.abs(est - exact)), 6).alias("mean_abs_err"),
        )
        .withColumn(
            "est_jaccard",
            F.round(F.col("matching") / F.lit(float(MINHASH_HASHES)), 6),
        )
        .select(
            "matching", "n_pairs", "est_jaccard",
            "avg_exact_jaccard", "mean_abs_err",
        )
        .orderBy("matching")
    )


#: Incremental-dedup batch split: docs with ``doc_id % NEWBATCH_MOD
#: == NEWBATCH_REM`` play the role of today's freshly-crawled batch;
#: the rest is the already-indexed corpus.
NEWBATCH_MOD = 10
NEWBATCH_REM = 9

#: Persisted LSH index: the existing corpus' band signatures live in
#: a table bucketed on ``band_val``, so every probe join reads the
#: index pre-distributed — no index-side exchange, ever. Memoized per
#: (applicationId, sf_dir) like the IVF codebook: built once per
#: session, single-entry cap so a stale sf_dir's table isn't trusted.
BAND_INDEX_TABLE = "minhash_band_index"
BAND_INDEX_BUCKETS = 16
#: Session memo — assumes sf_dir data is immutable within the
#: application (see memo.py); registered for global invalidation.
_BAND_INDEX_CACHE: dict[tuple[str, str], str] = _register_memo({})


def _band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The existing corpus' (existing_id, band_id, band_val) MinHash
    band signatures as a bucketed table — the stored half of the
    incremental-dedup index. The one-time write pays the only
    index-side shuffle it will ever do; every subsequent probe joins
    against bucket-co-located files."""
    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        write_bucketed,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if _BAND_INDEX_CACHE.get(key) is None:
        is_new = F.col("doc_id") % NEWBATCH_MOD == NEWBATCH_REM
        idx = (
            _minhash_bands(spark, sf_dir)
            .filter(~is_new)
            .select(
                F.col("doc_id").alias("existing_id"), "band_id", "band_val"
            )
        )
        write_bucketed(
            idx, BAND_INDEX_TABLE, "band_val", n_buckets=BAND_INDEX_BUCKETS
        )
        _BAND_INDEX_CACHE.clear()  # single-entry cap
        _BAND_INDEX_CACHE[key] = BAND_INDEX_TABLE
    return spark.table(BAND_INDEX_TABLE)


def dedup_incremental_newbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch against the EXISTING corpus'
    MinHash LSH index — the production shape at 100 TB, where you
    never re-dedup the whole corpus: band signatures of the historical
    corpus are a stored index (bucketed on band_val), and each new
    batch only signs itself and probes.

    Per new-batch doc: how many distinct existing docs share a band
    (``n_index_hits``), the canonical existing match (``dup_of``, min
    doc_id), and the drop flag. Scale shape: the new batch is a small
    fraction of the corpus, the probe is a plain equi-join on
    (band_id, band_val) against the index — with the index bucketed
    on band_val the probe shuffles ONLY the new batch; nothing pairs
    within the index side, so cost ∝ batch, not ∝ corpus.

    The index side IS persisted: ``_band_index`` writes the existing
    corpus' signatures once per session as a table bucketed on
    ``band_val`` (``sources/warehouse.write_bucketed``), and every
    probe reads it bucket-co-located — the plan contract
    (``tests/test_plans.py``) asserts the index side joins with no
    Exchange, so only the batch ever moves."""
    is_new = F.col("doc_id") % NEWBATCH_MOD == NEWBATCH_REM
    newb = _minhash_bands(spark, sf_dir).filter(is_new)
    idx = _band_index(spark, sf_dir)
    hits = (
        newb.join(idx, ["band_id", "band_val"])
        .groupBy("doc_id")
        .agg(
            F.countDistinct("existing_id").cast("bigint").alias(
                "n_index_hits"
            ),
            F.min("existing_id").alias("dup_of"),
        )
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(is_new)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_index_hits"), F.lit(0).cast("bigint")).alias(
                "n_index_hits"
            ),
            "dup_of",
            F.col("dup_of").isNotNull().cast("int").alias("is_dup"),
        )
        .orderBy("doc_id")
    )


#: Decontamination n-gram length and the held-out "benchmark" slice
#: (the first DECON_BENCH_DOCS doc_ids stand in for an eval suite).
#: Production decontamination uses 8-13-gram overlap; 4 suits the
#: small-vocabulary synthetic corpus — the machinery is identical.
DECON_K = 4
DECON_BENCH_DOCS = 10


def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    ``DECON_K``-gram with the benchmark set — the pass every training
    corpus runs against its eval suites before training.

    The benchmark shingle set is tiny (eval suites are human-sized)
    and broadcasts; the corpus side streams through explode →
    broadcast-hash join → per-doc count, so the full-corpus work is
    one narrow pass plus a shuffle on ``doc_id`` for the count —
    no pair explosion possible since hits aggregate per corpus doc."""
    docs = load_table(spark, sf_dir, "documents")
    # within-doc shingle dedup stays narrow: array_distinct before the
    # explode (doc_id is in the old distinct key — no corpus shuffle)
    sh = docs.withColumn("w", words()).select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(k=DECON_K))).alias("sh"),
    )
    bench = (
        sh.filter(F.col("doc_id") < DECON_BENCH_DOCS).select("sh").distinct()
    )
    hits = (
        sh.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
        .join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias(
                "n_hits"
            ),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def dedup_replayed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.trend.dedup_events_stream``
    (dropDuplicatesWithinWatermark): an at-least-once upstream
    re-delivers the newest day's file (the reference's cron extract
    re-runs exactly this way, tabjolt_email.py:351-359); dedup keeps
    one row per ``event_id`` and reports the delivery count.

    Deterministic replay model — re-deliver every event of the
    corpus's max date — so the DuckDB oracle replays it; the streaming
    equivalence is pytest-asserted against the watermarked stream
    (tests/test_streaming.py). Shape: one union (no shuffle) + one
    hash aggregate on event_id; the 1-row max-date anchor broadcasts.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    anchor = e.agg(F.max(F.to_date("ts")).alias("replay_day"))
    replay = (
        e.crossJoin(F.broadcast(anchor))
        .filter(F.to_date("ts") == F.col("replay_day"))
        .drop("replay_day")
    )
    return (
        e.unionByName(replay)
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_deliveries"),
            F.min("ts").alias("mts"),
            # replicas are bit-identical rows; MIN just picks the one
            F.min("event_type").alias("event_type"),
            F.min("value").alias("value"),
        )
        .select(
            "event_id",
            F.date_format("mts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "event_ts"
            ),
            "event_type",
            "value",
            "n_deliveries",
        )
        .orderBy("event_id")
    )


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where is the duplication COMING from: near-dup candidate pairs
    (MinHash+LSH, same pipeline as :func:`dedup_minhash_lsh`) rolled
    up into a source×source matrix — the curation diagnostic that
    tells you whether two crawls overlap or one source self-plagiarizes.

    Composition: the pair set is the LSH band join's output; attaching
    sources is two equi-joins on doc_id (the corpus' primary key —
    co-partitioned with any sensible bucketing); the matrix itself is
    a tiny aggregate on (source, source) keys, canonicalized with
    least/greatest so A↔B and B↔A land in one cell.
    """
    pairs = lsh_pair_table(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


#: Sub-document dedup granularity: non-overlapping word blocks.
#: The dial trades dedup resolution against block-key cardinality —
#: smaller blocks catch shorter copied spans but multiply the rows
#: shuffled on the block hash (still one row per block either way).
BLOCK_WORDS = 32

#: Canonicalization rule for near-exact textual dedup: drop trivial
#: tokens (short words + the high-frequency function words among the
#: corpus stoplist that survive the length gate) before hashing, so
#: documents differing only in such filler collapse to one canonical
#: group. Both engines apply the identical predicate.
CANON_MIN_LEN = 3
CANON_DROP = ("the", "and")

#: First-occurrence keys encode (doc_id, block_start) as
#: ``doc_id * OKEY_STRIDE + block_start``. 1e9 word offsets bounds any
#: document (a 1B-word doc is ~5 TB of text); the builder raises
#: loudly rather than silently corrupting order if one exceeds it.
OKEY_STRIDE = 1_000_000_000


def subdoc_block_stats(docs: DataFrame) -> DataFrame:
    """Per-doc block-dedup accounting over any (doc_id, text) frame —
    the reusable body of :func:`dedup_subdoc_blocks` (tests run their
    brute-force oracles against THIS function, so the shipped pipeline
    is what gets verified)."""
    blocks = (
        docs.select("doc_id", words().alias("w"))
        .select(
            "doc_id",
            "w",
            F.explode(
                F.expr(f"sequence(0, size(w) - 1, {BLOCK_WORDS})")
            ).alias("block_start"),
        )
        .select(
            "doc_id",
            "block_start",
            F.md5(
                F.array_join(
                    F.expr(f"slice(w, block_start + 1, {BLOCK_WORDS})"), " "
                )
            ).alias("bmd5"),
        )
        .withColumn(
            "okey",
            F.when(
                F.col("block_start") < OKEY_STRIDE,
                (F.col("doc_id") * OKEY_STRIDE + F.col("block_start")).cast(
                    "bigint"
                ),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "subdoc_block_stats: block_start exceeds OKEY_STRIDE "
                        f"({OKEY_STRIDE}); widen the stride for this corpus"
                    )
                )
            ),
        )
    )
    # two-level aggregate instead of a join back on bmd5: the old
    # probe side re-executed the whole split+slice+md5 block subtree
    # a second time (its exchange differs from the aggregate's, so
    # nothing is reused). okeys are globally unique, so per (bmd5,
    # doc) cell exactly the cell holding the group's min okey
    # contributes its one non-dup block: n_dup = c − (mo == group
    # min). The group min is a window over the (bmd5, doc) compaction
    # — block-hash groups are collision-bounded small.
    bd = blocks.groupBy("bmd5", "doc_id").agg(
        F.count(F.lit(1)).alias("c"), F.min("okey").alias("mo")
    )
    wb = Window.partitionBy("bmd5")
    flagged = bd.withColumn("first_okey", F.min("mo").over(wb))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_blocks"),
            F.sum(
                F.col("c")
                - (F.col("mo") == F.col("first_okey")).cast("int")
            )
            .cast("bigint")
            .alias("n_dup_blocks"),
        )
        .withColumn(
            "retained_frac",
            F.round(
                F.lit(1.0)
                - F.col("n_dup_blocks") * F.lit(1.0) / F.col("n_blocks"),
                6,
            ),
        )
    )


def dedup_subdoc_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (block level): every document is cut
    into non-overlapping ``BLOCK_WORDS``-word blocks, each block is
    content-hashed, and a block is a duplicate if the same hash
    occurred at any earlier (doc_id, offset). Per-doc output reports
    how much of the document survives block dedup — the
    CCNet/RefinedWeb-style pass that removes boilerplate spans repeated
    across a crawl without dropping whole documents.

    Scale shape: one narrow explode (bounded multiplication, one row
    per block), one hash-shuffle on the block md5 to find each hash's
    first occurrence (map-side combinable MIN), one equi-join back on
    the same key (co-partitioned with the aggregate — AQE reuses the
    exchange), and a per-doc aggregate. No windows, no cross joins,
    no driver involvement; every shuffle key is high-cardinality.

    First-occurrence order is encoded as ``doc_id * OKEY_STRIDE +
    block_start`` — a single BIGINT min instead of a struct min, so
    the same expression replays exactly in the oracle. (Offsets are
    word indices; 1e9 words/doc bounds any real document, and the
    builder raises loudly — ``raise_error`` — rather than corrupting
    order if a pathological document exceeds it.)
    """
    docs = load_table(spark, sf_dir, "documents")
    return subdoc_block_stats(docs).orderBy("doc_id")


#: Block-level MinHash: a lighter signature than the document-level
#: one (4 hashes → 2 bands × 2) since 32-word blocks hold ≤30
#: shingles, and a bucket cap that drops boilerplate band buckets
#: (the block-level "stop shingle" guard — a footer block shared by
#: 10k pages would otherwise mint a 10k² candidate clique).
SUBDOC_MINHASHES = 4
SUBDOC_BANDS = 2
SUBDOC_BUCKET_CAP = 50


def dedup_subdoc_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document NEAR-dup (block level): every 32-word block gets
    its own MinHash band signatures, blocks of different documents
    that share a band bucket are candidate near-dup block pairs, and
    the per-(doc_a, doc_b) pair count measures how much lightly-edited
    boilerplate the two documents share — the pass that catches a
    template paragraph with one word swapped, which block-exact
    dedup (:func:`dedup_subdoc_blocks`) misses by construction.

    Scale shape: explode to blocks (bounded, one row per block) →
    per-block MIN aggregates (map-side combinable) → band equi-join
    restricted to buckets with ≤ ``SUBDOC_BUCKET_CAP`` members (the
    cap check is one aggregate on the band key — same partitioning as
    the join, AQE reuses the exchange) → per-doc-pair count. Never a
    cross join; bucket membership is capped, so candidate output is
    ≤ CAP × blocks regardless of boilerplate skew.

    Steady state (round-9): the (doc_a, doc_b, n_block_pairs) table
    is the pipeline's deliverable pair table — persisted per corpus
    like ``emb_neardup_pairs``/``lsh_pairs``, so every run after the
    first is a 3-column parquet scan + sort. Build plan exposed as
    :func:`_subdoc_pair_build` for the plan-contract audit."""
    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        corpus_slug,
        persisted_table,
    )

    pairs = persisted_table(
        spark,
        f"subdoc_pair_counts/{corpus_slug(sf_dir)}",
        f"{sf_dir}|bw={BLOCK_WORDS}|mh={SUBDOC_MINHASHES}"
        f"|b={SUBDOC_BANDS}|cap={SUBDOC_BUCKET_CAP}",
        lambda: _subdoc_pair_build(spark, sf_dir),
    )
    return pairs.orderBy("doc_a", "doc_b")


def _subdoc_pair_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-persisted block-minhash pair plan (see
    :func:`dedup_subdoc_neardup` for semantics and the scale
    argument); the plan-contract test audits THIS plan."""
    docs = load_table(spark, sf_dir, "documents")
    blk = (
        docs.select("doc_id", words().alias("w"))
        .select(
            "doc_id",
            "w",
            F.explode(
                F.expr(f"sequence(0, size(w) - 1, {BLOCK_WORDS})")
            ).alias("bs"),
        )
        .select(
            "doc_id",
            "bs",
            F.expr(f"slice(w, bs + 1, {BLOCK_WORDS})").alias("bw"),
        )
    )
    # (doc_id, bs) is in the old distinct key: within-BLOCK dedup,
    # computed narrowly by array_distinct — deletes a corpus-sized
    # shuffle AND lets the minhash agg below plan its own (doc_id, bs)
    # exchange with map-side partials (the row-distinct spelling cost
    # two exchanges: one on (doc_id, bs, sh), one on (doc_id, bs))
    sh = blk.select(
        "doc_id",
        "bs",
        F.explode(F.array_distinct(word_shingles("bw"))).alias("sh"),
    )
    sig = sh.groupBy("doc_id", "bs").agg(
        *[
            F.min(seeded_md5(s, F.col("sh"))).alias(f"mh{s}")
            for s in range(SUBDOC_MINHASHES)
        ]
    )
    per_band = SUBDOC_MINHASHES // SUBDOC_BANDS
    bands = sig.select(
        "doc_id",
        "bs",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat(
                            *[
                                F.col(f"mh{b * per_band + j}")
                                for j in range(per_band)
                            ]
                        ).alias("band_val"),
                    )
                    for b in range(SUBDOC_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "bs", "band.band_id", "band.band_val")
    keep = (
        bands.groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= SUBDOC_BUCKET_CAP)
        .select("band_id", "band_val")
    )
    kept = bands.join(keep, ["band_id", "band_val"])
    cand = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.bs").alias("bs_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.bs").alias("bs_b"),
        )
        .distinct()
    )
    return cand.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_block_pairs")
    )


def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized near-exact dedup: hash each document AFTER
    dropping trivial tokens (length < ``CANON_MIN_LEN`` or in
    ``CANON_DROP``), so texts that differ only in filler words land in
    one canonical group. Reports, per group, the member count AND how
    many *exact-distinct* texts it merged — the measure of what
    canonicalization buys over plain exact dedup.

    Same scale shape as :func:`dedup_exact` (one hash-shuffle on the
    canonical md5, map-side combinable aggregates); the
    canonicalization itself is a codegen'd filter+join projection,
    zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    drop = ", ".join(f"'{w}'" for w in CANON_DROP)
    canon = F.md5(
        F.array_join(
            F.expr(
                f"filter(split(text, ' '), x -> length(x) >= "
                f"{CANON_MIN_LEN} AND NOT x IN ({drop}))"
            ),
            " ",
        )
    )
    return (
        docs.select(
            "doc_id", F.md5(F.col("text")).alias("th"), canon.alias("canon_hash")
        )
        .groupBy("canon_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.countDistinct("th").cast("bigint").alias("n_exact_variants"),
            F.min("doc_id").alias("keep_id"),
        )
        .orderBy("canon_hash")
    )


#: containment threshold: |A∩B| / min(|A|,|B|) at or above this flags
#: a subset-duplication pair even when Jaccard stays low.
CONTAINMENT_MIN = 0.8


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-based near-dup pairs: ``|A∩B| / min(|A|,|B|)`` over
    3-gram shingle sets. Containment catches the case symmetric
    Jaccard structurally misses — a short document embedded verbatim
    inside a long one (quote, excerpt, concatenated crawl page) has
    containment ≈ 1 but Jaccard ≈ |A|/|B| → 0.

    Scale shape: identical to the Jaccard pipeline (dedup.py's
    inverted-index equi-join with the stop-shingle DF cap bounding
    bucket sizes); only the scoring ratio differs, so the quadratic
    guards carry over unchanged. Both metrics are ratios of exact
    integers — bit-identical across engines — and the threshold
    compares the *rounded* value so the boundary is unambiguous.
    """
    sizes = shingle_doc_sizes(spark, sf_dir, capped=True)
    inter = shingle_pair_intersections(spark, sf_dir, capped=True).select(
        "doc_a", "doc_b", F.col("inter").cast("bigint").alias("inter")
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            F.round(
                F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")), 4
            ).alias("containment"),
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("containment") >= F.lit(CONTAINMENT_MIN))
        .orderBy("doc_a", "doc_b")
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_containment": dedup_containment,
    "dedup_subdoc_blocks": dedup_subdoc_blocks,
    "dedup_subdoc_neardup": dedup_subdoc_neardup,
    "dedup_canonical": dedup_canonical,
    "dedup_replayed_events": dedup_replayed_events,
    "cross_source_dup_matrix": cross_source_dup_matrix,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_incremental_newbatch": dedup_incremental_newbatch,
    "minhash_banding_precision": minhash_banding_precision,
    "minhash_estimate_error": minhash_estimate_error,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "benchmark_decontaminate": benchmark_decontaminate,
}


def _minhash_bands_cte() -> str:
    """Shared CTE chain ending in ``bands(doc_id, band_id, band_val)``."""
    mins = ", ".join(
        f"MIN(md5('{s}|' || sh)) AS mh{s}" for s in range(MINHASH_HASHES)
    )
    per_band = MINHASH_HASHES // MINHASH_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {concat} AS band_val FROM mh".format(
            b=b,
            concat=" || ".join(
                f"mh{b * per_band + j}" for j in range(per_band)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""{_SHINGLES_CTE},
        mh AS (
            SELECT doc_id, {mins} FROM doc_shingles GROUP BY doc_id
        ),
        bands AS ({band_selects})"""


def _minhash_oracle() -> str:
    return f"""
        WITH {_minhash_bands_cte()}
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                    AND a.doc_id < b.doc_id
        ORDER BY doc_a, doc_b
    """


def _simhash_oracle() -> str:
    # static 64-bit replay: the width dial lands on 64 for every
    # corpus the driver checks (simhash_fingerprint_bits flips to 128
    # only past ~512k docs; that regime is pytest-covered instead)
    bits = 64
    signed = ", ".join(
        f"SUM(cnt * CASE WHEN substr(md5('{j}|' || word), 1, 1) >= '8' "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits)
    )
    # shift-built powers; DuckDB refuses 1<<63 (overflow-checked), so
    # the sign bit is the min-long literal. The j-ascending order
    # keeps every partial sum inside BIGINT range.
    def _pow2(j: int) -> str:
        if j == bits - 1 == 63:
            return "CAST(-9223372036854775807 - 1 AS BIGINT)"
        return f"(CAST(1 AS BIGINT) << {j})"

    hash_expr = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {_pow2(j)} ELSE CAST(0 AS BIGINT) END"
        for j in range(bits)
    )
    bits_per_band = bits // SIMHASH_BANDS
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_id, "
        f"(simhash >> {b * bits_per_band}) & {2**bits_per_band - 1} AS band_val "
        f"FROM sh"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
        WITH tokens AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        counts AS (
            SELECT doc_id, word, COUNT(*) AS cnt
            FROM tokens GROUP BY doc_id, word
        ),
        sums AS (
            SELECT doc_id, {signed} FROM counts GROUP BY doc_id
        ),
        sh AS (
            SELECT doc_id, CAST({hash_expr} AS BIGINT) AS simhash FROM sums
        ),
        bands AS ({band_selects}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   xor(a.simhash, b.simhash) AS x
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                        AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, bit_count(x) AS hamming
        FROM pairs
        WHERE bit_count(x) <= {SIMHASH_MAX_HAMMING}
        ORDER BY doc_a, doc_b
    """


ORACLE_SQL = {
    "benchmark_decontaminate": f"""
        WITH doc_words AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   unnest({shingles_sql_duckdb(DECON_K)}) AS sh
            FROM doc_words
        ),
        bench AS (
            SELECT DISTINCT sh FROM sh WHERE doc_id < {DECON_BENCH_DOCS}
        ),
        hits AS (
            SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM sh s JOIN bench USING (sh)
            WHERE s.doc_id >= {DECON_BENCH_DOCS}
            GROUP BY s.doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n_hits, 0) AS n_hits,
               CAST(COALESCE(h.n_hits, 0) > 0 AS INTEGER) AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id >= {DECON_BENCH_DOCS}
        ORDER BY d.doc_id
    """,
    "dedup_subdoc_blocks": f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        b AS (
            SELECT doc_id, CAST(gs AS INTEGER) AS block_start,
                   md5(array_to_string(
                       list_slice(w, gs + 1, gs + {BLOCK_WORDS}), ' '))
                       AS bmd5,
                   CAST(doc_id * {OKEY_STRIDE} + gs AS BIGINT) AS okey
            FROM d, UNNEST(generate_series(0, len(w) - 1, {BLOCK_WORDS}))
                     AS t(gs)
        ),
        f AS (
            SELECT bmd5, MIN(okey) AS first_okey FROM b GROUP BY bmd5
        ),
        per_doc AS (
            SELECT b.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(CASE WHEN b.okey != f.first_okey
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_blocks
            FROM b JOIN f USING (bmd5)
            GROUP BY b.doc_id
        )
        SELECT doc_id, n_blocks, n_dup_blocks,
               ROUND(1.0 - n_dup_blocks * 1.0 / n_blocks, 6)
                   AS retained_frac
        FROM per_doc
        ORDER BY doc_id
    """,
    "dedup_canonical": f"""
        SELECT md5(array_to_string(
                   list_filter(string_split(text, ' '),
                       x -> length(x) >= {CANON_MIN_LEN}
                            AND x NOT IN ({", ".join(f"'{w}'" for w in CANON_DROP)})),
                   ' ')) AS canon_hash,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT)
                   AS n_exact_variants,
               MIN(doc_id) AS keep_id
        FROM documents
        GROUP BY 1
        ORDER BY canon_hash
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_hash,
               COUNT(*) AS n_copies,
               MIN(doc_id) AS keep_id
        FROM documents
        GROUP BY md5(text)
        ORDER BY text_hash
    """,
    "dedup_replayed_events": """
        WITH deliveries AS (
            SELECT event_id, ts, event_type, value FROM events
            UNION ALL
            SELECT event_id, ts, event_type, value FROM events
            WHERE CAST(ts AS DATE) =
                  (SELECT MAX(CAST(ts AS DATE)) FROM events)
        )
        SELECT event_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
               MIN(event_type) AS event_type,
               MIN(value) AS value,
               CAST(COUNT(*) AS BIGINT) AS n_deliveries
        FROM deliveries
        GROUP BY event_id
        ORDER BY event_id
    """,
    "dedup_minhash_lsh": _minhash_oracle(),
    "minhash_estimate_error": f"""
        WITH {_minhash_bands_cte()},
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id
                        AND a.band_val = b.band_val
                        AND a.doc_id < b.doc_id
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS sz FROM doc_shingles GROUP BY doc_id
        ),
        inter AS (
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                   COUNT(*) AS inter
            FROM doc_shingles x
            JOIN doc_shingles y ON x.sh = y.sh AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
        ),
        scored AS (
            SELECT ({" + ".join(
                f"CASE WHEN ma.mh{s} = mb.mh{s} THEN 1 ELSE 0 END"
                for s in range(MINHASH_HASHES)
            )}) AS matching,
                   COALESCE(i.inter, 0) * 1.0
                   / (sa.sz + sb.sz - COALESCE(i.inter, 0)) AS exact_j
            FROM cand c
            JOIN mh ma ON ma.doc_id = c.doc_a
            JOIN mh mb ON mb.doc_id = c.doc_b
            LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
            JOIN sizes sa ON sa.doc_id = c.doc_a
            JOIN sizes sb ON sb.doc_id = c.doc_b
        )
        SELECT matching,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(matching * 1.0 / {MINHASH_HASHES}, 6) AS est_jaccard,
               ROUND(AVG(exact_j), 6) AS avg_exact_jaccard,
               ROUND(AVG(ABS(matching * 1.0 / {MINHASH_HASHES} - exact_j)),
                     6) AS mean_abs_err
        FROM scored
        GROUP BY matching
        ORDER BY matching
    """,  # noqa: E501
    "minhash_banding_precision": f"""
        WITH {_minhash_bands_cte()},
        cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS INTEGER) AS band_overlap
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id
                        AND a.band_val = b.band_val
                        AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS sz FROM doc_shingles GROUP BY doc_id
        ),
        inter AS (
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                   COUNT(*) AS inter
            FROM doc_shingles x
            JOIN doc_shingles y ON x.sh = y.sh AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
        ),
        scored AS (
            SELECT c.band_overlap,
                   CASE WHEN COALESCE(i.inter, 0) * 1.0
                             / (sa.sz + sb.sz - COALESCE(i.inter, 0))
                             >= {BANDING_CONFIRM_JACCARD}
                        THEN 1 ELSE 0 END AS ok
            FROM cand c
            LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
            JOIN sizes sa ON sa.doc_id = c.doc_a
            JOIN sizes sb ON sb.doc_id = c.doc_b
        )
        SELECT band_overlap,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(ok) AS BIGINT) AS n_confirmed,
               ROUND(SUM(ok) * 1.0 / COUNT(*), 6) AS confirm_rate
        FROM scored
        GROUP BY band_overlap
        ORDER BY band_overlap
    """,
    "dedup_incremental_newbatch": f"""
        WITH {_minhash_bands_cte()},
        hits AS (
            SELECT n.doc_id,
                   CAST(COUNT(DISTINCT i.doc_id) AS BIGINT)
                       AS n_index_hits,
                   MIN(i.doc_id) AS dup_of
            FROM bands n
            JOIN bands i ON i.band_id = n.band_id
                        AND i.band_val = n.band_val
                        AND i.doc_id % {NEWBATCH_MOD} != {NEWBATCH_REM}
            WHERE n.doc_id % {NEWBATCH_MOD} = {NEWBATCH_REM}
            GROUP BY n.doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n_index_hits, 0) AS n_index_hits,
               h.dup_of,
               CAST(h.dup_of IS NOT NULL AS INTEGER) AS is_dup
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % {NEWBATCH_MOD} = {NEWBATCH_REM}
        ORDER BY d.doc_id
    """,
    "cross_source_dup_matrix": f"""
        SELECT LEAST(da.source, db.source) AS source_a,
               GREATEST(da.source, db.source) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM ({_minhash_oracle()}) p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
        GROUP BY 1, 2
        ORDER BY source_a, source_b
    """,
    "dedup_containment": f"""
        WITH {_SHINGLES_CTE},
        keep AS (
            SELECT sh FROM doc_shingles GROUP BY sh
            HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        sh2 AS (
            SELECT ds.doc_id, ds.sh FROM doc_shingles ds JOIN keep USING (sh)
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS sz FROM sh2 GROUP BY doc_id
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS inter
            FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, inter,
               ROUND(inter * 1.0 / LEAST(sa.sz, sb.sz), 4) AS containment,
               ROUND(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON inter.doc_a = sa.doc_id
        JOIN sizes sb ON inter.doc_b = sb.doc_id
        WHERE ROUND(inter * 1.0 / LEAST(sa.sz, sb.sz), 4)
              >= {CONTAINMENT_MIN}
        ORDER BY doc_a, doc_b
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES_CTE},
        keep AS (
            SELECT sh FROM doc_shingles GROUP BY sh
            HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        sh2 AS (
            SELECT ds.doc_id, ds.sh FROM doc_shingles ds JOIN keep USING (sh)
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS sz FROM sh2 GROUP BY doc_id
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        scored AS (
            SELECT doc_a, doc_b,
                   ROUND(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON inter.doc_a = sa.doc_id
            JOIN sizes sb ON inter.doc_b = sb.doc_id
        ),
        sym AS (
            SELECT doc_a, doc_b, jaccard FROM scored
            UNION ALL
            SELECT doc_b AS doc_a, doc_a AS doc_b, jaccard FROM scored
        )
        SELECT doc_a AS doc_id, doc_b AS best_match, jaccard
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_a ORDER BY jaccard DESC, doc_b
            ) AS rn
            FROM sym
        )
        WHERE rn = 1
        ORDER BY doc_id
    """,
    "dedup_simhash": _simhash_oracle(),
}


def _subdoc_neardup_oracle() -> str:
    """SQL replay of the block-level MinHash pipeline — same seeded
    md5 hash family, band concatenation, and bucket cap as the Spark
    side, generated so signature width/banding changes stay in one
    place (the module constants)."""
    mins = ", ".join(
        f"MIN(md5('{s}|' || sh)) AS mh{s}" for s in range(SUBDOC_MINHASHES)
    )
    per_band = SUBDOC_MINHASHES // SUBDOC_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, bs, {b} AS band_id, {concat} AS band_val "
        "FROM mh".format(
            b=b,
            concat=" || ".join(
                f"mh{b * per_band + j}" for j in range(per_band)
            ),
        )
        for b in range(SUBDOC_BANDS)
    )
    return f"""
        WITH dw AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        blk AS (
            SELECT doc_id, CAST(gs AS INTEGER) AS bs,
                   list_slice(w, gs + 1, gs + {BLOCK_WORDS}) AS bw
            FROM dw, UNNEST(generate_series(0, len(w) - 1, {BLOCK_WORDS}))
                     AS t(gs)
        ),
        bsh AS (
            SELECT DISTINCT doc_id, bs,
                   unnest({shingles_sql_duckdb(3, "bw")}) AS sh
            FROM blk
        ),
        mh AS (SELECT doc_id, bs, {mins} FROM bsh GROUP BY doc_id, bs),
        bands AS ({band_selects}),
        keep AS (
            SELECT band_id, band_val FROM bands
            GROUP BY band_id, band_val
            HAVING COUNT(*) <= {SUBDOC_BUCKET_CAP}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, a.bs AS bs_a,
                            b.doc_id AS doc_b, b.bs AS bs_b
            FROM bands a
            JOIN keep k ON k.band_id = a.band_id
                       AND k.band_val = a.band_val
            JOIN bands b ON b.band_id = a.band_id
                        AND b.band_val = a.band_val
                        AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_block_pairs
        FROM cand
        GROUP BY doc_a, doc_b
        ORDER BY doc_a, doc_b
    """


ORACLE_SQL["dedup_subdoc_neardup"] = _subdoc_neardup_oracle()


#: Bloom-filter geometry for the decontamination variant: m = 16^3 =
#: 4096 bits addressed directly by 3 md5 hex digits (no modulo bias),
#: k = 3 independent seeded hashes. At the benchmark's ~1.4k distinct
#: shingles this loads the filter to ~m/2 set bits — a realistic
#: false-positive regime (the diagnostic the op reports).
BLOOM_BITS_HEX = 3
BLOOM_HASHES = 3


def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a Bloom filter instead of the
    exact shingle join (``benchmark_decontaminate``): the benchmark's
    shingle set is folded into a fixed 4096-bit array and the corpus
    probes membership — the shape you ship when the eval suite is too
    large to broadcast as raw shingles (the filter is a few KB no
    matter how big the suite) or must be exchanged without revealing
    eval text. One-sided: no false negatives, only false positives —
    the op reports the FP count per doc by carrying the exact join
    alongside, which is the calibration run you do once before
    trusting the filter.

    Plan: the filter's set-bit positions form a ≤4096-element list
    (the bit space is 16^3 by construction), collected ONCE per build
    and compiled into the probe plan as a map-side ``isin`` (InSet)
    conjunction — a shingle "hits" iff ALL k of its probe positions
    are in the set-bit list. No join, no explode, no extra shuffle on
    the corpus side: one linear scan evaluates membership per task
    (the round-10 fix for the ×k-explode superlinearity; PERF.md).
    Everything is integer md5 arithmetic shared verbatim with the
    DuckDB oracle.

    Steady state (round-9): the per-doc contamination report IS what
    a pipeline stores (downstream filtering keys off it), so it
    persists per corpus like the other dedup deliverable tables;
    every run after the first is a scan + sort. Build plan exposed
    as :func:`_bloom_decon_build`."""
    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        corpus_slug,
        persisted_table,
    )

    rep = persisted_table(
        spark,
        f"bloom_decon_doc/{corpus_slug(sf_dir)}",
        f"{sf_dir}|k={DECON_K}|bench={DECON_BENCH_DOCS}"
        f"|bits={BLOOM_BITS_HEX}|h={BLOOM_HASHES}",
        lambda: _bloom_decon_build(spark, sf_dir),
    )
    return rep.orderBy("doc_id")


def _bloom_decon_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-persisted Bloom probe + exact-calibration plan (see
    :func:`bloom_decontaminate`). NOT fully lazy: constructing it
    runs one eager Spark job (bench-shingle scan → k positions →
    distinct → collect of the ≤4096 set-bit list) so the probe can
    be compiled as a map-side InSet; callers wanting only the
    logical plan still pay that bench-side scan. The plan audit
    (tools/plan_audit.py) audits the registered query, not this
    helper, so no audit path is affected."""
    from functools import reduce

    from tableau_dashboard_performance_etl_automation_spark.functions.hashing import (
        md5_hex_int,
    )

    docs = load_table(spark, sf_dir, "documents")
    # the corpus-wide (doc_id, sh) distinct was pure WITHIN-doc dedup
    # (doc_id is in the key): array_distinct before the explode makes
    # it narrow — the probe path's last corpus shuffle besides the
    # final per-doc aggregate is gone (round-10's residual 0.7×-above-
    # linear sort-spill term at the 1024× decade, PERF.md)
    sh = docs.withColumn("w", words()).select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(k=DECON_K))).alias("sh"),
    )
    bench = sh.filter(F.col("doc_id") < DECON_BENCH_DOCS).select("sh").distinct()

    def positions(side):
        pos_cols = [
            md5_hex_int(
                F.md5(F.concat(F.lit(f"{s}|"), F.col("sh"))),
                1,
                BLOOM_BITS_HEX,
            ).alias(f"p{s}")
            for s in range(BLOOM_HASHES)
        ]
        return side.select("*", *pos_cols)

    # The filter's bit space is 16^BLOOM_BITS_HEX = 4096 positions, so
    # the set-bit list is driver-sized BY CONSTRUCTION (and the bench
    # set is a fixed absolute doc count besides): collect it once per
    # build and evaluate membership map-side as an InSet. The previous
    # form exploded every probe shingle ×BLOOM_HASHES into a position
    # join + a (doc_id, sh) re-aggregation — two corpus-sized shuffles
    # that went superlinear past the spill threshold at the 1024×
    # decade (PERF.md round 10: 164.9 s at 256× → 1486.6 s at 1024×);
    # this is the getbit-bitmask fix sketched there, spelled as InSet.
    set_bits = sorted(
        r.pos
        for r in positions(bench)
        .select(
            F.explode(
                F.array(*[F.col(f"p{s}") for s in range(BLOOM_HASHES)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    all_set = (
        reduce(
            lambda a, b: a & b,
            [F.col(f"p{s}").isin(set_bits) for s in range(BLOOM_HASHES)],
        )
        if set_bits
        else F.lit(False)
    )
    per_shingle = positions(
        sh.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
    ).select("doc_id", "sh", all_set.cast("int").alias("bloom_hit"))
    exact = F.broadcast(bench.withColumn("exact_hit", F.lit(1)))
    return (
        per_shingle.join(exact, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sh"),
            F.sum("bloom_hit").cast("bigint").alias("n_bloom_hits"),
            F.sum(F.coalesce(F.col("exact_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_exact_hits"),
            F.sum(
                (
                    (F.col("bloom_hit") == 1)
                    & F.col("exact_hit").isNull()
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_false_pos"),
        )
        .withColumn(
            "bloom_contaminated",
            (F.col("n_bloom_hits") > 0).cast("int"),
        )
    )


QUERIES["bloom_decontaminate"] = bloom_decontaminate


def _bloom_oracle() -> str:
    from tableau_dashboard_performance_etl_automation_spark.functions.hashing import (
        md5_hex_int_sql,
    )
    from tableau_dashboard_performance_etl_automation_spark.functions.text import (
        shingles_sql_duckdb,
    )

    pos_exprs = ", ".join(
        md5_hex_int_sql(f"md5('{s}|' || sh)", 1, BLOOM_BITS_HEX)
        + f" AS p{s}"
        for s in range(BLOOM_HASHES)
    )
    pos_list = ", ".join(f"p{s}" for s in range(BLOOM_HASHES))
    return f"""
        WITH sh AS (
            SELECT DISTINCT doc_id,
                   unnest({shingles_sql_duckdb(DECON_K, "string_split(text, ' ')")})
                       AS sh
            FROM documents
        ),
        bench AS (
            SELECT DISTINCT sh FROM sh WHERE doc_id < {DECON_BENCH_DOCS}
        ),
        bits AS (
            SELECT DISTINCT pos FROM (
                SELECT unnest([{pos_list}]) AS pos
                FROM (SELECT sh, {pos_exprs} FROM bench)
            )
        ),
        probe_pos AS (
            SELECT doc_id, sh,
                   unnest(list_distinct([{pos_list}])) AS pos
            FROM (
                SELECT doc_id, sh, {pos_exprs}
                FROM sh WHERE doc_id >= {DECON_BENCH_DOCS}
            )
        ),
        per_shingle AS (
            SELECT doc_id, sh,
                   CAST(COUNT(*) = SUM(CASE WHEN b.pos IS NOT NULL
                                            THEN 1 ELSE 0 END)
                        AS INTEGER) AS bloom_hit
            FROM probe_pos p LEFT JOIN bits b USING (pos)
            GROUP BY doc_id, sh
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_sh,
               CAST(SUM(bloom_hit) AS BIGINT) AS n_bloom_hits,
               CAST(SUM(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_hits,
               CAST(SUM(CASE WHEN bloom_hit = 1 AND e.sh IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_false_pos,
               CAST(SUM(bloom_hit) > 0 AS INTEGER) AS bloom_contaminated
        FROM per_shingle s LEFT JOIN bench e USING (sh)
        GROUP BY doc_id
        ORDER BY doc_id
    """


ORACLE_SQL["bloom_decontaminate"] = _bloom_oracle()


def dedup_survivorship_conflicts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survivorship audit for exact-duplicate groups: when byte-equal
    texts carry DIFFERENT metadata (lang, source), a dedup pass that
    keeps one survivor silently discards the others' attributes —
    this op reports, per duplicate group, the copy count and the
    distinct metadata values, flagging the groups where survivor
    choice actually loses information (the MDM merge-conflict list a
    curation pipeline reviews before collapsing).

    Same single hash-shuffle as :func:`dedup_exact` — the metadata
    cardinalities ride along as extra aggregates on the same
    ``md5(text)`` grouping, so the audit costs nothing beyond the
    dedup pass it guards."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .filter(F.col("n_copies") > 1)
        .withColumn(
            "has_conflict",
            ((F.col("n_langs") > 1) | (F.col("n_sources") > 1)).cast("int"),
        )
        .orderBy("text_hash")
    )


QUERIES["dedup_survivorship_conflicts"] = dedup_survivorship_conflicts

ORACLE_SQL["dedup_survivorship_conflicts"] = """
    SELECT md5(text) AS text_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keep_id,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) > 1 OR COUNT(DISTINCT source) > 1
                AS INTEGER) AS has_conflict
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    ORDER BY text_hash
"""


def source_dedup_burden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate burden: how many of a source's
    documents the GLOBAL exact dedup pass (:func:`dedup_exact`'s
    min-doc_id-survivor rule over corpus-wide ``md5(text)`` families)
    would drop, and the share of the source they represent — the
    table that says which ingestion feeds are paying the duplicate
    tax. Families are corpus-wide, NOT per source: a copy living in a
    different source from its survivor still drops, and is charged to
    the source that carried the copy.

    One hash-shuffle on the content hash to pick each family's
    survivor, a join-back on the same key (co-partitioned — AQE
    reuses the exchange), then a per-source rollup; drop share is a
    ratio of exact integer counts. Families never materialize as
    pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select("source", "doc_id", F.md5("text").alias("h"))
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    return (
        hashed.join(keep, "h")
        .select(
            "source",
            (F.col("doc_id") != F.col("keep_id")).cast("int").alias(
                "dropped"
            ),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dropped").cast("bigint").alias("n_dropped"),
        )
        .withColumn(
            "drop_share",
            F.round(F.col("n_dropped") / F.col("n_docs"), 6),
        )
        .orderBy("source")
    )


QUERIES["source_dedup_burden"] = source_dedup_burden

ORACLE_SQL["source_dedup_burden"] = """
    WITH hashed AS (
        SELECT source, doc_id, md5(text) AS h FROM documents
    ),
    keep AS (
        SELECT h, MIN(doc_id) AS keep_id FROM hashed GROUP BY h
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN d.doc_id != k.keep_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           ROUND(SUM(CASE WHEN d.doc_id != k.keep_id THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS drop_share
    FROM hashed d
    JOIN keep k ON k.h = d.h
    GROUP BY d.source
    ORDER BY d.source
"""


#: Winnowing dials (Schleimer, Wilkerson & Aiken 2003, "Winnowing:
#: Local Algorithms for Document Fingerprinting" — the MOSS
#: algorithm). K-word grams hashed per position; each window of W
#: consecutive hashes contributes its minimum as a fingerprint, which
#: GUARANTEES any shared run of at least W + K - 1 words is caught by
#: at least one shared fingerprint — a local-match detector, where
#: MinHash/SimHash only see whole-document similarity.
WINNOW_K = 4
WINNOW_W = 4
#: Pairs must share at least this many fingerprints to be reported.
WINNOW_MIN_SHARED = 3
#: Stop-fingerprint cap — boilerplate grams shared by more docs than
#: this are dropped before the pair join (the jaccard discipline).
WINNOW_MAX_DF = 100


def _winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, fp) winnowing fingerprints, PERSISTED as a
    corpus artifact (the shingle-table discipline): the pair op
    consumes this table FOUR ways (stop-fingerprint census, both
    sides of the inverted-index join, per-doc counts) — without
    persistence Spark re-runs the whole extraction per consumer
    (measured 4× the extraction cost at sf0.1), and the stored
    fingerprint index is the production shape for repeated
    plagiarism/overlap probes anyway."""
    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        arr = word_shingles(k=WINNOW_K)
        return (
            docs.withColumn("w", words())
            .filter(F.size("w") >= WINNOW_K)
            .withColumn("hs", F.transform(arr, F.md5))
            .filter(F.size("hs") >= WINNOW_W)
            .select(
                "doc_id",
                F.explode(
                    F.array_distinct(
                        F.expr(
                            f"transform("
                            f"sequence(0, size(hs) - {WINNOW_W}), "
                            f"i -> array_min(slice(hs, i + 1, "
                            f"{WINNOW_W})))"
                        )
                    )
                ).alias("fp"),
            )
        )

    base = corpus_slug(sf_dir)
    return persisted_table(
        spark, f"winnow_fp/k{WINNOW_K}w{WINNOW_W}/{base}", sf_dir, build
    )


def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-overlap candidate pairs by winnowing fingerprints: docs
    that share ≥ ``WINNOW_MIN_SHARED`` window-min k-gram hashes —
    i.e. docs containing COPIED SPANS (quotes, templated paragraphs,
    near-identical sections), even when the documents as a whole are
    dissimilar. This is the span-level member of the dedup family:
    exact (whole doc) → minhash/simhash (whole-doc similarity) →
    winnowing (shared local runs ≥ W+K-1 words).

    Scale shape: fingerprint extraction is ENTIRELY array-side inside
    one narrow projection — per-document shingle hashes, then a
    sliding ``array_min`` over each W-window via
    ``transform(sequence(...))`` — so there is NO shuffle at all
    until the pair join (the first formulation used a per-doc window
    function, whose partition-sort shuffle was pure overhead for
    work that never crosses documents; measured 1.8× slower at
    sf0.1). The density bound means each doc keeps ~2/(W+1) of its
    positions, so the inverted index carries a fraction of the
    shingle volume. The pair step is the capped equi-join on
    fingerprint (no cross join), with the same stop-fingerprint DF
    cap as the jaccard index. Hashes are md5 hex strings —
    lexicographic MIN agrees across engines (the oracle expresses
    the identical window min over positions).

    Returns (doc_a, doc_b, n_shared, overlap_frac) where
    overlap_frac = n_shared / min(|fp_a|, |fp_b|), ordered by pair.
    """
    fp = _winnow_fingerprints(spark, sf_dir)
    keep = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= WINNOW_MAX_DF)
        .select("fp")
    )
    # materialize the capped fingerprint table once: three consumers
    # (per-doc counts + both self-join sides) otherwise each re-run
    # the fp⋈keep shuffle join — the self-join sides share an
    # exchange at runtime but the counts branch never did
    fpk = fp.join(keep, "fp").localCheckpoint(eager=False)
    counts = fpk.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nfp"))
    a, b = fpk.alias("a"), fpk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    ca = counts.select(
        F.col("doc_id").alias("doc_a"), F.col("nfp").alias("nfp_a")
    )
    cb = counts.select(
        F.col("doc_id").alias("doc_b"), F.col("nfp").alias("nfp_b")
    )
    return (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / F.least(F.col("nfp_a"), F.col("nfp_b")),
                4,
            ).alias("overlap_frac"),
        )
        .orderBy("doc_a", "doc_b")
    )


QUERIES["winnowing_overlap_pairs"] = winnowing_overlap_pairs

ORACLE_SQL["winnowing_overlap_pairs"] = f"""
    WITH dw AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= {WINNOW_K}
    ),
    sh AS (
        SELECT doc_id,
               len(w) - {WINNOW_K} + 1 AS nsh,
               generate_subscripts(
                   {shingles_sql_duckdb(WINNOW_K)}, 1) - 1 AS pos,
               md5(unnest({shingles_sql_duckdb(WINNOW_K)})) AS h
        FROM dw
    ),
    fp AS (
        SELECT DISTINCT doc_id, fp FROM (
            SELECT doc_id, pos, nsh,
                   MIN(h) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW
                                AND {WINNOW_W - 1} FOLLOWING
                   ) AS fp
            FROM sh
        )
        WHERE pos <= nsh - {WINNOW_W}
    ),
    keep AS (
        SELECT fp FROM fp GROUP BY fp
        HAVING COUNT(*) <= {WINNOW_MAX_DF}
    ),
    fpk AS (SELECT f.doc_id, f.fp FROM fp f JOIN keep USING (fp)),
    counts AS (
        SELECT doc_id, COUNT(*) AS nfp FROM fpk GROUP BY doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM fpk a
        JOIN fpk b ON b.fp = a.fp AND b.doc_id > a.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    )
    SELECT p.doc_a, p.doc_b, p.n_shared,
           ROUND(p.n_shared / CAST(LEAST(ca.nfp, cb.nfp) AS DOUBLE), 4)
               AS overlap_frac
    FROM pairs p
    JOIN counts ca ON ca.doc_id = p.doc_a
    JOIN counts cb ON cb.doc_id = p.doc_b
    ORDER BY doc_a, doc_b
"""


def winnow_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination via winnowing: flag
    corpus documents sharing ANY winnowed fingerprint with the
    benchmark slice (doc_id < DECON_BENCH_DOCS, the
    ``benchmark_decontaminate`` convention). Where the k-gram variant
    stores EVERY benchmark shingle, this one stores the winnowed
    ~2/(W+1) density subset yet still catches every shared run of at
    least W+K-1 words (the winnowing guarantee) — the storage/recall
    trade an eval-suite registry at production scale actually ships.

    Scale shape: both sides are id-filtered reads of the PERSISTED
    fingerprint table (:func:`_winnow_fingerprints` — built once per
    corpus, shared with the pair detector); the benchmark side is
    human-sized and broadcasts into one narrow join + per-doc count.

    Returns (doc_id, n_shared_fp, contaminated) for corpus docs.
    """
    fp = _winnow_fingerprints(spark, sf_dir)
    bench = (
        fp.filter(F.col("doc_id") < DECON_BENCH_DOCS)
        .select("fp")
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents")
    hits = (
        fp.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
        .join(F.broadcast(bench), "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fp"))
    )
    return (
        docs.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("n_shared_fp"), F.lit(0).cast("bigint")
            ).alias("n_shared_fp"),
            (F.coalesce(F.col("n_shared_fp"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
        .orderBy("doc_id")
    )


QUERIES["winnow_decontaminate"] = winnow_decontaminate

ORACLE_SQL["winnow_decontaminate"] = f"""
    WITH dw AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= {WINNOW_K}
    ),
    sh AS (
        SELECT doc_id,
               len(w) - {WINNOW_K} + 1 AS nsh,
               generate_subscripts(
                   {shingles_sql_duckdb(WINNOW_K)}, 1) - 1 AS pos,
               md5(unnest({shingles_sql_duckdb(WINNOW_K)})) AS h
        FROM dw
    ),
    fp AS (
        SELECT DISTINCT doc_id, fp FROM (
            SELECT doc_id, pos, nsh,
                   MIN(h) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW
                                AND {WINNOW_W - 1} FOLLOWING
                   ) AS fp
            FROM sh
        )
        WHERE pos <= nsh - {WINNOW_W}
    ),
    bench AS (
        SELECT DISTINCT fp FROM fp
        WHERE doc_id < {DECON_BENCH_DOCS}
    ),
    hits AS (
        SELECT f.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shared_fp
        FROM fp f JOIN bench b ON b.fp = f.fp
        WHERE f.doc_id >= {DECON_BENCH_DOCS}
        GROUP BY f.doc_id
    )
    SELECT d.doc_id AS doc_id,
           CAST(COALESCE(h.n_shared_fp, 0) AS BIGINT) AS n_shared_fp,
           CAST(COALESCE(h.n_shared_fp, 0) > 0 AS INTEGER)
               AS contaminated
    FROM documents d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id >= {DECON_BENCH_DOCS}
    ORDER BY doc_id
"""


#: Exact-Jaccard threshold for the prefix-filter join, as an integer
#: ratio (3/5 = 0.6) so the survival test is pure integer arithmetic.
PREFIX_T_NUM = 3
PREFIX_T_DEN = 5


def _prefix_verified_rep_pairs(
    spark: SparkSession,
    sf_dir: str,
    sh_all: DataFrame,
    members: DataFrame,
    base: str,
) -> DataFrame:
    """The prefix-filter candidate join + exact array verification
    over exact-dup REPRESENTATIVES — the build step behind the
    persisted ``prefix_pairs/{base}`` artifact (see
    :func:`dedup_prefix_filter_pairs` for the guarantee proofs).
    Runs once per corpus; steady state reads the stored pairs."""
    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    reps = members.filter(F.col("doc_id") == F.col("rep")).select(
        F.col("doc_id").alias("rid"), "sz"
    )
    sh = sh_all.join(
        reps.select(F.col("rid").alias("doc_id")), "doc_id", "left_semi"
    )

    def _build_rep_sets() -> DataFrame:
        return sh.groupBy("doc_id").agg(
            F.sort_array(F.collect_list("sh")).alias("sset"),
            F.count(F.lit(1)).alias("sz"),
        )

    rep_sets = persisted_table(
        spark, f"prefix_repsets/{base}", sf_dir, _build_rep_sets
    )

    def _build_prefix() -> DataFrame:
        census = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        sizes = reps.select(F.col("rid").alias("doc_id"), "sz")
        w = Window.partitionBy("doc_id").orderBy("df", "sh")
        return (
            sh.join(census, "sh")
            .withColumn("rk", F.row_number().over(w))
            .join(sizes, "doc_id")
            .filter(
                F.col("rk")
                <= F.col("sz")
                - F.expr(
                    f"({PREFIX_T_NUM} * sz + {PREFIX_T_DEN - 1}) "
                    f"DIV {PREFIX_T_DEN}"
                )
                + 1
            )
            .select("doc_id", "sh", "sz", "rk")
        )

    prefix = persisted_table(
        spark, f"prefix_index/{base}", sf_dir, _build_prefix
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # candidate equi-join on prefix shingles with PPJoin's LENGTH and
    # POSITIONAL filters inline. Length: J >= t forces t·|A| <= |B|
    # and t·|B| <= |A|. Positional: J >= t needs overlap
    # α = ceil(t/(1+t)·(|A|+|B|)) = ceil(3(sa+sb)/8); if w is the
    # FIRST common token (smallest global order), every common token
    # ranks >= rk(w) in both docs, so α <= min(sa−rk_a, sb−rk_b)+1 —
    # the join emits a row for every shared prefix token, the
    # first-match row always survives the bound, and distinct()
    # recovers exactly the qualifying pair set. Both filters are
    # integer-exact: n >= ceil(X/(NUM+DEN)) over integers is
    # n·(NUM+DEN) >= X, no ceil arithmetic needed. Measured at the
    # 16× ladder: 1.04M bare candidates → 678k after length → 180k
    # after positional (5.8× total) before the array-verify stage.
    alpha = (
        PREFIX_T_NUM * (F.col("a.sz") + F.col("b.sz"))
    ).cast("bigint")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.col("a.sz") * PREFIX_T_NUM
                <= F.col("b.sz") * PREFIX_T_DEN
            )
            & (
                F.col("b.sz") * PREFIX_T_NUM
                <= F.col("a.sz") * PREFIX_T_DEN
            )
            & (
                (
                    F.least(
                        F.col("a.sz") - F.col("a.rk"),
                        F.col("b.sz") - F.col("b.rk"),
                    )
                    + 1
                )
                * (PREFIX_T_NUM + PREFIX_T_DEN)
                >= alpha
            ),
        )
        .select(
            F.col("a.doc_id").alias("rep_a"),
            F.col("b.doc_id").alias("rep_b"),
        )
        .distinct()
    )
    # verification WITHOUT a pair×shingle explosion: each rep carries
    # its sorted shingle array once; the intersection is a per-row
    # array_intersect over the two arrays (codegen'd, distinct
    # elements → exact count), so verify cost is rows = |candidates|,
    # never |candidates|·|set| shuffled rows — the first form of this
    # stage cost 60 s of the 16×-ladder's 166 s on exactly that
    rep_pairs = (
        cand.join(
            rep_sets.select(
                F.col("doc_id").alias("rep_a"),
                F.col("sset").alias("set_a"),
                F.col("sz").alias("sz_a"),
            ),
            "rep_a",
        )
        .join(
            rep_sets.select(
                F.col("doc_id").alias("rep_b"),
                F.col("sset").alias("set_b"),
                F.col("sz").alias("sz_b"),
            ),
            "rep_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect("set_a", "set_b"))
        )
        .filter(
            F.col("inter") * PREFIX_T_DEN
            >= PREFIX_T_NUM
            * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .select(
            "rep_a",
            "rep_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
    )
    return rep_pairs


def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join (Jaccard ≥ 0.6) via prefix filtering
    — the deterministic counterpart to ``dedup_minhash_lsh``: LSH
    finds *probably*-similar pairs with banding-curve misses; this
    finds *every* pair at the threshold, guaranteed, and at a cost
    bounded by the same inverted-index discipline (the PPJoin family
    — Chaudhuri et al. 2006 / Xiao et al. 2008 — re-expressed as
    three DataFrame joins).

    Prefix-filter guarantee: order all shingles by a single global
    key (df ASC, shingle ASC — rarest first, which minimizes
    candidates); if J(A,B) ≥ t, then A and B must share a shingle
    within each one's first ``|X| − ceil(t·|X|) + 1`` shingles under
    that order, so the candidate join runs over PREFIXES only —
    ``ceil(3s/5) = (3s+4) DIV 5`` keeps the length integral. Each
    candidate pair is then verified against the FULL shingle sets
    with an exact integer intersection count, and survival is the
    integer cross-multiplication ``inter·5 ≥ 3·(union)`` — no float
    ever decides membership, so cross-engine parity is structural.

    Scale shape — exact-duplicate groups are collapsed FIRST: docs
    with identical shingle sets (J = 1 by definition, and real
    corpora carry massive exact-dup families) reduce to one
    representative via a set-signature hash, the prefix/verify
    pipeline runs over REPRESENTATIVES only, and member pairs expand
    back at the end (within-group pairs are J = 1.0 literals,
    cross-group pairs inherit the representative Jaccard — identical
    numbers, identical output multiset). Without the collapse a
    family of m exact copies makes every prefix shingle collide m×
    and the candidate join goes quadratic in m — the 16× corpus
    ladder measured exactly that (6.7 s → 162 s) before the rewrite,
    and 11 s after. Downstream of the collapse: df census = one
    shingle hash aggregate; the per-rep rank window partitions by
    doc_id (huge cardinality → tiny partitions); candidate equi-join
    on prefix shingles (each rep's rarest); verification = two hash
    equi-joins on the rep key; expansion is two joins linear in the
    OUTPUT pair count. No all-pairs stage anywhere."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    base = corpus_slug(sf_dir)
    sh_all = _doc_shingles(spark, sf_dir)

    # ---- exact-set collapse + prefix index, PERSISTED per corpus
    # (the band-index discipline): signature aggregate, rep shingle
    # sets, and the ranked prefix table are all deterministic
    # functions of the corpus, are each referenced from several
    # downstream joins, and at steady state the query should pay only
    # the candidate join + verify — a fresh run rebuilds once, every
    # later run gets disk-backed scans (an earlier localCheckpoint
    # form pinned them per-plan but re-paid the build every session
    # and held executor heap; measured at the 16× ladder the
    # un-pinned form recomputed the signature aggregate ~8×: 111 s)
    def _build_members() -> DataFrame:
        sig = sh_all.groupBy("doc_id").agg(
            F.md5(
                F.concat_ws("\x1f", F.sort_array(F.collect_list("sh")))
            ).alias("sig"),
            F.count(F.lit(1)).alias("sz"),
        )
        groups = sig.groupBy("sig").agg(F.min("doc_id").alias("rep"))
        return sig.join(groups, "sig").select("doc_id", "rep", "sz")

    members = persisted_table(
        spark, f"prefix_members/{base}", sf_dir, _build_members
    )

    def _build_rep_pairs() -> DataFrame:
        return _prefix_verified_rep_pairs(spark, sf_dir, sh_all, members, base)

    # the VERIFIED rep-pair set is itself a per-corpus artifact
    # (round-7, the part_golden_records pattern): a deployed dedup
    # pipeline computes the pair set once per corpus snapshot —
    # steady state pays only this scan + the member expansion, not
    # the candidate join + array verify (measured at sf0.1: 6.4 s
    # steady → ~1 s). The tag folds in the threshold so a changed
    # PREFIX_T_* invalidates stored pairs instead of serving the old
    # threshold's output.
    rep_pairs = persisted_table(
        spark,
        f"prefix_pairs/{base}",
        f"{sf_dir}|t={PREFIX_T_NUM}/{PREFIX_T_DEN}",
        _build_rep_pairs,
    )
    # ---- expand representatives back to members
    ma = members.select(F.col("rep").alias("rep_a"), F.col("doc_id").alias("a"))
    mb = members.select(F.col("rep").alias("rep_b"), F.col("doc_id").alias("b"))
    cross = (
        rep_pairs.join(ma, "rep_a")
        .join(mb, "rep_b")
        .select(
            F.least("a", "b").alias("doc_a"),
            F.greatest("a", "b").alias("doc_b"),
            "jaccard",
        )
    )
    m1, m2 = members.alias("m1"), members.alias("m2")
    within = (
        m1.join(
            m2,
            (F.col("m1.rep") == F.col("m2.rep"))
            & (F.col("m1.doc_id") < F.col("m2.doc_id")),
        )
        .select(
            F.col("m1.doc_id").alias("doc_a"),
            F.col("m2.doc_id").alias("doc_b"),
            F.round(F.lit(1.0), 4).alias("jaccard"),
        )
    )
    return cross.unionByName(within).orderBy("doc_a", "doc_b")


QUERIES["dedup_prefix_filter_pairs"] = dedup_prefix_filter_pairs

ORACLE_SQL["dedup_prefix_filter_pairs"] = f"""
    WITH {_SHINGLES_CTE},
    census AS (
        SELECT sh, COUNT(*) AS df FROM doc_shingles GROUP BY sh
    ),
    sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM doc_shingles GROUP BY doc_id
    ),
    pre AS (
        SELECT t.doc_id, t.sh FROM (
            SELECT s.doc_id, s.sh, z.sz,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.doc_id ORDER BY c.df, s.sh
                   ) AS rk
            FROM doc_shingles s
            JOIN census c USING (sh)
            JOIN sizes z USING (doc_id)
        ) t
        WHERE t.rk <= t.sz
                      - ({PREFIX_T_NUM} * t.sz + {PREFIX_T_DEN - 1})
                        // {PREFIX_T_DEN}
                      + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pre a JOIN pre b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
        FROM cand c
        JOIN doc_shingles sa
          ON sa.doc_id = c.doc_a
        JOIN doc_shingles sb
          ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(i.inter * 1.0
                 / (za.sz + zb.sz - i.inter), 4) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE i.inter * {PREFIX_T_DEN}
          >= {PREFIX_T_NUM} * (za.sz + zb.sz - i.inter)
    ORDER BY i.doc_a, i.doc_b
"""


def prefix_vs_lsh_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head of the two pair-finding strategies the engine
    ships: the MinHash+LSH candidate set (fast, probabilistic,
    banding-curve misses) against the prefix-filter EXACT Jaccard ≥
    0.6 set (:func:`dedup_prefix_filter_pairs`) as ground truth — the
    one-row scorecard that says what the LSH pipeline actually missed
    at the threshold and how much extra it surfaced (pairs below 0.6
    or band coincidences). This is the dedup analog of the ANN
    retrieval scorecard (``ann_lsh_ranking_quality``): run it before
    trusting the approximate path on a new corpus.

    Scale shape: both pair sets are bounded upstream (banded
    equi-join / verified prefix candidates); the comparison is one
    full-outer equi-join on the pair key plus a 1-row fold. Recall is
    one exact-integer division rounded once."""
    exact = dedup_prefix_filter_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_exact")
    )
    lsh = lsh_pair_table(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_lsh")
    )
    both = exact.join(lsh, ["doc_a", "doc_b"], "full_outer")
    return both.agg(
        F.sum(F.coalesce("in_exact", F.lit(0)))
        .cast("bigint")
        .alias("n_exact_pairs"),
        F.sum(F.coalesce("in_lsh", F.lit(0)))
        .cast("bigint")
        .alias("n_lsh_pairs"),
        F.sum(
            (
                F.coalesce("in_exact", F.lit(0))
                * F.coalesce("in_lsh", F.lit(0))
            )
        )
        .cast("bigint")
        .alias("n_common"),
        # explicit NULL when the exact set is empty (recall
        # undefined): Spark's 0/0 is NULL but DuckDB's IEEE double
        # division gives NaN, so the guard is spelled out in both
        F.when(
            F.sum(F.coalesce("in_exact", F.lit(0))) > 0,
            F.round(
                F.sum(
                    F.coalesce("in_exact", F.lit(0))
                    * F.coalesce("in_lsh", F.lit(0))
                )
                * 1.0
                / F.sum(F.coalesce("in_exact", F.lit(0))),
                4,
            ),
        ).alias("lsh_recall_at_06"),
    )


QUERIES["prefix_vs_lsh_agreement"] = prefix_vs_lsh_agreement


def _agreement_oracle() -> str:
    exact_sql = ORACLE_SQL["dedup_prefix_filter_pairs"]
    lsh_sql = _minhash_oracle()
    return f"""
        WITH exact_pairs AS MATERIALIZED (
            SELECT doc_a, doc_b FROM ({exact_sql}) t
        ),
        lsh_pairs AS MATERIALIZED (
            SELECT doc_a, doc_b FROM ({lsh_sql}) t
        ),
        joined AS (
            SELECT COALESCE(e.one, 0) AS in_exact,
                   COALESCE(l.one, 0) AS in_lsh
            FROM (SELECT doc_a, doc_b, 1 AS one FROM exact_pairs) e
            FULL OUTER JOIN
                 (SELECT doc_a, doc_b, 1 AS one FROM lsh_pairs) l
            USING (doc_a, doc_b)
        )
        SELECT CAST(SUM(in_exact) AS BIGINT) AS n_exact_pairs,
               CAST(SUM(in_lsh) AS BIGINT) AS n_lsh_pairs,
               CAST(SUM(in_exact * in_lsh) AS BIGINT) AS n_common,
               CASE WHEN SUM(in_exact) = 0 THEN NULL
                    ELSE ROUND(SUM(in_exact * in_lsh) * 1.0
                               / SUM(in_exact), 4)
               END AS lsh_recall_at_06
        FROM joined
    """


ORACLE_SQL["prefix_vs_lsh_agreement"] = _agreement_oracle()
