"""Blocked fuzzy record linkage — entity resolution over dirty
catalog names, the classic warehouse dedup that content hashing
cannot do (reference analogue: the reject-path's tolerance for dirty
rows, tabjolt_email.py:33-56, generalized to fuzzy key matching).

Scale shape — two guards stacked, each killing one quadratic:

1. **Link the distinct-key projection, not the rows.** Edit distance
   depends only on the name string, so the linkage runs on
   ``SELECT DISTINCT p_name`` (bounded by the name vocabulary — 64
   here, maybe millions at 100 TB, never the row count); row-level
   dup impact comes back from a count join. Scoring raw rows was
   measured at 75 s on sf0.1 (312-row buckets of *identical* names
   re-scored 312× each); the projection form is constant-cost in
   corpus size.
2. **Block the distinct names.** The all-pairs matrix over distinct
   names is still O(V²); an equi-join on a cheap blocking key (first
   name token; at scale you union several — leading tokens, soundex,
   length band) bounds pair production by block sizes, exactly like
   the LSH band joins in dedup.py.

Levenshtein runs JVM-side (codegen'd built-in, no Python) only on
the blocked distinct-name pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
    corpus_slug,
)


def part_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best fuzzy match for every DISTINCT part name within its
    blocking bucket (first name token), scored by normalized
    Levenshtein similarity ``1 - lev/max(len)``, with the row-level
    footprint (``n_parts``) each linked name carries.

    Similarity is a ratio of exact integers (edit distance / string
    length), so cross-engine values are bit-identical and the
    ``ROW_NUMBER`` tie order (sim DESC, match name ASC) is
    deterministic.
    """
    parts = load_table(spark, sf_dir, "part")
    names = (
        parts.groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .withColumn("blk", F.split(F.col("p_name"), " ")[0])
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts"),
        F.col("blk"),
    )
    b = names.select(F.col("p_name").alias("name_b"), F.col("blk"))
    cand = a.join(
        b,
        (a.blk == b.blk) & (F.col("name_a") != F.col("name_b")),
    ).select(
        "name_a",
        "n_parts",
        "name_b",
        F.levenshtein(F.col("name_a"), F.col("name_b")).alias("lev_dist"),
        F.greatest(
            F.length(F.col("name_a")), F.length(F.col("name_b"))
        ).alias("max_len"),
    )
    scored = cand.withColumn(
        "sim", F.round(1.0 - F.col("lev_dist") / F.col("max_len"), 4)
    )
    w = Window.partitionBy("name_a").orderBy(
        F.col("sim").desc(), F.col("name_b").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("name_a").alias("p_name"),
            "n_parts",
            F.col("name_b").alias("match_name"),
            "lev_dist",
            "sim",
        )
        .orderBy("p_name")
    )


QUERIES = {"part_record_linkage": part_record_linkage}

ORACLE_SQL = {
    "part_record_linkage": """
        WITH names AS (
            SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
                   split_part(p_name, ' ', 1) AS blk
            FROM part
            GROUP BY p_name
        ),
        cand AS (
            SELECT a.p_name AS name_a, a.n_parts,
                   b.p_name AS name_b,
                   levenshtein(a.p_name, b.p_name) AS lev_dist,
                   GREATEST(length(a.p_name), length(b.p_name)) AS max_len
            FROM names a JOIN names b
              ON a.blk = b.blk AND a.p_name <> b.p_name
        ),
        scored AS (
            SELECT name_a, n_parts, name_b, lev_dist,
                   ROUND(1.0 - lev_dist * 1.0 / max_len, 4) AS sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY name_a
                       ORDER BY ROUND(1.0 - lev_dist * 1.0 / max_len, 4)
                                DESC,
                                name_b ASC
                   ) AS rn
            FROM cand
        )
        SELECT name_a AS p_name, n_parts, name_b AS match_name,
               CAST(lev_dist AS INTEGER) AS lev_dist, sim
        FROM scored
        WHERE rn = 1
        ORDER BY p_name
    """,
}


#: Proxy-match threshold: candidate pairs whose normalized name
#: similarity reaches this are treated as matches when estimating the
#: m-probabilities (standard blocked-F-S bootstrap in lieu of EM).
FS_MATCH_SIM = 0.9

#: Report size of the scored-pair table.
FS_TOP_N = 50


def _fs_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter scored record linkage over part records: each
    candidate pair gets the classic log-likelihood-ratio weight
    ``sum_f log2(m_f/u_f)`` (agree) / ``log2((1-m_f)/(1-u_f))``
    (disagree) across four fields (name-similarity ≥
    ``FS_MATCH_SIM``, brand, type, size) — probabilistic entity
    resolution (Fellegi & Sunter 1969), the principled upgrade of
    :func:`part_record_linkage`'s single-field best-match.

    Parameters are data-derived and exact: the u-probabilities are
    unconditional collision rates ``sum f_v(f_v-1) / N(N-1)`` from
    per-value frequency counts (exact BIGINTs), the m-probabilities
    are Laplace-smoothed agreement rates on the proxy-matched subset
    of candidates — so both engines compute identical doubles, and
    ``log2`` applies once per (field, branch) to those shared values.

    Scale shape: candidate generation is two equi-join blocking
    passes — (brand, size) and (type, size) — unioned and
    deduplicated; pair volume is bounded by block sizes, never N²
    (the LSH-band discipline applied to entity resolution; at 100 TB
    you add more selective composite keys, the scoring is unchanged).
    Levenshtein runs JVM-side on the blocked pairs only; the final
    top-``FS_TOP_N`` is sort+limit."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    )
    # First-name-token in BOTH composite blocking keys: brand/type/
    # size have FIXED domains, so on a growing catalog blocks keyed
    # only by them deepen linearly and pair volume grows
    # QUADRATICALLY — measured on the part-replication ladder
    # (4.26 s → 16.6 s for 4× rows, heap-OOM at 16×). Name tokens are
    # the attribute whose domain grows with a real catalog (Heaps'
    # law: new products, new words), so (attr, size, tok1) keeps
    # block depth bounded; the recall cost is only pairs whose names
    # disagree on the FIRST token yet still clear the 0.9 name-sim
    # proxy — rare by construction (one edit in a 2-word name).
    tok1 = F.split(F.col("p_name"), " ")[0]
    a = parts.select(
        F.col("p_partkey").alias("ka"),
        F.col("p_name").alias("na"),
        F.col("p_brand").alias("ba"),
        F.col("p_type").alias("ta"),
        F.col("p_size").alias("sa"),
        tok1.alias("wa"),
    )
    b = parts.select(
        F.col("p_partkey").alias("kb"),
        F.col("p_name").alias("nb"),
        F.col("p_brand").alias("bb"),
        F.col("p_type").alias("tb"),
        F.col("p_size").alias("sb"),
        tok1.alias("wb"),
    )
    pass1 = a.join(
        b,
        (F.col("ba") == F.col("bb"))
        & (F.col("sa") == F.col("sb"))
        & (F.col("wa") == F.col("wb"))
        & (F.col("ka") < F.col("kb")),
    )
    pass2 = a.join(
        b,
        (F.col("ta") == F.col("tb"))
        & (F.col("sa") == F.col("sb"))
        & (F.col("wa") == F.col("wb"))
        & (F.col("ka") < F.col("kb")),
    )
    cand = pass1.unionByName(pass2).dropDuplicates(["ka", "kb"])
    sim = F.round(
        1.0
        - F.levenshtein(F.col("na"), F.col("nb"))
        / F.greatest(F.length("na"), F.length("nb")),
        4,
    )
    # The blocked pairs feed two actions (the m-probability
    # aggregation and the final scored output) — materialize them once
    # so the joins + Levenshtein don't run twice.
    flagged = cand.select(
        "ka",
        "kb",
        sim.alias("name_sim"),
        (sim >= FS_MATCH_SIM).cast("int").alias("f_name"),
        (F.col("ba") == F.col("bb")).cast("int").alias("f_brand"),
        (F.col("ta") == F.col("tb")).cast("int").alias("f_type"),
        (F.col("sa") == F.col("sb")).cast("int").alias("f_size"),
    ).localCheckpoint()
    # u-probabilities: chance two distinct random records agree on
    # the field — exact frequency arithmetic on the full table.
    # sum f_v(f_v-1) folds Spark-side per field; ONE job returns five
    # scalar rows (never the per-value frequency table, which for
    # p_name is O(N) and would grow with the corpus).
    u_legs = [
        parts.agg(
            F.count(F.lit(1)).cast("bigint").alias("num")
        ).select(F.lit("__n__").alias("field"), "num")
    ]
    for col in ("p_name", "p_brand", "p_type", "p_size"):
        u_legs.append(
            parts.groupBy(col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .agg(
                F.sum(F.col("c") * (F.col("c") - 1))
                .cast("bigint")
                .alias("num")
            )
            .select(F.lit(col).alias("field"), "num")
        )
    leg0 = u_legs[0]
    for leg in u_legs[1:]:
        leg0 = leg0.unionByName(leg)
    nums = {r.field: r.num for r in leg0.collect()}
    n_tot = nums["__n__"]
    # name-field u: chance a random pair clears the sim threshold is
    # approximated by exact-name collisions (a lower bound; constant
    # exact arithmetic, shared with the oracle)
    denom = n_tot * (n_tot - 1)
    u = {
        "f_name": nums["p_name"] / denom,
        "f_brand": nums["p_brand"] / denom,
        "f_type": nums["p_type"] / denom,
        "f_size": nums["p_size"] / denom,
    }
    # m-probabilities: Laplace-smoothed agreement among proxy matches
    proxy = flagged.filter(F.col("f_name") == 1)
    m_row = proxy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(f).cast("bigint").alias(f)
            for f in ("f_brand", "f_type", "f_size")
        ],
    ).collect()[0]
    m = {"f_name": (m_row.n + 1) / (m_row.n + 2)}
    for f in ("f_brand", "f_type", "f_size"):
        m[f] = (getattr(m_row, f) + 1) / (m_row.n + 2)

    import math

    def w_pair(f: str) -> tuple[float, float]:
        return (
            math.log2(m[f] / u[f]),
            math.log2((1 - m[f]) / (1 - u[f])),
        )

    weight = F.lit(0.0)
    for f in ("f_name", "f_brand", "f_type", "f_size"):
        wa, wd = w_pair(f)
        weight = weight + F.when(F.col(f) == 1, F.lit(wa)).otherwise(
            F.lit(wd)
        )
    return flagged.select(
        "ka",
        "kb",
        "name_sim",
        "f_brand",
        "f_type",
        "f_size",
        F.round(weight, 4).alias("fs_weight"),
    )


def part_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``FS_TOP_N`` view of :func:`_fs_scored_pairs` (the full
    Fellegi-Sunter docstring lives there) — the human-review queue of
    the highest-weight candidate matches."""
    return (
        _fs_scored_pairs(spark, sf_dir)
        .select(
            F.col("ka").alias("partkey_a"),
            F.col("kb").alias("partkey_b"),
            "name_sim",
            "f_brand",
            "f_type",
            "f_size",
            "fs_weight",
        )
        .orderBy(F.col("fs_weight").desc(), "partkey_a", "partkey_b")
        .limit(FS_TOP_N)
    )


QUERIES["part_fs_linkage"] = part_fs_linkage

#: Shared Fellegi-Sunter CTE chain (candidates, flags, u/m
#: probabilities) — written once, consumed by both the top-N
#: report and the golden-records clustering oracle.
_FS_CTES = f"""cand AS (
        SELECT DISTINCT ka, kb, na, nb, ba, bb, ta, tb, sa, sb
        FROM (
            SELECT a.p_partkey AS ka, b.p_partkey AS kb,
                   a.p_name AS na, b.p_name AS nb,
                   a.p_brand AS ba, b.p_brand AS bb,
                   a.p_type AS ta, b.p_type AS tb,
                   a.p_size AS sa, b.p_size AS sb
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_size = b.p_size
             AND split_part(a.p_name, ' ', 1)
                 = split_part(b.p_name, ' ', 1)
             AND a.p_partkey < b.p_partkey
            UNION ALL
            SELECT a.p_partkey, b.p_partkey, a.p_name, b.p_name,
                   a.p_brand, b.p_brand, a.p_type, b.p_type,
                   a.p_size, b.p_size
            FROM part a JOIN part b
              ON a.p_type = b.p_type AND a.p_size = b.p_size
             AND split_part(a.p_name, ' ', 1)
                 = split_part(b.p_name, ' ', 1)
             AND a.p_partkey < b.p_partkey
        )
    ),
    flagged AS (
        SELECT ka, kb,
               ROUND(1.0 - levenshtein(na, nb) * 1.0
                     / GREATEST(length(na), length(nb)), 4) AS name_sim,
               CAST(ROUND(1.0 - levenshtein(na, nb) * 1.0
                    / GREATEST(length(na), length(nb)), 4)
                    >= {FS_MATCH_SIM} AS INTEGER) AS f_name,
               CAST(ba = bb AS INTEGER) AS f_brand,
               CAST(ta = tb AS INTEGER) AS f_type,
               CAST(sa = sb AS INTEGER) AS f_size
        FROM cand
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part),
    u AS (
        SELECT
            (SELECT SUM(c * (c - 1)) FROM (
                SELECT COUNT(*) AS c FROM part GROUP BY p_name))
                * 1.0 / (n * (n - 1)) AS u_name,
            (SELECT SUM(c * (c - 1)) FROM (
                SELECT COUNT(*) AS c FROM part GROUP BY p_brand))
                * 1.0 / (n * (n - 1)) AS u_brand,
            (SELECT SUM(c * (c - 1)) FROM (
                SELECT COUNT(*) AS c FROM part GROUP BY p_type))
                * 1.0 / (n * (n - 1)) AS u_type,
            (SELECT SUM(c * (c - 1)) FROM (
                SELECT COUNT(*) AS c FROM part GROUP BY p_size))
                * 1.0 / (n * (n - 1)) AS u_size
        FROM tot
    ),
    m AS (
        SELECT (COUNT(*) + 1.0) / (COUNT(*) + 2.0) AS m_name,
               (SUM(f_brand) + 1.0) / (COUNT(*) + 2.0) AS m_brand,
               (SUM(f_type) + 1.0) / (COUNT(*) + 2.0) AS m_type,
               (SUM(f_size) + 1.0) / (COUNT(*) + 2.0) AS m_size
        FROM flagged WHERE f_name = 1
    )"""

_FS_WEIGHT_EXPR = f"""ROUND(
             (CASE WHEN f_name = 1 THEN log2(m_name / u_name)
                   ELSE log2((1 - m_name) / (1 - u_name)) END)
           + (CASE WHEN f_brand = 1 THEN log2(m_brand / u_brand)
                   ELSE log2((1 - m_brand) / (1 - u_brand)) END)
           + (CASE WHEN f_type = 1 THEN log2(m_type / u_type)
                   ELSE log2((1 - m_type) / (1 - u_type)) END)
           + (CASE WHEN f_size = 1 THEN log2(m_size / u_size)
                   ELSE log2((1 - m_size) / (1 - u_size)) END), 4)"""

ORACLE_SQL["part_fs_linkage"] = f"""
    WITH {_FS_CTES}
    SELECT ka AS partkey_a, kb AS partkey_b, name_sim,
           f_brand, f_type, f_size,
           {_FS_WEIGHT_EXPR} AS fs_weight
    FROM flagged CROSS JOIN u CROSS JOIN m
    ORDER BY fs_weight DESC, partkey_a, partkey_b
    LIMIT {FS_TOP_N}
"""


#: Sorted-neighborhood sliding-window size: each record pairs with
#: the next SN_WINDOW-1 records in block-local sort order.
SN_WINDOW = 4

#: Candidate floor — emit only pairs at least this name-similar.
SN_MIN_SIM = 0.5


def part_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo
    1995) — the THIRD blocking strategy next to equi-key blocking
    (:func:`part_record_linkage`) and multi-pass composite blocking
    (:func:`part_fs_linkage`): sort records on a fuzzy key and pair
    each with its next ``SN_WINDOW - 1`` sort neighbors, catching
    near-misses that share a prefix but no exact blocking key.

    Scale shape: the textbook formulation sorts the WHOLE dataset
    and slides one global window — a single-task sort at scale. This
    is the multi-pass practical variant: sort only WITHIN coarse
    blocks (first name token), so each window partition is one
    bounded block and the pair count is ≤ (W-1)·N. Pairing is
    ``lead()`` inside the block window — no join anywhere;
    Levenshtein runs codegen-JVM-side on the emitted neighbors
    only. Distinct names (the vocabulary projection, guard
    #1 of the module docstring) keep the window partitions bounded
    by vocabulary, not row count."""
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = parts.groupBy("p_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.min("p_partkey").cast("bigint").alias("anchor_key"),
    )
    block = F.substring_index(F.col("p_name"), " ", 1)
    w = Window.partitionBy("block").orderBy("p_name", "anchor_key")
    staged = names.select(
        block.alias("block"), "p_name", "n_parts", "anchor_key"
    )
    pairs = None
    for d in range(1, SN_WINDOW):
        leg = staged.select(
            "block",
            F.col("p_name").alias("name_a"),
            F.col("n_parts").alias("n_parts_a"),
            F.lead("p_name", d).over(w).alias("name_b"),
            F.lead("n_parts", d).over(w).alias("n_parts_b"),
            F.lit(d).cast("int").alias("window_dist"),
        ).filter(F.col("name_b").isNotNull())
        pairs = leg if pairs is None else pairs.unionByName(leg)
    sim = F.round(
        1.0
        - F.levenshtein(F.col("name_a"), F.col("name_b"))
        / F.greatest(F.length("name_a"), F.length("name_b")),
        4,
    )
    return (
        pairs.withColumn("name_sim", sim)
        .filter(F.col("name_sim") >= SN_MIN_SIM)
        .select(
            "block",
            "name_a",
            "name_b",
            "window_dist",
            "name_sim",
            "n_parts_a",
            "n_parts_b",
        )
        .orderBy("block", "name_a", "name_b", "window_dist")
    )


QUERIES["part_sorted_neighborhood"] = part_sorted_neighborhood

_SN_OVER = "(PARTITION BY block ORDER BY p_name, anchor_key)"

_SN_LEGS = "\n            UNION ALL\n".join(
    f"""            SELECT block, p_name AS name_a,
                   n_parts AS n_parts_a,
                   LEAD(p_name, {d}) OVER {_SN_OVER} AS name_b,
                   LEAD(n_parts, {d}) OVER {_SN_OVER} AS n_parts_b,
                   CAST({d} AS INTEGER) AS window_dist
            FROM staged"""
    for d in range(1, SN_WINDOW)
)

ORACLE_SQL["part_sorted_neighborhood"] = f"""
    WITH names AS (
        SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(MIN(p_partkey) AS BIGINT) AS anchor_key
        FROM part GROUP BY p_name
    ),
    staged AS (
        SELECT split_part(p_name, ' ', 1) AS block, p_name,
               n_parts, anchor_key
        FROM names
    ),
    legs AS (
{_SN_LEGS}
    )
    SELECT block, name_a, name_b, window_dist,
           ROUND(1.0 - levenshtein(name_a, name_b) * 1.0
                 / GREATEST(length(name_a), length(name_b)), 4)
               AS name_sim,
           n_parts_a, n_parts_b
    FROM legs
    WHERE name_b IS NOT NULL
      AND ROUND(1.0 - levenshtein(name_a, name_b) * 1.0
                / GREATEST(length(name_a), length(name_b)), 4)
          >= {SN_MIN_SIM}
    ORDER BY block, name_a, name_b, window_dist
"""


# ---------------------------------------------------------------------------
# Golden records: entity resolution end-to-end
# ---------------------------------------------------------------------------

#: Pairs at or above this Fellegi-Sunter weight are accepted as
#: matches and merged (picked from the weight histogram: the score
#: distribution is strongly bimodal — agreement on name + two fields
#: lands ≥ ~11, chance co-occurrence ≤ ~3).
FS_GOLD_MIN = 10.0


def part_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: Fellegi-Sunter scored pairs
    (:func:`_fs_scored_pairs`) → accept matches ≥ ``FS_GOLD_MIN`` →
    connected components over the match graph → one GOLDEN RECORD per
    multi-member cluster with survivorship rules (representative =
    minimum key member's name; ranges/uniques aggregated across
    members). This is the master-data-management pipeline in one
    operator: dedup candidates, probabilistic match, transitive
    merge, survivor pick.

    Scale shape: match pairs are block-bounded (never N²), the CC
    fixpoint is pointer-jumped min-label propagation (O(log diameter)
    rounds, each an equi-join — the same engine as the near-dup
    clusters), and survivorship is one hash aggregate per cluster
    plus one equi-join back to ``part`` for the representative's
    attributes. Nothing in the plan holds more than a cluster's
    members in one task."""
    from tableau_dashboard_performance_etl_automation_spark.operators.clustering import (
        connected_components,
    )

    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    def _build() -> DataFrame:
        edges = (
            _fs_scored_pairs(spark, sf_dir)
            .filter(F.col("fs_weight") >= FS_GOLD_MIN)
            .select(F.col("ka").alias("doc_a"), F.col("kb").alias("doc_b"))
        )
        return connected_components(edges).select(
            F.col("doc_id").alias("partkey"),
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
        )

    # the match-label table is a per-corpus artifact (same discipline
    # as the LSH cluster labels): the FS scoring + CC fixpoint runs
    # once per corpus EVER, every later call reads the stored
    # assignment — measured 6.1 s -> sub-second recurring at sf0.1.
    # The tag folds in an ALGORITHM hash (source of the scoring/
    # blocking pipeline + FS_GOLD_MIN), not just the corpus: the
    # labels bake in the blocking keys and threshold, so any change
    # to that logic must invalidate the stored clusters instead of
    # silently serving the old algorithm's output (round-6 ADVICE)
    import hashlib
    import inspect

    algo = hashlib.md5(
        (
            inspect.getsource(_fs_scored_pairs)
            + f"|FS_GOLD_MIN={FS_GOLD_MIN}"
        ).encode()
    ).hexdigest()[:10]
    base = corpus_slug(sf_dir)
    labels = persisted_table(
        spark,
        f"part_match_labels/{base}",
        f"{sf_dir}|algo={algo}",
        _build,
    )
    part = load_table(spark, sf_dir, "part")
    members = labels.join(
        part, labels["partkey"] == part["p_partkey"]
    )
    reps = part.select(
        F.col("p_partkey").alias("rep_key"),
        F.col("p_name").alias("golden_name"),
    )
    return (
        members.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
            F.countDistinct("p_brand").cast("bigint").alias("n_brands"),
            F.min("p_size").cast("int").alias("min_size"),
            F.max("p_size").cast("int").alias("max_size"),
            F.round(F.max("p_retailprice"), 2).alias("max_retailprice"),
        )
        .join(reps, F.col("cluster_id") == F.col("rep_key"))
        .select(
            "cluster_id",
            "cluster_size",
            "golden_name",
            "n_brands",
            "min_size",
            "max_size",
            "max_retailprice",
        )
        .orderBy("cluster_id")
    )


QUERIES["part_golden_records"] = part_golden_records

ORACLE_SQL["part_golden_records"] = f"""
    WITH RECURSIVE {_FS_CTES},
    scored AS (
        SELECT ka, kb, {_FS_WEIGHT_EXPR} AS fs_weight
        FROM flagged CROSS JOIN u CROSS JOIN m
    ),
    edges AS (
        SELECT ka, kb FROM scored WHERE fs_weight >= {FS_GOLD_MIN}
    ),
    sym AS (
        SELECT ka AS src, kb AS dst FROM edges
        UNION
        SELECT kb AS src, ka AS dst FROM edges
    ),
    reach(k, root) AS (
        SELECT src, src FROM sym
        UNION
        SELECT s.src, r.root
        FROM sym s JOIN reach r ON s.dst = r.k
    ),
    labels AS (
        SELECT k AS partkey, CAST(MIN(root) AS BIGINT) AS cluster_id
        FROM reach GROUP BY k
    )
    SELECT l.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           MIN(g.p_name) AS golden_name,
           CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
           CAST(MIN(p.p_size) AS INTEGER) AS min_size,
           CAST(MAX(p.p_size) AS INTEGER) AS max_size,
           ROUND(MAX(p.p_retailprice), 2) AS max_retailprice
    FROM labels l
    JOIN part p ON p.p_partkey = l.partkey
    JOIN part g ON g.p_partkey = l.cluster_id
    GROUP BY l.cluster_id
    ORDER BY l.cluster_id
"""
