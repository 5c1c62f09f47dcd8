"""Duplicate-cluster resolution: connected components over candidate
pairs — the pass that turns pairwise dedup output (minhash/simhash
pairs) into per-document cluster assignments ("keep one per
component").

This is the engine's genuinely *iterative* operator: min-label
propagation to fixpoint, implemented as a driver-side loop over
distributed joins (the standard large-graph CC shape — GraphX/
GraphFrames do the same under the hood). Each round is one equi-join
+ one aggregate; rounds needed = graph diameter (tiny for dedup
graphs, which are near-cliques). Only the single convergence *count*
crosses to the driver per round, never data. localCheckpoint truncates
the growing lineage so round N's plan doesn't replay rounds 1..N-1.

The DuckDB oracle expresses the same fixpoint as a recursive CTE —
one of the few operators here where the two engines use genuinely
different execution strategies for the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
    corpus_slug,
)
from tableau_dashboard_performance_etl_automation_spark.operators.dedup import (
    ORACLE_SQL as _DEDUP_ORACLE_SQL,
    lsh_pair_table,
)
from tableau_dashboard_performance_etl_automation_spark.memo import register as _register_memo

MAX_ROUNDS = 20


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Min-label propagation over an undirected edge list
    (columns ``doc_a``, ``doc_b``) → (doc_id, cluster_id) where
    cluster_id is the component's minimum doc id."""
    if max_rounds < 1:
        # max_rounds=0 would skip the loop and silently return the
        # identity labeling — the exact silent-wrong-answer the
        # non-convergence RuntimeError below exists to prevent
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    sym = edges.selectExpr("doc_a AS src", "doc_b AS dst").union(
        edges.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    sym = sym.distinct().localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    changed = 0
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster_id").alias("neighbor_min"))
        )
        propagated = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("neighbor_min"), F.col("cluster_id")),
            ).alias("cluster_id"),
        )
        # pointer jumping: relabel through the mapping itself
        # (cluster_id := label(cluster_id)), which shortcuts long
        # chains — rounds become O(log diameter) instead of
        # O(diameter). Every cluster_id is a doc_id in the mapping,
        # so the self-join is total; least() keeps monotonicity.
        mapping = propagated.selectExpr(
            "doc_id AS m_id", "cluster_id AS m_cluster"
        )
        updated = (
            propagated.join(
                mapping, propagated.cluster_id == mapping.m_id
            )
            .select(
                "doc_id",
                F.least(F.col("cluster_id"), F.col("m_cluster")).alias(
                    "cluster_id"
                ),
            )
            # LAZY: the changed-count action below materializes this
            # round's labels while computing the convergence test —
            # one job per round instead of checkpoint + count
            .localCheckpoint(eager=False)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    if changed != 0:
        # an unconverged mapping silently mislabels downstream dedup
        # (wrong survivors dropped) — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"rounds ({changed} labels still changing); raise "
            f"max_rounds — rounds needed is O(log diameter) with "
            f"pointer jumping"
        )
    return labels


#: Session memo of the converged LSH cluster-label table, keyed by
#: (applicationId, sf_dir) and single-entry capped — same rationale
#: as the PageRank/IVF memos: in production the cluster assignment is
#: a stored artifact every downstream consumer (survivor pick, size
#: histogram, curation) reads; re-running the iterative fixpoint per
#: query never amortizes, and min-label CC is deterministic so the
#: memo is bit-identical to a recompute.
#: Session memo — assumes sf_dir data is immutable within the
#: application (see memo.py); registered for global invalidation.
_CC_LABELS_CACHE: dict[tuple[str, str], DataFrame] = _register_memo({})


def _lsh_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converged (doc_id, cluster_id) labels, persisted as a
    warehouse parquet table (round-5, like the shingle/band tables):
    the iterative fixpoint runs once per corpus EVER — any session
    thereafter reads the stored assignment, which is also what a
    production pipeline ships downstream. Min-label CC is
    deterministic, so the loaded table equals a recompute."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        persisted_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CC_LABELS_CACHE.get(key)
    if cached is None:
        base = corpus_slug(sf_dir)
        cached = persisted_table(
            spark,
            f"cc_labels/{base}",
            sf_dir,
            lambda: connected_components(lsh_pair_table(spark, sf_dir)),
        )
        _CC_LABELS_CACHE.clear()  # single-entry cap
        _CC_LABELS_CACHE[key] = cached
    return cached


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignments for every document that appears in a
    MinHash-LSH candidate pair, plus per-cluster survivor stats."""
    labels = _lsh_cluster_labels(spark, sf_dir)
    return (
        labels.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("keep_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("cluster_id")
    )


#: PageRank dials: damping, fixed iteration count (small-diameter
#: trade graph converges in a handful), and the integer rank unit —
#: ranks live in nano-units (BIGINT) so every iteration is
#: reduction-order-independent and bit-identical across engines.
PR_DAMPING = 0.85
PR_ITERS = 5
PR_UNIT = 1_000_000_000
#: Ceiling on driver-resident rank-vector size.  The nation graph
#: has 25 nodes; above this the operator DISPATCHES to the
#: DataFrame-resident iteration (:func:`_pagerank_df_resident`)
#: instead of holding the vector in a driver dict (round-7: the
#: former loud guard is now a slow-path dispatch).
PR_MAX_DRIVER_NODES = 100_000


def _pr_max_driver_nodes() -> int:
    """Dispatch bound, env-overridable
    (``SPARK_GRAFT_PR_MAX_DRIVER_NODES``) so tests can force the
    DataFrame-resident path on a small graph and prove it
    bit-identical to the driver-dict path."""
    import os

    return int(
        os.environ.get(
            "SPARK_GRAFT_PR_MAX_DRIVER_NODES", PR_MAX_DRIVER_NODES
        )
    )


def _pagerank_df_resident(
    spark: SparkSession, ew: DataFrame, nodes: DataFrame, n: int
) -> DataFrame:
    """Weighted PageRank with the rank vector AS A DATAFRAME — the
    unbounded-node-domain path. Per round: one equi-join of the rank
    table into the (pre-aggregated, never-moving) edge table, one
    map-side-combinable integer SUM onto ``dst``, one left-anti
    aggregate for the dangling mass (a single scalar collected per
    round — O(iters) driver traffic, not O(nodes)), and a left join
    back onto the node table. ``localCheckpoint`` per round truncates
    the iteration's lineage.

    Bit-identical to the driver-dict path by construction: the
    per-edge contribution is the same
    ``FLOOR(CAST(0.85 AS DOUBLE) · r · w / out_w)`` expression, the
    dangling share is the same Python ``int(0.85 · dangling / n)``
    (dangling is an exact integer scalar either way), and the update
    is the same integer addition — so dispatch changes WHERE the
    vector lives, never the numbers. ``nodes``: one ``node BIGINT``
    column; ``ew``: (src, dst, w, out_w)."""
    base = int(PR_UNIT // n)
    teleport = int((1 - PR_DAMPING) * PR_UNIT / n)
    srcs = ew.select("src").distinct()
    contrib = F.expr(
        f"CAST(FLOOR(CAST({PR_DAMPING} AS DOUBLE)"
        " * r * w / out_w) AS BIGINT)"
    )
    ranks = nodes.select(
        "node", F.lit(base).cast("bigint").alias("r")
    ).localCheckpoint()
    for _ in range(PR_ITERS):
        contribs = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(contrib).alias("c"))
        )
        dangling = (
            ranks.join(srcs, ranks["node"] == srcs["src"], "left_anti")
            .agg(F.sum("r"))
            .collect()[0][0]
            or 0
        )
        dshare = int(PR_DAMPING * dangling / n)
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport + dshare)
                    + F.coalesce(F.col("c"), F.lit(0))
                )
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return ranks


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier-nation → customer-nation revenue edges, weights in
    exact integer revenue units (``starjoins.rev_units``)."""
    from tableau_dashboard_performance_etl_automation_spark.operators.starjoins import (
        rev_units,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").cast("bigint").alias("src"),
            F.col("c_nationkey").cast("bigint").alias("dst"),
        )
        .agg(F.sum(rev_units()).cast("bigint").alias("w"))
    )


def nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph (who supplies
    whom, edge weight = revenue), ``PR_ITERS`` fixed power
    iterations — the engine's second iterative graph operator next to
    :func:`connected_components`, the shape of any
    importance-propagation pass (site rank for crawl prioritization,
    source trust scoring for data curation).

    Scale shape: the heavy step is building the edge aggregate from
    the fact table — one shuffle on (src, dst), dims broadcast. The
    iterations then run on the AGGREGATED edge table: the rank vector
    (O(nodes), tiny) broadcasts into an edge join each round and the
    edges never move — at billions of edges the per-round cost is one
    broadcast join + one map-side-combinable SUM, no edge shuffle.

    Determinism: ranks are BIGINT nano-units; every per-edge
    contribution is ``FLOOR(damping · rank · w / out_w)`` — FLOOR of
    a double computed from exact integers, so the reduction is an
    integer SUM and both engines produce bit-identical ranks (the
    exact-integer-moments discipline; ROUND is avoided because
    engines disagree on tie semantics, FLOOR has no ties).

    The converged rank vector is memoized per (applicationId, sf_dir)
    — same rationale as the IVF codebook: a deployed rank is computed
    once and persisted, re-deriving it per query never amortizes, and
    determinism makes the cached vector bit-identical to a recompute.

    Node domains above ``PR_MAX_DRIVER_NODES`` dispatch to
    :func:`_pagerank_df_resident` (rank vector as a DataFrame joined
    to the edge table each round) instead of a driver dict — same
    arithmetic, unbounded domain (round-7: formerly a loud guard).
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PR_CACHE.get(key)
    if cached is not None:
        return _pr_output(spark, sf_dir, cached)
    edges = _trade_edges(spark, sf_dir).localCheckpoint()
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = edges.join(outw, "src").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # LIMIT bound+1 keeps the dispatch probe ONE job and caps driver
    # memory even when the domain is huge
    bound = _pr_max_driver_nodes()
    probe = nodes.limit(bound + 1).collect()
    if len(probe) > bound:
        # unbounded node domain: rank vector stays a DataFrame —
        # same numbers (see _pagerank_df_resident), different home
        ranks_df = _pagerank_df_resident(spark, ew, nodes, nodes.count())
        _PR_CACHE.clear()
        _PR_CACHE[key] = ranks_df
        return _pr_output(spark, sf_dir, ranks_df)
    node_rows = sorted(r.node for r in probe)
    n = len(node_rows)
    base = int(PR_UNIT // n)
    teleport = int((1 - PR_DAMPING) * PR_UNIT / n)
    src_set = {r.src for r in edges.select("src").distinct().collect()}
    ranks = {node: base for node in node_rows}
    for _ in range(PR_ITERS):
        rdf = spark.createDataFrame(
            [(k, v) for k, v in ranks.items()], "src BIGINT, r BIGINT"
        )
        contribs = {
            row.dst: row.c
            for row in ew.join(F.broadcast(rdf), "src")
            .groupBy("dst")
            .agg(
                # CAST AS DOUBLE: a bare 0.85 literal parses as
                # DECIMAL in both engines with *different* arithmetic;
                # forcing DOUBLE makes the expression identical IEEE
                # math everywhere
                F.sum(
                    F.expr(
                        f"CAST(FLOOR(CAST({PR_DAMPING} AS DOUBLE)"
                        " * r * w / out_w) AS BIGINT)"
                    )
                ).alias("c")
            )
            .collect()
        }
        dangling = sum(v for k, v in ranks.items() if k not in src_set)
        dshare = int(PR_DAMPING * dangling / n)
        ranks = {
            node: teleport + dshare + contribs.get(node, 0)
            for node in node_rows
        }
    _PR_CACHE.clear()  # single-entry cap, like the codebook cache
    _PR_CACHE[key] = ranks
    return _pr_output(spark, sf_dir, ranks)


#: Session memo of the converged rank vector — a plain dict on the
#: small-domain path, a localCheckpointed (node, r) DataFrame on the
#: DataFrame-resident path — single-entry capped. Assumes sf_dir data
#: is immutable within the application (see memo.py); registered for
#: global invalidation.
_PR_CACHE: dict[tuple[str, str], object] = _register_memo({})


def _pr_output(spark: SparkSession, sf_dir: str, ranks) -> DataFrame:
    """``ranks``: driver dict (small-domain path) or (node, r)
    DataFrame (DataFrame-resident path) — same downstream join."""
    nation = load_table(spark, sf_dir, "nation")
    if isinstance(ranks, dict):
        rdf = spark.createDataFrame(
            [(k, v) for k, v in ranks.items()],
            "n_nationkey BIGINT, rank_units BIGINT",
        )
    else:
        rdf = ranks.select(
            F.col("node").alias("n_nationkey"),
            F.col("r").alias("rank_units"),
        )
    return (
        rdf.join(
            F.broadcast(nation),
            rdf["n_nationkey"] == nation["n_nationkey"].cast("bigint"),
        )
        .select(
            "n_name",
            "rank_units",
            F.round(F.col("rank_units") / F.lit(float(PR_UNIT)), 6).alias(
                "rank"
            ),
        )
        .orderBy(F.col("rank_units").desc(), "n_name")
    )


def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of the near-dup clusters: how much of the
    duplicated corpus sits in pairs vs. giant template families. The
    shape drives dedup policy — a heavy tail of huge clusters means
    boilerplate/template text (drop all but one), many small clusters
    mean organic near-dups (keep per-cluster survivors); it's also
    the number that says what fraction of storage dedup will recover.

    Composition of two already-scalable stages: the MinHash-LSH pair
    join and pointer-jumping connected components; the histogram
    itself is two tiny hash aggregates over the label table (cluster
    sizes, then size frequencies) — map-side combinable, output
    bounded by the largest cluster size.
    """
    labels = _lsh_cluster_labels(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            (F.count(F.lit(1)) * F.col("cluster_size"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "dup_cluster_size_histogram": dup_cluster_size_histogram,
    "nation_pagerank": nation_pagerank,
}

# The recursive-CTE fixpoint: reach(doc, root) holds every label a doc
# can see along any path; MIN(root) per doc is the component label.
# (UNION deduplicates, so the recursion is bounded by nodes × labels.)
# The minhash pair pipeline is inlined as a derived table so the
# oracle runs against the driver's base views alone.
_PAIRS_SQL = f"({_DEDUP_ORACLE_SQL['dedup_minhash_lsh']})"

ORACLE_SQL = {
    "dup_cluster_size_histogram": f"""
        WITH RECURSIVE
        pairs AS (SELECT * FROM {_PAIRS_SQL} t),
        sym AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(doc_id, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.src, r.root
            FROM sym s JOIN reach r ON s.dst = r.doc_id
        ),
        labels AS (
            SELECT doc_id, MIN(root) AS cluster_id
            FROM reach GROUP BY doc_id
        ),
        sizes AS (
            SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM labels GROUP BY cluster_id
        )
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
        FROM sizes
        GROUP BY cluster_size
        ORDER BY cluster_size
    """,  # noqa: E501
    "dedup_clusters": f"""
        WITH RECURSIVE
        pairs AS (SELECT * FROM {_PAIRS_SQL} t),
        sym AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(doc_id, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.src, r.root
            FROM sym s JOIN reach r ON s.dst = r.doc_id
        ),
        labels AS (
            SELECT doc_id, MIN(root) AS cluster_id
            FROM reach GROUP BY doc_id
        )
        SELECT cluster_id,
               COUNT(*) AS cluster_size,
               MIN(doc_id) AS keep_id,
               MAX(doc_id) AS max_doc_id
        FROM labels
        GROUP BY cluster_id
        ORDER BY cluster_id
    """,  # noqa: E501
}


def _pagerank_oracle() -> str:
    """Unrolled ``PR_ITERS`` power iterations as chained CTEs —
    generated so the per-iteration arithmetic is written ONCE and is
    character-identical across iterations (and mirrors the Spark
    expression exactly: CAST AS DOUBLE damping, FLOOR contributions,
    BIGINT sums)."""
    from tableau_dashboard_performance_etl_automation_spark.operators.starjoins import (
        REV_UNITS_SQL,
    )

    d = f"CAST({PR_DAMPING} AS DOUBLE)"
    parts = [
        f"""
        edges AS (
            SELECT CAST(s.s_nationkey AS BIGINT) AS src,
                   CAST(c.c_nationkey AS BIGINT) AS dst,
                   CAST(SUM({REV_UNITS_SQL}) AS BIGINT) AS w
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            GROUP BY src, dst
        ),
        outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
        edgesw AS (
            SELECT e.src, e.dst, e.w, o.out_w
            FROM edges e JOIN outw o USING (src)
        ),
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges
            ) t
        ),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        rk0 AS (
            SELECT node, {PR_UNIT} // nn.n AS r FROM nodes CROSS JOIN nn
        )"""
    ]
    prev = "rk0"
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"""
        c{i} AS (
            SELECT e.dst AS node,
                   SUM(CAST(FLOOR({d} * r.r * e.w / e.out_w)
                       AS BIGINT)) AS c
            FROM edgesw e JOIN {prev} r ON r.node = e.src
            GROUP BY e.dst
        ),
        d{i} AS (
            SELECT COALESCE(SUM(r), 0) AS dm FROM {prev}
            WHERE node NOT IN (SELECT src FROM outw)
        ),
        rk{i} AS (
            SELECT n.node,
                   CAST(FLOOR((1 - {d}) * {PR_UNIT} / nn.n) AS BIGINT)
                   + CAST(FLOOR({d} * d{i}.dm / nn.n) AS BIGINT)
                   + COALESCE(c{i}.c, 0) AS r
            FROM nodes n
            CROSS JOIN nn
            CROSS JOIN d{i}
            LEFT JOIN c{i} ON c{i}.node = n.node
        )"""
        )
        prev = f"rk{i}"
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT na.n_name,
               CAST(rk.r AS BIGINT) AS rank_units,
               ROUND(rk.r / CAST({PR_UNIT} AS DOUBLE), 6) AS rank
        FROM {prev} rk
        JOIN nation na ON CAST(na.n_nationkey AS BIGINT) = rk.node
        ORDER BY rank_units DESC, na.n_name
    """
    )


ORACLE_SQL["nation_pagerank"] = _pagerank_oracle()


def neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation in the MinHash near-dup
    graph — the clustering-coefficient ingredient that separates
    tight duplicate cliques (template farms: every pair near-dup)
    from chains (A~B~C drift where A and C differ): a doc in many
    triangles sits in a dense clique and is safe to drop aggressively;
    a chain member needs the transitive-closure caution
    :func:`dedup_clusters` applies.

    Scale shape: the canonical a<b<c triangle enumeration — two
    equi-joins over the (already doc_a < doc_b ordered) edge list,
    wedge (a,b)+(b,c) closed by (a,c). Join fan-out is bounded by the
    band-bucket caps upstream (the edge list is LSH output, never
    all-pairs), and counts aggregate per node — the standard
    distributed triangle count. No windows, no driver data paths."""
    edges = lsh_pair_table(spark, sf_dir)
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    return (
        nodes.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .orderBy("doc_id")
    )


QUERIES["neardup_triangles"] = neardup_triangles

ORACLE_SQL["neardup_triangles"] = f"""
    WITH pairs AS (SELECT * FROM {_PAIRS_SQL} t),
    tri AS (
        SELECT e1.doc_a AS a, e1.doc_b AS b, e3.doc_b AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.doc_a = e1.doc_b
        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    nodes AS (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM nodes
    GROUP BY doc_id
    ORDER BY doc_id
"""


def neardup_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global shape of the near-dup graph in one row — node/edge
    counts, wedge count, triangle count, and transitivity
    (3·triangles / wedges) — the health dial that says whether the
    LSH pair stage is producing tight cliques (template corpus,
    transitivity → 1) or sprawling chains (drifting near-dups,
    transitivity → 0) before anyone pays for clustering.

    All four counts are exact-integer aggregates over the LSH edge
    list (never all-pairs): degrees from a symmetric projection,
    wedges = Σ d·(d−1)/2 (map-side combinable), triangles from the
    same bounded two-join enumeration ``neardup_triangles`` uses.
    The final ratio is one guarded division."""
    edges = lsh_pair_table(spark, sf_dir)
    sym = edges.selectExpr("doc_a AS doc_id").unionAll(
        edges.selectExpr("doc_b AS doc_id")
    )
    deg = sym.groupBy("doc_id").agg(F.count(F.lit(1)).alias("d"))
    base = F.broadcast(
        deg.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            (F.sum(F.expr("d * (d - 1)")) / 2)
            .cast("bigint")
            .alias("n_wedges"),
        )
    )
    n_edges = F.broadcast(
        edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = F.broadcast(
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        base.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    F.col("n_triangles") * 3.0 / F.col("n_wedges"), 6
                ),
            ).alias("transitivity"),
        )
    )


QUERIES["neardup_graph_stats"] = neardup_graph_stats

ORACLE_SQL["neardup_graph_stats"] = f"""
    WITH pairs AS (SELECT * FROM {_PAIRS_SQL} t),
    sym AS (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs
    ),
    deg AS (SELECT doc_id, COUNT(*) AS d FROM sym GROUP BY doc_id),
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS n_wedges
        FROM deg
    ),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pairs),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e2.doc_a = e1.doc_b
        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0
                THEN ROUND(n_triangles * 3.0 / n_wedges, 6) END
               AS transitivity
    FROM base CROSS JOIN ne CROSS JOIN tri
"""


def neardup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup graph (degree → node
    count) — the skew dial for the pair stage: a fat head means a few
    hub documents (boilerplate magnets) dominate the candidate pairs
    and deserve a stop-doc cap, a thin tail means healthy organic
    near-dups. Two bounded hash aggregates over the LSH edge list."""
    edges = lsh_pair_table(spark, sf_dir)
    sym = edges.selectExpr("doc_a AS doc_id").unionAll(
        edges.selectExpr("doc_b AS doc_id")
    )
    deg = sym.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("degree")
    )


QUERIES["neardup_degree_histogram"] = neardup_degree_histogram

ORACLE_SQL["neardup_degree_histogram"] = f"""
    WITH pairs AS (SELECT * FROM {_PAIRS_SQL} t),
    sym AS (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs
    ),
    deg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
        FROM sym GROUP BY doc_id
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    ORDER BY degree
"""


def pagerank_df(
    edges: DataFrame, iters: int = PR_ITERS, damping: float = PR_DAMPING
) -> DataFrame:
    """DataFrame-resident weighted PageRank for UNBOUNDED node
    domains — the generalization :func:`nation_pagerank`'s driver
    guard points to: ranks live in a (node, rank_units) DataFrame
    that joins the edge table each round, so neither the rank vector
    nor the edges ever concentrate on the driver.

    ``edges`` must have columns (src, dst, w) with positive integer
    weights.  Same exact-integer nano-unit arithmetic as
    :func:`nation_pagerank` — identical results where both are
    applicable (pinned by ``tests/test_clustering.py``) — but each
    round is an equi-join on ``src`` (ranks hash-partitioned by node,
    edges by src — co-located after the first round) + one map-side
    combinable SUM, and a ``localCheckpoint`` truncates lineage so
    round N never replays rounds 1..N-1.  The per-round dangling mass
    and the node count are the only driver scalars.

    At 100 TB scale: rank updates shuffle O(nodes) rows per round;
    the edge table shuffles once at build. When nodes ≪ edges (the
    usual web/trade graph regime) the broadcast variant wins; when
    the node set itself outgrows executor memory this is the only
    correct shape — same trade-off as broadcast vs sort-merge join.
    """
    sym = edges.select("src", "dst", "w").localCheckpoint()
    outw = sym.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = sym.join(outw, "src").localCheckpoint()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .union(sym.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    base = int(PR_UNIT // n)
    teleport = int((1 - damping) * PR_UNIT / n)
    srcs = sym.select(F.col("src").alias("node")).distinct()
    ranks = nodes.withColumn("r", F.lit(base).cast("bigint"))
    for _ in range(iters):
        contribs = (
            ew.join(ranks, ew.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.expr(
                        f"CAST(FLOOR(CAST({damping} AS DOUBLE)"
                        " * r * w / out_w) AS BIGINT)"
                    )
                ).alias("c")
            )
        )
        dangling = (
            ranks.join(srcs, "node", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)))
            .collect()[0][0]
        )
        dshare = int(damping * dangling / n)
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport + dshare)
                    + F.coalesce(F.col("c"), F.lit(0))
                )
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("r").alias("rank_units"))


def dedup_policy_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What dedup actually BUYS, in tokens: for the near-dup clusters
    (MinHash-LSH pairs → connected components), the training-token
    savings under the two standard policies — keep-one-per-cluster
    (drop all but the min-doc_id survivor) and keep-two (hedge
    against LSH false positives) — plus the recovered share of the
    WHOLE corpus' tokens. This is the number the "should we pay for
    dedup" decision reads; the cluster-size histogram shows shape,
    this shows budget.

    Scale shape: reuses the memoized CC label table; token counts
    join on doc_id (co-partitioned); the keep-K accounting is one
    row_number window PARTITIONED by cluster (state bounded by the
    largest cluster) and a global single-row aggregate. The corpus
    token total is a separate map-side-combinable aggregate that
    never touches the labels."""
    from tableau_dashboard_performance_etl_automation_spark.functions.text import words

    labels = _lsh_cluster_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(words()).cast("bigint").alias("toks")
    )
    corpus = F.broadcast(
        docs.agg(F.sum("toks").alias("corpus_tokens"))
    )
    w = Window.partitionBy("cluster_id").orderBy("doc_id")
    ranked = labels.join(docs, "doc_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.agg(
            F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
            F.count(F.lit(1)).cast("bigint").alias("n_clustered_docs"),
            F.sum("toks").cast("bigint").alias("clustered_tokens"),
            F.sum(F.when(F.col("rn") > 1, F.col("toks")))
            .cast("bigint")
            .alias("tokens_recovered_keep1"),
            F.coalesce(
                F.sum(F.when(F.col("rn") > 2, F.col("toks"))), F.lit(0)
            )
            .cast("bigint")
            .alias("tokens_recovered_keep2"),
        )
        .crossJoin(corpus)
        .select(
            "n_clusters",
            "n_clustered_docs",
            "clustered_tokens",
            "tokens_recovered_keep1",
            "tokens_recovered_keep2",
            F.round(
                F.col("tokens_recovered_keep1")
                * 100.0
                / F.col("corpus_tokens"),
                4,
            ).alias("corpus_pct_recovered"),
        )
    )


QUERIES["dedup_policy_token_savings"] = dedup_policy_token_savings

ORACLE_SQL["dedup_policy_token_savings"] = f"""
    WITH RECURSIVE
    pairs AS (SELECT * FROM {_PAIRS_SQL} t),
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(doc_id, root) AS (
        SELECT src, src FROM sym
        UNION
        SELECT s.src, r.root
        FROM sym s JOIN reach r ON s.dst = r.doc_id
    ),
    labels AS (
        SELECT doc_id, MIN(root) AS cluster_id
        FROM reach GROUP BY doc_id
    ),
    toks AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        FROM documents
    ),
    corpus AS (SELECT SUM(toks) AS corpus_tokens FROM toks),
    ranked AS (
        SELECT l.cluster_id, t.toks,
               ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                  ORDER BY l.doc_id) AS rn
        FROM labels l JOIN toks t USING (doc_id)
    )
    SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) AS BIGINT) AS n_clustered_docs,
           CAST(SUM(toks) AS BIGINT) AS clustered_tokens,
           CAST(SUM(CASE WHEN rn > 1 THEN toks END) AS BIGINT)
               AS tokens_recovered_keep1,
           CAST(COALESCE(SUM(CASE WHEN rn > 2 THEN toks END), 0)
                AS BIGINT) AS tokens_recovered_keep2,
           ROUND(SUM(CASE WHEN rn > 1 THEN toks END) * 100.0
                 / (SELECT corpus_tokens FROM corpus), 4)
               AS corpus_pct_recovered
    FROM ranked
"""


#: Dedup-aware sampling: base keep rate (percent) for a singleton
#: document; a duplicate family of k docs gets each member at
#: BASE/k, so every FAMILY contributes the same expected mass and
#: boilerplate-heavy sources stop dominating the training mix.
DWS_BASE_PCT = 50


def dedup_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware Poisson sample: each document's inclusion
    probability is ``DWS_BASE_PCT% / cluster_size``, where
    cluster_size is the document's MinHash-LSH duplicate-family size
    (1 for documents in no candidate pair) — the sampling-side
    alternative to hard dedup: instead of deleting all-but-one of a
    family, DOWN-WEIGHT the family so its expected contribution
    equals a singleton's (cf. repetition-discounted epoch mixing in
    large-scale LM data work). The Horvitz-Thompson weight makes
    sample-side aggregates unbiased for the corpus.

    Scale shape: reuses the persisted CC labels
    (:func:`_lsh_cluster_labels` — pointer-jumping output, built once
    per corpus); cluster sizes are one hash aggregate on the labeled
    set (the per-CLUSTER census broadcasts into the family join; the
    per-DOC family table is corpus-shaped, so its join onto the
    corpus is a plain doc_id equi-join — AQE broadcasts it only when
    it is actually small); the
    keep decision is per-row exact-integer arithmetic
    (``u · 100 · k < BASE · 2^16``), no global state, merges
    trivially — the Poisson-sampler shape (sampling.py) with a
    cluster-derived rate.

    Returns kept rows (doc_id, cluster_size, ht_weight) by doc_id.
    """
    from tableau_dashboard_performance_etl_automation_spark.operators.sampling import (
        _U_BITS,
        _hex4,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = _lsh_cluster_labels(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("k")
    )
    # sizes (one row per CLUSTER) is census-shaped and safe to
    # broadcast; fam (one row per labeled DOC) is corpus-shaped, so
    # its join onto the corpus stays a plain equi-join on doc_id —
    # AQE broadcasts it dynamically when the labeled set is small
    fam = labels.join(F.broadcast(sizes), "cluster_id").select(
        "doc_id", "k"
    )
    u = _hex4("dws|", F.col("doc_id"))
    return (
        docs.join(fam, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("k"), F.lit(1))
            .cast("bigint")
            .alias("cluster_size"),
            u.alias("u"),
        )
        .filter(
            F.col("u") * 100 * F.col("cluster_size")
            < DWS_BASE_PCT * (1 << _U_BITS)
        )
        .select(
            "doc_id",
            "cluster_size",
            F.round(
                F.col("cluster_size") * 100.0 / DWS_BASE_PCT, 6
            ).alias("ht_weight"),
        )
        .orderBy("doc_id")
    )


QUERIES["dedup_weighted_sample"] = dedup_weighted_sample


def _dws_oracle() -> str:
    from tableau_dashboard_performance_etl_automation_spark.operators.sampling import (
        _U_BITS,
        _hex4_sql,
    )

    u_sql = _hex4_sql("dws|", "d.doc_id")
    return f"""
        WITH RECURSIVE
        pairs AS (SELECT * FROM {_PAIRS_SQL} t),
        sym AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(doc_id, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.src, r.root
            FROM sym s JOIN reach r ON s.dst = r.doc_id
        ),
        labels AS (
            SELECT doc_id, MIN(root) AS cluster_id
            FROM reach GROUP BY doc_id
        ),
        fam AS (
            SELECT doc_id,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS k
            FROM labels
        )
        SELECT d.doc_id AS doc_id,
               CAST(COALESCE(f.k, 1) AS BIGINT) AS cluster_size,
               ROUND(COALESCE(f.k, 1) * 100.0 / {DWS_BASE_PCT}, 6)
                   AS ht_weight
        FROM documents d
        LEFT JOIN fam f ON f.doc_id = d.doc_id
        WHERE {u_sql} * 100 * COALESCE(f.k, 1)
              < {DWS_BASE_PCT} * {1 << _U_BITS}
        ORDER BY doc_id
    """


ORACLE_SQL["dedup_weighted_sample"] = _dws_oracle()


def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: every MinHash-LSH near-dup
    candidate pair, bucketed by the split assignment of its two ends
    (``sampling.dataset_split``'s md5 buckets). Rows with
    ``leaks = 1`` are near-duplicate pairs that STRADDLE a split
    boundary — the eval-set leakage a naive per-document split
    produces, and the number :func:`leakfree_split_assign` drives to
    zero.

    Scale shape: the candidate pairs come from the banded equi-join
    (never a cross join); the split column is a narrow md5 projection
    on each side, so this adds two cheap joins on ``doc_id`` and one
    bounded (≤ |splits|²-row) aggregate.
    """
    from tableau_dashboard_performance_etl_automation_spark.operators.dedup import (
        lsh_pair_table,
    )
    from tableau_dashboard_performance_etl_automation_spark.operators.sampling import (
        _split_col,
    )

    pairs = lsh_pair_table(spark, sf_dir)
    return (
        pairs.withColumn("split_a", _split_col(F.col("doc_a")))
        .withColumn("split_b", _split_col(F.col("doc_b")))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .withColumn(
            "leaks",
            (F.col("split_a") != F.col("split_b")).cast("int"),
        )
        .orderBy("split_a", "split_b")
    )


def leakfree_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster-aware split assignment: every document is
    split by the md5 bucket of its near-dup CLUSTER REPRESENTATIVE
    (the cluster's min doc_id; singletons represent themselves), so a
    whole duplicate family always lands in ONE split and near-dup
    train→test leakage is zero by construction — the split discipline
    eval-minded pipelines use (group-aware splitting).

    Scale shape: reuses the persisted CC labels
    (:func:`_lsh_cluster_labels`); the assignment is a left join on
    ``doc_id`` plus a narrow md5 projection — no new pair work.

    Returns (doc_id, rep_id, split) ordered by doc_id.
    """
    from tableau_dashboard_performance_etl_automation_spark.operators.sampling import (
        _split_col,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = _lsh_cluster_labels(spark, sf_dir)
    return (
        # labels are corpus-shaped (every doc in any pair): plain
        # equi-join on doc_id; AQE broadcasts when actually small
        docs.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id"))
            .cast("bigint")
            .alias("rep_id"),
        )
        .withColumn("split", _split_col(F.col("rep_id")))
        .orderBy("doc_id")
    )


QUERIES["split_leakage_report"] = split_leakage_report
QUERIES["leakfree_split_assign"] = leakfree_split_assign


def _leakage_oracle() -> str:
    from tableau_dashboard_performance_etl_automation_spark.operators.sampling import (
        split_case_sql,
    )

    return f"""
        WITH pairs AS (SELECT * FROM {_PAIRS_SQL} t)
        SELECT {split_case_sql('doc_a')} AS split_a,
               {split_case_sql('doc_b')} AS split_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST({split_case_sql('doc_a')}
                    != {split_case_sql('doc_b')} AS INTEGER) AS leaks
        FROM pairs
        GROUP BY split_a, split_b
        ORDER BY split_a, split_b
    """


def _leakfree_oracle() -> str:
    from tableau_dashboard_performance_etl_automation_spark.operators.sampling import (
        split_case_sql,
    )

    return f"""
        WITH RECURSIVE
        pairs AS (SELECT * FROM {_PAIRS_SQL} t),
        sym AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(doc_id, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.src, r.root
            FROM sym s JOIN reach r ON s.dst = r.doc_id
        ),
        labels AS (
            SELECT doc_id, MIN(root) AS cluster_id
            FROM reach GROUP BY doc_id
        )
        SELECT d.doc_id AS doc_id,
               CAST(COALESCE(l.cluster_id, d.doc_id) AS BIGINT)
                   AS rep_id,
               {split_case_sql('COALESCE(l.cluster_id, d.doc_id)')}
                   AS split
        FROM documents d
        LEFT JOIN labels l ON l.doc_id = d.doc_id
        ORDER BY doc_id
    """


ORACLE_SQL["split_leakage_report"] = _leakage_oracle()
ORACLE_SQL["leakfree_split_assign"] = _leakfree_oracle()


#: Markov power-iteration dials: iteration count and the integer mass
#: unit (same discipline as PageRank: BIGINT micro-units make every
#: iteration reduction-order-independent and bit-identical across
#: engines).
MARKOV_ITERS = 8
MARKOV_UNIT = 1_000_000_000
#: Bound on the driver-resident transition matrix (|types|² cells);
#: above it the operator dispatches to the DataFrame-resident power
#: iteration (:func:`_markov_df_resident`) instead of raising
#: (round-7: guard → dispatch).
MARKOV_MAX_CELLS = 100_000


def _markov_max_cells() -> int:
    """Dispatch bound, env-overridable
    (``SPARK_GRAFT_MARKOV_MAX_CELLS``) so tests can force the
    DataFrame-resident path on the real corpus and prove it
    row-identical to the driver-dict path."""
    import os

    return int(
        os.environ.get("SPARK_GRAFT_MARKOV_MAX_CELLS", MARKOV_MAX_CELLS)
    )


def _markov_df_resident(
    spark: SparkSession, trans: DataFrame
) -> DataFrame:
    """Markov power iteration with the mass vector AS A DATAFRAME —
    the unbounded-state-space path. The closed sub-chain restriction,
    out-mass census, and per-cell ``(v·w) DIV out`` integer update
    replicate the driver-dict arithmetic exactly (integer floor
    division of non-negative BIGINTs is engine- and
    reduction-order-independent), so dispatch changes where the
    vector lives, not the numbers. Each round: two equi-joins of the
    (never-moving) cell table against the |states|-row vector and
    out tables, one hash aggregate onto ``nxt``, a left join back
    onto the state table; ``localCheckpoint`` truncates lineage.

    Overflow bound (documented, loud): ``v ≤ MARKOV_UNIT = 1e9`` so
    ``v·w`` stays in BIGINT while any single transition cell has
    ``w < 9.2e9`` observations — beyond that, pre-scale ``w`` (only
    the ratio ``w/out`` matters).

    Returns (event_type, stationary_micro, stationary) ordered by
    event_type — same schema as the driver path."""
    states = trans.select(F.col("cur").alias("t")).distinct()
    closed = trans.join(
        states.withColumnRenamed("t", "nxt"), "nxt", "left_semi"
    ).localCheckpoint()
    out = closed.groupBy("cur").agg(F.sum("w").alias("out"))
    n_states = states.count()
    v = states.select(
        "t",
        F.lit(int(MARKOV_UNIT // n_states)).cast("bigint").alias("v"),
    ).localCheckpoint()
    for _ in range(MARKOV_ITERS):
        nv = (
            closed.join(v, closed["cur"] == v["t"])
            .join(out, "cur")
            .groupBy("nxt")
            .agg(F.sum(F.expr("(v * w) DIV out")).alias("nv"))
        )
        v = (
            states.join(nv, states["t"] == nv["nxt"], "left")
            .select(
                "t",
                F.coalesce("nv", F.lit(0)).cast("bigint").alias("v"),
            )
            .localCheckpoint()
        )
    return v.select(
        F.col("t").alias("event_type"),
        F.col("v").alias("stationary_micro"),
        F.round(F.col("v") / F.lit(float(MARKOV_UNIT)), 6).alias(
            "stationary"
        ),
    ).orderBy("event_type")


def event_markov_stationary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: count
    per-user consecutive (current → next) transitions, row-normalize
    into a transition matrix, and power-iterate a uniform start for
    ``MARKOV_ITERS`` steps — "where does a user session settle" as a
    first-class behavioral-model table (the chain analog of
    ``session_type_pmi``'s co-occurrence view).

    Scale shape: the DISTRIBUTED work is the transition census — a
    per-user lead window (each partition sorts only its own user's
    events) into a |types|² hash aggregate. At bounded type domains
    (≤ ``MARKOV_MAX_CELLS`` cells) the power iteration runs
    driver-side on exact integers, like the 25-node PageRank vector;
    larger state spaces DISPATCH to :func:`_markov_df_resident`
    (mass vector as a DataFrame — same integer arithmetic, unbounded
    domain; round-7: formerly a loud guard). Mass updates are
    ``floor(v·w/out)`` BIGINT ops — deterministic in both engines.
    Types that never appear as a transition SOURCE are excluded from
    the state space (they would silently absorb mass).

    Returns (event_type, stationary_micro, stationary) ordered by
    event_type.
    """
    trans = _markov_trans(spark, sf_dir)
    # LIMIT bound+1 keeps the dispatch probe ONE job and caps driver
    # memory: if the limit fills past the bound, the domain is large —
    # dispatch to the DataFrame-resident path without ever collecting
    # the full matrix
    max_cells = _markov_max_cells()
    rows = trans.limit(max_cells + 1).collect()
    if len(rows) > max_cells:
        # unbounded state space: the matrix and mass vector stay
        # DataFrames — same numbers (see _markov_df_resident)
        return _markov_df_resident(spark, trans)
    srcs, v = _markov_stationary_from_rows(rows)
    out_rows = [
        (t, v[t], round(v[t] / MARKOV_UNIT, 6)) for t in srcs
    ]
    return spark.createDataFrame(
        out_rows,
        "event_type STRING, stationary_micro BIGINT, stationary DOUBLE",
    ).orderBy("event_type")


def _markov_trans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-user consecutive (cur → nxt) transition census — the
    ONE distributed pass both the stationary solver and
    ``statstests.markov_entropy_rate`` run from (shared so composers
    collect it once instead of re-running the lead window)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("cur"),
        )
        .withColumn("nxt", F.lead("cur").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )


def _markov_stationary_from_rows(rows) -> tuple[list, dict]:
    """Driver-side exact-integer power iteration over collected census
    rows (the bounded-domain path): restrict to the closed sub-chain
    over source types, iterate ``floor(v·w/out)`` updates. Returns
    (sorted source types, stationary micro-mass per type)."""
    srcs = sorted({r.cur for r in rows})
    sset = set(srcs)
    mat: dict = {}
    out: dict = {}
    for r in rows:
        if r.cur in sset and r.nxt in sset:
            mat[(r.cur, r.nxt)] = mat.get((r.cur, r.nxt), 0) + r.w
            out[r.cur] = out.get(r.cur, 0) + r.w
    v = {t: MARKOV_UNIT // len(srcs) for t in srcs}
    for _ in range(MARKOV_ITERS):
        nv = {t: 0 for t in srcs}
        for (cur, nxt), wt in sorted(mat.items()):
            nv[nxt] += (v[cur] * wt) // out[cur]
        v = nv
    return srcs, v


QUERIES["event_markov_stationary"] = event_markov_stationary


def _markov_oracle() -> str:
    parts = [
        """
        trans AS (
            SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS w
            FROM (
                SELECT event_type AS cur,
                       LEAD(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id
                       ) AS nxt
                FROM events
            )
            WHERE nxt IS NOT NULL
            GROUP BY cur, nxt
        ),
        srcs AS (SELECT DISTINCT cur AS t FROM trans),
        mat AS (
            SELECT t.cur, t.nxt, t.w FROM trans t
            JOIN srcs a ON a.t = t.cur
            JOIN srcs b ON b.t = t.nxt
        ),
        outw AS (SELECT cur, SUM(w) AS out_w FROM mat GROUP BY cur),
        nn AS (SELECT COUNT(*) AS n FROM srcs)"""
    ]
    parts.append(f"""
        v0 AS (
            SELECT t, {MARKOV_UNIT} // nn.n AS r
            FROM srcs CROSS JOIN nn
        )""")
    prev = "v0"
    for i in range(1, MARKOV_ITERS + 1):
        parts.append(f"""
        v{i} AS (
            SELECT m.nxt AS t,
                   SUM((r.r * m.w) // o.out_w) AS r
            FROM mat m
            JOIN {prev} r ON r.t = m.cur
            JOIN outw o ON o.cur = m.cur
            GROUP BY m.nxt
        )""")
        prev = f"v{i}"
    return f"""
        WITH {", ".join(parts)}
        SELECT s.t AS event_type,
               CAST(COALESCE(v.r, 0) AS BIGINT) AS stationary_micro,
               ROUND(COALESCE(v.r, 0) / {float(MARKOV_UNIT)!r}, 6)
                   AS stationary
        FROM srcs s LEFT JOIN {prev} v ON v.t = s.t
        ORDER BY event_type
    """


ORACLE_SQL["event_markov_stationary"] = _markov_oracle()


#: Trusted-seed stride for label propagation: docs with
#: ``doc_id % LP_SEED_MOD == 0`` carry a trusted label.
LP_SEED_MOD = 5

#: Synchronous propagation rounds (unrolled — each is one
#: join+aggregate stage; no driver-side iteration state).
LP_ROUNDS = 2


def lang_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the MinHash near-dup
    graph: a trusted subset of docs (``doc_id % LP_SEED_MOD == 0``)
    seeds its ``lang`` label; each round, every still-unlabeled doc
    with at least one labeled neighbor adopts the majority neighbor
    label (ties → lexicographically smallest) — how a curation
    pipeline extends expensive gold labels (human or model-audited)
    across near-duplicate content for free.

    Determinism: the vote is (count DESC, label ASC) via one
    row_number per candidate doc; once labeled, a doc never flips.
    Scale shape: edges come from the banded LSH equi-join (never
    all-pairs, shared band-index memo); each round is
    edge ⋈ labeled-frontier (hash join on doc id) → hash aggregate
    on (doc, label) → per-doc top-1 window over ≤ |labels| rows.
    ``LP_ROUNDS`` is a static unroll with a LAZY localCheckpoint per
    round: round r+1 reads the label table twice (vote join +
    settled anti-join) and the final output reads it again, so an
    un-materialized unroll re-executes each earlier round's votes
    subtree ~3× per added round — the same barrier discipline as
    :func:`connected_components`, one Spark job per round."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    edges = lsh_pair_table(spark, sf_dir)
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )
    )
    labeled = docs.filter(
        F.col("doc_id") % LP_SEED_MOD == 0
    ).select(
        "doc_id",
        F.col("lang").alias("label"),
        F.lit(0).cast("int").alias("labeled_round"),
    )
    for rnd in range(1, LP_ROUNDS + 1):
        votes = (
            sym.join(
                labeled.select(
                    F.col("doc_id").alias("src"), "label"
                ),
                "src",
            )
            .join(
                labeled.select(F.col("doc_id").alias("dst")),
                "dst",
                "left_anti",
            )
            .groupBy(F.col("dst").alias("doc_id"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        picked = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "doc_id",
                "label",
                F.lit(rnd).cast("int").alias("labeled_round"),
            )
        )
        # materialize each round's label table: round r+1 consumes
        # `labeled` TWICE (vote join + settled anti-join) and the
        # final output reads it again, so without the barrier the
        # round-r votes subtree re-executes ~3× per added round
        # (measured 1.75 → 1.28 at LP_ROUNDS=2; the lazy checkpoint
        # keeps it one Spark job per round, the connected_components
        # discipline)
        labeled = labeled.unionByName(picked).localCheckpoint(
            eager=False
        )
    return labeled.orderBy("doc_id")


QUERIES["lang_label_propagation"] = lang_label_propagation


def _lp_round_sql(prev: str, rnd: int) -> str:
    return f"""
        SELECT doc_id, label,
               CAST({rnd} AS INTEGER) AS labeled_round
        FROM (
            SELECT s.dst AS doc_id, l.label, COUNT(*) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.dst
                       ORDER BY COUNT(*) DESC, l.label ASC
                   ) AS rn
            FROM sym s
            JOIN {prev} l ON s.src = l.doc_id
            LEFT JOIN {prev} already ON s.dst = already.doc_id
            WHERE already.doc_id IS NULL
            GROUP BY s.dst, l.label
        ) WHERE rn = 1
    """


ORACLE_SQL["lang_label_propagation"] = f"""
    WITH pairs AS (SELECT * FROM {_PAIRS_SQL} t),
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    seeds AS (
        SELECT doc_id, lang AS label,
               CAST(0 AS INTEGER) AS labeled_round
        FROM documents WHERE doc_id % {LP_SEED_MOD} = 0
    ),
    p1 AS ({_lp_round_sql("seeds", 1)}),
    l1 AS (
        SELECT * FROM seeds UNION ALL SELECT * FROM p1
    ),
    p2 AS ({_lp_round_sql("l1", 2)})
    SELECT * FROM l1 UNION ALL SELECT * FROM p2
    ORDER BY doc_id
"""


#: k-core order (minimum within-core degree) and the fixed peel-round
#: budget both engines unroll. 2-core drops every tree/chain appendage
#: of the near-dup graph; 8 rounds reaches fixpoint on dedup graphs
#: (near-cliques peel in 1-2 rounds; the pytest invariant asserts the
#: last two rounds agree, so a non-converged corpus fails loudly
#: rather than reporting a non-core).
KCORE_K = 2
KCORE_ROUNDS = 8


#: Collected-edge-list bound for the k-core driver path: 1M edges
#: arrives as two Arrow int64 columns (~16 MB on the wire) and lands
#: as a Python list of 2-tuples of ints — ~100-150 MB of driver heap
#: at the bound (tuples, not Row objects; measured order-of-magnitude,
#: not the old "~16 MB" claim) — acceptable on any real driver, far
#: over every test/bench corpus; the distributed loop covers
#: everything bigger.
KCORE_MAX_DRIVER_EDGES = 1_000_000


def _kcore_max_driver_edges() -> int:
    """Dispatch bound, env-overridable
    (``SPARK_GRAFT_KCORE_MAX_DRIVER_EDGES``) so tests can force the
    distributed path on a small graph and prove it bit-identical to
    the driver path (the ``_pr_max_driver_nodes`` discipline)."""
    import os

    return int(
        os.environ.get(
            "SPARK_GRAFT_KCORE_MAX_DRIVER_EDGES",
            KCORE_MAX_DRIVER_EDGES,
        )
    )


def neardup_kcore_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-core peel of the MinHash near-dup graph: round r
    drops every node whose degree in round r-1's edge set is below
    ``KCORE_K``, then keeps only edges with both ends surviving; the
    output is the peel TRAJECTORY — (round, n_nodes, n_edges) for
    ``KCORE_ROUNDS`` rounds — whose tail rows are the 2-core size.
    Curation meaning: isolated duplicate PAIRS (degree-1 both sides)
    and chain appendages peel away; what survives is the dense
    template-farm mass that aggressive cluster-level dropping should
    target (the same edges feed ``neardup_triangles``; the core is
    where the triangles live).

    Scale shape: each round is one degree aggregate (hash, map-side
    combinable) + two semi-joins on the node key, localCheckpoint'd
    like :func:`connected_components` so round N never replays rounds
    1..N-1; only the two per-round COUNTS cross to the driver. Rounds
    are a fixed constant, so the DuckDB oracle unrolls the identical
    peel as ``KCORE_ROUNDS`` nested CTEs — both engines compute all 8
    rounds even after fixpoint (idempotent peels), keeping the row
    sets identical by construction.

    Dispatch (round 8, the :func:`nation_pagerank` pattern): the LSH
    edge list is pair-mass, not corpus-mass — a few thousand rows at
    sf0.1, ~100k at the 256× decade — so below
    ``KCORE_MAX_DRIVER_EDGES`` the peel runs as plain Python dicts on
    the collected edge list (integer degree counts: bit-identical by
    construction) instead of paying 8 Spark job launches to count a
    driver-sized table; above the bound the distributed
    semi-join/checkpoint loop takes over unchanged."""
    edges = lsh_pair_table(spark, sf_dir).select("doc_a", "doc_b")
    n_edges = edges.count()
    if n_edges <= _kcore_max_driver_edges():
        # Arrow transfer + plain int 2-tuples, not collect()'s Row
        # objects (round-9 ADVICE: Rows cost ~10x the heap); n_edges
        # is reused as the round-0 edge count instead of len()-ing
        # the freshly built list.
        pdf = edges.toPandas()
        pairs = list(zip(pdf["doc_a"].tolist(), pdf["doc_b"].tolist()))
        assert len(pairs) == n_edges
        rows = []
        for rnd in range(1, KCORE_ROUNDS + 1):
            deg: dict = {}
            for a, b in pairs:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            surv = {v for v, d in deg.items() if d >= KCORE_K}
            pairs = [(a, b) for a, b in pairs if a in surv and b in surv]
            rows.append((rnd, len(surv), len(pairs)))
        return spark.createDataFrame(
            rows, "round INT, n_nodes BIGINT, n_edges BIGINT"
        ).orderBy("round")
    rows = []
    for rnd in range(1, KCORE_ROUNDS + 1):
        deg = (
            edges.select(F.col("doc_a").alias("v"))
            .unionAll(edges.select(F.col("doc_b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        surv = deg.filter(F.col("deg") >= KCORE_K).select("v")
        # LAZY checkpoint: the one union-aggregate action below both
        # materializes this round's edge set (truncating lineage for
        # round r+1) and returns the two counts — one Spark job per
        # round instead of three (checkpoint + count + count)
        edges = (
            edges.join(
                surv.select(F.col("v").alias("doc_a")), "doc_a", "left_semi"
            )
            .join(
                surv.select(F.col("v").alias("doc_b")), "doc_b", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
        stats = {
            r["k"]: r["c"]
            for r in surv.agg(F.count(F.lit(1)).alias("c"))
            .withColumn("k", F.lit("n"))
            .unionAll(
                edges.agg(F.count(F.lit(1)).alias("c")).withColumn(
                    "k", F.lit("e")
                )
            )
            .collect()
        }
        rows.append((rnd, stats["n"], stats["e"]))
    return spark.createDataFrame(
        rows, "round INT, n_nodes BIGINT, n_edges BIGINT"
    ).orderBy("round")


QUERIES["neardup_kcore_rounds"] = neardup_kcore_rounds


def _kcore_oracle() -> str:
    """Unroll the identical peel as nested CTEs (the
    ``_lp_round_sql`` discipline: fixed rounds → static SQL)."""
    # every CTE is MATERIALIZED: each round references the previous
    # edge set three times (degree census twice via the UNION ALL,
    # filter once) — inlined, e8 would expand to 3^8 copies of the
    # LSH pair subquery and exhaust file handles on the parquet scan
    ctes = [
        f"pairs AS MATERIALIZED (SELECT * FROM {_PAIRS_SQL} t)",
        "e0 AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs)",
    ]
    selects = []
    for r in range(1, KCORE_ROUNDS + 1):
        prev = f"e{r - 1}"
        ctes.append(
            f"""d{r} AS MATERIALIZED (
                SELECT v, COUNT(*) AS deg FROM (
                    SELECT doc_a AS v FROM {prev}
                    UNION ALL SELECT doc_b FROM {prev}
                ) GROUP BY v
            )"""
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT v FROM d{r} WHERE deg >= {KCORE_K})"
        )
        ctes.append(
            f"""e{r} AS MATERIALIZED (
                SELECT e.doc_a, e.doc_b FROM {prev} e
                WHERE e.doc_a IN (SELECT v FROM s{r})
                  AND e.doc_b IN (SELECT v FROM s{r})
            )"""
        )
        selects.append(
            f"""SELECT {r} AS round,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM s{r}) AS n_nodes,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


ORACLE_SQL["neardup_kcore_rounds"] = _kcore_oracle()


def neardup_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link scoring over the MinHash near-dup graph:
    every document pair sharing at least one neighbor, with the
    shared-neighbor count, the neighbor-Jaccard score
    ``|N(a) ∩ N(c)| / |N(a) ∪ N(c)|``, and an ``is_edge`` flag saying
    whether the LSH bands already produced that pair. The
    ``is_edge = 0`` rows are the link PREDICTIONS — "these two are
    probably near-dups the bands happened to miss" — the recall audit
    a dedup pipeline runs on its own candidate generator (a
    high-scoring non-edge is a band-collision miss worth an exact
    verify pass); the ``is_edge = 1`` rows calibrate what score range
    real edges occupy.

    Scale shape: wedge enumeration ``(a,b)+(b,c)`` over the symmetric
    LSH edge list — the same bounded two-hop join
    :func:`neardup_triangles` pays (fan-out capped by the band-bucket
    caps upstream, never corpus²) — canonicalized ``a < c``, then one
    LEFT equi-join against the edge list sets the flag, and degree
    lookups are a broadcast of the per-node degree table (|nodes|
    rows). Jaccard is a ratio of exact integers, rounded to 6, so the
    ranking is cross-engine exact; ties order by the pair key."""
    edges = lsh_pair_table(spark, sf_dir)
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    e1 = sym.select(F.col("dst").alias("b"), F.col("src").alias("a"))
    e2 = sym.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = (
        e1.join(e2, "b")
        .filter(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    flagged = wedges.join(
        edges.select("doc_a", "doc_b", F.lit(1).alias("is_edge")),
        (wedges["a"] == edges["doc_a"]) & (wedges["c"] == edges["doc_b"]),
        "left",
    ).select(
        "a", "c", "common", F.coalesce("is_edge", F.lit(0)).alias("is_edge")
    )
    da = F.broadcast(deg.select(F.col("src").alias("a"), F.col("d").alias("da")))
    dc = F.broadcast(deg.select(F.col("src").alias("c"), F.col("d").alias("dc")))
    return (
        flagged.join(da, "a")
        .join(dc, "c")
        .select(
            F.col("a").alias("doc_a"),
            F.col("c").alias("doc_b"),
            "common",
            F.round(
                F.col("common")
                / (F.col("da") + F.col("dc") - F.col("common")),
                6,
            ).alias("neighbor_jaccard"),
            F.col("is_edge").cast("int").alias("is_edge"),
        )
        .orderBy(
            "is_edge",
            F.col("neighbor_jaccard").desc(),
            F.col("common").desc(),
            "doc_a",
            "doc_b",
        )
    )


QUERIES["neardup_link_prediction"] = neardup_link_prediction

ORACLE_SQL["neardup_link_prediction"] = f"""
    WITH pairs AS (SELECT * FROM {_PAIRS_SQL} t),
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY src),
    wedges AS (
        SELECT e1.src AS a, e2.dst AS c, CAST(COUNT(*) AS BIGINT) AS common
        FROM sym e1
        JOIN sym e2 ON e2.src = e1.dst
        WHERE e1.src < e2.dst
        GROUP BY e1.src, e2.dst
    ),
    flagged AS (
        SELECT w.a, w.c, w.common,
               CASE WHEN p.doc_a IS NULL THEN 0 ELSE 1 END AS is_edge
        FROM wedges w
        LEFT JOIN pairs p ON p.doc_a = w.a AND p.doc_b = w.c
    )
    SELECT n.a AS doc_a, n.c AS doc_b, n.common,
           ROUND(n.common * 1.0 / (da.d + dc.d - n.common), 6)
               AS neighbor_jaccard,
           CAST(n.is_edge AS INT) AS is_edge
    FROM flagged n
    JOIN deg da ON da.src = n.a
    JOIN deg dc ON dc.src = n.c
    ORDER BY is_edge, neighbor_jaccard DESC, n.common DESC, doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Multi-source BFS over the near-dup graph
# ---------------------------------------------------------------------------

#: BFS horizon — distances are reported exactly up to this many hops;
#: everything farther (or disconnected) lands in the -1 bucket.
BFS_MAX_HOPS = 4

#: Seed selector: every graph node whose doc_id is divisible by this
#: is a BFS source (deterministic multi-source seed set — the
#: "distance to nearest labeled doc" shape, e.g. hops to the nearest
#: human-audited duplicate). 7 ≈ a 14% audit sample of graph nodes.
BFS_SEED_MOD = 7


def neardup_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the MinHash near-dup graph: distance of
    every graph node to the nearest seed (doc_id % BFS_SEED_MOD == 0),
    reported as a (hop, n_docs) histogram with one ``-1`` row for
    nodes beyond ``BFS_MAX_HOPS`` or in seedless components. The
    "how far is everything from the audited set" primitive —
    propagation radius for label spreading, audit coverage, or
    contamination blast-radius questions over the duplicate graph.

    Scale shape: ``BFS_MAX_HOPS`` rounds of frontier expansion — each
    one equi-join of the (shrinking) frontier against the symmetric
    edge list plus an anti-join against the settled set, checkpointed
    per round like :func:`connected_components` so round N never
    replays 1..N-1; per-round state is (node, dist), never paths.
    The rounds are a fixed constant, so the DuckDB oracle is a
    depth-bounded recursive CTE computing the identical MIN(depth)."""
    edges = lsh_pair_table(spark, sf_dir)
    sym = (
        edges.selectExpr("doc_a AS src", "doc_b AS dst")
        .union(edges.selectExpr("doc_b AS src", "doc_a AS dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = sym.select(F.col("src").alias("doc_id")).distinct()
    settled = (
        nodes.filter(F.col("doc_id") % BFS_SEED_MOD == 0)
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    frontier = settled
    for h in range(1, BFS_MAX_HOPS + 1):
        reached = (
            sym.join(
                frontier.select(F.col("doc_id").alias("src")), "src"
            )
            .select(F.col("dst").alias("doc_id"))
            .distinct()
        )
        # LAZY checkpoints + one count per round: the count
        # materializes this round's frontier (and, via the anti-join,
        # the previous round's settled union — both reads of already-
        # checkpointed parents), replacing the isEmpty probe and the
        # two eager checkpoint jobs — one Spark job per hop
        frontier = (
            reached.join(settled.select("doc_id"), "doc_id", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint(eager=False)
        )
        settled = settled.unionByName(frontier).localCheckpoint(eager=False)
        if frontier.count() == 0:
            break
    hist = settled.groupBy("hop").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    unreachable = (
        nodes.join(settled.select("doc_id"), "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(F.lit(-1).alias("hop"), "n_docs")
        .filter(F.col("n_docs") > 0)
    )
    return (
        hist.select(F.col("hop").cast("int").alias("hop"), "n_docs")
        .unionByName(
            unreachable.select(F.col("hop").cast("int"), "n_docs")
        )
        .orderBy("hop")
    )


QUERIES["neardup_bfs_hops"] = neardup_bfs_hops

ORACLE_SQL["neardup_bfs_hops"] = f"""
    WITH RECURSIVE
    pairs AS (SELECT * FROM {_PAIRS_SQL} t),
    sym AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM sym),
    bfs(doc_id, hop) AS (
        SELECT doc_id, 0 FROM nodes WHERE doc_id % {BFS_SEED_MOD} = 0
        UNION
        SELECT s.dst, b.hop + 1
        FROM bfs b JOIN sym s ON s.src = b.doc_id
        WHERE b.hop < {BFS_MAX_HOPS}
    ),
    dist AS (
        SELECT doc_id, MIN(hop) AS hop FROM bfs GROUP BY doc_id
    ),
    hist AS (
        SELECT CAST(hop AS INTEGER) AS hop,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM dist GROUP BY hop
        UNION ALL
        SELECT -1, CAST(COUNT(*) AS BIGINT)
        FROM nodes n
        WHERE NOT EXISTS (
            SELECT 1 FROM dist d WHERE d.doc_id = n.doc_id
        )
        HAVING COUNT(*) > 0
    )
    SELECT hop, n_docs FROM hist ORDER BY hop
"""
