"""Invariant tests for the round-5e operators. Value-level parity
with DuckDB is the mirror/driver gate's job; these pin the
mathematical invariants each operator must satisfy on ANY input."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.operators import statstests

SF = "/root/testdata/sf0.001"


def test_calibration_partitions_corpus_and_decomposes(spark):
    rows = statstests.quality_score_calibration(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # every document lands in exactly one bin
    assert sum(r.n_docs for r in rows) == n_docs
    bins = [r.bin for r in rows]
    assert bins == sorted(bins)
    assert all(0 <= b < statstests.CALIB_BINS for b in bins)
    for r in rows:
        # midpoint confidence is a constant of the bin id
        assert abs(r.conf_mid - (r.bin + 0.5) / statstests.CALIB_BINS) < 1e-9
        assert 0.0 <= r.acc <= 1.0
        # |gap| consistency and term signs
        assert abs(r.abs_gap - abs(r.conf_mid - r.acc)) < 5e-4
        assert r.ece_term >= 0 and r.rel_term >= 0 and r.res_term >= 0
        # rel term is the squared gap times the bin weight: bounded
        # by the ece term (|gap| <= 1 so gap^2 <= |gap|)
        assert r.rel_term <= r.ece_term + 1e-6
    # resolution never exceeds uncertainty (Murphy decomposition
    # bound): sum res <= ybar*(1-ybar)
    y_all = sum(r.acc * r.n_docs for r in rows)
    ybar = y_all / n_docs
    assert sum(r.res_term for r in rows) <= ybar * (1 - ybar) + 1e-6


def test_label_propagation_invariants(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import clustering
    from tableau_dashboard_performance_etl_automation_spark.operators.dedup import (
        dedup_minhash_lsh,
    )

    rows = clustering.lang_label_propagation(spark, SF).collect()
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    by_id = {}
    for r in rows:
        assert r.doc_id not in by_id, "doc labeled twice"
        by_id[r.doc_id] = r
    seeds = {d for d in docs if d % clustering.LP_SEED_MOD == 0}
    # every seed present with its true label at round 0
    for d in seeds:
        assert by_id[d].label == docs[d] and by_id[d].labeled_round == 0
    # every propagated doc must be adjacent to at least one doc
    # labeled in an earlier round (the vote that labeled it)
    edges = dedup_minhash_lsh(spark, SF).collect()
    adj = {}
    for e in edges:
        adj.setdefault(e.doc_a, set()).add(e.doc_b)
        adj.setdefault(e.doc_b, set()).add(e.doc_a)
    for d, r in by_id.items():
        if r.labeled_round == 0:
            continue
        assert 1 <= r.labeled_round <= clustering.LP_ROUNDS
        nbr_rounds = [
            by_id[n].labeled_round
            for n in adj.get(d, ())
            if n in by_id
        ]
        assert any(x < r.labeled_round for x in nbr_rounds), (
            "propagated doc has no earlier-labeled neighbor"
        )


def test_ann_ranking_quality_consistent_with_topk_lists(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import similarity

    rows = similarity.ann_lsh_ranking_quality(spark, SF).collect()
    exact = similarity.ann_cosine_topk(spark, SF).collect()
    approx = similarity.ann_lsh_topk(spark, SF).collect()
    e_by_q, a_by_q = {}, {}
    for r in exact:
        e_by_q.setdefault(r.query_id, {})[r.neighbor_id] = r.rank
    for r in approx:
        a_by_q.setdefault(r.query_id, {})[r.neighbor_id] = r.rank
    assert {r.query_id for r in rows} == set(e_by_q)
    for r in rows:
        inter = set(e_by_q[r.query_id]) & set(
            a_by_q.get(r.query_id, {})
        )
        assert r.n_hits == len(inter)
        assert abs(r.recall_at_k - len(inter) / similarity.TOP_K) < 5e-4
        assert 0.0 <= r.mrr <= 1.0 and 0.0 <= r.ndcg_h <= 1.0
        # perfect retrieval of the full exact list => ndcg == 1
        if len(inter) == similarity.TOP_K and all(
            e_by_q[r.query_id][n] == a_by_q[r.query_id][n]
            for n in inter
        ):
            assert abs(r.ndcg_h - 1.0) < 5e-4 and abs(r.mrr - 1.0) < 5e-4
        # top-1 found => mrr = 1/approx_rank of that neighbor
        top1 = next(
            n for n, rk in e_by_q[r.query_id].items() if rk == 1
        )
        want_mrr = (
            1.0 / a_by_q[r.query_id][top1]
            if top1 in a_by_q.get(r.query_id, {})
            else 0.0
        )
        assert abs(r.mrr - want_mrr) < 5e-4


def test_consistent_hash_rebalance_moves_only_to_new_shard(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import profiling

    rows = profiling.consistent_hash_rebalance(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    moved = [r for r in rows if r.shard_before != r.shard_after]
    stayed = sum(r.n_docs for r in rows if r.shard_before == r.shard_after)
    # the consistent-hashing contract: every mover lands on the NEW
    # shard, and the moved volume is ~N/(S+1), not ~N
    assert all(r.shard_after == profiling.CH_SHARDS for r in moved)
    n_moved = sum(r.n_docs for r in moved)
    assert n_moved + stayed == n_docs
    expect = n_docs / (profiling.CH_SHARDS + 1)
    assert n_moved <= 3 * expect, (n_moved, expect)
    assert all(
        0 <= row.shard_before < profiling.CH_SHARDS for row in rows
    )


def test_sorted_neighborhood_pairs_are_window_bounded(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import linkage

    rows = linkage.part_sorted_neighborhood(spark, SF).collect()
    names = (
        spark.read.parquet(f"{SF}/part.parquet")
        .select("p_name")
        .distinct()
        .collect()
    )
    # rebuild the block-local sort order in python and check each
    # pair is within the sliding window at the claimed distance
    import collections

    blocks = collections.defaultdict(list)
    for r in names:
        blocks[r.p_name.split(" ")[0]].append(r.p_name)
    order = {
        blk: {n: i for i, n in enumerate(sorted(ns))}
        for blk, ns in blocks.items()
    }
    assert rows, "expected candidate pairs at this SF"
    for r in rows:
        pos = order[r.block]
        assert pos[r.name_b] - pos[r.name_a] == r.window_dist
        assert 1 <= r.window_dist < linkage.SN_WINDOW
        assert linkage.SN_MIN_SIM <= r.name_sim <= 1.0
