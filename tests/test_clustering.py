"""Connected-components contracts: pointer-jumping convergence on
long chains (diameter >> max_rounds) and loud failure when genuinely
unconverged — an unconverged mapping silently drops wrong survivors
downstream.
"""

from __future__ import annotations

import pytest

from tableau_dashboard_performance_etl_automation_spark.operators.clustering import (
    connected_components,
)


def test_long_chain_converges_via_pointer_jumping(spark):
    """A 300-edge path graph has diameter 300 — min-label propagation
    alone needs ~300 rounds; with pointer jumping it must finish
    inside the default 20 (O(log diameter))."""
    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["doc_a", "doc_b"]
    )
    labels = connected_components(edges)
    rows = labels.collect()
    assert len(rows) == n + 1
    assert {r.cluster_id for r in rows} == {0}


def test_unconverged_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=1)


def test_two_components_stay_separate(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_pagerank_df_matches_driver_vector_variant(spark, sf_dir):
    """The DataFrame-resident PageRank must produce the SAME integer
    nano-unit ranks as the broadcast driver-vector implementation on
    the nation trade graph (both are exact-integer arithmetic, so
    equality is bitwise, not approximate)."""
    from tableau_dashboard_performance_etl_automation_spark.operators import clustering as cl

    edges = cl._trade_edges(spark, sf_dir)
    df_ranks = {
        r.node: r.rank_units for r in cl.pagerank_df(edges).collect()
    }
    names = {
        int(r.n_nationkey): r.n_name
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    drv = {
        r.n_name: r.rank_units
        for r in cl.nation_pagerank(spark, sf_dir).collect()
    }
    got = {names[k]: v for k, v in df_ranks.items()}
    assert got == drv


def test_pagerank_df_conserves_unit_mass_approximately(spark):
    """Integer flooring only LOSES mass: total rank stays within
    n·(iters+1) units of PR_UNIT and every rank is positive."""
    from tableau_dashboard_performance_etl_automation_spark.operators import clustering as cl

    edges = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 5), (3, 1, 1), (1, 3, 4), (4, 1, 7)],
        "src BIGINT, dst BIGINT, w BIGINT",
    )
    ranks = {r.node: r.rank_units for r in cl.pagerank_df(edges).collect()}
    assert set(ranks) == {1, 2, 3, 4}
    assert all(v > 0 for v in ranks.values())
    total = sum(ranks.values())
    slack = 4 * (cl.PR_ITERS + 1) * 10  # floor losses per node/round
    assert total <= cl.PR_UNIT
    assert total >= cl.PR_UNIT - slack - 4 * cl.PR_ITERS * 2
