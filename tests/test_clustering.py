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
