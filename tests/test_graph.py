"""Tests for operators/graph.py — iteration-bounded PageRank."""

from __future__ import annotations

import pytest

from rdsa_utils_spark.operators.graph import pagerank


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_cycle_stays_uniform(spark):
    """On a directed cycle every node keeps exactly 1/N at every
    iteration (the uniform vector is the fixed point)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long",
    )
    got = _ranks(pagerank(edges, iterations=7))
    for v in (1, 2, 3):
        assert got[v] == pytest.approx(1 / 3, abs=1e-12)


def test_star_matches_hand_computation(spark):
    """Three leaves feeding one center, one iteration:
    center = 0.15/4 + 0.85 * 3 * (0.25) ; leaves = 0.15/4."""
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "src long, dst long",
    )
    got = _ranks(pagerank(edges, iterations=1))
    assert got[0] == pytest.approx(0.15 / 4 + 0.85 * 0.75, abs=1e-12)
    for leaf in (1, 2, 3):
        assert got[leaf] == pytest.approx(0.15 / 4, abs=1e-12)


def test_weights_split_contribution(spark):
    """One source, two targets with 3:1 weights — after one iteration
    the targets split the damped mass 3:1."""
    edges = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 1.0)], "src long, dst long, w double",
    )
    got = _ranks(pagerank(edges, weight="w", iterations=1))
    base = 0.15 / 3
    assert got[2] == pytest.approx(base + 0.85 * (1 / 3) * 0.75, abs=1e-12)
    assert got[3] == pytest.approx(base + 0.85 * (1 / 3) * 0.25, abs=1e-12)


def test_dangling_mass_drops_but_ranks_positive(spark):
    """Chain 1→2→3: node 3 is dangling; total rank < 1 (documented)
    and every node keeps at least the teleport term."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = _ranks(pagerank(edges, iterations=5))
    assert sum(got.values()) < 1.0
    for v in got.values():
        assert v >= 0.15 / 3 - 1e-12


def test_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.0)


def test_plan_is_jvm_only_and_lineage_cut(spark):
    edges = spark.createDataFrame(
        [(i % 7, (i * 3) % 7) for i in range(30) if i % 7 != (i * 3) % 7],
        "src long, dst long",
    )
    out = pagerank(edges, iterations=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "InPandas" not in plan
    # localCheckpoint each round: the final plan must NOT contain the
    # full 4-iteration join cascade (lineage is cut per iteration).
    assert plan.count("Join") <= 2


def test_connected_components_alias_matches_dedup_clusters(spark):
    from rdsa_utils_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long",
    )
    got = {r.id: r.cluster_id for r in connected_components(edges).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[20] == 20


def test_association_rules_hand_computed(spark):
    from rdsa_utils_spark.operators.graph import association_rules

    # baskets: {A,B}, {A,B}, {A}, {B,C}
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (4, "B"), (4, "C")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {(r["antecedent"], r["consequent"]): r
           for r in association_rules(df, "basket", "item", min_count=1).collect()}
    ab = out[("A", "B")]
    # n_both=2, n_A=3, n_B=3, baskets=4
    assert ab["n_both"] == 2 and ab["n_antecedent"] == 3
    assert ab["support"] == 0.5
    assert ab["confidence"] == round(2 / 3, 6)
    assert ab["lift"] == round((2 / 4) / ((3 / 4) * (3 / 4)), 6)
    ba = out[("B", "A")]
    assert ba["confidence"] == round(2 / 3, 6) and ba["lift"] == ab["lift"]
    assert ("C", "A") not in out  # never co-occur
