"""Tests for operators/linkage.py — blocked fuzzy record linkage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.linkage import blocking_key, fuzzy_join_blocked


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "Smith"), (2, "Smyth"), (3, "Jones"), (4, "Johnson")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [(10, "Smith"), (11, "Jonez")], "id long, name string",
    )
    return left, right


def test_soundex_block_and_distance_gate(spark):
    left, right = _frames(spark)
    out = fuzzy_join_blocked(
        left, right, "id", "id", "name", "name", block="soundex", max_distance=1,
    ).collect()
    pairs = {(r.left_id, r.right_id): r for r in out}
    # Smith↔Smith exact; Smyth↔Smith 1 edit (same soundex S530);
    # Jones↔Jonez 1 edit (same soundex J520); Johnson blocks J525 — no pair.
    assert set(pairs) == {(1, 10), (2, 10), (3, 11)}
    assert pairs[(1, 10)].distance == 0 and pairs[(1, 10)].ratio == 1.0
    assert pairs[(2, 10)].distance == 1
    assert pairs[(3, 11)].ratio == pytest.approx(1 - 1 / 5)


def test_min_ratio_gate_and_callable_block(spark):
    left, right = _frames(spark)
    out = fuzzy_join_blocked(
        left, right, "id", "id", "name", "name",
        block=lambda c: F.substring(F.lower(c), 1, 2),
        min_ratio=0.8,
    ).collect()
    got = {(r.left_id, r.right_id) for r in out}
    # block 'sm': Smith/Smyth vs Smith; block 'jo': Jones/Johnson vs Jonez.
    # Johnson↔Jonez ratio = 1 - 4/7 ≈ 0.43 < 0.8 -> dropped.
    assert got == {(1, 10), (2, 10), (3, 11)}


def test_requires_a_gate_and_valid_method(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="max_distance and/or min_ratio"):
        fuzzy_join_blocked(left, right, "id", "id", "name", "name")
    with pytest.raises(ValueError, match="soundex\\|prefix\\|length"):
        blocking_key("name", method="bogus")


def test_no_cross_join_in_plan(spark):
    left, right = _frames(spark)
    out = fuzzy_join_blocked(
        left, right, "id", "id", "name", "name", block="prefix", max_distance=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # levenshtein is codegen'd, no UDF


def test_edit_distance_join_exact_k1(spark):
    from rdsa_utils_spark.operators.linkage import edit_distance_join

    df = spark.createDataFrame(
        [(1, "cat"), (2, "cta"), (3, "cut"), (4, "cart"), (5, "dog"), (6, "cat")],
        ["id", "s"],
    )
    out = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "id", "s").collect()
    )
    # cat~cut (sub), cat~cart (ins), cat==cat; cta is distance 2 from cat
    assert out == [(1, 3, 1), (1, 4, 1), (1, 6, 0), (3, 6, 1), (4, 6, 1)]


def test_edit_distance_join_matches_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from rdsa_utils_spark.operators.linkage import edit_distance_join

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    fast = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_join(sup, "s_suppkey", "s_name").collect()
    }
    a = sup.select(F.col("s_suppkey").alias("ia"), F.col("s_name").alias("na"))
    b = sup.select(F.col("s_suppkey").alias("ib"), F.col("s_name").alias("nb"))
    brute = {
        (r["ia"], r["ib"])
        for r in a.crossJoin(b)
        .filter((F.col("ia") < F.col("ib")) & (F.levenshtein("na", "nb") <= 1))
        .collect()
    }
    assert fast == brute  # deletion neighborhood is lossless at k=1
