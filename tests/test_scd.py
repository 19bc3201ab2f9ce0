"""Tests for operators/scd.py — SCD2 dimension maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.scd import (
    END_OF_TIME,
    scd2_apply,
    scd2_init,
    snapshot_as_of,
)


def _dim(spark):
    base = spark.createDataFrame(
        [(1, "bronze"), (2, "silver")], "k long, tier string",
    )
    return scd2_init(base, "2024-01-01 00:00:00")


def _chain(df):
    rows = df.orderBy("k", "valid_from").collect()
    return [
        (r.k, r.tier, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in rows
    ]


class TestScd2Apply:
    def test_new_version_closes_previous(self, spark):
        upd = spark.createDataFrame(
            [(1, "gold", "2024-06-01 00:00:00")], "k long, tier string, eff string",
        ).withColumn("eff", F.col("eff").cast("timestamp"))
        out = scd2_apply(_dim(spark), upd, ["k"], ["tier"], "eff")
        assert _chain(out) == [
            (1, "bronze", "2024-01-01 00:00:00", "2024-06-01 00:00:00", False),
            (1, "gold", "2024-06-01 00:00:00", END_OF_TIME, True),
            (2, "silver", "2024-01-01 00:00:00", END_OF_TIME, True),
        ]

    def test_noop_update_extends_previous(self, spark):
        upd = spark.createDataFrame(
            [(1, "bronze", "2024-06-01 00:00:00")], "k long, tier string, eff string",
        ).withColumn("eff", F.col("eff").cast("timestamp"))
        out = scd2_apply(_dim(spark), upd, ["k"], ["tier"], "eff")
        assert (1, "bronze", "2024-01-01 00:00:00", END_OF_TIME, True) in _chain(out)
        assert out.filter("k = 1").count() == 1

    def test_multi_update_batch_chains_in_order(self, spark):
        upd = spark.createDataFrame(
            [
                (1, "gold", "2024-06-01 00:00:00"),
                (1, "platinum", "2024-09-01 00:00:00"),
                (1, "gold", "2024-03-01 00:00:00"),
            ],
            "k long, tier string, eff string",
        ).withColumn("eff", F.col("eff").cast("timestamp"))
        out = scd2_apply(_dim(spark), upd, ["k"], ["tier"], "eff")
        k1 = [c for c in _chain(out) if c[0] == 1]
        # bronze@01-01 -> gold@03-01 (06-01 gold is a no-op) -> platinum@09-01
        assert [(c[1], c[2]) for c in k1] == [
            ("bronze", "2024-01-01 00:00:00"),
            ("gold", "2024-03-01 00:00:00"),
            ("platinum", "2024-09-01 00:00:00"),
        ]
        assert [c[4] for c in k1] == [False, False, True]
        # intervals tile: each valid_to = next valid_from
        assert k1[0][3] == k1[1][2] and k1[1][3] == k1[2][2]

    def test_batch_replay_equals_single_shot(self, spark):
        """Applying updates in two batches equals applying them at once."""
        mk = lambda rows: spark.createDataFrame(
            rows, "k long, tier string, eff string",
        ).withColumn("eff", F.col("eff").cast("timestamp"))
        u1 = mk([(1, "gold", "2024-03-01 00:00:00")])
        u2 = mk([(1, "platinum", "2024-09-01 00:00:00")])
        both = mk([
            (1, "gold", "2024-03-01 00:00:00"),
            (1, "platinum", "2024-09-01 00:00:00"),
        ])
        stepwise = scd2_apply(
            scd2_apply(_dim(spark), u1, ["k"], ["tier"], "eff"),
            u2, ["k"], ["tier"], "eff",
        )
        oneshot = scd2_apply(_dim(spark), both, ["k"], ["tier"], "eff")
        assert _chain(stepwise) == _chain(oneshot)

    def test_new_key_inserted(self, spark):
        upd = spark.createDataFrame(
            [(9, "gold", "2024-06-01 00:00:00")], "k long, tier string, eff string",
        ).withColumn("eff", F.col("eff").cast("timestamp"))
        out = scd2_apply(_dim(spark), upd, ["k"], ["tier"], "eff")
        assert (9, "gold", "2024-06-01 00:00:00", END_OF_TIME, True) in _chain(out)

    def test_validation(self, spark):
        upd = spark.createDataFrame([(1, "g")], "k long, tier string")
        with pytest.raises(ValueError, match="missing columns"):
            scd2_apply(_dim(spark), upd, ["k"], ["tier"], "eff")
        with pytest.raises(ValueError, match="keys"):
            scd2_apply(_dim(spark), upd, [], ["tier"], "tier")
        with pytest.raises(ValueError, match="attrs"):
            scd2_apply(_dim(spark), upd, ["k"], [], "tier")


def test_snapshot_as_of(spark):
    upd = spark.createDataFrame(
        [(1, "gold", "2024-06-01 00:00:00")], "k long, tier string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    dim = scd2_apply(_dim(spark), upd, ["k"], ["tier"], "eff")
    before = {r.k: r.tier for r in snapshot_as_of(dim, "2024-05-31 00:00:00").collect()}
    after = {r.k: r.tier for r in snapshot_as_of(dim, "2024-06-01 00:00:00").collect()}
    assert before == {1: "bronze", 2: "silver"}
    assert after == {1: "gold", 2: "silver"}


def test_scd2_single_window_shuffle(spark):
    """The chain rebuild is one hash-partitioned window — no joins, no
    extra exchanges beyond the key shuffle (+ union pass-through)."""
    upd = spark.createDataFrame(
        [(1, "gold", "2024-06-01 00:00:00")], "k long, tier string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    out = scd2_apply(_dim(spark), upd, ["k"], ["tier"], "eff")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "InPandas" not in plan


def test_point_in_time_join_picks_correct_version(spark):
    from rdsa_utils_spark.operators.scd import point_in_time_join

    dim = spark.createDataFrame(
        [
            (1, "v1", "2020-01-01", "2020-06-01"),
            (1, "v2", "2020-06-01", "2999-12-31"),
            (2, "w1", "2020-01-01", "2999-12-31"),
        ],
        ["k", "attr", "valid_from", "valid_to"],
    ).select(
        "k", "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [
            (1, "2020-03-01"),   # -> v1
            (1, "2020-06-01"),   # boundary: valid_from inclusive -> v2
            (1, "2021-01-01"),   # -> v2
            (2, "2020-02-02"),   # -> w1
            (3, "2020-02-02"),   # no dim row -> left join null
        ],
        ["k", "ts"],
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    out = point_in_time_join(facts, dim, ["k"], "ts")
    rows = {(r["k"], str(r["ts"])[:10]): r["attr"] for r in out.collect()}
    assert rows[(1, "2020-03-01")] == "v1"
    assert rows[(1, "2020-06-01")] == "v2"
    assert rows[(1, "2021-01-01")] == "v2"
    assert rows[(2, "2020-02-02")] == "w1"
    assert rows[(3, "2020-02-02")] is None
    assert out.count() == 5  # exactly one version per fact (or null)


def test_point_in_time_join_plan_is_equi_join(spark):
    from rdsa_utils_spark.operators.scd import point_in_time_join

    dim = spark.createDataFrame(
        [(1, "a", "2020-01-01", "2999-01-01")],
        ["k", "attr", "valid_from", "valid_to"],
    ).select("k", "attr", F.col("valid_from").cast("timestamp").alias("valid_from"),
             F.col("valid_to").cast("timestamp").alias("valid_to"))
    facts = spark.createDataFrame([(1, "2020-05-05")], ["k", "ts"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"))
    plan = point_in_time_join(facts, dim, ["k"], "ts")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
