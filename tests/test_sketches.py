"""Tests for operators/sketches.py — mergeable HLL distinct counting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.sketches import (
    distinct_sketch,
    merge_sketches,
    sketch_estimate,
)
from rdsa_utils_spark.sources.readers import read_parquet

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return read_parquet(spark, f"{SF}/events.parquet")


def test_merge_of_parts_equals_whole(spark, events):
    """The incremental contract: daily sketches merged = one sketch
    over the whole range, estimate-identical (HLL union is lossless
    for same-lg_k sketches)."""
    daily = distinct_sketch(
        events.withColumn("day", F.to_date("ts")),
        "user_id",
        ["event_type", "day"],
    )
    merged = sketch_estimate(merge_sketches(daily, group_cols=["event_type"]))
    direct = sketch_estimate(distinct_sketch(events, "user_id", ["event_type"]))
    m = {r.event_type: r.n_distinct for r in merged.collect()}
    d = {r.event_type: r.n_distinct for r in direct.collect()}
    assert m == d


def test_estimate_error_bound(spark, events):
    """lg_k=12 → ≈1.6% standard error; assert a generous 5% bound per
    event type against the exact distinct count."""
    est = {
        r.event_type: r.n_distinct
        for r in sketch_estimate(
            distinct_sketch(events, "user_id", ["event_type"]),
        ).collect()
    }
    exact = {
        r.event_type: r.nd
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("nd"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        rel = abs(est[k] - e) / e
        assert rel <= 0.05, f"{k}: rel err {rel:.3f} (est {est[k]}, exact {e})"


def test_global_merge_and_plan(spark, events):
    daily = distinct_sketch(
        events.withColumn("day", F.to_date("ts")), "user_id", ["day"],
    )
    total = sketch_estimate(merge_sketches(daily))
    rows = total.collect()
    assert len(rows) == 1 and rows[0].n_distinct > 0
    plan = total._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "InPandas" not in plan
