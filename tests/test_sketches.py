"""Tests for operators/sketches.py — mergeable HLL distinct counting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.sketches import (
    distinct_sketch,
    freq_estimate,
    freq_sketch,
    merge_freq_sketches,
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


# --- count-min frequency sketch ---


def test_cms_merge_is_lossless(spark, events):
    """Daily sketches summed = one direct sketch: counter addition is
    the CMS merge, so the sparse rows must be identical."""
    daily = freq_sketch(
        events.withColumn("day", F.to_date("ts")),
        "user_id",
        ["event_type", "day"],
    )
    merged = merge_freq_sketches(daily, group_cols=["event_type"])
    direct = freq_sketch(events, "user_id", ["event_type"])
    assert merged.exceptAll(direct).isEmpty()
    assert direct.exceptAll(merged).isEmpty()


def test_cms_estimate_bounds(spark, events):
    """CMS never underestimates; overshoot is bounded by the collision
    budget. With width=8192 and N = |events| the additive error bound
    2N/w holds per probe with prob 1 − 2^-5; assert it for every user
    (generous: the sf0.01 events table has ~60k rows → 2N/w ≈ 15)."""
    sketch = freq_sketch(events, "user_id")
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_freq"))
    est = freq_estimate(sketch, exact, "user_id")
    n = events.count()
    bad = est.filter(
        (F.col("est_freq") < F.col("true_freq"))
        | (F.col("est_freq") > F.col("true_freq") + F.lit(2.0 * n / 8192)),
    )
    assert bad.isEmpty(), bad.limit(5).collect()


def test_cms_absent_value_estimates_near_zero(spark, events):
    """A value never inserted can only collide — its estimate is at
    most the additive error, and usually 0."""
    sketch = freq_sketch(events, "user_id")
    probes = spark.range(1).select(F.lit(-999999).alias("user_id"))
    [row] = freq_estimate(sketch, probes, "user_id").collect()
    assert 0 <= row.est_freq <= 2.0 * events.count() / 8192


def test_cms_plan_is_jvm_only(spark, events):
    sketch = freq_sketch(events, "user_id", ["event_type"])
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "InPandas" not in plan
    # Map-side partial aggregation must collapse the ×depth explode
    # before the shuffle: two HashAggregates around the exchange.
    assert plan.count("HashAggregate") >= 2


def test_histogram_quantiles_error_bounded_and_mergeable(spark):
    import numpy as np

    from rdsa_utils_spark.operators.aggregations import merge_partial_aggregates
    from rdsa_utils_spark.operators.sketches import histogram_quantiles
    from rdsa_utils_spark.plans.diagnostics import numeric_histogram

    vals = [float(v) for v in np.random.RandomState(7).uniform(0, 100, 2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    hist = numeric_histogram(df, "v", bins=50, value_range=(0.0, 100.0))
    est = {r.p: r.quantile for r in
           histogram_quantiles(hist, [0.0, 0.5, 0.9, 0.99, 1.0]).collect()}
    bin_w = 2.0
    for p in (0.5, 0.9, 0.99):
        exact = float(np.percentile(np.array(vals), p * 100))
        assert abs(est[p] - exact) <= bin_w + 1e-9, (p, est[p], exact)
    assert est[0.0] >= 0.0 and est[1.0] <= 100.0
    # Merge law: per-half sketches summed == whole-data sketch.
    df1 = df.filter("v < 50"); df2 = df.filter("v >= 50")
    ha = numeric_histogram(df1, "v", bins=50, value_range=(0.0, 100.0))
    hb = numeric_histogram(df2, "v", bins=50, value_range=(0.0, 100.0))
    merged = merge_partial_aggregates(
        [ha, hb], ["bin", "bin_lo", "bin_hi"], sum_cols=["n_rows"],
    )
    key = lambda d: sorted((r.bin, r.n_rows) for r in d.collect())
    assert key(merged) == key(hist)
    est_m = {r.p: r.quantile for r in
             histogram_quantiles(merged, [0.5, 0.9]).collect()}
    assert est_m[0.5] == est[0.5] and est_m[0.9] == est[0.9]
    import pytest

    with pytest.raises(ValueError):
        histogram_quantiles(hist, [])
    with pytest.raises(ValueError):
        histogram_quantiles(hist, [1.5])


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# --------------------------------------------------------------------------


def test_kmv_unsaturated_is_exact(spark):
    """While |distinct| < k the sketch holds EVERY distinct hash, so
    the estimate is the exact distinct count."""
    from rdsa_utils_spark.operators.sketches import kmv_estimate, kmv_sketch

    df = spark.createDataFrame(
        [(i % 37,) for i in range(500)], ["v"],
    )
    out = kmv_estimate(kmv_sketch(df, "v", k=64), k=64).collect()
    assert len(out) == 1
    assert out[0].n_distinct_est == 37.0
    assert len(out[0].kmv) == 37
    assert out[0].kmv == sorted(out[0].kmv)


def test_kmv_merge_equals_union_sketch(spark, events):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — the KMV merge
    law, bit-exact (same k smallest hashes either way)."""
    from rdsa_utils_spark.operators.sketches import kmv_merge, kmv_sketch

    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    parts = kmv_sketch(a, "user_id", k=128).unionByName(
        kmv_sketch(b, "user_id", k=128),
    )
    merged = kmv_merge(parts, k=128).collect()[0].kmv
    whole = kmv_sketch(events, "user_id", k=128).collect()[0].kmv
    assert merged == whole


def test_kmv_estimate_error_bound(spark):
    """Saturated estimate lands within ~4 standard errors of the
    exact distinct count (se ≈ 1/sqrt(k−2))."""
    from rdsa_utils_spark.operators.sketches import kmv_estimate, kmv_sketch

    exact = 20_000
    df = spark.range(exact).select(
        F.concat(F.lit("user-"), F.col("id")).alias("v"),
    )
    k = 256
    est = kmv_estimate(kmv_sketch(df, "v", k=k), k=k).collect()[0]
    rel = abs(est.n_distinct_est - exact) / exact
    assert rel < 4.0 / (k - 2) ** 0.5, (est.n_distinct_est, exact, rel)


def test_kmv_grouped_and_validation(spark, events):
    from rdsa_utils_spark.operators.sketches import kmv_estimate, kmv_sketch

    sk = kmv_estimate(
        kmv_sketch(events, "user_id", k=64, group_cols=["event_type"]), k=64,
    )
    rows = sk.collect()
    assert len(rows) == events.select("event_type").distinct().count()
    for r in rows:
        assert len(r.kmv) <= 64 and r.n_distinct_est > 0
    import pytest as _pt

    with _pt.raises(ValueError):
        kmv_sketch(events, "user_id", k=1)


def test_kmv_jaccard_identical_and_disjoint(spark):
    from rdsa_utils_spark.operators.sketches import kmv_jaccard, kmv_sketch

    df = spark.createDataFrame([(i % 30,) for i in range(200)], ["v"])
    sk = kmv_sketch(df, "v", k=64).collect()[0].kmv
    same = spark.createDataFrame([(sk, sk)], ["a", "b"])
    r = kmv_jaccard(same, "a", "b", k=64).collect()[0]
    # Unsaturated identical sketches: everything is exact.
    assert r.jaccard_est == 1.0 and r.union_est == 30.0
    assert r.intersection_est == 30.0
    # Disjoint sets with |union| = 50 < k: still exact, Jaccard 0.
    other = kmv_sketch(
        spark.createDataFrame([(1000 + i,) for i in range(20)], ["v"]), "v", k=64,
    ).collect()[0].kmv
    disj = spark.createDataFrame([(sk, other)], ["a", "b"])
    r2 = kmv_jaccard(disj, "a", "b", k=64).collect()[0]
    assert r2.jaccard_est == 0.0 and r2.union_est == 50.0
    assert r2.intersection_est == 0.0


def test_kmv_jaccard_estimate_accuracy(spark):
    """Planted 1/3 Jaccard (two 20k sets sharing 10k elements):
    the k=256 estimate lands within a few standard errors."""
    from rdsa_utils_spark.operators.sketches import kmv_jaccard, kmv_sketch

    a = spark.range(0, 20_000).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    b = spark.range(10_000, 30_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("v"),
    )
    k = 256
    ska = kmv_sketch(a, "v", k=k).collect()[0].kmv
    skb = kmv_sketch(b, "v", k=k).collect()[0].kmv
    r = kmv_jaccard(
        spark.createDataFrame([(ska, skb)], ["a", "b"]), "a", "b", k=k,
    ).collect()[0]
    assert abs(r.jaccard_est - 1.0 / 3.0) < 0.12, r.jaccard_est
    assert abs(r.union_est - 30_000) / 30_000 < 0.25, r.union_est
    assert abs(r.intersection_est - 10_000) / 10_000 < 0.45, r.intersection_est
