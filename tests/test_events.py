"""Tests for operators/events.py — funnel and cohort retention
semantics on hand-built event streams."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.events import cohort_retention, funnel_counts


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_strict_order_and_ties(spark):
    t = lambda s: datetime.fromisoformat(s)
    df = _events(spark, [
        # user 1 completes a->b->c in order
        (1, t("2024-01-01T00:00:00"), "a"),
        (1, t("2024-01-02T00:00:00"), "b"),
        (1, t("2024-01-03T00:00:00"), "c"),
        # user 2 does b BEFORE a: step 2 not reached
        (2, t("2024-01-02T00:00:00"), "b"),
        (2, t("2024-01-03T00:00:00"), "a"),
        # user 3: b at the SAME instant as a -> tie does not advance
        (3, t("2024-01-01T00:00:00"), "a"),
        (3, t("2024-01-01T00:00:00"), "b"),
        # user 4 stops after b
        (4, t("2024-01-01T00:00:00"), "a"),
        (4, t("2024-01-05T00:00:00"), "b"),
    ])
    out = {r.step: (r.step_name, r.n_users) for r in funnel_counts(df, ["a", "b", "c"]).collect()}
    assert out == {1: ("a", 4), 2: ("b", 2), 3: ("c", 1)}


def test_funnel_uses_earliest_qualifying_event(spark):
    t = lambda s: datetime.fromisoformat(s)
    # user does a, then b, then an EARLIER-than-b c after a but before b?
    # c at 01-02 is after a (01-01) but before b (01-03): must not count,
    # because step 3 requires ts > the step-2 time.
    df = _events(spark, [
        (1, t("2024-01-01T00:00:00"), "a"),
        (1, t("2024-01-02T00:00:00"), "c"),
        (1, t("2024-01-03T00:00:00"), "b"),
    ])
    out = {r.step: r.n_users for r in funnel_counts(df, ["a", "b", "c"]).collect()}
    assert out == {1: 1, 2: 1, 3: 0}
    with pytest.raises(ValueError):
        funnel_counts(df, [])


def test_cohort_retention_buckets_and_cap(spark):
    t = lambda s: datetime.fromisoformat(s)
    df = _events(spark, [
        # user 1: first on Jan 1; active day 0, day 8 (period 1), day 30 (period 4)
        (1, t("2024-01-01T05:00:00"), "x"),
        (1, t("2024-01-09T00:00:00"), "x"),
        (1, t("2024-01-31T00:00:00"), "x"),
        # user 2: same cohort day, only period 0
        (2, t("2024-01-01T23:59:59"), "x"),
        # user 3: later cohort (Jan 10), active period 0 and 1
        (3, t("2024-01-10T00:00:00"), "x"),
        (3, t("2024-01-18T12:00:00"), "x"),
    ])
    rows = cohort_retention(df, period_days=7).collect()
    got = {(str(r.cohort_date), r.period): r.n_active for r in rows}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 4): 1,
        ("2024-01-10", 0): 1,
        ("2024-01-10", 1): 1,
    }
    capped = cohort_retention(df, period_days=7, max_periods=2).collect()
    assert max(r.period for r in capped) == 1
    with pytest.raises(ValueError):
        cohort_retention(df, period_days=0)


def test_funnel_plan_has_no_cartesian(spark, sf_dir):
    from rdsa_utils_spark.plans.explain import has_cartesian_product
    from rdsa_utils_spark.sources.readers import read_parquet

    events = read_parquet(spark, f"{sf_dir}/events.parquet")
    df = funnel_counts(events, ["signup", "view", "purchase"])
    assert not has_cartesian_product(df)


class TestFillTimeGaps:
    def _series(self, spark):
        return spark.createDataFrame(
            [
                ("a", "2024-01-01 00:00:00", 5.0),
                ("a", "2024-01-01 03:00:00", 7.0),
                ("b", "2024-01-01 01:00:00", 1.0),
            ],
            "g string, h string, v double",
        ).select("g", F.col("h").cast("timestamp").alias("h"), "v")

    def test_grid_completion_and_modes(self, spark):
        from rdsa_utils_spark.operators.events import fill_time_gaps

        out = fill_time_gaps(
            self._series(spark), "h", "1 hour", ["g"], fill={"v": "zero"},
        ).orderBy("g", "h")
        rows = [(r.g, r.h.hour, r.v) for r in out.collect()]
        # group a: hours 0..3 dense (two gaps zero-filled); b: single point
        assert rows == [
            ("a", 0, 5.0), ("a", 1, 0.0), ("a", 2, 0.0), ("a", 3, 7.0),
            ("b", 1, 1.0),
        ]

    def test_forward_fill(self, spark):
        from rdsa_utils_spark.operators.events import fill_time_gaps

        out = fill_time_gaps(
            self._series(spark), "h", "1 hour", ["g"], fill={"v": "forward"},
        ).orderBy("g", "h")
        assert [r.v for r in out.filter(F.col("g") == "a").collect()] == [
            5.0, 5.0, 5.0, 7.0,
        ]

    def test_null_mode_and_unlisted_cols(self, spark):
        from rdsa_utils_spark.operators.events import fill_time_gaps

        df = self._series(spark).withColumn("w", F.col("v") * 2)
        out = fill_time_gaps(df, "h", "1 hour", ["g"], fill={"v": "null"})
        gap = out.filter(F.col("g") == "a").orderBy("h").collect()[1]
        assert gap.v is None and gap.w is None

    def test_observed_nulls_survive_fill(self, spark):
        """Fill applies to gap rows only: a NULL present in an observed
        input row is NOT zero-filled, and forward fill carries the
        observed NULL instead of skipping back to an older value."""
        from rdsa_utils_spark.operators.events import fill_time_gaps

        df = spark.createDataFrame(
            [
                ("a", "2024-01-01 00:00:00", 5.0),
                ("a", "2024-01-01 02:00:00", None),  # observed NULL
                ("a", "2024-01-01 04:00:00", 9.0),
            ],
            "g string, h string, v double",
        ).select("g", F.col("h").cast("timestamp").alias("h"), "v")

        zeroed = fill_time_gaps(df, "h", "1 hour", ["g"], fill={"v": "zero"})
        vals = {r.h.hour: r.v for r in zeroed.collect()}
        assert vals == {0: 5.0, 1: 0.0, 2: None, 3: 0.0, 4: 9.0}

        ffilled = fill_time_gaps(df, "h", "1 hour", ["g"], fill={"v": "forward"})
        fvals = {r.h.hour: r.v for r in ffilled.collect()}
        # hour 3's gap follows the observed NULL at hour 2 — it carries
        # that NULL, not hour 0's 5.0; hour 2 itself stays NULL.
        assert fvals == {0: 5.0, 1: 5.0, 2: None, 3: None, 4: 9.0}

    def test_rejects_bad_spec(self, spark):
        from rdsa_utils_spark.operators.events import fill_time_gaps

        df = self._series(spark)
        with pytest.raises(ValueError, match="zero\\|forward\\|null"):
            fill_time_gaps(df, "h", "1 hour", ["g"], fill={"v": "bogus"})
        with pytest.raises(ValueError, match="not in frame"):
            fill_time_gaps(df, "h", "1 hour", ["g"], fill={"nope": "zero"})

    def test_no_extra_exchange_for_join(self, spark):
        from rdsa_utils_spark.operators.events import fill_time_gaps

        out = fill_time_gaps(
            self._series(spark), "h", "1 hour", ["g"], fill={"v": "forward"},
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InPandas" not in plan and "BatchEvalPython" not in plan


class TestRollingZscore:
    def test_exact_values_and_self_exclusion(self, spark):
        from rdsa_utils_spark.operators.events import rolling_zscore

        # series 10, 10, 10, 40: the spike's baseline is the three 10s
        # (itself excluded) -> sd == 0 -> NULL z. With series 8, 12,
        # 10, 40 the spike scores against mean=10, sd=2 -> z=15.
        df = spark.createDataFrame(
            [("a", i, v) for i, v in enumerate([8.0, 12.0, 10.0, 40.0])],
            "g string, t long, v double",
        )
        out = {r.t: (r.zscore, r.is_anomaly) for r in rolling_zscore(
            df, "t", "v", window_rows=10, group_cols=["g"],
        ).collect()}
        assert out[0] == (None, False)          # empty window
        assert out[1] == (None, False)          # n=1 < 2
        assert out[2][0] == pytest.approx(0.0)  # (10-10)/sd(8,12)
        assert out[3][0] == pytest.approx((40 - 10) / 2.0)  # vs 8,12,10: sd=2
        assert out[3][1] is True

    def test_zero_variance_window_yields_null(self, spark):
        from rdsa_utils_spark.operators.events import rolling_zscore

        df = spark.createDataFrame(
            [("a", i, 5.0) for i in range(4)] + [("a", 4, 50.0)],
            "g string, t long, v double",
        )
        row = rolling_zscore(df, "t", "v", window_rows=4, group_cols=["g"]).filter(
            "t = 4").collect()[0]
        assert row.zscore is None and row.is_anomaly is False

    def test_window_bounds_and_validation(self, spark):
        from rdsa_utils_spark.operators.events import rolling_zscore

        df = spark.createDataFrame([("a", 0, 1.0)], "g string, t long, v double")
        with pytest.raises(ValueError, match="window_rows"):
            rolling_zscore(df, "t", "v", window_rows=1)

    def test_single_shuffle_plan(self, spark):
        from rdsa_utils_spark.operators.events import rolling_zscore

        df = spark.createDataFrame(
            [("a", i, float(i)) for i in range(50)], "g string, t long, v double",
        )
        out = rolling_zscore(df, "t", "v", window_rows=5, group_cols=["g"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1 and "Join" not in plan


class TestEwmaSmooth:
    def test_matches_pandas_adjusted_ewm(self, spark):
        """With max_lag >= series length the truncation is inactive —
        results must equal pandas ewm(adjust=True) exactly (to the
        6-decimal rounding the operator applies)."""
        import pandas as pd

        from rdsa_utils_spark.operators.events import ewma_smooth

        vals = [3.0, 7.0, 1.0, 9.0, 4.0, 6.0, 2.0, 8.0]
        df = spark.createDataFrame(
            [("a", i, v) for i, v in enumerate(vals)], "g string, t long, v double",
        )
        out = (
            ewma_smooth(df, "t", "v", alpha=0.3, group_cols=["g"], max_lag=16)
            .orderBy("t")
            .collect()
        )
        expect = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
        for row, e in zip(out, expect):
            assert row.ewma == pytest.approx(round(e, 6), abs=1e-6), row.t

    def test_truncation_error_is_bounded(self, spark):
        """Past max_lag the truncated EWMA drifts from the exact one by
        at most (1-alpha)^(max_lag+1) relative — generous 10x bound."""
        import pandas as pd

        from rdsa_utils_spark.operators.events import ewma_smooth

        vals = [float((i * 37) % 11) for i in range(60)]
        df = spark.createDataFrame(
            [("a", i, v) for i, v in enumerate(vals)], "g string, t long, v double",
        )
        out = ewma_smooth(df, "t", "v", alpha=0.3, group_cols=["g"], max_lag=12)
        got = [r.ewma for r in out.orderBy("t").collect()]
        exact = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
        bound = 10 * (1 - 0.3) ** 13 * max(vals)
        for g, e in zip(got, exact):
            assert abs(g - e) <= bound

    def test_null_values_are_skipped_not_zeroed(self, spark):
        from rdsa_utils_spark.operators.events import ewma_smooth

        df = spark.createDataFrame(
            [("a", 0, 4.0), ("a", 1, None), ("a", 2, 4.0)],
            "g string, t long, v double",
        )
        out = {r.t: r.ewma for r in ewma_smooth(
            df, "t", "v", alpha=0.5, group_cols=["g"], max_lag=4,
        ).collect()}
        # A NULL contributes neither to numerator nor denominator: at
        # t=1 the smoothed value falls back to the t=0 observation.
        assert out[0] == 4.0 and out[1] == 4.0 and out[2] == 4.0

    def test_validation_and_single_shuffle(self, spark):
        from rdsa_utils_spark.operators.events import ewma_smooth

        df = spark.createDataFrame([("a", 0, 1.0)], "g string, t long, v double")
        with pytest.raises(ValueError, match="alpha"):
            ewma_smooth(df, "t", "v", alpha=1.5)
        with pytest.raises(ValueError, match="max_lag"):
            ewma_smooth(df, "t", "v", alpha=0.5, max_lag=-1)
        big = spark.createDataFrame(
            [("a", i, float(i)) for i in range(50)], "g string, t long, v double",
        )
        out = ewma_smooth(big, "t", "v", alpha=0.3, group_cols=["g"], max_lag=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1 and "InPandas" not in plan


class TestNumericHistogram:
    def test_edges_and_clamping(self, spark):
        from rdsa_utils_spark.plans.diagnostics import numeric_histogram

        df = spark.createDataFrame(
            [(v,) for v in [-5.0, 0.0, 0.49, 0.5, 0.99, 1.0, 7.0, None]],
            "x double",
        )
        out = {r.bin: r for r in numeric_histogram(
            df, "x", bins=2, value_range=(0.0, 1.0),
        ).collect()}
        # -5 clamps into bin 0; 1.0 and 7.0 clamp into the top bin;
        # NULL drops; 0.5 is right-exclusive -> bin 1.
        assert out[0].n_rows == 3 and out[1].n_rows == 4
        assert out[0].bin_lo == 0.0 and out[0].bin_hi == 0.5
        assert out[1].bin_lo == 0.5 and out[1].bin_hi == 1.0

    def test_auto_range_and_counts(self, spark):
        from rdsa_utils_spark.plans.diagnostics import numeric_histogram

        df = spark.range(100).selectExpr("cast(id as double) x")
        out = numeric_histogram(df, "x", bins=10).collect()
        assert sum(r.n_rows for r in out) == 100
        assert out[0].bin_lo == 0.0 and out[-1].bin_hi == 99.0

    def test_grouped_histogram_plan_is_one_aggregate(self, spark):
        from rdsa_utils_spark.plans.diagnostics import numeric_histogram

        df = spark.createDataFrame(
            [("a", float(i % 7)) for i in range(100)], "g string, x double",
        )
        out = numeric_histogram(df, "x", bins=5, value_range=(0.0, 7.0),
                                group_cols=["g"])
        assert sum(r.n_rows for r in out.collect()) == 100
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InPandas" not in plan and "BatchEvalPython" not in plan


def test_debounce_events_greedy_not_lag_based(spark):
    from rdsa_utils_spark.operators.events import debounce_events
    from pyspark.sql import functions as F

    # Key 1 at t=0, 10, 20, 35 with gap 15: greedy keeps 0, 20, 35;
    # a lag-based filter would drop 20 (only 10s after the DROPPED 10).
    rows = [(1, t) for t in (0, 10, 20, 35)] + [(2, t) for t in (5,)]
    df = spark.createDataFrame(rows, "k long, sec long").withColumn(
        "ts", F.timestamp_seconds(F.col("sec")),
    )
    kept = debounce_events(df, "k", "ts", 15, tiebreak_cols=["sec"])
    got = sorted((r.k, r.sec) for r in kept.collect())
    assert got == [(1, 0), (1, 20), (1, 35), (2, 5)]
    import pytest

    with pytest.raises(ValueError):
        debounce_events(df, "k", "ts", 0)


def test_impute_nulls_strategies(spark):
    from rdsa_utils_spark.operators.filters import impute_nulls
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 9.0), ("g", None),
         ("h", None)],  # group with no observed values
        "grp string, v double",
    )
    mean = impute_nulls(df, "v", ["grp"], "mean")
    got = sorted((r.grp, r.v) for r in mean.collect())
    assert (("g", 3.5) in got)          # (1+2+2+9)/4 fills the null
    assert ("h", None) in got           # nothing observed -> stays NULL
    med = impute_nulls(df, "v", ["grp"], "median", out_col="v2")
    vals = [r.v2 for r in med.filter("grp = 'g'").collect()]
    assert 2.0 in vals and sorted(vals) == [1.0, 2.0, 2.0, 2.0, 9.0]
    mode = impute_nulls(df, "v", ["grp"], "mode", out_col="v3")
    assert sorted(r.v3 for r in mode.filter("grp = 'g'").collect()) == [1.0, 2.0, 2.0, 2.0, 9.0]
    # Global (no groups) path.
    glob = impute_nulls(df, "v", [], "mean", out_col="v4")
    filled = [r.v4 for r in glob.filter("grp = 'h'").collect()]
    assert filled == [3.5]
    import pytest

    with pytest.raises(ValueError):
        impute_nulls(df, "v", [], "bogus")


def test_cumulative_distinct_first_occurrence(spark):
    from pyspark.sql import functions as F

    from rdsa_utils_spark.operators.events import cumulative_distinct

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-03 10:00:00"),   # returning — must not recount
        (2, "2024-01-01 12:00:00"),
        (3, "2024-01-03 09:00:00"),
        (3, "2024-01-05 09:00:00"),
        (4, "2024-01-05 23:59:59"),
    ]
    df = spark.createDataFrame(rows, "user_id long, s string").withColumn(
        "ts", F.to_timestamp("s"),
    )
    out = {
        str(r.bucket_start)[:10]: (r.n_new, r.n_cumulative)
        for r in cumulative_distinct(df, "user_id", "ts").collect()
    }
    assert out == {
        "2024-01-01": (2, 2),
        "2024-01-03": (1, 3),
        "2024-01-05": (1, 4),
    }


def test_cusum_matches_naive_recursion(spark):
    from rdsa_utils_spark.operators.events import cusum_scores

    vals = [0.0, 2.0, -1.0, 5.0, -10.0, 3.0, 3.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], ["g", "i", "v"],
    )
    out = {r["i"]: r for r in cusum_scores(df, "g", "i", "v", 0.0, slack=0.5).collect()}

    s_pos = s_neg = 0.0
    for i, x in enumerate(vals):
        s_pos = max(0.0, s_pos + (x - 0.0 - 0.5))
        s_neg = max(0.0, s_neg + (-(x - 0.0) - 0.5))
        assert out[i]["cusum_pos"] == round(s_pos, 6), f"pos row {i}"
        assert out[i]["cusum_neg"] == round(s_neg, 6), f"neg row {i}"


def test_top_paths_hand_computed(spark):
    from rdsa_utils_spark.operators.events import top_paths

    rows = [
        # user 1: one session a>b, then (gap) session a
        (1, "2020-01-01 10:00:00", 1, "a"),
        (1, "2020-01-01 10:05:00", 2, "b"),
        (1, "2020-01-01 12:00:00", 3, "a"),
        # user 2: session a>b
        (2, "2020-01-01 09:00:00", 4, "a"),
        (2, "2020-01-01 09:10:00", 5, "b"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "event_type",
    )
    out = [(r["path"], r["n_sessions"]) for r in
           top_paths(df, "user_id", "ts", "event_type", 1800,
                     k=10, tiebreak_cols=["event_id"]).collect()]
    assert out == [("a>b", 2), ("a", 1)]


def test_time_weighted_avg_hand_computed(spark):
    from rdsa_utils_spark.operators.events import time_weighted_avg

    rows = [
        # key a: value 10 for 100s, then 20 for 300s, last obs excluded
        ("a", "2020-01-01 00:00:00", 10.0),
        ("a", "2020-01-01 00:01:40", 20.0),
        ("a", "2020-01-01 00:06:40", 99.0),
        ("b", "2020-01-01 00:00:00", 7.0),   # single obs -> NULL twap
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v",
    )
    out = {r["k"]: r for r in time_weighted_avg(df, "k", "ts", "v").collect()}
    want = (10 * 100 + 20 * 300) / 400
    assert out["a"]["twap"] == round(want, 6)
    assert out["a"]["span_seconds"] == 400.0 and out["a"]["n_obs"] == 3
    assert out["b"]["twap"] is None and out["b"]["n_obs"] == 1


def test_conversion_attribution_models(spark):
    from rdsa_utils_spark.operators.events import conversion_attribution

    rows = [
        (1, "2020-01-01 09:00:00", 1, "ad"),
        (1, "2020-01-01 10:00:00", 2, "email"),
        (1, "2020-01-01 11:00:00", 3, "purchase"),
        (2, "2020-01-01 09:00:00", 4, "email"),
        (2, "2020-01-01 09:30:00", 5, "purchase"),
        (3, "2020-01-01 09:00:00", 6, "purchase"),   # no touch -> (none)
        (4, "2020-01-02 09:00:00", 7, "purchase"),   # touch after conv -> (none)
        (4, "2020-01-02 10:00:00", 8, "ad"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "event_type",
    )
    last = {r["touch_type"]: r["n_conversions"] for r in conversion_attribution(
        df, "user_id", "ts", "event_type", "purchase", ["ad", "email"],
        model="last", tiebreak_col="event_id").collect()}
    assert last == {"email": 2, "(none)": 2}
    first = {r["touch_type"]: r["n_conversions"] for r in conversion_attribution(
        df, "user_id", "ts", "event_type", "purchase", ["ad", "email"],
        model="first", tiebreak_col="event_id").collect()}
    assert first == {"ad": 1, "email": 1, "(none)": 2}


def test_seasonal_baseline_null_for_thin_or_flat_slots(spark):
    from rdsa_utils_spark.operators.events import seasonal_baseline_anomalies

    rows = [
        # slot with 3 obs, variance > 0
        ("k", "2020-01-06 10:00:00", 1.0),
        ("k", "2020-01-13 10:00:00", 2.0),
        ("k", "2020-01-20 10:30:00", 6.0),
        # slot with 2 obs only -> NULL scores
        ("k", "2020-01-06 11:00:00", 1.0),
        ("k", "2020-01-13 11:00:00", 9.0),
        # flat slot (zero variance) -> NULL scores
        ("k", "2020-01-06 12:00:00", 5.0),
        ("k", "2020-01-13 12:00:00", 5.0),
        ("k", "2020-01-20 12:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v",
    )
    out = seasonal_baseline_anomalies(df, "k", "ts", "v")
    by_hour = {}
    for r in out.collect():
        by_hour.setdefault(r["ts"].hour, []).append(r)
    assert all(r["seasonal_z"] is not None for r in by_hour[10])
    assert all(r["seasonal_z"] is None for r in by_hour[11])  # thin
    assert all(r["seasonal_z"] is None for r in by_hour[12])  # flat
    import statistics
    m = statistics.mean([1.0, 2.0, 6.0]); s = statistics.stdev([1.0, 2.0, 6.0])
    got = {round((v - m) / s, 6) for v in (1.0, 2.0, 6.0)}
    assert {r["seasonal_z"] for r in by_hour[10]} == got


def test_growth_accounting_decomposition(spark):
    from rdsa_utils_spark.operators.events import growth_accounting

    rows = [
        # u1: new in Jan(10), expands Feb(15), churns Mar (absent)
        (1, "2020-01-05", 10.0), (1, "2020-02-05", 15.0),
        # u2: new in Jan(20), contracts Feb(5), retained Mar(5)
        (2, "2020-01-10", 20.0), (2, "2020-02-10", 5.0), (2, "2020-03-10", 5.0),
        # u3: new in Feb(7)
        (3, "2020-02-15", 7.0),
        # u4: new Jan(3), gap Feb, resurrected Mar(4)
        (4, "2020-01-20", 3.0), (4, "2020-03-20", 4.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "v"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "v",
    )
    out = {str(r["month"])[:7]: r for r in
           growth_accounting(df, "user_id", "ts", "v").collect()}
    jan, feb, mar = out["2020-01"], out["2020-02"], out["2020-03"]
    assert (jan["new"], jan["total"]) == (33.0, 33.0)
    assert feb["new"] == 7.0 and feb["expansion"] == 5.0
    assert feb["contraction"] == -15.0 and feb["churned"] == -3.0
    assert feb["total"] == 27.0
    assert mar["resurrected"] == 4.0 and mar["churned"] == -22.0
    assert mar["total"] == 9.0
    assert mar["new"] == 0.0
    # Apr is a churn-only month (no current activity): u2(5) + u4(4)
    # churn there. The full-outer month join must keep it — a left
    # join from current-activity months would silently drop it.
    apr = out["2020-04"]
    assert apr["churned"] == -9.0
    assert (apr["new"], apr["expansion"], apr["contraction"],
            apr["resurrected"], apr["total"]) == (0.0, 0.0, 0.0, 0.0, 0.0)


def test_rolling_active_users_window(spark):
    from rdsa_utils_spark.operators.events import rolling_active_users

    rows = [
        (1, "2020-01-01"), (2, "2020-01-01"), (1, "2020-01-03"),
        (3, "2020-01-05"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
    )
    out = {str(r["day"])[:10]: r["active_users"] for r in
           rolling_active_users(df, "ts", "user_id", window_days=3).collect()}
    assert out["2020-01-01"] == 2          # u1,u2
    assert out["2020-01-03"] == 2          # u1(1st+3rd),u2(1st)
    assert out["2020-01-04"] == 1          # u1 (3rd)
    assert out["2020-01-05"] == 2          # u1(3rd), u3(5th)
    assert out["2020-01-07"] == 1          # u3 only
    assert "2020-01-08" not in out


def test_funnel_latency_hand_computed(spark):
    from rdsa_utils_spark.operators.events import funnel_latency

    rows = [
        (1, "2020-01-01 10:00:00", "view"),
        (1, "2020-01-01 10:00:10", "click"),     # 10s
        (1, "2020-01-01 10:01:10", "purchase"),  # 60s
        (2, "2020-01-01 09:00:00", "view"),
        (2, "2020-01-01 09:00:30", "click"),     # 30s, no purchase
        (3, "2020-01-01 08:00:00", "click"),     # click w/o prior view: excluded
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type",
    )
    out = {r["step"]: r for r in
           funnel_latency(df, ["view", "click", "purchase"]).collect()}
    assert out[1]["n_users"] == 2 and out[1]["q_50"] == 20.0  # median of 10,30
    assert out[2]["n_users"] == 1 and out[2]["q_50"] == 60.0


def test_change_points_locates_shift(spark):
    from rdsa_utils_spark.operators.events import change_points

    # mean shifts up at i=5 (values 0 -> 10); target = overall mean 5
    rows = [("g", i, 0.0 if i < 5 else 10.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    r = change_points(df, "g", "i", "v", 5.0).collect()[0]
    # cusum_neg peaks at the last pre-shift point (i=4) with 25
    assert r["change_at"] == 4
    assert r["direction"] == "down"
    assert r["peak_cusum"] == 25.0


def test_seasonal_adjust_recovers_flat_series(spark):
    from rdsa_utils_spark.operators.events import seasonal_adjust

    # value = 100 * seasonal factor by weekday position; period 3
    factors = [0.5, 1.0, 1.5]
    rows = [("g", i, 100.0 * factors[i % 3]) for i in range(12)]
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    out = sorted(
        (r["i"], r["seasonal_index"], r["adjusted"])
        for r in seasonal_adjust(df, "g", "i", "v", period=3).collect()
    )
    for i, si, adj in out:
        assert si == factors[i % 3]      # exact periodic pattern recovered
        assert adj == 100.0              # adjusted series is flat


def test_funnel_latency_subpercent_quantile_aliases(spark):
    """Regression: 0.995 and 0.999 must get DISTINCT column names
    (q_99_5 / q_99_9), not both collapse to q_99; duplicate aliases
    raise instead of producing ambiguous columns."""
    import pytest

    from rdsa_utils_spark.operators.events import funnel_latency

    rows = [
        (u, f"2020-01-01 10:00:{s:02d}", t)
        for u in range(1, 4)
        for s, t in [(0, "view"), (10 + u, "click")]
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type",
    )
    out = funnel_latency(
        df, ["view", "click"], quantiles=(0.5, 0.995, 0.999),
    )
    assert {"q_50", "q_99_5", "q_99_9"} <= set(out.columns)
    r = out.collect()[0]
    assert r["q_50"] == 12.0
    assert r["q_99_5"] <= r["q_99_9"]

    with pytest.raises(ValueError, match="duplicate"):
        funnel_latency(df, ["view", "click"], quantiles=(0.5, 0.5))


# --------------------------------------------------------------------------
# time_decayed_agg
# --------------------------------------------------------------------------


def test_time_decayed_hand_computed(spark):
    from rdsa_utils_spark.operators.events import time_decayed_agg

    # ref pinned; rows at 0, 1 and 2 half-lives before it.
    rows = [
        ("a", "2024-01-15 00:00:00", 10.0),
        ("a", "2024-01-08 00:00:00", 10.0),   # 1 half-life: w = 0.5
        ("a", "2024-01-01 00:00:00", 10.0),   # 2 half-lives: w = 0.25
        ("b", "2024-01-15 00:00:00", None),   # decays count, not sum
    ]
    df = spark.createDataFrame(rows, ["g", "ts_s", "v"]).select(
        "g", F.col("ts_s").cast("timestamp").alias("ts"), "v",
    )
    out = {
        r.g: r
        for r in time_decayed_agg(
            df, "ts", 7.0, by=["g"], value_col="v",
            ref_ts="2024-01-15 00:00:00",
        ).collect()
    }
    assert out["a"].n_rows == 3
    assert out["a"].decayed_count == pytest.approx(1.75, abs=1e-6)
    assert out["a"].decayed_sum == pytest.approx(17.5, abs=1e-6)
    assert out["a"].decayed_mean == pytest.approx(10.0, abs=1e-6)
    # All-NULL-value group: count decays, sum is NULL (SQL SUM semantics).
    assert out["b"].decayed_count == 1.0 and out["b"].decayed_sum is None


def test_time_decayed_default_ref_is_global_max(spark):
    from rdsa_utils_spark.operators.events import time_decayed_agg

    rows = [
        ("a", "2024-01-15 00:00:00"),
        ("b", "2024-01-08 00:00:00"),  # one half-life before the max
    ]
    df = spark.createDataFrame(rows, ["g", "ts_s"]).select(
        "g", F.col("ts_s").cast("timestamp").alias("ts"),
    )
    out = {r.g: r for r in time_decayed_agg(df, "ts", 7.0, by=["g"]).collect()}
    assert out["a"].decayed_count == pytest.approx(1.0, abs=1e-9)
    assert out["b"].decayed_count == pytest.approx(0.5, abs=1e-9)


def test_time_decayed_validates_and_excludes_null_ts(spark):
    from rdsa_utils_spark.operators.events import time_decayed_agg

    rows = [("a", "2024-01-15 00:00:00"), ("a", None)]
    df = spark.createDataFrame(rows, ["g", "ts_s"]).select(
        "g", F.col("ts_s").cast("timestamp").alias("ts"),
    )
    out = time_decayed_agg(df, "ts", 7.0, by=["g"]).collect()[0]
    assert out.n_rows == 1
    with pytest.raises(ValueError):
        time_decayed_agg(df, "ts", 0.0)


# --------------------------------------------------------------------------
# attribute_conversions
# --------------------------------------------------------------------------


def _attr_frame(spark, rows):
    return spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts_s"],
    ).select(
        "user_id", "event_id", "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"),
    )


def test_attribution_last_and_first_touch(spark):
    from rdsa_utils_spark.operators.events import attribute_conversions

    df = _attr_frame(spark, [
        (1, 10, "click", "2024-01-01 00:00:00"),
        (1, 11, "view",  "2024-01-02 00:00:00"),
        (1, 12, "purchase", "2024-01-03 00:00:00"),
    ])
    last = attribute_conversions(df, ["click", "view"], "purchase").collect()[0]
    assert (last.touch_id, last.touch_type) == (11, "view")
    assert last.gap_s == pytest.approx(86400.0)
    first = attribute_conversions(
        df, ["click", "view"], "purchase", model="first",
    ).collect()[0]
    assert (first.touch_id, first.touch_type) == (10, "click")
    assert first.gap_s == pytest.approx(2 * 86400.0)


def test_attribution_lookback_and_organic(spark):
    from rdsa_utils_spark.operators.events import attribute_conversions

    df = _attr_frame(spark, [
        (1, 10, "click", "2024-01-01 00:00:00"),
        (1, 12, "purchase", "2024-01-09 00:00:00"),   # click 8 days old
        (2, 20, "purchase", "2024-01-05 00:00:00"),   # no touch at all
    ])
    out = {
        r.conversion_id: r
        for r in attribute_conversions(
            df, ["click", "view"], "purchase", lookback_s=7 * 86400,
        ).collect()
    }
    assert out[12].touch_id is None and out[12].gap_s is None
    assert out[20].touch_id is None
    # Without the lookback the old click attributes.
    no_lb = attribute_conversions(df, ["click"], "purchase").collect()
    got = {r.conversion_id: r.touch_id for r in no_lb}
    assert got[12] == 10 and got[20] is None


def test_attribution_same_instant_excluded_and_tiebreak(spark):
    from rdsa_utils_spark.operators.events import attribute_conversions

    df = _attr_frame(spark, [
        (1, 10, "click", "2024-01-01 00:00:00"),
        (1, 11, "view",  "2024-01-01 00:00:00"),      # same µs as 10
        (1, 12, "click", "2024-01-02 00:00:00"),      # same µs as purchase
        (1, 13, "purchase", "2024-01-02 00:00:00"),
    ])
    r = attribute_conversions(df, ["click", "view"], "purchase").collect()[0]
    # The same-microsecond click (id 12) is NOT eligible (strictly
    # earlier only); among the two day-1 touches the larger id wins.
    assert (r.touch_id, r.touch_type) == (11, "view")


def test_attribution_validates(spark):
    from rdsa_utils_spark.operators.events import attribute_conversions

    df = _attr_frame(spark, [(1, 1, "click", "2024-01-01 00:00:00")])
    with pytest.raises(ValueError):
        attribute_conversions(df, [], "purchase")
    with pytest.raises(ValueError):
        attribute_conversions(df, ["click"], "click")
    with pytest.raises(ValueError):
        attribute_conversions(df, ["click"], "purchase", model="linear")
