"""Unit tests for operators/stats.py and the graph extensions
(cooccurrence_pairs / triangle_count) — small hand-built frames with
independently computable answers; the corpus-scale paths are
oracle-checked in test_extra_oracles.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.graph import cooccurrence_pairs, triangle_count
from rdsa_utils_spark.operators.stats import (
    chi_square_drift,
    correlation_matrix,
    grouped_linear_fit,
    rfm_segments,
    winsorize,
)


def test_grouped_linear_fit_exact_line(spark):
    # y = 2x + 1 exactly in group 'a'; constant x in group 'b' -> NULLs.
    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(5)]
    rows += [("b", 3.0, float(y)) for y in range(4)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in grouped_linear_fit(df, "x", "y", ["g"]).collect()}
    assert out["a"].n == 5
    assert out["a"].slope == pytest.approx(2.0)
    assert out["a"].intercept == pytest.approx(1.0)
    assert out["a"].r2 == pytest.approx(1.0)
    assert out["b"].slope is None and out["b"].r2 is None


def test_correlation_matrix_signs_and_pairs(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.5, -3.9)],
        "a double, b double, c double",
    )
    out = {(r.col_x, r.col_y): r.corr for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] > 0.99
    assert out[("a", "c")] < -0.99
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a"])


def test_chi_square_drift_identical_distributions_zero(spark):
    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 4, "c string")
    b = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "c string")
    out = chi_square_drift(a, b, "c").collect()
    # Same x:y mix in both samples -> expected == observed, contrib 0.
    assert all(r.chi2_contrib == 0.0 for r in out)
    total = sum(r.n_a + r.n_b for r in out)
    assert total == 15


def test_chi_square_drift_statistic_matches_hand_calc(spark):
    # 2x2: a = 8 x / 2 y, b = 2 x / 8 y.
    a = spark.createDataFrame([("x",)] * 8 + [("y",)] * 2, "c string")
    b = spark.createDataFrame([("x",)] * 2 + [("y",)] * 8, "c string")
    out = {r.category: r for r in chi_square_drift(a, b, "c").collect()}
    # For category x: row_total 10, expected 5/5 -> (8-5)^2/5 + (2-5)^2/5 = 3.6
    assert out["x"].chi2_contrib == pytest.approx(3.6)
    assert out["y"].chi2_contrib == pytest.approx(3.6)
    stat = sum(r.chi2_contrib for r in out.values())
    assert stat == pytest.approx(7.2)


def test_winsorize_clips_only_outliers_and_keeps_nulls(spark):
    vals = [float(v) for v in range(1, 21)]  # 1..20
    rows = [("g", v) for v in vals] + [("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", ["g"], lower=0.05, upper=0.95)
    got = [r.v_winsorized for r in out.collect()]
    # Exact interpolated bounds for 1..20 at (n-1)p: lo=1.95, hi=19.05.
    assert min(x for x in got if x is not None) == pytest.approx(1.95)
    assert max(x for x in got if x is not None) == pytest.approx(19.05)
    assert sum(1 for x in got if x is None) == 1  # NULL passes through
    # Interior values untouched.
    assert 10.0 in got
    with pytest.raises(ValueError):
        winsorize(df, "v", ["g"], lower=0.9, upper=0.1)


def test_rfm_segments_scores_and_label(spark):
    rows = []
    # 4 customers with strictly increasing frequency/monetary/recency.
    for cust, n in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        for i in range(n):
            rows.append((cust, f"2024-0{cust}-0{i+1} 00:00:00", 100.0 * cust))
    df = spark.createDataFrame(rows, "cust long, d string, amt double").withColumn(
        "d", F.col("d").cast("timestamp"),
    )
    out = {r.customer: r for r in rfm_segments(df, "cust", "d", "amt").collect()}
    assert [out[c].f_score for c in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[c].m_score for c in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[c].r_score for c in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[4].segment == "444"
    assert out[1].segment == "111"


def test_cooccurrence_pairs_counts_and_cap(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # duplicate item in basket
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.item_a, r.item_b): r.n_baskets
           for r in cooccurrence_pairs(df, "basket", "item").collect()}
    assert out[("a", "b")] == 3  # dup (3,b) counted once
    assert out[("a", "c")] == 1 and out[("b", "c")] == 1
    capped = cooccurrence_pairs(df, "basket", "item", max_items_per_basket=2)
    got = {(r.item_a, r.item_b): r.n_baskets for r in capped.collect()}
    # Basket 1 keeps only items a, b (smallest-first deterministic cap).
    assert ("a", "c") not in got and got[("a", "b")] == 3


def test_triangle_count_hand_built_graph(spark):
    # K4 minus one edge has 2 triangles; edges given in mixed order
    # with duplicates and a self-loop to exercise canonicalization.
    edges = [
        (1, 2), (2, 3), (3, 1), (1, 4), (4, 2),
        (2, 1),  # reverse duplicate
        (3, 3),  # self-loop
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).collect()[0].n_triangles == 2
    empty = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert triangle_count(empty).collect()[0].n_triangles == 0


def test_boilerplate_ngrams_flags_shared_tokens(spark):
    from rdsa_utils_spark.operators.text import boilerplate_ngrams

    docs = spark.createDataFrame(
        [
            (1, "common alpha unique1"),
            (2, "common alpha unique2"),
            (3, "common beta unique3"),
            (4, "common beta unique4"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           boilerplate_ngrams(docs, "text", "doc_id", shingle_n=1,
                              max_doc_frac=0.5).collect()}
    # 'common' in 4/5 docs (0.8 > 0.5) -> boilerplate; 'alpha'/'beta'
    # in 2/5 (0.4) -> not.
    assert out[1].n_shingles == 3 and out[1].n_boilerplate == 1
    assert out[1].boilerplate_ratio == pytest.approx(1 / 3, abs=1e-6)
    assert out[5].n_shingles == 0 and out[5].boilerplate_ratio is None
    with pytest.raises(ValueError):
        boilerplate_ngrams(docs, "text", "doc_id", max_doc_frac=0.0)


# ----------------------------------------------------- round-2 additions

def test_transition_matrix_counts_and_probs(spark):
    from rdsa_utils_spark.operators.events import transition_matrix

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),   # a->b, b->a
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),   # a->b, b->c
    ]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    out = {(r.from_state, r.to_state): r for r in
           transition_matrix(df, "u", "t", "s").collect()}
    assert out[("a", "b")].n == 2 and out[("a", "b")].p == 1.0
    assert out[("b", "a")].p == 0.5 and out[("b", "c")].p == 0.5
    # Rows out of each from_state sum to 1.
    assert sum(r.p for k, r in out.items() if k[0] == "b") == 1.0


def test_merge_partial_aggregates_equals_direct(spark):
    from rdsa_utils_spark.operators.aggregations import merge_partial_aggregates
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("x", i, float(i * 10)) for i in range(10)]
        + [("y", i, float(100 - i)) for i in range(5)],
        "g string, n long, v double",
    )

    def partial(d):
        return d.groupBy("g").agg(
            F.sum("n").alias("sum_n"), F.count(F.lit(1)).alias("cnt"),
            F.min("v").alias("min_v"), F.max("v").alias("max_v"),
        )

    merged = merge_partial_aggregates(
        [partial(df.filter(F.col("n") < 3)), partial(df.filter(F.col("n") >= 3))],
        ["g"], sum_cols=["sum_n"], count_cols=["cnt"],
        min_cols=["min_v"], max_cols=["max_v"],
    )
    direct = partial(df)
    key = lambda d: sorted(tuple(r) for r in d.collect())
    assert key(merged) == key(direct)
    with pytest.raises(ValueError):
        merge_partial_aggregates([], ["g"], sum_cols=["sum_n"])
    with pytest.raises(ValueError):
        merge_partial_aggregates([direct], ["g"])


def test_scd2_compact_equals_dedup_apply(spark):
    from rdsa_utils_spark.operators.scd import scd2_apply, scd2_compact, scd2_init

    base = spark.createDataFrame([(1, "z"), (2, "z")], "k long, tier string")
    dim = scd2_init(base, "2023-12-01 00:00:00")
    upd = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"),
         (1, "a", "2024-01-02 00:00:00"),   # no-op under dedup
         (1, "b", "2024-01-03 00:00:00"),
         (2, "z", "2024-01-01 00:00:00")],  # no-op vs base
        "k long, tier string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    lossless = scd2_apply(dim, upd, ["k"], ["tier"], "eff", drop_unchanged=False)
    compacted = scd2_compact(lossless, ["k"], ["tier"])
    deduped = scd2_apply(dim, upd, ["k"], ["tier"], "eff")
    key = lambda d: sorted(
        (r.k, r.tier, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in d.collect()
    )
    assert key(compacted) == key(deduped)
    # Lossless kept the no-ops that compaction removes.
    assert lossless.count() > compacted.count()


def test_interval_join_bounds_and_renames(spark):
    from rdsa_utils_spark.streaming.joins import interval_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "L1"), (2, "2024-01-01 10:00:00", "L2")],
        "u long, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00", "R-in"),
         (1, "2024-01-01 13:00:00", "R-late"),
         (1, "2024-01-01 09:59:59", "R-early"),
         (2, "2024-01-01 12:00:00", "R-edge")],  # exactly +2h
        "u long, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = interval_join(
        left, right, ["u"], "ts", "ts", lower="0 seconds", upper="2 hours",
    )
    rows = sorted((r.u, r.tag, r.tag_right) for r in out.collect())
    # Colliding right columns arrive suffixed; bounds are inclusive.
    assert rows == [(1, "L1", "R-in"), (2, "L2", "R-edge")]
    assert "ts_right" in out.columns
    with pytest.raises(ValueError):
        interval_join(left, right, [], "ts", "ts")


def test_interval_join_left_outer_keeps_unmatched(spark):
    from rdsa_utils_spark.streaming.joins import interval_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (9, "2024-01-01 10:00:00")],
        "u long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "u long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = interval_join(left, right, ["u"], "ts", "ts", how="leftOuter")
    got = {r.u: r.ts_right for r in out.collect()}
    assert got[9] is None and got[1] is not None


def test_standardize_dims_moments_and_zero_variance(spark):
    from rdsa_utils_spark.operators.similarity import standardize_dims

    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [3.0, 5.0]), (3, [5.0, 5.0])],
        "id long, v array<double>",
    )
    out = {r.id: r.z_vec for r in standardize_dims(df, "v").collect()}
    # Dim 0: mean 3, stddev_samp 2 -> z = [-1, 0, 1]; dim 1 constant -> 0.
    assert out[1] == [pytest.approx(-1.0), 0.0]
    assert out[2] == [pytest.approx(0.0), 0.0]
    assert out[3] == [pytest.approx(1.0), 0.0]


def test_mix_corpora_hits_target_mixture(spark):
    from rdsa_utils_spark.operators.sampling import mix_corpora

    rows = [(f"a{i}", "a") for i in range(400)]
    rows += [(f"b{i}", "b") for i in range(100)]
    df = spark.createDataFrame(rows, "id string, src string")
    # Target 50/50: b (100 rows) binds -> keep all b, ~100 of a.
    out = mix_corpora(df, "src", "id", {"a": 0.5, "b": 0.5})
    counts = {r.src: r.c for r in out.groupBy("src").agg(F.count("*").alias("c")).collect()}
    assert counts["b"] == 100
    assert 80 <= counts["a"] <= 120  # hash thinning is statistical
    # Determinism: same seed, same rows.
    again = mix_corpora(df, "src", "id", {"a": 0.5, "b": 0.5})
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in again.collect())
    with pytest.raises(ValueError):
        mix_corpora(df, "src", "id", {"a": 0.5, "b": 0.2})  # sums != 1
    with pytest.raises(ValueError):
        mix_corpora(df, "src", "id", {})


def test_js_divergence_bounds_and_known_values(spark):
    from rdsa_utils_spark.operators.stats import js_divergence

    same = spark.createDataFrame([("x",)] * 4 + [("y",)] * 4, "c string")
    r = js_divergence(same, same, "c").collect()[0]
    assert r.jsd == pytest.approx(0.0)
    assert r.n_a == 8 and r.n_b == 8
    # Disjoint supports -> JSD = 1 bit (base 2).
    a = spark.createDataFrame([("x",)] * 5, "c string")
    b = spark.createDataFrame([("y",)] * 7, "c string")
    assert js_divergence(a, b, "c").collect()[0].jsd == pytest.approx(1.0)


def test_label_centroid_similarity_hand_built(spark):
    from rdsa_utils_spark.operators.similarity import label_centroid_similarity

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]), (0, [1.0, 0.0]),        # centroid (1, 0)
            (1, [0.0, 2.0]), (1, [0.0, 4.0]),        # centroid (0, 3)
            (2, [2.0, 0.0]), (2, [4.0, 0.0]),        # centroid (3, 0)
        ],
        "label long, v array<double>",
    )
    out = {(r.label_a, r.label_b): r.cos_sim
           for r in label_centroid_similarity(df, "v", "label").collect()}
    assert out[(0, 1)] == pytest.approx(0.0)   # orthogonal
    assert out[(0, 2)] == pytest.approx(1.0)   # parallel
    assert out[(1, 2)] == pytest.approx(0.0)
    assert len(out) == 3  # unordered pairs only


def test_grouped_autocorrelation_matches_numpy(spark):
    """ACF per group at lags 1..3 must equal the pandas/numpy sample
    Pearson r between the series and its shifted self (overlap pairs
    only); short groups yield NULL; lag must be positive."""
    import numpy as np
    import pandas as pd

    from rdsa_utils_spark.operators.stats import grouped_autocorrelation

    rng = np.random.default_rng(11)
    frames = []
    for g, n in (("a", 40), ("b", 25), ("tiny", 2)):
        x = np.cumsum(rng.normal(size=n))  # random walk → high lag-1 ACF
        frames.append(pd.DataFrame({"g": g, "t": range(n), "x": x}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)

    out = grouped_autocorrelation(df, ["g"], "t", "x", lags=(1, 2, 3))
    got = {(r.g, r.lag): r.acf for r in out.collect()}
    assert len(got) == 9

    for g, n in (("a", 40), ("b", 25)):
        s = pdf.loc[pdf.g == g, "x"].reset_index(drop=True)
        for lag in (1, 2, 3):
            a, b = s[lag:].to_numpy(), s[:-lag].to_numpy()
            want = float(np.corrcoef(a, b)[0, 1])
            assert got[(g, lag)] == pytest.approx(want, abs=1e-6), (g, lag)

    # 2-row group: lag-1 overlap has zero variance → NULL; lags 2,3 have
    # no overlap at all → NULL.
    assert got[("tiny", 2)] is None and got[("tiny", 3)] is None

    with pytest.raises(ValueError, match="positive"):
        grouped_autocorrelation(df, ["g"], "t", "x", lags=(0,))


def test_group_percent_rank_semantics(spark):
    from rdsa_utils_spark.operators.stats import group_percent_rank

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 4.0), ("b", 9.0)],
        ["g", "v"],
    )
    rows = group_percent_rank(df, "g", "v").collect()
    got = sorted((r["g"], r["v"], r["pct_rank"]) for r in rows)
    # percent_rank = (rank-1)/(n-1); ties share rank; singleton group -> 0.
    assert got == [
        ("a", 1.0, 0.0),
        ("a", 2.0, round(1 / 3, 6)),
        ("a", 2.0, round(1 / 3, 6)),
        ("a", 4.0, 1.0),
        ("b", 9.0, 0.0),
    ]


def test_mad_outliers_hand_computed(spark):
    from rdsa_utils_spark.operators.stats import mad_outliers

    # g=a: values 1..5 plus 100. median=3.5, MAD=1.5;
    # mod_z(100) = .6745*96.5/1.5 = 43.4 -> outlier; others < 3.5.
    data = [("a", float(v)) for v in [1, 2, 3, 4, 5, 100]]
    df = spark.createDataFrame(data, ["g", "v"])
    out = {r["v"]: r for r in mad_outliers(df, "g", "v").collect()}
    assert out[100.0]["is_outlier"] is True
    assert all(out[float(v)]["is_outlier"] is False for v in [1, 2, 3, 4, 5])
    assert out[100.0]["mod_z"] == round(0.6745 * (100 - 3.5) / 1.5, 6)


def test_mad_outliers_zero_mad_group(spark):
    from rdsa_utils_spark.operators.stats import mad_outliers

    # constant group: MAD=0 -> only exact deviants flagged
    df = spark.createDataFrame(
        [("c", 5.0), ("c", 5.0), ("c", 5.0), ("c", 7.0)], ["g", "v"],
    )
    rows = mad_outliers(df, "g", "v").collect()
    # median=5, MAD=0: 7.0 deviates -> outlier, 5.0s not
    flags = sorted((r["v"], r["is_outlier"]) for r in rows)
    assert flags == [(5.0, False), (5.0, False), (5.0, False), (7.0, True)]


def test_grouped_bootstrap_ci_properties(spark, sf_dir):
    from rdsa_utils_spark.operators.stats import grouped_bootstrap_ci

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = grouped_bootstrap_ci(
        cust, "c_nationkey", "c_acctbal", n_resamples=30, id_col="c_custkey",
    ).collect()
    assert len(out) == 25
    for r in out:
        assert r["ci_lo"] <= r["ci_hi"]
        # percentile-bootstrap interval should bracket the point mean
        # for these group sizes (not guaranteed in general, but stable
        # for this fixture)
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # deterministic across invocations
    again = grouped_bootstrap_ci(
        cust, "c_nationkey", "c_acctbal", n_resamples=30, id_col="c_custkey",
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    import pytest as _pt
    with _pt.raises(ValueError):
        grouped_bootstrap_ci(cust, "c_nationkey", "c_acctbal", n_resamples=1)


def test_ab_test_report_hand_computed(spark):
    import math

    from rdsa_utils_spark.operators.stats import ab_test_report

    rows = [("c", v) for v in [1.0, 2.0, 3.0, 4.0]] + [("t", v) for v in [3.0, 5.0, 7.0]]
    df = spark.createDataFrame(rows, ["arm", "y"])
    r = ab_test_report(df, "arm", "y", "c", "t").collect()[0]
    import statistics
    mc, mt = 2.5, 5.0
    vc, vt = statistics.variance([1, 2, 3, 4]), statistics.variance([3, 5, 7])
    se2c, se2t = vc / 4, vt / 3
    assert (r["n_c"], r["n_t"]) == (4, 3)
    assert r["lift"] == 2.5 and r["rel_lift"] == 1.0
    assert r["welch_t"] == round((mt - mc) / math.sqrt(se2c + se2t), 6)
    want_dof = (se2c + se2t) ** 2 / (se2c**2 / 3 + se2t**2 / 2)
    assert r["dof"] == round(want_dof, 6)


def test_cuped_preserves_mean_and_reduces_variance(spark):
    import numpy as np

    from rdsa_utils_spark.operators.stats import cuped_adjust

    rng = np.random.default_rng(3)
    x = rng.normal(10, 2, 300)
    y = 3 * x + rng.normal(0, 1, 300)   # strongly covariate-driven
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"],
    )
    out = cuped_adjust(df, "y", "x", round_to=None)
    import pyspark.sql.functions as SF
    r = out.agg(
        SF.avg("y").alias("my"), SF.avg("metric_cuped").alias("ma"),
        SF.var_samp("y").alias("vy"), SF.var_samp("metric_cuped").alias("va"),
    ).collect()[0]
    assert abs(r["my"] - r["ma"]) < 1e-9          # mean preserved
    assert r["va"] < 0.1 * r["vy"]                # big variance cut
    # zero-variance covariate: unchanged metric
    flat = spark.createDataFrame([(1.0, 5.0), (1.0, 7.0)], ["x", "y"])
    vals = sorted(
        r["metric_cuped"] for r in cuped_adjust(flat, "y", "x", round_to=None).collect()
    )
    assert vals == [5.0, 7.0]


def test_post_stratified_mean_reweights(spark):
    from rdsa_utils_spark.operators.stats import post_stratified_mean

    # stratum A mean 10 (3 rows), B mean 20 (1 row); population 50/50
    df = spark.createDataFrame(
        [("A", 10.0), ("A", 10.0), ("A", 10.0), ("B", 20.0)], ["s", "v"],
    )
    r = post_stratified_mean(df, "s", "v", {"A": 0.5, "B": 0.5, "C": 0.1}).collect()[0]
    assert r["estimate"] == 15.0          # population-weighted
    assert r["naive_mean"] == 12.5        # sample-weighted
    assert r["n"] == 4 and r["missing_strata"] == "C"


def test_ratio_estimator_hand_computed(spark):
    from rdsa_utils_spark.operators.stats import ratio_estimator

    df = spark.createDataFrame([(10.0, 2.0), (20.0, 3.0)], ["y", "x"])
    r = ratio_estimator(df, "y", "x", 100.0).collect()[0]
    assert r["ratio"] == 6.0 and r["y_hat"] == 600.0
    assert r["sample_y"] == 30.0 and r["sample_x"] == 5.0 and r["n"] == 2


def test_price_index_hand_computed(spark):
    from rdsa_utils_spark.operators.stats import price_index

    rows = [
        # base period 0: item A p=10 q=2, item B p=20 q=1
        (0, "A", 10.0, 2.0), (0, "B", 20.0, 1.0),
        # period 1: A p=20 (x2) q=1, B p=20 q=3; C unmatched (ignored)
        (1, "A", 20.0, 1.0), (1, "B", 20.0, 3.0), (1, "C", 5.0, 9.0),
    ]
    df = spark.createDataFrame(rows, ["t", "item", "p", "q"])
    out = {r["period"]: r for r in price_index(df, "t", "item", "p", "q", 0).collect()}
    assert out[0]["laspeyres"] == 100.0 and out[0]["fisher"] == 100.0
    r1 = out[1]
    # L = (20*2 + 20*1)/(10*2 + 20*1) = 60/40 = 150
    assert r1["laspeyres"] == 150.0
    # P = (20*1 + 20*3)/(10*1 + 20*3) = 80/70
    assert r1["paasche"] == round(80 / 70 * 100, 6)
    assert r1["fisher"] == round((150 * 80 / 70 * 100) ** 0.5, 6)
    assert r1["n_items"] == 2  # C is unmatched


def test_gini_known_values(spark):
    from rdsa_utils_spark.operators.stats import gini_coefficient

    df = spark.createDataFrame(
        [("eq", 5.0)] * 4 + [("uneq", 0.000001), ("uneq", 0.000001),
                             ("uneq", 0.000001), ("uneq", 100.0)],
        ["g", "v"],
    )
    out = {r["g"]: r for r in gini_coefficient(df, "g", "v").collect()}
    assert out["eq"]["gini"] == 0.0                 # perfect equality
    assert out["uneq"]["gini"] > 0.74               # near-max for n=4 (0.75)


def test_hhi_monopoly_vs_even(spark):
    from rdsa_utils_spark.operators.stats import hhi_concentration

    rows = [("mono", "f1", 10.0),
            ("even", "f1", 5.0), ("even", "f2", 5.0),
            ("even", "f3", 5.0), ("even", "f4", 5.0)]
    df = spark.createDataFrame(rows, ["m", "f", "v"])
    out = {r["market"]: r for r in hhi_concentration(df, "m", "f", "v").collect()}
    assert out["mono"]["hhi"] == 10000.0
    assert out["even"]["hhi"] == 2500.0


def test_lorenz_points_perfect_equality_is_diagonal(spark):
    from rdsa_utils_spark.operators.stats import lorenz_points

    df = spark.createDataFrame([("g", 5.0)] * 10, ["g", "v"])
    out = {r["point"]: r for r in lorenz_points(df, "g", "v", n_points=5).collect()}
    for p, r in out.items():
        assert r["value_share"] == r["pop_share"] == round(p / 5, 6)


def test_lorenz_points_concentrated(spark):
    from rdsa_utils_spark.operators.stats import lorenz_points

    # 9 units of ~0, 1 unit holds everything: curve hugs 0 until the top
    df = spark.createDataFrame(
        [("g", 0.0)] * 9 + [("g", 100.0)], ["g", "v"],
    )
    out = {r["point"]: r for r in lorenz_points(df, "g", "v", n_points=10).collect()}
    assert out[9]["value_share"] == 0.0
    assert out[10]["value_share"] == 1.0


def test_chained_index_equals_fixed_base_for_constant_basket(spark):
    from rdsa_utils_spark.operators.stats import chained_index, price_index

    # constant item set & quantities: chained Fisher == fixed-base Fisher
    rows = []
    for t, scale in [(0, 1.0), (1, 1.1), (2, 1.32)]:
        rows += [(t, "A", 10.0 * scale, 2.0), (t, "B", 20.0 * scale, 1.0)]
    df = spark.createDataFrame(rows, ["t", "item", "p", "q"])
    chained = {r["period"]: r["chained_fisher"]
               for r in chained_index(df, "t", "item", "p", "q").collect()}
    fixed = {r["period"]: r["fisher"]
             for r in price_index(df, "t", "item", "p", "q", 0).collect()}
    for t in (0, 1, 2):
        assert abs(chained[t] - fixed[t]) < 1e-6
    assert abs(chained[2] - 132.0) < 1e-6


def test_ab_test_report_degenerate_inputs_yield_null_not_error(spark):
    """ANSI-mode guards: zero control mean → NULL rel_lift; both arm
    variances zero → NULL welch_t/dof; n=1 arms → NULL dof. The job
    must complete, not throw DIVIDE_BY_ZERO."""
    from rdsa_utils_spark.operators.stats import ab_test_report

    # zero control mean (net/difference metric) — rel_lift undefined
    rows = [("c", -1.0), ("c", 1.0), ("t", 2.0), ("t", 4.0)]
    df = spark.createDataFrame(rows, ["arm", "y"])
    r = ab_test_report(df, "arm", "y", "c", "t").collect()[0]
    assert r["mean_c"] == 0.0 and r["rel_lift"] is None
    assert r["welch_t"] is not None  # variances nonzero → t defined

    # both arms constant: se = 0 → welch_t / dof NULL, lift defined
    rows = [("c", 5.0), ("c", 5.0), ("t", 7.0), ("t", 7.0)]
    df = spark.createDataFrame(rows, ["arm", "y"])
    r = ab_test_report(df, "arm", "y", "c", "t").collect()[0]
    assert r["lift"] == 2.0
    assert r["welch_t"] is None and r["dof"] is None

    # single-row arms: var_samp NULL → everything degenerate is NULL
    rows = [("c", 5.0), ("t", 7.0)]
    df = spark.createDataFrame(rows, ["arm", "y"])
    r = ab_test_report(df, "arm", "y", "c", "t").collect()[0]
    assert r["lift"] == 2.0 and r["welch_t"] is None and r["dof"] is None


def test_ratio_estimator_zero_x_total_yields_null(spark):
    from rdsa_utils_spark.operators.stats import ratio_estimator

    df = spark.createDataFrame([(10.0, 2.0), (20.0, -2.0)], ["y", "x"])
    r = ratio_estimator(df, "y", "x", 100.0).collect()[0]
    assert r["ratio"] is None and r["y_hat"] is None
    assert r["sample_y"] == 30.0 and r["sample_x"] == 0.0 and r["n"] == 2


def test_hhi_zero_total_market_yields_null(spark):
    from rdsa_utils_spark.operators.stats import hhi_concentration

    df = spark.createDataFrame(
        [("m1", "f1", 5.0), ("m1", "f2", -5.0), ("m2", "f1", 10.0)],
        ["mkt", "firm", "v"],
    )
    out = {r["market"]: r for r in
           hhi_concentration(df, "mkt", "firm", "v").collect()}
    assert out["m1"]["hhi"] is None       # net-zero market → NULL, no throw
    assert out["m2"]["hhi"] == 10000.0


def test_lorenz_points_zero_total_group_yields_null(spark):
    from rdsa_utils_spark.operators.stats import lorenz_points

    df = spark.createDataFrame(
        [("g", 1.0), ("g", -1.0), ("h", 2.0), ("h", 2.0)], ["g", "v"],
    )
    out = lorenz_points(df, "g", "v", n_points=2).collect()
    g_rows = [r for r in out if r["g"] == "g"]
    h_rows = [r for r in out if r["g"] == "h"]
    assert g_rows and all(r["value_share"] is None for r in g_rows)
    assert h_rows and all(r["value_share"] is not None for r in h_rows)


def test_price_index_zero_base_denominator_yields_null(spark):
    from rdsa_utils_spark.operators.stats import price_index

    # base period: price 0 for the only item → Σp0·q0 = Σp0·qt = 0
    rows = [(0, "A", 0.0, 2.0), (1, "A", 5.0, 2.0)]
    df = spark.createDataFrame(rows, ["t", "item", "p", "q"])
    out = {r["period"]: r for r in price_index(df, "t", "item", "p", "q", 0).collect()}
    assert out[1]["laspeyres"] is None and out[1]["paasche"] is None
    assert out[1]["fisher"] is None


def test_chained_index_degenerate_link_chains_as_one(spark):
    from rdsa_utils_spark.operators.stats import chained_index

    # t=1's only matched item has base price 0 → NULL link, chain
    # carries 100 forward; t=2 links normally off t=1 prices.
    rows = [(0, "A", 0.0, 1.0), (1, "A", 5.0, 1.0), (2, "A", 10.0, 1.0)]
    df = spark.createDataFrame(rows, ["t", "item", "p", "q"])
    out = {r["period"]: r for r in
           chained_index(df, "t", "item", "p", "q").collect()}
    assert out[1]["link_fisher"] is None
    assert out[1]["chained_fisher"] == 100.0
    assert out[2]["link_fisher"] == 2.0
    assert out[2]["chained_fisher"] == 200.0


def test_grouped_bootstrap_ci_duplicates_draw_independent_weights(spark):
    """Regression: the default resample id must be unique per ROW, not
    per (group, value) — otherwise duplicate rows get perfectly
    correlated Poisson weights and the CI doesn't shrink when the
    sample doubles. With independent weights, duplicating every row 2×
    shrinks the CI width by ≈ 1/√2 (all hash-deterministic, no flake).
    """
    from rdsa_utils_spark.operators.stats import grouped_bootstrap_ci

    vals = [float(v % 17) for v in range(40)]
    single = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    doubled = spark.createDataFrame([("g", v) for v in vals * 2], ["g", "v"])

    def width(df):
        r = grouped_bootstrap_ci(df, "g", "v", n_resamples=200).collect()[0]
        return r["ci_hi"] - r["ci_lo"]

    w1, w2 = width(single), width(doubled)
    assert w2 < 0.85 * w1, f"CI width {w2} did not shrink vs {w1}"
    # determinism: same input → same interval
    assert width(doubled) == w2


# --------------------------------------------------------------------------
# categorical_entropy / mutual_information
# --------------------------------------------------------------------------


def test_entropy_hand_computed(spark):
    import math

    from rdsa_utils_spark.operators.stats import categorical_entropy

    # p = [1/2, 1/4, 1/4] -> H = 1.5 bits exactly; k=3.
    rows = [("a",)] * 4 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, ["c"])
    r = categorical_entropy(df, "c").collect()[0]
    assert (r.n, r.k) == (8, 3)
    assert r.entropy == pytest.approx(1.5, abs=1e-6)
    assert r.entropy_norm == pytest.approx(1.5 / math.log2(3), abs=1e-6)


def test_entropy_uniform_is_log2k_and_constant_is_zero(spark):
    from rdsa_utils_spark.operators.stats import categorical_entropy

    uni = spark.createDataFrame([(str(i % 8),) for i in range(64)], ["c"])
    r = categorical_entropy(uni, "c").collect()[0]
    assert r.entropy == pytest.approx(3.0, abs=1e-6)
    assert r.entropy_norm == pytest.approx(1.0, abs=1e-6)
    const = spark.createDataFrame([("x",)] * 5, ["c"])
    r2 = categorical_entropy(const, "c").collect()[0]
    assert r2.entropy == 0.0 and r2.k == 1 and r2.entropy_norm is None


def test_entropy_grouped_null_is_category(spark):
    from rdsa_utils_spark.operators.stats import categorical_entropy

    rows = [("g1", "a"), ("g1", None), ("g2", "a"), ("g2", "a")]
    df = spark.createDataFrame(rows, ["g", "c"])
    out = {r.g: r for r in categorical_entropy(df, "c", group_by=["g"]).collect()}
    assert out["g1"].k == 2 and out["g1"].entropy == pytest.approx(1.0, abs=1e-6)
    assert out["g2"].k == 1 and out["g2"].entropy == 0.0


def test_mutual_information_hand_computed(spark):
    from rdsa_utils_spark.operators.stats import mutual_information

    # Perfectly dependent binary pair: MI = H(X) = 1 bit.
    dep = spark.createDataFrame(
        [("a", "u")] * 5 + [("b", "v")] * 5, ["x", "y"],
    )
    assert mutual_information(dep, "x", "y").collect()[0].mi == pytest.approx(
        1.0, abs=1e-6,
    )
    # Independent uniform pair: MI = 0.
    ind = spark.createDataFrame(
        [(a, b) for a in ("a", "b") for b in ("u", "v") for _ in range(3)],
        ["x", "y"],
    )
    assert mutual_information(ind, "x", "y").collect()[0].mi == pytest.approx(
        0.0, abs=1e-9,
    )


def test_mutual_information_numpy_replay_and_nulls(spark):
    import math

    from rdsa_utils_spark.operators.stats import mutual_information

    # Skewed joint distribution; replay MI in pure python.
    joint = {("a", "u"): 10, ("a", "v"): 2, ("b", "u"): 3, ("b", "v"): 15}
    rows = [(x, y) for (x, y), m in joint.items() for _ in range(m)]
    df = spark.createDataFrame(rows + [(None, "u"), ("a", None)], ["x", "y"])
    n = sum(joint.values())
    mx = {"a": 12, "b": 18}
    my = {"u": 13, "v": 17}
    want = round(
        sum(
            round((m / n) * math.log2(m * n / (mx[x] * my[y])), 9)
            for (x, y), m in joint.items()
        ),
        6,
    )
    r = mutual_information(df, "x", "y").collect()[0]
    assert r.n == n  # NULL-bearing rows excluded
    assert r.mi == pytest.approx(want, abs=1e-6)


def test_mutual_information_grouped(spark):
    from rdsa_utils_spark.operators.stats import mutual_information

    rows = [("g1", "a", "u")] * 3 + [("g1", "b", "v")] * 3
    rows += [("g2", x, y) for x in ("a", "b") for y in ("u", "v")]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r.g: r.mi for r in mutual_information(df, "x", "y", group_by=["g"]).collect()}
    assert out["g1"] == pytest.approx(1.0, abs=1e-6)
    assert out["g2"] == pytest.approx(0.0, abs=1e-9)
