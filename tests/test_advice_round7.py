"""Regression tests for the round-7 advisor findings (ADVICE.md r06):
float-derived microseconds in attribute_conversions, string-ordered
KS values in the stats façade, string-cast kappa raters, NULL rows in
brier_score's n, and the hardcoded qrels 'rel' column in MRR/MAP@k."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_attribute_conversions_exact_microseconds(spark):
    """Touch at conversion_ts − 1 µs is eligible; at the same µs it is
    not — exact integer µs (unix_micros), no double rounding."""
    from rdsa_utils_spark.operators.events import attribute_conversions

    base = dt.datetime(2024, 3, 1, 12, 0, 0, 500000)
    rows = [
        ("u1", 1, "click", base - dt.timedelta(microseconds=1)),
        ("u1", 2, "purchase", base),
        # u2: touch at the EXACT conversion microsecond — ineligible.
        ("u2", 3, "click", base),
        ("u2", 4, "purchase", base),
    ]
    df = spark.createDataFrame(rows, "user string, id long, type string, ts timestamp")
    got = {
        r.user: r.touch_id
        for r in attribute_conversions(
            df, ["click"], "purchase", user_col="user", ts_col="ts",
            type_col="type", id_col="id", model="last",
        ).collect()
    }
    assert got.get("u1") == 1
    assert got.get("u2") is None


def test_ks_statistic_facade_casts_strings_numerically(spark):
    """String-typed numeric values must order numerically ('9' < '10'),
    matching the double-typed result exactly."""
    from rdsa_utils_spark.operators.stats import ks_statistic

    rows = [("9", "a"), ("10", "a"), ("2", "a"), ("10", "b"), ("3", "b"), ("9", "b")]
    s = spark.createDataFrame(rows, "v string, grp string")
    d = s.select(F.col("v").cast("double").alias("v"), "grp")
    ks_s = ks_statistic(s, "v", "grp", left="a", right="b").collect()[0]
    ks_d = ks_statistic(d, "v", "grp", left="a", right="b").collect()[0]
    assert ks_s.ks == ks_d.ks
    assert (ks_s.n_left, ks_s.n_right) == (ks_d.n_left, ks_d.n_right)


def test_cohens_kappa_numeric_raters_agree_across_types(spark):
    """int 1 vs double 1.0 is agreement when both rater columns are
    numeric (previously '1' != '1.0' under the string cast)."""
    from rdsa_utils_spark.operators.evaluate import cohens_kappa

    rows = [(1, 1.0), (0, 0.0), (1, 1.0), (0, 1.0)]
    df = spark.createDataFrame(rows, "r1 int, r2 double")
    got = cohens_kappa(df, "r1", "r2", include_rates=True).collect()[0]
    assert got.po == 0.75  # 3/4 agree numerically
    # Same data as same-typed ints must give the identical kappa.
    df_i = spark.createDataFrame([(a, int(b)) for a, b in rows], "r1 int, r2 int")
    assert cohens_kappa(df_i, "r1", "r2").collect()[0].kappa == got.kappa


def test_brier_score_excludes_null_rows_from_n(spark):
    from rdsa_utils_spark.operators.evaluate import brier_score

    clean = [(0.8, 1), (0.1, 0), (0.6, 1), (0.4, 0)]
    df = spark.createDataFrame(
        clean + [(None, 1), (0.5, None)], "score double, label int",
    )
    got = brier_score(df, "score", "label").collect()[0]
    want = brier_score(
        spark.createDataFrame(clean, "score double, label int"), "score", "label",
    ).collect()[0]
    assert got.n == 4 == want.n
    assert got.brier == want.brier


def test_mrr_map_at_k_respect_rel_col(spark):
    """A qrels frame whose grade column is named 'grade' must filter
    grade > 0 when rel_col='grade' — not treat every pair as relevant."""
    from rdsa_utils_spark.operators.evaluate import map_at_k, mrr_at_k

    runs = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3)],
        "query_id string, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 0), ("q1", "d2", 1)], "query_id string, doc_id string, grade int",
    )
    mrr = mrr_at_k(runs, qrels, 10, rel_col="grade").collect()[0]
    assert mrr.mrr == 0.5  # first relevant is d2 at rank 2, NOT d1
    ap = map_at_k(runs, qrels, 10, rel_col="grade").collect()[0]
    assert ap.n_rel == 1 and ap.ap == 0.5


def test_temporal_split_exact_no_global_window(spark):
    """Exact boundary matches the k-th-smallest definition and the
    physical plan contains no unpartitioned window over raw rows."""
    import datetime

    from rdsa_utils_spark.operators.sampling import temporal_split

    rows = [(i, datetime.datetime(2024, 1, 1 + i % 28, i % 24)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = temporal_split(df, "ts", train_frac=0.8)
    assert out.count() == 200
    train_n = out.filter("split = 'train'").count()
    # smallest time-prefix holding >= 80%: boundary is 160th smallest ts;
    # ties at the boundary all land in train.
    ts_sorted = sorted(r.ts for r in df.collect())
    bound = ts_sorted[159]
    assert train_n == sum(1 for t in ts_sorted if t <= bound)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # every Window node must carry a partition spec (windowing only on __pid__)
    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start():m.start() + 400]
        assert "__pid__" in seg, f"unpartitioned window in plan: {seg[:200]}"


def test_temporal_split_approx_timestamp_and_numeric(spark):
    import datetime

    from rdsa_utils_spark.operators.sampling import temporal_split

    rows = [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i))
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = temporal_split(df, "ts", train_frac=0.8, boundary="approx")
    frac = out.filter("split = 'train'").count() / 500
    assert 0.75 <= frac <= 0.85
    # pure time predicate: max(train ts) < min(valid ts)
    tmax = out.filter("split='train'").agg({"ts": "max"}).first()[0]
    vmin = out.filter("split='valid'").agg({"ts": "min"}).first()[0]
    assert tmax < vmin
    # numeric column path
    nd = spark.createDataFrame([(i, float(i)) for i in range(500)], "id long, v double")
    outn = temporal_split(nd, "v", train_frac=0.5, boundary="approx")
    fn = outn.filter("split = 'train'").count() / 500
    assert 0.45 <= fn <= 0.55


def test_temporal_split_empty_and_single_row(spark):
    import datetime

    from rdsa_utils_spark.operators.sampling import temporal_split

    empty = spark.createDataFrame([], "id long, ts timestamp")
    assert temporal_split(empty, "ts").count() == 0
    one = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "id long, ts timestamp",
    )
    got = temporal_split(one, "ts", train_frac=0.5).collect()
    assert len(got) == 1 and got[0].split == "train"


def test_train_logreg_cache_features_equivalence(spark):
    """cache_features=False recomputes the feature explode per
    iteration but must produce byte-identical weights (the training
    arithmetic is quantized every step)."""
    from rdsa_utils_spark.operators.classify import train_logreg_hashed

    rows = [
        (i, f"spark data {'good' if i % 2 else 'bad'} doc {i % 7}", i % 2)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    cached = {
        r.feature: r.weight
        for r in train_logreg_hashed(
            df, "label", "text", "doc_id", n_features=32, iterations=3,
        ).collect()
    }
    uncached = {
        r.feature: r.weight
        for r in train_logreg_hashed(
            df, "label", "text", "doc_id", n_features=32, iterations=3,
            cache_features=False,
        ).collect()
    }
    assert cached == uncached
