"""Property-based tests (hypothesis): invariants that golden-frame
unit tests can't sweep. Kept to few examples per property — every
example runs real Spark jobs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # id
        st.integers(min_value=-100, max_value=100),  # a
        st.integers(min_value=-100, max_value=100),  # b
    ),
    min_size=1,
    max_size=12,
)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_melt_shape_and_values(spark, rows):
    from rdsa_utils_spark.operators.reshape import melt

    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = melt(df, id_vars=["id"], value_vars=["a", "b"]).collect()
    assert len(out) == 2 * len(rows)
    # every (id, variable, value) triple traces back to a source cell
    source = {}
    for i, a, b in rows:
        source.setdefault(("a", i), []).append(a)
        source.setdefault(("b", i), []).append(b)
    got = {}
    for r in out:
        got.setdefault((r["variable"], r["id"]), []).append(r["value"])
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in source.items()
    }


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_cumulative_array_is_prefix_sum(spark, rows):
    from rdsa_utils_spark.functions.columns import cumulative_array

    arrays = [[a, b, i] for i, a, b in rows]
    df = spark.createDataFrame(
        [(j, arr) for j, arr in enumerate(arrays)], "id long, xs array<long>",
    )
    out = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", cumulative_array("xs")).collect()
    }
    for j, arr in enumerate(arrays):
        assert out[j] == [float(v) for v in np.cumsum(arr)]


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_exact_dedup_idempotent(spark, rows):
    from rdsa_utils_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(j, f"doc {a} {b}") for j, (i, a, b) in enumerate(rows)],
        "doc_id long, text string",
    )
    once = exact_dedup(df, "text", "doc_id")
    twice = exact_dedup(once, "text", "doc_id")
    got_once = sorted(r["doc_id"] for r in once.collect())
    got_twice = sorted(r["doc_id"] for r in twice.collect())
    assert got_once == got_twice
    # keeps exactly one row per normalized text, the smallest id
    texts = {}
    for j, (i, a, b) in enumerate(rows):
        texts.setdefault(f"doc {a} {b}", []).append(j)
    assert got_once == sorted(min(v) for v in texts.values())


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=10),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=10),
)


@given(data=asof_strategy)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    from rdsa_utils_spark.operators.joins import asof_join

    left_ts, right_ts = data
    left = spark.createDataFrame(
        [(i, float(t)) for i, t in enumerate(sorted(left_ts))], "lid long, ts double",
    )
    right = spark.createDataFrame(
        [(i, float(t), float(t) * 2) for i, t in enumerate(sorted(set(right_ts)))],
        "rid long, ts double, payload double",
    )
    got = {
        r["lid"]: r["payload"]
        for r in asof_join(left, right.drop("rid"), on="ts", direction="backward").collect()
    }
    expected_df = pd.merge_asof(
        pd.DataFrame({"lid": range(len(left_ts)), "ts": sorted(map(float, left_ts))}),
        pd.DataFrame(
            {"ts": sorted(set(map(float, right_ts)))},
        ).assign(payload=lambda d: d.ts * 2),
        on="ts",
        direction="backward",
    )
    for _, row in expected_df.iterrows():
        want = None if pd.isna(row["payload"]) else row["payload"]
        assert got[row["lid"]] == want


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_union_mismatched_pads_missing_columns(spark, rows):
    from rdsa_utils_spark.operators.sets import union_mismatched_dfs

    df1 = spark.createDataFrame(rows, "id long, a long, b long")
    df2 = spark.createDataFrame([(i, a) for i, a, _ in rows], "id long, c long")
    out = union_mismatched_dfs([df1, df2])
    assert out.count() == 2 * len(rows)
    assert set(out.columns) == {"id", "a", "b", "c"}
    assert out.filter(F.col("c").isNull()).count() == len(rows)
    assert out.filter(F.col("a").isNull() & F.col("b").isNull()).count() == len(rows)


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_dedup_clusters_matches_union_find(spark, edges):
    """dedup_clusters (iterative min-label propagation) must agree with
    a driver-side union-find on arbitrary small graphs."""
    from rdsa_utils_spark.operators.dedup import dedup_clusters

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # canonical representative = min node id per component
    comp: dict[int, list[int]] = {}
    for n, r in expected.items():
        comp.setdefault(find(r), []).append(n)
    want = {n: min(m) for r, m in comp.items() for n in m}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in dedup_clusters(df).collect()}
    assert got == want


# --------------------------------------------------------------- SCD2

scd_updates_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),                  # key
        st.sampled_from(["a", "b", "c"]),                       # attr value
        st.integers(min_value=1, max_value=28),                 # eff day
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda t: (t[0], t[2]),  # unique (key, effective) per batch
)


@given(upd_rows=scd_updates_strategy)
@settings(**SETTINGS)
def test_scd2_chain_invariants(spark, upd_rows):
    """For ANY update stream: per key the version intervals tile (each
    valid_to equals the next valid_from), exactly one version is
    current, no zero-length or overlapping intervals, and consecutive
    versions always differ in the tracked attribute."""
    from rdsa_utils_spark.operators.scd import END_OF_TIME, scd2_apply, scd2_init

    base = spark.createDataFrame(
        [(1, "z"), (2, "z"), (3, "z")], "k long, tier string",
    )
    dim = scd2_init(base, "2023-12-01 00:00:00")
    upd = spark.createDataFrame(
        [(k, v, f"2024-01-{d:02d} 00:00:00") for k, v, d in upd_rows],
        "k long, tier string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    out = scd2_apply(dim, upd, ["k"], ["tier"], "eff")
    chains = {}
    for r in out.orderBy("k", "valid_from").collect():
        chains.setdefault(r.k, []).append(r)
    assert set(chains) == {1, 2, 3}
    for k, chain in chains.items():
        assert sum(1 for r in chain if r.is_current) == 1
        assert chain[-1].is_current and str(chain[-1].valid_to) == END_OF_TIME
        for a, b in zip(chain, chain[1:]):
            assert a.valid_to == b.valid_from     # tiling, no gaps/overlap
            assert a.valid_from < a.valid_to      # no zero-length version
            assert a.tier != b.tier               # no-op updates dropped


@given(upd_rows=scd_updates_strategy)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_batch_split_equivalence(spark, upd_rows):
    """Replay determinism, per the scd2_apply contract: (a) an
    event-time-ordered prefix/suffix split with default no-op
    dropping equals one-shot application; (b) an ARBITRARY
    (out-of-order) split equals one-shot when drop_unchanged=False
    (nothing is discarded, so no interleave can lose information)."""
    from rdsa_utils_spark.operators.scd import scd2_apply, scd2_init

    base = spark.createDataFrame([(1, "z"), (2, "z"), (3, "z")], "k long, tier string")
    dim = scd2_init(base, "2023-12-01 00:00:00")
    rows = [(k, v, f"2024-01-{d:02d} 00:00:00") for k, v, d in upd_rows]

    def mk(rs):
        df = spark.createDataFrame(rs, "k long, tier string, eff string")
        return df.withColumn("eff", F.col("eff").cast("timestamp"))

    def snap(df):
        return sorted(
            (r.k, r.tier, str(r.valid_from), str(r.valid_to), r.is_current)
            for r in df.collect()
        )

    if not rows:
        return

    # (a) in-time-order split, default dedup.
    ordered = sorted(rows, key=lambda r: r[2])
    cut = len(ordered) // 2
    stepwise = scd2_apply(
        scd2_apply(dim, mk(ordered[:cut]), ["k"], ["tier"], "eff"),
        mk(ordered[cut:]), ["k"], ["tier"], "eff",
    )
    oneshot = scd2_apply(dim, mk(ordered), ["k"], ["tier"], "eff")
    assert snap(stepwise) == snap(oneshot)

    # (b) arbitrary (generation-order) split, nothing dropped.
    cut = len(rows) // 2
    stepwise_all = scd2_apply(
        scd2_apply(dim, mk(rows[:cut]), ["k"], ["tier"], "eff",
                   drop_unchanged=False),
        mk(rows[cut:]), ["k"], ["tier"], "eff", drop_unchanged=False,
    )
    oneshot_all = scd2_apply(
        dim, mk(rows), ["k"], ["tier"], "eff", drop_unchanged=False,
    )
    assert snap(stepwise_all) == snap(oneshot_all)


# ------------------------------------------------------- rolling z-score

series_strategy = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=3, max_size=25,
)


@given(values=series_strategy, win=st.integers(min_value=2, max_value=6))
@settings(**SETTINGS)
def test_rolling_zscore_matches_pandas(spark, values, win):
    """For ANY series: z-scores equal pandas' shifted rolling
    mean/std (the independent reference implementation), including
    the NULL policy for short or zero-variance windows."""
    from rdsa_utils_spark.operators.events import rolling_zscore

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate(values)],
        "g string, t long, v double",
    )
    got = {
        r.t: r.zscore
        for r in rolling_zscore(df, "t", "v", window_rows=win, group_cols=["g"]).collect()
    }
    s = pd.Series([float(v) for v in values])
    trail = s.rolling(window=win, min_periods=1).agg(["mean", "std", "count"]).shift(1)
    for i in range(len(values)):
        mean, sd, cnt = trail.iloc[i]
        if not (cnt >= 2 and sd > 0):
            assert got[i] is None, f"t={i}: expected NULL, got {got[i]}"
        else:
            expect = (values[i] - mean) / sd
            assert got[i] == pytest.approx(expect, rel=1e-9), f"t={i}"


# ------------------------------------------------- round-4 statistics ops

floats_list = st.lists(
    st.floats(min_value=-1000, max_value=1000,
              allow_nan=False, allow_infinity=False),
    min_size=5, max_size=40,
)


@given(vals=floats_list)
@settings(**SETTINGS)
def test_winsorize_matches_numpy_interpolation(spark, vals):
    from rdsa_utils_spark.operators.stats import winsorize

    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
    out = sorted(r.v_winsorized for r in
                 winsorize(df, "v", ["g"], 0.1, 0.9, round_to=None).collect())
    lo, hi = np.percentile(np.array(vals, dtype=float), [10, 90],
                           method="linear")
    expected = sorted(float(np.clip(v, lo, hi)) for v in vals)
    assert out == pytest.approx(expected, rel=1e-9, abs=1e-9)


@given(vals=st.lists(
    st.tuples(st.floats(-100, 100, allow_nan=False),
              st.floats(-100, 100, allow_nan=False)),
    min_size=3, max_size=30,
))
@settings(**SETTINGS)
def test_grouped_linear_fit_matches_numpy(spark, vals):
    from rdsa_utils_spark.operators.stats import grouped_linear_fit

    xs = np.array([v[0] for v in vals])
    ys = np.array([v[1] for v in vals])
    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in vals], "g string, x double, y double",
    )
    r = grouped_linear_fit(df, "x", "y", ["g"], round_to=None).collect()[0]
    if np.var(xs) == 0:
        assert r.slope is None
    else:
        slope, intercept = np.polyfit(xs, ys, 1)
        assert r.slope == pytest.approx(float(slope), rel=1e-6, abs=1e-6)
        assert r.intercept == pytest.approx(float(intercept), rel=1e-6, abs=1e-4)


@given(counts=st.tuples(st.integers(1, 50), st.integers(1, 50),
                        st.integers(1, 50), st.integers(1, 50)))
@settings(**SETTINGS)
def test_js_divergence_symmetric_and_bounded(spark, counts):
    from rdsa_utils_spark.operators.stats import js_divergence

    na_x, na_y, nb_x, nb_y = counts
    a = spark.createDataFrame([("x",)] * na_x + [("y",)] * na_y, "c string")
    b = spark.createDataFrame([("x",)] * nb_x + [("y",)] * nb_y, "c string")
    ab = js_divergence(a, b, "c").collect()[0].jsd
    ba = js_divergence(b, a, "c").collect()[0].jsd
    assert ab == pytest.approx(ba, abs=1e-9)
    assert -1e-9 <= ab <= 1.0 + 1e-9


@given(rows=st.lists(
    st.lists(st.floats(-10, 10, allow_nan=False, allow_infinity=False),
             min_size=3, max_size=3),
    min_size=3, max_size=20,
))
@settings(**SETTINGS)
def test_standardize_dims_moments(spark, rows):
    from rdsa_utils_spark.operators.similarity import standardize_dims

    df = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(rows)],
        "id long, v array<double>",
    )
    z = np.array([r.z_vec for r in
                  standardize_dims(df, "v", round_to=12).orderBy("id").collect()])
    orig = np.array(rows)
    for d in range(3):
        sd = np.std(orig[:, d], ddof=1)
        if sd < 1e-9:
            assert np.allclose(z[:, d], 0.0)
        elif sd >= 1e-3:
            # Moments are rounded to 9 dp by contract, so only
            # non-degenerate dims carry the exact z-score invariants.
            assert abs(z[:, d].mean()) < 1e-3
            assert abs(z[:, d].std(ddof=1) - 1.0) < 1e-3
        else:
            assert np.all(np.isfinite(z[:, d]))


# Docs drawn from a tiny vocabulary so high-Jaccard pairs actually
# occur; duplicate doc_ids collapse via dict.
jaccard_docs_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=15),
    values=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=10,
)


@given(
    docs=jaccard_docs_strategy,
    threshold=st.sampled_from([0.34, 0.5, 0.75, 0.9, 1.0]),
)
@settings(**SETTINGS)
def test_jaccard_join_matches_brute_force(spark, docs, threshold):
    """Prefix filtering must be LOSSLESS for any corpus/threshold:
    identical pair set and identical rounded scores as quadratic
    brute force, including all-identical docs (giant cliques), empty
    docs, and single-token docs where the prefix is the whole set."""
    from rdsa_utils_spark.operators.dedup import jaccard_similarity_join

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_similarity_join(df, "doc_id", "text", threshold).collect()
    }

    toks = {i: set(w) for i, w in docs.items() if w}
    want = {}
    for a in toks:
        for b in toks:
            if a < b:
                j = round(
                    len(toks[a] & toks[b]) / len(toks[a] | toks[b]), 6,
                )
                if j >= threshold:
                    want[(a, b)] = j
    assert got == want


# --------------------------------------------------------------------------
# round-6 drift / information invariants
# --------------------------------------------------------------------------

drift_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),   # value
        st.booleans(),                           # sample flag
    ),
    min_size=2,
    max_size=16,
).filter(lambda rs: any(s for _, s in rs) and any(not s for _, s in rs))


@given(rows=drift_rows)
@settings(**SETTINGS)
def test_ks_bounds_and_symmetry(spark, rows):
    from rdsa_utils_spark.operators.drift import ks_2sample

    df = spark.createDataFrame(rows, "v long, s boolean")
    ks = ks_2sample(df, "v", "s").collect()[0].ks
    assert 0.0 <= ks <= 1.0
    # Swapping the samples leaves D unchanged (|F_A - F_B| symmetry).
    swapped = df.select("v", (~F.col("s")).alias("s"))
    assert ks_2sample(swapped, "v", "s").collect()[0].ks == ks


@given(rows=drift_rows)
@settings(**SETTINGS)
def test_psi_nonnegative_and_zero_on_identity(spark, rows):
    from rdsa_utils_spark.operators.drift import psi

    df = spark.createDataFrame(rows, "v long, s boolean")
    out = psi(df, "v", "s", n_bins=4, lo=0.0, hi=8.0).collect()[0]
    # Every (pb-pa)·ln(pb/pa) term is >= 0, so PSI >= 0 (9-dp term
    # rounding can leave a -0.0-magnitude residue at worst).
    assert out.psi >= -1e-8
    # A frame where B duplicates A exactly gives PSI 0.
    dup = df.filter("s").select("v")
    both = dup.withColumn("s", F.lit(True)).unionByName(
        dup.withColumn("s", F.lit(False)),
    )
    assert abs(psi(both, "v", "s", n_bins=4, lo=0.0, hi=8.0).collect()[0].psi) < 1e-9


cat_rows = st.lists(
    st.tuples(
        st.sampled_from(["x", "y", "z"]),
        st.sampled_from(["u", "v"]),
    ),
    min_size=1,
    max_size=16,
)


@given(rows=cat_rows)
@settings(**SETTINGS)
def test_entropy_and_mi_information_bounds(spark, rows):
    import math

    from rdsa_utils_spark.operators.stats import (
        categorical_entropy,
        mutual_information,
    )

    df = spark.createDataFrame(rows, "x string, y string")
    hx = categorical_entropy(df, "x").collect()[0]
    hy = categorical_entropy(df, "y").collect()[0]
    assert -1e-9 <= hx.entropy <= math.log2(hx.k) + 1e-6
    mi = mutual_information(df, "x", "y").collect()[0].mi
    # 0 <= MI <= min(H(X), H(Y)) up to the 9-dp term quantization.
    assert mi >= -1e-6
    assert mi <= min(hx.entropy, hy.entropy) + 1e-6


@given(rows=cat_rows)
@settings(**SETTINGS)
def test_mi_symmetry(spark, rows):
    from rdsa_utils_spark.operators.stats import mutual_information

    df = spark.createDataFrame(rows, "x string, y string")
    assert (
        mutual_information(df, "x", "y").collect()[0].mi
        == mutual_information(df, "y", "x").collect()[0].mi
    )
