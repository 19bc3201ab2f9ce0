"""Regression tests for the round-7 self-review findings: type
dispatch in the ks_statistic facade, restored NTZ guard in
attribute_conversions, approx temporal_split NULL-boundary labeling,
loud missing-rel_col in MRR/MAP, payload_near_dups signature reuse and
n_bands=1, and case-insensitive schema lookups."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_ks_statistic_dispatches_on_value_type(spark):
    from rdsa_utils_spark.operators.stats import ks_statistic

    # date columns stay raw-ordered (no cast crash)
    rows = [
        (dt.date(2024, 1, d), "a" if d % 2 else "b") for d in range(1, 11)
    ]
    d = spark.createDataFrame(rows, "v date, grp string")
    out = ks_statistic(d, "v", "grp", left="a", right="b").collect()[0]
    assert out.ks is not None and 0.0 <= out.ks <= 1.0
    # a stray non-numeric string becomes NULL (excluded), not a crash
    s = spark.createDataFrame(
        [("1", "a"), ("2", "a"), ("N/A", "a"), ("3", "b"), ("4", "b")],
        "v string, grp string",
    )
    got = ks_statistic(s, "v", "grp", left="a", right="b").collect()[0]
    assert (got.n_left, got.n_right) == (2, 2)


def test_attribute_conversions_ntz_guard(spark):
    from rdsa_utils_spark.operators.events import attribute_conversions

    df = spark.createDataFrame(
        [("u", 1, "click", dt.datetime(2024, 1, 1))],
        "user string, id long, type string, ts timestamp",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="UTC"):
            attribute_conversions(
                df, ["click"], "purchase", user_col="user", ts_col="ts",
                type_col="type", id_col="id",
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_temporal_split_approx_all_null_labels_rows(spark):
    from rdsa_utils_spark.operators.sampling import temporal_split

    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, ts timestamp",
    )
    got = temporal_split(df, "ts", boundary="approx").collect()
    assert len(got) == 2 and all(r.split == "valid" for r in got)
    exact = temporal_split(df, "ts").collect()
    assert sorted((r.id, r.split) for r in got) == sorted(
        (r.id, r.split) for r in exact
    )


def test_mrr_map_raise_on_missing_named_rel_col(spark):
    from rdsa_utils_spark.operators.evaluate import map_at_k, mrr_at_k

    runs = spark.createDataFrame(
        [("q1", "d1", 1)], "query_id string, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 1)], "query_id string, doc_id string, grade int",
    )
    with pytest.raises(ValueError, match="grad"):
        mrr_at_k(runs, qrels, 10, rel_col="grad")  # typo for 'grade'
    with pytest.raises(ValueError, match="grad"):
        map_at_k(runs, qrels, 10, rel_col="grad")
    # default 'rel' absent stays the documented all-relevant binary form
    assert mrr_at_k(runs, qrels.drop("grade"), 10).collect()[0].mrr == 1.0


def test_payload_near_dups_single_scan_and_one_band(spark):
    from rdsa_utils_spark.operators.multimodal import (
        attach_binary_payload,
        payload_near_dups,
    )

    df = attach_binary_payload(
        spark.createDataFrame(
            [(1, "alpha " * 40), (2, "alpha " * 40), (3, "gamma " * 40)],
            "doc_id long, text string",
        ),
        "text",
    )
    out = payload_near_dups(df, "payload", "doc_id", max_hamming=0, n_bands=1)
    # n_bands=1 == exact signature match; must not overflow the mask
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}
    # the SimHash pipeline runs once: a single ArrowEvalPython node
    plan = (
        payload_near_dups(df, "payload", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") <= 1


def test_case_insensitive_schema_lookups(spark):
    from rdsa_utils_spark.operators.evaluate import cohens_kappa
    from rdsa_utils_spark.operators.sampling import temporal_split

    df = spark.createDataFrame([(1, 1), (0, 0)], "Rater1 int, Rater2 int")
    got = cohens_kappa(df, "rater1", "rater2").collect()[0]
    assert got.n == 2
    ts = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i)) for i in range(10)], "id long, TS timestamp",
    )
    out = temporal_split(ts, "ts", boundary="approx")
    assert out.count() == 10


# ------------------------------------------------- round-7 widening ops


def test_substring_dedup_unaligned_repeat(spark):
    """A 30-token run repeated at a DIFFERENT offset in another doc is
    removed from the later doc (the case block-aligned span_dedup
    misses); within-doc periodic repeats keep only the first period."""
    from rdsa_utils_spark.operators.dedup import substring_dedup

    run = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, "alpha " + run),
            (2, "prefix tokens here " + run + " suffix"),  # offset 3, unaligned
            (3, "totally different text " * 5),  # period-3 self repeat
            (4, "short doc"),  # < n tokens: survives whole
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in substring_dedup(df, "doc_id", "text", 10).collect()}
    assert got[1].n_kept == got[1].n_tokens == 31  # first occurrence survives
    assert got[2].dedup_text == "prefix tokens here suffix"
    assert got[3].dedup_text == "totally different text"
    assert got[4].n_kept == 2 and got[4].dedup_text == "short doc"


def test_substring_dedup_blank_and_whole_doc_dup(spark):
    from rdsa_utils_spark.operators.dedup import substring_dedup

    body = " ".join(f"t{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, "   ")], "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in substring_dedup(df, "doc_id", "text", 10).collect()}
    assert rows[1].n_kept == 12
    assert rows[2].n_kept == 0 and rows[2].dedup_text == ""
    assert 3 not in rows  # zero-token docs absent, per contract


def test_cluster_representatives_policies(spark):
    from rdsa_utils_spark.operators.dedup import cluster_representatives

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.1), (5, None)],
        "doc_id long, quality double",
    )
    cl = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5)], "id long, cluster_id long",
    )
    best = sorted(
        r.doc_id for r in cluster_representatives(docs, cl, "quality").collect()
    )
    assert best == [2, 4, 5]  # 2 wins ties by min id; 4 singleton; 5 sole member
    worst = sorted(
        r.doc_id
        for r in cluster_representatives(docs, cl, "quality", keep="min").collect()
    )
    assert worst == [1, 4, 5]


def test_bloom_semi_join_matches_plain_joins(spark):
    from rdsa_utils_spark.operators.joins import bloom_semi_join

    left = spark.createDataFrame(
        [(i, i % 7) for i in range(200)] + [(999, None)], "id long, k int",
    )
    right = spark.createDataFrame([(0,), (3,), (5,)], "k int")
    for how in ("semi", "anti"):
        got = sorted(
            r.id
            for r in bloom_semi_join(
                left, right, "k", how=how, expected_items=100,
            ).collect()
        )
        want = sorted(r.id for r in left.join(right, "k", f"left_{how}").collect())
        assert got == want, how
    # NULL keys: excluded by semi, passed through by anti (plain-join parity)
    anti = bloom_semi_join(left, right, "k", how="anti", expected_items=100)
    assert 999 in {r.id for r in anti.collect()}
    with pytest.raises(ValueError, match="semi"):
        bloom_semi_join(left, right, "k", how="inner")


def test_bloom_semi_join_undersized_filter_still_exact(spark):
    """An undersized filter (high fpp) must still give exact results —
    correctness never depends on the sizing."""
    from rdsa_utils_spark.operators.joins import bloom_semi_join

    left = spark.createDataFrame([(i, i) for i in range(500)], "id long, k long")
    right = spark.createDataFrame([(i * 50,) for i in range(5)], "k long")
    got = sorted(
        r.id
        for r in bloom_semi_join(
            left, right, "k", expected_items=1, fpp=0.5,
        ).collect()
    )
    assert got == [0, 50, 100, 150, 200]


def test_l_diversity_violations(spark):
    from rdsa_utils_spark.operators.disclosure import l_diversity_violations

    rows = [
        ("a", "flu"), ("a", "flu"), ("a", "flu"),      # homogeneous: violates
        ("b", "flu"), ("b", "cold"), ("b", "covid"),   # 3-diverse: passes l=3
        ("c", None), ("c", None),                       # all-NULL: 0 distinct
    ]
    df = spark.createDataFrame(rows, "quasi string, diag string")
    got = {
        r.quasi: (r.n_rows, r.n_distinct_sensitive)
        for r in l_diversity_violations(df, ["quasi"], "diag", 3).collect()
    }
    assert got == {"a": (3, 1), "c": (2, 0)}
    with pytest.raises(ValueError):
        l_diversity_violations(df, ["quasi"], "diag", 1)


def test_compact_snapshot_preserves_rows_and_reduces_files(spark, tmp_path):
    from rdsa_utils_spark.sources.versioned import (
        compact_snapshot,
        read_snapshot,
        rollback_snapshot,
        snapshot_history,
        write_snapshot,
    )

    root = str(tmp_path / "versioned")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    # fragment the first version into many small files
    write_snapshot(df.repartition(64), root)
    import glob

    v1_files = glob.glob(f"{root}/v00001/*.parquet")
    assert len(v1_files) == 64
    v2 = compact_snapshot(spark, root, target_file_mb=256)
    assert v2 == 2
    v2_files = glob.glob(f"{root}/v00002/*.parquet")
    assert len(v2_files) < len(v1_files)
    got = read_snapshot(spark, root)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    hist = snapshot_history(root)
    assert hist[-1]["n_rows"] == 10_000 and hist[-1]["note"] == "compaction"
    # compaction is revertible like any snapshot
    rollback_snapshot(root, 1)
    assert read_snapshot(spark, root).count() == 10_000
