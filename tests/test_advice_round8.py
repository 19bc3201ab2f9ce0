"""Regression tests for the round-7 ADVICE findings fixed in round 8:
truncate_normalize's short-vector guard, compact_snapshot's
per-partition file sizing, neyman_sample's NULL-stratum draw, the
price-index decimal price mean, and isotonic_calibrate's knot ceiling.
(The checkpoint-reset refusal is covered in
test_round8_bucketed_state.py.)"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_truncate_normalize_raises_on_short_vectors(spark):
    from rdsa_utils_spark.operators.similarity import truncate_normalize

    ok = spark.createDataFrame(
        [(1, [3.0, 4.0, 0.0])], "id long, embedding array<double>",
    )
    got = truncate_normalize(ok, dim=2).collect()[0]["embedding"]
    assert got == pytest.approx([0.6, 0.8])

    short = spark.createDataFrame(
        [(1, [3.0, 4.0, 0.0]), (2, [1.0])], "id long, embedding array<double>",
    )
    # F.slice alone would silently pass the dim-1 vector through; the
    # assert_true guard must surface it instead of mixing dimensions.
    with pytest.raises(Exception, match="shorter than dim"):
        truncate_normalize(short, dim=2).collect()

    # ...but a NULL vector is a missing embedding, not a length
    # violation: it must pass through as NULL, not kill the job
    # (assert_true raises on NULL conditions — review finding).
    with_null = spark.createDataFrame(
        [(1, [3.0, 4.0, 0.0]), (2, None)], "id long, embedding array<double>",
    )
    got = {r["id"]: r["embedding"]
           for r in truncate_normalize(with_null, dim=2).collect()}
    assert got[2] is None and got[1] == pytest.approx([0.6, 0.8])


def test_compact_snapshot_honors_target_mb_per_partition(spark, tmp_path):
    from rdsa_utils_spark.sources.versioned import (
        compact_snapshot,
        read_snapshot,
        write_snapshot,
    )

    root = str(tmp_path / "snap")
    # skewed: partition a has 40k rows, partition b has 100 — written
    # as many small files to give compaction something to merge
    big = spark.range(40_000).select(
        F.lit("a").alias("part"),
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    small = spark.range(100).select(
        F.lit("b").alias("part"),
        (F.col("id") + 50_000).alias("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    df = big.unionByName(small).repartition(16)
    write_snapshot(df, root, partition_by=["part"])

    before = read_snapshot(spark, root)
    n_before = before.count()
    # tiny target => the skewed partition MUST split into several
    # files, each written by its own task — not one giant file
    v = compact_snapshot(spark, root, target_file_mb=1)
    vdir = f"{root}/v{v:05d}"
    files_a = [
        f for f in os.listdir(f"{vdir}/part=a") if f.endswith(".parquet")
    ]
    files_b = [
        f for f in os.listdir(f"{vdir}/part=b") if f.endswith(".parquet")
    ]
    assert len(files_a) >= 2, "skewed partition collapsed to one file"
    assert len(files_b) >= 1
    after = read_snapshot(spark, root)
    assert after.count() == n_before
    assert sorted(r["id"] for r in after.collect()) == sorted(
        r["id"] for r in before.collect()
    )


def test_neyman_sample_draws_from_null_stratum(spark):
    from rdsa_utils_spark.operators.sampling import neyman_sample

    rows = (
        [("a", float(i % 7), i) for i in range(60)]
        + [(None, float(i % 11) * 3.0, 1000 + i) for i in range(60)]
    )
    df = spark.createDataFrame(rows, "seg string, val double, id long")
    alloc, sample = neyman_sample(df, "seg", "val", "id", total_n=30)
    arows = {r["stratum"]: r for r in alloc.collect()}
    assert None in arows and arows[None]["n_alloc"] > 0
    got_null = [r for r in sample.collect() if r["seg"] is None]
    # the fixed null-safe join actually delivers the allocated rows
    assert len(got_null) == arows[None]["n_alloc"]


def test_price_mean_is_accumulation_order_invariant(spark):
    from rdsa_utils_spark.operators.stats import tornqvist_index

    import random

    rng = random.Random(8)
    rows = [
        (p, i, round(rng.uniform(0.01, 999.99), 2), 1.0 + (i % 3))
        for p in (0, 1)
        for i in range(40)
        for _ in range(25)
    ]
    df = spark.createDataFrame(rows, "yr int, item int, p double, q double")
    one = tornqvist_index(
        df.coalesce(1), "yr", "item", "p", "q", 0,
    ).collect()
    many = tornqvist_index(
        df.repartition(13), "yr", "item", "p", "q", 0,
    ).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_isotonic_calibrate_enforces_knot_ceiling(spark):
    from rdsa_utils_spark.operators.classify import isotonic_calibrate

    df = spark.range(500).select(
        (F.col("id").cast("double") / 500).alias("s"),
        (F.col("id") % 2).alias("y"),
    )
    with pytest.raises(ValueError, match="max_knots"):
        isotonic_calibrate(df, "s", "y", max_knots=100)
    # unchanged under the ceiling: fit still monotone
    out = isotonic_calibrate(df, "s", "y", score_round=1).collect()
    cals = [r["p_cal"] for r in sorted(out, key=lambda r: r["score"])]
    assert cals == sorted(cals)
