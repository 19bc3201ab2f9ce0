"""Tests for plans/layout.py — z-order (Morton) clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.plans.layout import (
    column_ranges,
    zorder_key,
    zorder_repartition,
)
from rdsa_utils_spark.sources.readers import read_parquet

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem(spark):
    return read_parquet(spark, f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity",
    )


def _python_morton(vals, ranges, bits):
    """Independent reference: clamp → scale → interleave in Python."""
    cols = list(ranges)
    top = (1 << bits) - 1
    key = 0
    for j, c in enumerate(cols):
        lo, hi = ranges[c]
        frac = (min(max(float(vals[c]), lo), hi) - lo) / (hi - lo)
        s = round(frac * top)
        for b in range(bits):
            key += ((s >> b) & 1) << (b * len(cols) + j)
    return key


def test_zorder_key_matches_python_reference(spark, lineitem):
    ranges = {"l_orderkey": (1.0, 60000.0), "l_partkey": (1.0, 2000.0)}
    sample = (
        lineitem.withColumn("zkey", zorder_key(ranges, bits=8))
        .orderBy("l_orderkey", "l_partkey", "l_quantity")
        .limit(50)
        .collect()
    )
    for r in sample:
        expect = _python_morton(
            {"l_orderkey": r.l_orderkey, "l_partkey": r.l_partkey}, ranges, 8,
        )
        assert r.zkey == expect, (r.l_orderkey, r.l_partkey)


def test_zorder_repartition_preserves_rows(spark, lineitem):
    ranges = column_ranges(lineitem, ["l_orderkey", "l_partkey"])
    out = zorder_repartition(lineitem, ranges, 16)
    assert out.columns == lineitem.columns
    assert out.exceptAll(lineitem).isEmpty()
    assert lineitem.exceptAll(out).isEmpty()


def test_zorder_improves_per_partition_locality(spark, lineitem):
    """The data-skipping proxy: per-partition normalized (max-min)
    span, averaged over partitions, for BOTH clustered columns. Hash
    partitioning spans ~the full range everywhere; z-order must cut
    the combined span by at least 2×."""
    ranges = column_ranges(lineitem, ["l_orderkey", "l_partkey"])

    def mean_span(df):
        spans = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                F.min("l_orderkey").alias("olo"), F.max("l_orderkey").alias("ohi"),
                F.min("l_partkey").alias("plo"), F.max("l_partkey").alias("phi"),
            )
        )
        (olo, ohi), (plo, phi) = ranges["l_orderkey"], ranges["l_partkey"]
        [row] = spans.agg(
            F.avg(
                (F.col("ohi") - F.col("olo")) / F.lit(float(ohi - olo))
                + (F.col("phi") - F.col("plo")) / F.lit(float(phi - plo)),
            ).alias("s"),
        ).collect()
        return row.s

    hashed = mean_span(lineitem.repartition(16, "l_orderkey"))
    zordered = mean_span(zorder_repartition(lineitem, ranges, 16))
    assert zordered < 0.5 * hashed, (zordered, hashed)


def test_zorder_key_overflow_guard(spark):
    with pytest.raises(ValueError, match="overflows"):
        zorder_key({"a": (0, 1), "b": (0, 1), "c": (0, 1)}, bits=22)


def test_zorder_plan_is_jvm_only(spark, lineitem):
    ranges = {"l_orderkey": (1.0, 60000.0), "l_partkey": (1.0, 2000.0)}
    out = zorder_repartition(lineitem, ranges, 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "InPandas" not in plan
