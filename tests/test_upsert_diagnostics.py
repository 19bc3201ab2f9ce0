"""Tests for sources/writers.py::merge_upsert and
plans/diagnostics.py::key_skew_report."""

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.plans.diagnostics import key_skew_report
from rdsa_utils_spark.sources.writers import merge_upsert


def _read(spark, path):
    return {r.k: (r.v, r.ts) for r in spark.read.parquet(path).collect()}


def test_merge_upsert_creates_then_updates(spark, tmp_path):
    path = str(tmp_path / "target")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ts long",
    )
    merge_upsert(spark, base, path, keys=["k"])
    assert _read(spark, path) == {1: ("a", 10), 2: ("b", 10), 3: ("c", 10)}

    batch = spark.createDataFrame(
        [(2, "B", 20), (4, "d", 20)], "k long, v string, ts long",
    )
    merge_upsert(spark, batch, path, keys=["k"])
    assert _read(spark, path) == {
        1: ("a", 10), 2: ("B", 20), 3: ("c", 10), 4: ("d", 20),
    }


def test_merge_upsert_within_batch_ordering_and_idempotence(spark, tmp_path):
    path = str(tmp_path / "target")
    base = spark.createDataFrame([(1, "a", 10)], "k long, v string, ts long")
    merge_upsert(spark, base, path, keys=["k"])
    # duplicate keys in one batch: order_col descending decides
    batch = spark.createDataFrame(
        [(1, "stale", 20), (1, "fresh", 30)], "k long, v string, ts long",
    )
    merge_upsert(spark, batch, path, keys=["k"], order_col="ts")
    assert _read(spark, path) == {1: ("fresh", 30)}
    # replaying the same batch changes nothing
    merge_upsert(spark, batch, path, keys=["k"], order_col="ts")
    assert _read(spark, path) == {1: ("fresh", 30)}


def test_merge_upsert_rejects_schema_mismatch_and_empty_keys(spark, tmp_path):
    path = str(tmp_path / "target")
    base = spark.createDataFrame([(1, "a", 10)], "k long, v string, ts long")
    merge_upsert(spark, base, path, keys=["k"])
    bad = spark.createDataFrame([(1, "a")], "k long, other string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(spark, bad, path, keys=["k"])
    with pytest.raises(ValueError, match="non-empty"):
        merge_upsert(spark, base, path, keys=[])


def test_key_skew_report_values(spark):
    # 6 a's, 3 b's, 1 c -> total 10, n_keys 3, mean 10/3
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "key string")
    out = key_skew_report(df, "key", top_n=2).collect()
    assert [(r.key, r.key_count) for r in out] == [("a", 6), ("b", 3)]
    top = out[0]
    assert top.share == 0.6
    assert top.skew_ratio == round(6 / (10 / 3), 6)
    with pytest.raises(ValueError):
        key_skew_report(df, [])
