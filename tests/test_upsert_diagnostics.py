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


def test_merge_upsert_crash_leaves_recoverable_copy(spark, tmp_path, monkeypatch):
    """Kill the swap at each step; a complete copy of the data must
    exist somewhere (live, __old__, or stage) after every crash."""
    from rdsa_utils_spark.sources.objectstore import HadoopFileSystemClient

    def run_with_crash(crash_at):
        path = str(tmp_path / f"target_{crash_at}")
        base = spark.createDataFrame([(1, "a", 10)], "k long, v string, ts long")
        merge_upsert(spark, base, path, keys=["k"])
        batch = spark.createDataFrame([(1, "B", 20)], "k long, v string, ts long")

        real_move = HadoopFileSystemClient.move_file
        real_delete = HadoopFileSystemClient.delete_folder
        calls = {"move": 0}

        def crashing_move(self, src, dst):
            calls["move"] += 1
            if calls["move"] == crash_at:
                raise RuntimeError("simulated crash mid-swap")
            return real_move(self, src, dst)

        def crashing_delete(self, p):
            if crash_at == "delete" and p.endswith("__old__"):
                raise RuntimeError("simulated crash before cleanup")
            return real_delete(self, p)

        monkeypatch.setattr(HadoopFileSystemClient, "move_file", crashing_move)
        monkeypatch.setattr(HadoopFileSystemClient, "delete_folder", crashing_delete)
        with pytest.raises(RuntimeError, match="simulated crash"):
            merge_upsert(spark, batch, path, keys=["k"])
        monkeypatch.setattr(HadoopFileSystemClient, "move_file", real_move)
        monkeypatch.setattr(HadoopFileSystemClient, "delete_folder", real_delete)

        # A full readable copy must exist at one of the three locations.
        candidates = [path, path + "__old__", path + "__stage__"]
        copies = []
        for p in candidates:
            try:
                copies.append({r.k: r.v for r in spark.read.parquet(p).collect()})
            except Exception:
                pass
        assert copies, f"no recoverable copy after crash at step {crash_at}"
        assert any(c in ({1: "a"}, {1: "B"}) for c in copies)

    run_with_crash(1)       # crash moving live -> __old__: live intact
    run_with_crash(2)       # crash moving stage -> live: __old__ holds data
    run_with_crash("delete")  # crash deleting __old__: live has new data


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


def test_compact_dataset_reduces_files_keeps_rows(spark, tmp_path):
    from rdsa_utils_spark.sources.writers import compact_dataset

    path = str(tmp_path / "smallfiles")
    # 40 tiny files.
    spark.range(0, 4000).repartition(40).write.parquet(path)
    import glob

    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 30
    original = sorted(r.id for r in spark.read.parquet(path).collect())
    n_files = compact_dataset(spark, path, target_file_size=64 * 1024 * 1024)
    after = len(glob.glob(path + "/*.parquet"))
    assert n_files == after
    assert after < before and after >= 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == original
    # No leftover stage/old dirs.
    import os

    assert not os.path.exists(path + "__stage__")
    assert not os.path.exists(path + "__old__")
    import pytest

    with pytest.raises(FileNotFoundError):
        compact_dataset(spark, str(tmp_path / "missing"))


def test_merge_upsert_partition_pruned(spark, tmp_path):
    """partition_col path: untouched partition directories keep their
    file mtimes (never rewritten), touched ones carry the merge."""
    import os

    path = str(tmp_path / "ptarget")
    base = spark.createDataFrame(
        [(1, "a", 10, 100), (2, "b", 10, 100), (3, "c", 20, 100), (4, "d", 30, 100)],
        "k long, v string, day long, ts long",
    )
    merge_upsert(spark, base, path, keys=["k", "day"], partition_col="day")
    parts = sorted(p for p in os.listdir(path) if p.startswith("day="))
    assert parts == ["day=10", "day=20", "day=30"]

    def mtimes(part):
        d = os.path.join(path, part)
        return {f: os.stat(os.path.join(d, f)).st_mtime_ns for f in os.listdir(d)}

    before_20 = mtimes("day=20")
    before_30 = mtimes("day=30")

    batch = spark.createDataFrame(
        [(2, "B", 10, 200), (5, "e", 40, 200)], "k long, v string, day long, ts long",
    )
    merge_upsert(spark, batch, path, keys=["k", "day"], partition_col="day")

    got = {r.k: (r.v, r.day, r.ts) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", 10, 100), 2: ("B", 10, 200), 3: ("c", 20, 100),
        4: ("d", 30, 100), 5: ("e", 40, 200),
    }
    # untouched partitions: identical files, identical mtimes
    assert mtimes("day=20") == before_20
    assert mtimes("day=30") == before_30
    # no stage/aside leftovers
    leftovers = [p for p in os.listdir(tmp_path) if "__old__" in p or "__stage__" in p]
    assert leftovers == []


def test_merge_upsert_partition_pruned_scan_is_pruned(spark, tmp_path):
    """The existing-side scan must carry a PartitionFilter — untouched
    partitions are pruned before any parquet file is opened."""
    path = str(tmp_path / "ptarget2")
    base = spark.createDataFrame(
        [(i, "x", i % 5, 1) for i in range(50)], "k long, v string, day long, ts long",
    )
    merge_upsert(spark, base, path, keys=["k", "day"], partition_col="day")
    pruned = spark.read.parquet(path).filter(F.col("day").isin([1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]


def test_merge_upsert_partition_pruned_guards(spark, tmp_path):
    path = str(tmp_path / "ptarget3")
    base = spark.createDataFrame([(1, "a", 10, 1)], "k long, v string, day long, ts long")
    merge_upsert(spark, base, path, keys=["k", "day"], partition_col="day")
    null_batch = spark.createDataFrame(
        [(2, "b", None, 1)], "k long, v string, day long, ts long",
    )
    with pytest.raises(ValueError, match="NULL in partition column"):
        merge_upsert(spark, null_batch, path, keys=["k", "day"], partition_col="day")
    # partition_col outside keys: allowed, but warns about stale rows
    batch = spark.createDataFrame([(1, "A", 10, 2)], "k long, v string, day long, ts long")
    with pytest.warns(UserWarning, match="outside keys"):
        merge_upsert(spark, batch, path, keys=["k"], partition_col="day")
