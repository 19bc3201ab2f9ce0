"""Regression tests for the second round-7 review pass (bloom join key
types, partitioned snapshot compaction, disclosure exports, sketch
validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bloom_semi_join_rejects_mismatched_key_types(spark):
    from rdsa_utils_spark.operators.joins import bloom_semi_join

    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1,), (3,)], "k bigint")
    with pytest.raises(ValueError, match="key types must match"):
        bloom_semi_join(left, right, "k")
    # same types still works end-to-end
    right_ok = right.select(F.col("k").cast("int"))
    got = {r["k"] for r in bloom_semi_join(left, right_ok, "k").collect()}
    assert got == {1}


def test_compact_snapshot_preserves_partition_layout(spark, tmp_path):
    import os

    from rdsa_utils_spark.sources.versioned import (
        compact_snapshot,
        read_snapshot,
        snapshot_history,
        write_snapshot,
    )

    root = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(200)],
        "id long, part string, v double",
    ).repartition(16)
    write_snapshot(df, root, partition_by=["part"])
    v = compact_snapshot(spark, root, target_file_mb=256)
    hist = {h["version"]: h for h in snapshot_history(root)}
    # a fresh 16-file write compacts into a new version…
    assert v == 2
    # …whose directory keeps the hive partition layout
    vdir = os.path.join(root, hist[v]["dir"])
    subdirs = {d for d in os.listdir(vdir) if d.startswith("part=")}
    assert subdirs == {"part=a", "part=b"}
    back = read_snapshot(spark, root)
    assert back.count() == 200
    assert {r["part"] for r in back.select("part").distinct().collect()} == {
        "a",
        "b",
    }
    # already-compact: the second call is a no-op returning CURRENT
    assert compact_snapshot(spark, root, target_file_mb=256) == v
    assert len(snapshot_history(root)) == 2


def test_compact_snapshot_partitioned_reaches_per_dir_floor(spark, tmp_path):
    """The round-7b bug: a flat glob saw 0 bytes under col=value/ dirs.
    With several files per partition dir, compaction must actually run
    (recursive walk sees them) and land at the per-directory floor —
    and a snapshot already AT the floor must be a no-op, not an
    endless re-compaction loop."""
    import glob
    import os

    from rdsa_utils_spark.sources.versioned import (
        compact_snapshot,
        snapshot_history,
        write_snapshot,
    )

    root = str(tmp_path / "snap2")
    df = spark.createDataFrame(
        [(i, str(i % 3)) for i in range(30)], "id long, part string",
    ).repartition(4)
    write_snapshot(df, root, partition_by=["part"])
    v = compact_snapshot(spark, root, target_file_mb=256)
    assert v == 2
    hist = {h["version"]: h for h in snapshot_history(root)}
    files = glob.glob(
        os.path.join(root, hist[v]["dir"], "part=*", "*.parquet"),
    )
    assert len(files) == 3  # one file per partition dir — the floor
    # at the floor: no-op forever after
    assert compact_snapshot(spark, root, target_file_mb=256) == v
    assert len(snapshot_history(root)) == 2


def test_l_diversity_exported_in_star_import():
    import rdsa_utils_spark.operators.disclosure as d

    assert "l_diversity_violations" in d.__all__
    assert callable(getattr(d, "l_diversity_violations"))


def test_windowed_quantile_sketch_validates_accuracy(spark):
    from rdsa_utils_spark.streaming.sketches import windowed_quantile_sketch

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0)], "ts string, v double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
    with pytest.raises(ValueError, match="accuracy"):
        windowed_quantile_sketch(df, "ts", "1 hour", "v", accuracy=0)
