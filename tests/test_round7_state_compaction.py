"""Tests for the near-dedup gate's state-store compaction
(streaming/dedup.compact_near_dedup_state / recover_near_dedup_state):
probe-equivalence after compaction, newest-batch preservation, and
crash-state recovery in both directions."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.streaming.dedup import (
    compact_near_dedup_state,
    recover_near_dedup_state,
)


def _write_state(spark, state, kind, batches):
    # batches: {batch_id: [(id, band, band_hash)]} or sigs rows
    for bid, rows in batches.items():
        if kind == "bands":
            df = spark.createDataFrame(
                rows, "id long, band int, band_hash long",
            )
        else:
            df = spark.createDataFrame(rows, "id long, minhash array<long>")
        df.write.mode("overwrite").parquet(
            f"{state}/{kind}/__batch__={bid}",
        )


def _read_lt(spark, state, kind, before):
    return (
        spark.read.parquet(f"{state}/{kind}")
        .filter(F.col("__batch__") < before)
        .drop("__batch__")
    )


def test_compaction_preserves_probe_view(spark, tmp_path):
    state = str(tmp_path / "state")
    bands = {
        0: [(1, 0, 111), (1, 1, 222)],
        1: [(2, 0, 333)],
        2: [(3, 0, 444)],
        3: [(4, 1, 555)],
    }
    sigs = {b: [(r[0], [1, 2, 3]) for r in rows] for b, rows in bands.items()}
    _write_state(spark, state, "bands", bands)
    _write_state(spark, state, "sigs", sigs)

    before = sorted(
        tuple(r) for r in _read_lt(spark, state, "bands", 4).collect()
    )
    reclaimed = compact_near_dedup_state(spark, state)
    assert reclaimed == 2 * 2  # batches 0,1 merged, per store
    after = sorted(
        tuple(r) for r in _read_lt(spark, state, "bands", 4).collect()
    )
    assert after == before
    # newest batch dir untouched; merged dir labeled second-newest
    dirs = sorted(os.listdir(f"{state}/bands"))
    assert "__batch__=3" in dirs and "__batch__=2" in dirs
    assert "__batch__=0" not in dirs and "__batch__=1" not in dirs
    # a REPLAY of the newest batch (filter < 3) also sees identical rows
    replay = sorted(
        tuple(r) for r in _read_lt(spark, state, "bands", 3).collect()
    )
    want = sorted(tuple(r) for b in (0, 1, 2) for r in bands[b])
    assert replay == want
    # idempotent: nothing left to merge without touching the newest
    assert compact_near_dedup_state(spark, state) == 0


def test_compaction_noop_below_three_batches(spark, tmp_path):
    state = str(tmp_path / "state")
    _write_state(spark, state, "bands", {0: [(1, 0, 1)], 1: [(2, 0, 2)]})
    _write_state(
        spark, state, "sigs", {0: [(1, [1])], 1: [(2, [2])]},
    )
    assert compact_near_dedup_state(spark, state) == 0


def test_recovery_rolls_back_from_pre_plan_crash(spark, tmp_path):
    state = str(tmp_path / "state")
    bands = {0: [(1, 0, 1)], 1: [(2, 0, 2)], 2: [(3, 0, 3)]}
    _write_state(spark, state, "bands", bands)
    # simulate: stage written but crash BEFORE the plan file: nothing
    # has moved, the stage is garbage
    os.makedirs(f"{state}/bands__stage__")
    summary = recover_near_dedup_state(state)
    assert "bands:back" in summary
    assert not os.path.exists(f"{state}/bands__stage__")
    got = sorted(tuple(r) for r in _read_lt(spark, state, "bands", 9).collect())
    assert len(got) == 3


def _stage_and_plan(spark, state, bands, label):
    merged = (
        spark.read.parquet(f"{state}/bands")
        .filter(F.col("__batch__") <= label)
        .drop("__batch__")
    )
    merged.write.parquet(f"{state}/bands__stage__")
    newest = max(bands)
    with open(f"{state}/bands__plan__", "w") as fh:
        fh.write(f"{label}\n{newest}\n")


def test_recovery_rolls_forward_from_post_aside_crash(spark, tmp_path):
    state = str(tmp_path / "state")
    bands = {0: [(1, 0, 1)], 1: [(2, 0, 2)], 2: [(3, 0, 3)]}
    _write_state(spark, state, "bands", bands)
    # simulate: complete stage + plan written, store moved aside, crash
    _stage_and_plan(spark, state, bands, label=1)
    shutil.move(f"{state}/bands", f"{state}/bands__aside__")
    summary = recover_near_dedup_state(state)
    assert "bands:forward" in summary
    dirs = sorted(os.listdir(f"{state}/bands"))
    assert dirs == ["__batch__=1", "__batch__=2"]
    got = sorted(tuple(r) for r in _read_lt(spark, state, "bands", 9).collect())
    assert len(got) == 3
    assert not os.path.exists(f"{state}/bands__aside__")
    assert not os.path.exists(f"{state}/bands__stage__")
    assert not os.path.exists(f"{state}/bands__plan__")


def test_recovery_forward_after_newest_already_moved(spark, tmp_path):
    """The review-found data-loss window: merged dir AND the newest
    batch already moved into the new root, crash just before the
    aside delete. Inferring the label from the aside's remaining ids
    would roll back and destroy the newest batch; the plan file must
    roll forward keeping everything."""
    state = str(tmp_path / "state")
    bands = {0: [(1, 0, 1)], 1: [(2, 0, 2)], 2: [(3, 0, 3)], 3: [(4, 0, 4)]}
    _write_state(spark, state, "bands", bands)
    _stage_and_plan(spark, state, bands, label=2)
    shutil.move(f"{state}/bands", f"{state}/bands__aside__")
    os.makedirs(f"{state}/bands")
    shutil.move(f"{state}/bands__stage__", f"{state}/bands/__batch__=2")
    shutil.move(
        f"{state}/bands__aside__/__batch__=3", f"{state}/bands/__batch__=3",
    )
    summary = recover_near_dedup_state(state)
    assert "bands:forward" in summary
    dirs = sorted(os.listdir(f"{state}/bands"))
    assert dirs == ["__batch__=2", "__batch__=3"]  # newest SURVIVES
    got = sorted(tuple(r) for r in _read_lt(spark, state, "bands", 9).collect())
    assert len(got) == 4
    assert not os.path.exists(f"{state}/bands__aside__")
    assert not os.path.exists(f"{state}/bands__plan__")


def test_recovery_plan_only_means_forward_complete(spark, tmp_path):
    state = str(tmp_path / "state")
    bands = {1: [(2, 0, 2)], 2: [(3, 0, 3)]}
    _write_state(spark, state, "bands", bands)
    with open(f"{state}/bands__plan__", "w") as fh:
        fh.write("1\n2\n")
    summary = recover_near_dedup_state(state)
    assert "bands:forward" in summary
    assert not os.path.exists(f"{state}/bands__plan__")
    assert len(_read_lt(spark, state, "bands", 9).collect()) == 2


def test_recovery_refuses_aside_without_plan(spark, tmp_path):
    state = str(tmp_path / "state")
    _write_state(spark, state, "bands", {0: [(1, 0, 1)]})
    os.makedirs(f"{state}/bands__aside__")
    with pytest.raises(RuntimeError, match="manual inspection"):
        recover_near_dedup_state(state)


def test_gate_refuses_mid_compaction_state(spark, tmp_path):
    from rdsa_utils_spark.streaming.dedup import write_stream_near_dedup

    src = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4")], "id long, text string",
    ).write.parquet(src)
    _write_state(spark, state, "bands", {0: [(1, 0, 1)]})
    os.makedirs(f"{state}/bands__aside__")
    stream = spark.readStream.schema("id long, text string").parquet(src)
    q = write_stream_near_dedup(
        stream, "text", "id",
        str(tmp_path / "out"), state, str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="recover_near_dedup_state"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
