"""Round-11 streaming-gate fault matrix completion (VERDICT r10 task 7):

* concurrent-writer refusal — two gates sharing one ``state_path``
  (each with its OWN checkpoint) must refuse on writer identity; the
  batch-id monotonicity guard reasons only about one writer's history
  and cannot see the second writer,
* torn/partial manifest write — a truncated ``{kind}__manifest__``
  JSON must refuse-don't-guess (a guessed manifest would silently drop
  whole epochs from the admitted corpus),
* torn owner file — same refuse-don't-guess posture,
* crash-restart of the SAME query (same checkpoint) stays allowed.

Protocol documentation lives in streaming/dedup.py's shared-plumbing
comment block (``__owner__`` writer-identity file)."""

from __future__ import annotations

import json

import pytest

from rdsa_utils_spark.streaming.dedup import (
    _claim_state_ownership,
    _load_manifest,
    compact_near_dedup_state,
    state_epoch_census,
    write_stream_exact_dedup,
    write_stream_near_dedup,
)

SCHEMA = "id long, text string"


def _run_exact(spark, src, path, state, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_exact_dedup(stream, "text", "id", path, state, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _run_near(spark, src, path, state, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_near_dedup(
        stream, "text", "id", path, state, ckpt, jaccard_threshold=0.8,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_exact_gate_refuses_second_writer(spark, tmp_path):
    """Gate A claims the store; gate B (own checkpoint, batch ids that
    LOOK like a plausible fresh start to the batch-id guard) must
    refuse on identity before touching any state."""
    src_a = str(tmp_path / "feed_a")
    src_b = str(tmp_path / "feed_b")
    state = str(tmp_path / "state")
    spark.createDataFrame([(1, "alpha"), (2, "beta")], SCHEMA).coalesce(
        1,
    ).write.parquet(src_a)
    spark.createDataFrame([(9, "gamma")], SCHEMA).coalesce(1).write.parquet(src_b)

    _run_exact(spark, src_a, str(tmp_path / "out_a"), state, str(tmp_path / "ck_a"))
    admitted_before = {
        r["id"] for r in spark.read.parquet(str(tmp_path / "out_a")).collect()
    }
    assert admitted_before == {1, 2}

    with pytest.raises(Exception, match="owned by the gate checkpointed"):
        _run_exact(
            spark, src_b, str(tmp_path / "out_b"), state, str(tmp_path / "ck_b"),
        )
    # refusal happened BEFORE any state mutation: A's store is intact
    fps = spark.read.parquet(f"{state}/fps")
    assert fps.count() == 2


def test_near_gate_refuses_second_writer(spark, tmp_path):
    src = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], SCHEMA,
    ).coalesce(1).write.parquet(src)
    _run_near(spark, src, str(tmp_path / "out_a"), state, str(tmp_path / "ck_a"))
    with pytest.raises(Exception, match="owned by the gate checkpointed"):
        _run_near(spark, src, str(tmp_path / "out_b"), state, str(tmp_path / "ck_b"))


def test_same_checkpoint_restart_still_allowed(spark, tmp_path):
    """The claim is identity, not a lease: crash-restarts of the SAME
    query (same checkpoint) pass, and cross-batch memory still works."""
    src = str(tmp_path / "feed")
    path = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "hello world")], SCHEMA).coalesce(1).write.parquet(src)
    _run_exact(spark, src, path, state, ckpt)
    spark.createDataFrame([(2, "HELLO  world"), (3, "fresh")], SCHEMA).coalesce(
        1,
    ).write.mode("append").parquet(src)
    _run_exact(spark, src, path, state, ckpt)
    assert {r["id"] for r in spark.read.parquet(path).collect()} == {1, 3}


def test_ownership_transfer_by_deleting_owner_file(spark, tmp_path):
    """The documented recovery path: retire the old query, delete
    ``__owner__``, and the new query re-claims."""
    src = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    spark.createDataFrame([(1, "alpha")], SCHEMA).coalesce(1).write.parquet(src)
    _run_exact(spark, src, str(tmp_path / "out_a"), state, str(tmp_path / "ck_a"))
    spark.createDataFrame([(2, "beta")], SCHEMA).coalesce(1).write.mode(
        "append",
    ).parquet(src)
    _run_exact(spark, src, str(tmp_path / "out_a"), state, str(tmp_path / "ck_a"))
    (tmp_path / "state" / "__owner__").unlink()
    # new owner starts from a fresh checkpoint at batch 0 — but the
    # store already holds __batch__=0, so the RESET guard now owns the
    # refusal (ownership transfer does not bypass batch-id monotonicity)
    with pytest.raises(Exception, match="checkpoint appears to have been reset"):
        _run_exact(
            spark, src, str(tmp_path / "out_b"), state, str(tmp_path / "ck_b"),
        )


def test_torn_owner_file_refuses(spark, tmp_path):
    state = tmp_path / "state"
    state.mkdir()
    (state / "__owner__").write_text('{"checkpoint_dir": "/x/y"')  # truncated
    with pytest.raises(RuntimeError, match="torn owner write"):
        _claim_state_ownership(spark, str(state), str(tmp_path / "ck"))


def test_torn_manifest_refuses_everywhere(spark, tmp_path):
    """Truncate a real compaction manifest mid-JSON: the gate probe,
    the census, and the direct loader must all refuse with the
    recovery-path message, never probe a guessed epoch list."""
    src = str(tmp_path / "feed")
    path = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    for i, txt in enumerate(["aa bb", "cc dd", "ee ff"]):
        spark.createDataFrame([(i, txt)], SCHEMA).coalesce(1).write.mode(
            "append",
        ).parquet(src)
        _run_exact(spark, src, path, state, ckpt)
    compact_near_dedup_state(
        spark, state, kinds=("fps",), bucket=True, num_buckets=2,
    )
    mpath = tmp_path / "state" / "fps__manifest__"
    full = mpath.read_text()
    assert json.loads(full)["epochs"]  # sanity: a real manifest
    mpath.write_text(full[: len(full) // 2])  # torn write

    with pytest.raises(RuntimeError, match="torn/partial manifest"):
        _load_manifest(spark, state, "fps")
    with pytest.raises(RuntimeError, match="torn/partial manifest"):
        state_epoch_census(spark, state, kinds=("fps",))
    # the gate itself (same checkpoint, so ownership passes) refuses too
    spark.createDataFrame([(99, "gg hh")], SCHEMA).coalesce(1).write.mode(
        "append",
    ).parquet(src)
    with pytest.raises(Exception, match="torn/partial manifest"):
        _run_exact(spark, src, path, state, ckpt)
    # drop any epoch tables the compaction registered, for test isolation
    for t in spark.catalog.listTables():
        if "fps" in t.name:
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
