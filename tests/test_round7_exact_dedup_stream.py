"""Live test for the round-7 streaming exact-duplicate gate
(streaming/dedup.write_stream_exact_dedup): within-batch min-id
dedup, whole-corpus cross-batch memory, and agreement with the batch
dedup_against_corpus/exact_dedup composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.streaming.dedup import write_stream_exact_dedup

SCHEMA = "id long, text string"


def _run(spark, src, path, state, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_exact_dedup(
        stream, "text", "id", path, state, ckpt,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_exact_gate_two_batches(spark, tmp_path):
    src = str(tmp_path / "feed")
    path = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: 1 and 2 identical (normalized), 3 distinct
    b1 = spark.createDataFrame(
        [(1, "Hello   world"), (2, "hello world"), (3, "other text")],
        SCHEMA,
    )
    # batch 1: 4 duplicates the admitted 1 (cross-batch, far apart),
    # 5 is new, 6 duplicates 5 within the batch
    b2 = spark.createDataFrame(
        [(4, "HELLO WORLD"), (5, "brand new"), (6, "brand  NEW")],
        SCHEMA,
    )
    b1.coalesce(1).write.parquet(src)
    _run(spark, src, path, state, ckpt)
    assert {r["id"] for r in spark.read.parquet(path).collect()} == {1, 3}

    b2.coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, path, state, ckpt)
    out = spark.read.parquet(path)
    assert {r["id"] for r in out.collect()} == {1, 3, 5}
    # fingerprint column retained for audit; store holds 3 digests
    assert "fingerprint" in out.columns
    fps = spark.read.parquet(f"{state}/fps")
    assert fps.select("fingerprint").distinct().count() == 3

    # batch-machinery agreement on the union
    from rdsa_utils_spark.operators.dedup import exact_dedup

    batch_kept = {
        r["id"] for r in exact_dedup(b1.unionByName(b2), "text", "id").collect()
    }
    assert batch_kept == {1, 3, 5}


def test_exact_gate_state_compaction_roundtrip(spark, tmp_path):
    from rdsa_utils_spark.streaming.dedup import (
        compact_near_dedup_state,
        recover_near_dedup_state,
    )

    src = str(tmp_path / "feed")
    path = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    for i, txt in enumerate(["a a", "b b", "c c"]):
        spark.createDataFrame([(i, txt)], SCHEMA).coalesce(1).write.mode(
            "append",
        ).parquet(src)
        _run(spark, src, path, state, ckpt)
    assert recover_near_dedup_state(state, kinds=("fps",)).endswith("clean")
    reclaimed = compact_near_dedup_state(spark, state, kinds=("fps",))
    assert reclaimed == 1  # batches 0,1 merged; newest untouched
    # a duplicate of batch-0 content still gates out after compaction
    spark.createDataFrame([(9, "A  a")], SCHEMA).coalesce(1).write.mode(
        "append",
    ).parquet(src)
    _run(spark, src, path, state, ckpt)
    assert 9 not in {r["id"] for r in spark.read.parquet(path).collect()}
