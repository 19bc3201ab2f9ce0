"""Live test for the round-7 streaming near-duplicate gate
(streaming/dedup.write_stream_near_dedup): within-batch LSH+verify
dedup, cross-batch probe of the admitted-corpus MinHash store, blank
passthrough — and agreement with the batch near-dedup on the union."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdsa_utils_spark.streaming.dedup import write_stream_near_dedup


def _text(words):
    return " ".join(words)


BASE = [f"w{i}" for i in range(40)]
OTHER = [f"x{i}" for i in range(40)]
THIRD = [f"y{i}" for i in range(40)]

DOC_A = _text(BASE)                       # id 1 — admitted batch 0
DOC_B = _text(BASE[:-1] + ["zz"])         # id 2 — near-dup of A, same batch
DOC_C = _text(OTHER)                      # id 3 — distinct
DOC_D = _text(BASE[:-1] + ["qq"])         # id 4 — near-dup of A, NEXT batch
DOC_E = _text(THIRD)                      # id 5 — new distinct
DOC_F = _text(THIRD[:-1] + ["rr"])        # id 6 — near-dup of E, same batch
DOC_G = ""                                # id 7 — blank: bypasses the gate

SCHEMA = "id long, text string"


def _run_batch(spark, src, path, state, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_near_dedup(
        stream, "text", "id", path, state, ckpt,
        jaccard_threshold=0.8,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_near_dedup_gate_two_batches(spark, tmp_path):
    src = str(tmp_path / "feed")
    path = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, DOC_C)], SCHEMA,
    )
    b2 = spark.createDataFrame(
        [(4, DOC_D), (5, DOC_E), (6, DOC_F), (7, DOC_G)], SCHEMA,
    )

    b1.coalesce(1).write.parquet(src)
    _run_batch(spark, src, path, state, ckpt)
    got1 = {r["id"] for r in spark.read.parquet(path).collect()}
    assert got1 == {1, 3}  # B dropped within its own batch

    b2.coalesce(1).write.mode("append").parquet(src)
    _run_batch(spark, src, path, state, ckpt)
    out = spark.read.parquet(path)
    got2 = {r["id"] for r in out.collect()}
    # D dropped against the store (cross-batch), F within-batch,
    # blank G passes through.
    assert got2 == {1, 3, 5, 7}

    # The state store holds signatures for exactly the admitted,
    # non-blank docs.
    sig_ids = {r["id"] for r in spark.read.parquet(f"{state}/sigs").collect()}
    assert sig_ids == {1, 3, 5}

    # Batch-machinery agreement: one-shot near-dedup over the union
    # keeps the same document set (the gate is its incremental form).
    from rdsa_utils_spark.operators.dedup import minhash_near_dedup

    batch_kept = {
        r["id"]
        for r in minhash_near_dedup(
            b1.unionByName(b2), "text", "id", jaccard_threshold=0.8,
        ).collect()
    }
    assert batch_kept == got2

    # Every output row lands in a __batch__ partition (replay
    # overwrites its own partition — idempotence by construction).
    assert "__batch__" in out.columns


def test_near_dedup_gate_validates_threshold(spark, tmp_path):
    src = str(tmp_path / "feed")
    spark.createDataFrame([(1, DOC_A)], SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    import pytest

    with pytest.raises(ValueError, match="jaccard_threshold"):
        write_stream_near_dedup(
            stream, "text", "id",
            str(tmp_path / "o"), str(tmp_path / "s"), str(tmp_path / "c"),
            jaccard_threshold=0.0,
        )
