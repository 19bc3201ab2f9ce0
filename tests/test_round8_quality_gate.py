"""Tests for the calibrated quality gate: batch flag semantics
(operators/classify.calibrated_gate) and the streaming composition
(streaming/quality.write_stream_quality_gate) — live two-batch run ==
one-shot batch flags, reject audit trail, checkpoint-reset refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.classify import (
    calibrated_gate,
    isotonic_calibrate,
)
from rdsa_utils_spark.streaming.quality import write_stream_quality_gate

SCHEMA = "id long, score double"


def _calibration(spark):
    # monotone-ish training data on scores 0.0 .. 0.9
    rows = []
    for i in range(10):
        s = i / 10.0
        pos = i  # higher score -> more positives out of 10
        rows += [(s, 1.0)] * pos + [(s, 0.0)] * (10 - pos)
    train = spark.createDataFrame(rows, "score double, y double")
    return isotonic_calibrate(train, "score", "y", score_round=1)


def test_calibrated_gate_batch_semantics(spark):
    cal = _calibration(spark)
    df = spark.createDataFrame(
        [(1, 0.05), (2, 0.45), (3, 0.85), (4, None), (5, -0.5)], SCHEMA,
    )
    out = {r["id"]: r for r in
           calibrated_gate(df, cal, "score", 0.5).collect()}
    assert out[3]["passed"] is True and out[3]["p_cal"] >= 0.5
    assert out[1]["passed"] is False
    # NULL score and below-range score both reject with NULL p_cal
    assert out[4]["passed"] is False and out[4]["p_cal"] is None
    assert out[5]["passed"] is False and out[5]["p_cal"] is None
    with pytest.raises(ValueError, match="threshold"):
        calibrated_gate(df, cal, "score", 1.5)


def test_stream_gate_matches_batch_and_audits_rejects(spark, tmp_path):
    cal = _calibration(spark)
    src = str(tmp_path / "feed")
    path = str(tmp_path / "pass")
    rej = str(tmp_path / "rej")
    ckpt = str(tmp_path / "ckpt")

    b1 = [(1, 0.05), (2, 0.45), (3, 0.85)]
    b2 = [(4, 0.95), (5, 0.15), (6, None)]

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = write_stream_quality_gate(
            stream, cal, "score", 0.5, path, ckpt,
            reject_path=rej, score_round=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(src)
    run()
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode(
        "append",
    ).parquet(src)
    run()

    passed = {r["id"] for r in spark.read.parquet(path).collect()}
    rejected = {r["id"] for r in spark.read.parquet(rej).collect()}
    union = spark.createDataFrame(b1 + b2, SCHEMA)
    want = calibrated_gate(union, cal, "score", 0.5, score_round=1)
    want_pass = {r["id"] for r in want.collect() if r["passed"]}
    assert passed == want_pass
    assert rejected == {r["id"] for r in union.collect()} - want_pass
    # p_cal rides along for audit on both sinks
    assert "p_cal" in spark.read.parquet(path).columns
    assert "p_cal" in spark.read.parquet(rej).columns


def test_stream_gate_refuses_checkpoint_reset(spark, tmp_path):
    cal = _calibration(spark)
    src = str(tmp_path / "feed")
    path = str(tmp_path / "pass")
    spark.createDataFrame([(1, 0.9)], SCHEMA).write.parquet(src)
    # prior run's output exists with a higher batch id; fresh checkpoint
    spark.createDataFrame([(9, 0.9, 0.9)], "id long, score double, p_cal double")\
        .write.parquet(f"{path}/__batch__=3")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_quality_gate(
        stream, cal, "score", 0.5, path, str(tmp_path / "fresh_ckpt"),
        score_round=1,
    )
    with pytest.raises(Exception, match="checkpoint"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_stream_gate_validates_calibration_at_construction(spark, tmp_path):
    src = str(tmp_path / "feed")
    spark.createDataFrame([(1, 0.9)], SCHEMA).write.parquet(src)
    empty_cal = spark.createDataFrame(
        [], "score double, n long, n_pos long, p_cal double",
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    with pytest.raises(ValueError, match="empty calibration"):
        write_stream_quality_gate(
            stream, empty_cal, "score", 0.5,
            str(tmp_path / "p"), str(tmp_path / "c"),
        )
