"""Round-9 tests for the streaming benchmark-decontamination gate
(streaming/quality.write_stream_contamination_gate): live two-batch
run == the batch ngram_contamination composition on the union, the
reject audit trail, blank-doc admission, construction refusals, and
the checkpoint-reset guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.dedup import ngram_contamination
from rdsa_utils_spark.streaming.quality import write_stream_contamination_gate

SCHEMA = "doc_id long, text string"

BENCH = [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
# id 1: a verbatim benchmark 8-gram inside novel text -> contaminated
LEAK = (
    "alpha beta gamma delta epsilon zeta eta theta "
    "completely different continuation words here"
)
FRESH = "one two three four five six seven eight nine ten eleven"
FRESH2 = "red orange yellow green blue indigo violet ultraviolet infrared"


def _run(spark, src, path, rej, ckpt, ref, thr=0.0):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_contamination_gate(
        stream, ref, "doc_id", "text", path, ckpt,
        max_contamination=thr, reject_path=rej,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_gate_matches_batch_composition(spark, tmp_path):
    ref = spark.createDataFrame(BENCH, SCHEMA)
    src = str(tmp_path / "feed")
    path = str(tmp_path / "pass")
    rej = str(tmp_path / "rej")
    ckpt = str(tmp_path / "ckpt")

    b1 = [(1, LEAK), (2, FRESH)]
    b2 = [(3, ""), (4, FRESH2), (5, LEAK + " more")]

    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(src)
    _run(spark, src, path, rej, ckpt, ref)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode(
        "append",
    ).parquet(src)
    _run(spark, src, path, rej, ckpt, ref)

    admitted = {r["doc_id"] for r in spark.read.parquet(path).collect()}
    rejected = {r["doc_id"] for r in spark.read.parquet(rej).collect()}
    # batch composition on the union: scored docs above 0.0 reject,
    # unscored (no-shingle) docs admit
    union = spark.createDataFrame(b1 + b2, SCHEMA)
    scored = {
        r["doc_id"]: r["contamination"]
        for r in ngram_contamination(union, ref, n=8).collect()
    }
    want_reject = {d for d, c in scored.items() if c > 0.0}
    assert rejected == want_reject
    assert admitted == {1, 2, 3, 4, 5} - want_reject
    assert 3 in admitted  # blank doc: no shingles -> admit
    # audit columns ride along on both sinks
    for p in (path, rej):
        cols = spark.read.parquet(p).columns
        assert {"n_shingles", "n_contaminated", "contamination"} <= set(cols)
    # blank doc's audit: zero shingles scored nothing -> NULLs
    blank = [r for r in spark.read.parquet(path).collect() if r["doc_id"] == 3]
    assert blank[0]["contamination"] is None


def test_stream_gate_threshold_admits_partial_overlap(spark, tmp_path):
    ref = spark.createDataFrame(BENCH, SCHEMA)
    src = str(tmp_path / "feed")
    path = str(tmp_path / "pass")
    spark.createDataFrame([(1, LEAK)], SCHEMA).write.parquet(src)
    # LEAK has 1 contaminated shingle out of several -> small fraction;
    # a permissive threshold admits it
    _run(spark, src, path, None, str(tmp_path / "c"), ref, thr=0.5)
    assert {r["doc_id"] for r in spark.read.parquet(path).collect()} == {1}


def test_gate_construction_refusals(spark, tmp_path):
    src = str(tmp_path / "feed")
    spark.createDataFrame([(1, FRESH)], SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    empty_ref = spark.createDataFrame([(9, ""), (10, None)], SCHEMA)
    with pytest.raises(ValueError, match="empty reference"):
        write_stream_contamination_gate(
            stream, empty_ref, "doc_id", "text",
            str(tmp_path / "p"), str(tmp_path / "c"),
        )
    ref = spark.createDataFrame(BENCH, SCHEMA)
    with pytest.raises(ValueError, match="max_contamination"):
        write_stream_contamination_gate(
            stream, ref, "doc_id", "text",
            str(tmp_path / "p"), str(tmp_path / "c"), max_contamination=1.5,
        )
    tainted = spark.readStream.schema(
        SCHEMA + ", contamination double",
    ).parquet(src)
    with pytest.raises(ValueError, match="contamination"):
        write_stream_contamination_gate(
            tainted, ref, "doc_id", "text",
            str(tmp_path / "p"), str(tmp_path / "c"),
        )


def test_gate_refuses_checkpoint_reset(spark, tmp_path):
    ref = spark.createDataFrame(BENCH, SCHEMA)
    src = str(tmp_path / "feed")
    path = str(tmp_path / "pass")
    spark.createDataFrame([(1, FRESH)], SCHEMA).write.parquet(src)
    spark.createDataFrame([(9, FRESH)], SCHEMA).write.parquet(
        f"{path}/__batch__=5",
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_contamination_gate(
        stream, ref, "doc_id", "text", path, str(tmp_path / "fresh_ckpt"),
    )
    with pytest.raises(Exception, match="checkpoint"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
