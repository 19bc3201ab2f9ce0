"""Round-10 adversarial-shape tests (round-9 verdict task 7): SQ8
quantization on a corpus with CONSTANT dimensions (per-dimension range
0 → step 0, the degenerate case the codec guard must absorb), and the
contamination gate with a reference too large for AQE to broadcast
(forced by a 1-byte autoBroadcastJoinThreshold) — correctness must not
depend on the join strategy AQE picks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- SQ8 degenerate dims

def _corpus(spark):
    # dim 0 varies, dim 1 is CONSTANT (=7.5), dim 2 constant at 0.0
    rows = [(i, [float(i), 7.5, 0.0]) for i in range(8)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sq8_constant_dimension_round_trip(spark):
    """step=0 dims must quantize to code 0 and reconstruct EXACTLY
    (lo + 0·0 = lo) — not NaN/divide-by-zero under ANSI mode."""
    from rdsa_utils_spark.operators.similarity import (
        sq8_dequantize_expr,
        sq8_quantize,
        sq8_train,
    )

    corpus = _corpus(spark)
    params = sq8_train(corpus, "embedding")
    assert params[1] == (7.5, 0.0)  # constant dim: lo=value, step=0
    assert params[2] == (0.0, 0.0)
    coded = sq8_quantize(corpus, params, "embedding", "codes")
    got = coded.select(
        "vec_id", "codes",
        sq8_dequantize_expr("codes", params).alias("recon"),
    ).orderBy("vec_id").collect()
    for r in got:
        assert r["codes"][1] == 0 and r["codes"][2] == 0
        assert r["recon"][1] == 7.5  # exact: lo + 0*0
        assert r["recon"][2] == 0.0


def test_sq8_topk_all_constant_corpus(spark):
    """Fully degenerate corpus (EVERY dim constant): all vectors
    reconstruct identically; top-k must still return k rows per query
    with deterministic tie-broken ordering, not crash on a 0-norm."""
    from rdsa_utils_spark.operators.similarity import sq8_topk, sq8_train

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(6)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>",
    )
    params = sq8_train(corpus, "embedding")
    assert all(st == 0.0 for _, st in params)
    got = sq8_topk(corpus, corpus, params, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r[0], []).append(r)
    assert all(len(v) == 3 for v in by_q.values())


# ------------------------------- contamination gate past the broadcast cap

def test_contamination_gate_correct_when_reference_cannot_broadcast(
    spark, tmp_path,
):
    """With autoBroadcastJoinThreshold=1 byte AQE cannot broadcast the
    pinned reference hash set, so the probe join falls back to a
    shuffle strategy — admitted/rejected sets must be IDENTICAL to the
    broadcast plan's (strategy-independence of the gate)."""
    from rdsa_utils_spark.streaming.quality import (
        write_stream_contamination_gate,
    )

    reference = spark.createDataFrame(
        [(i, f"benchmark question {i} the quick brown fox jumps over "
             f"the lazy dog variant {i} zulu")
         for i in range(50)],
        "id long, text string",
    )
    src = str(tmp_path / "feed")
    spark.createDataFrame(
        [(100, "benchmark question 7 the quick brown fox jumps over "
               "the lazy dog variant 7 zulu plus trailing words"),
         (101, "a completely fresh training document with none of the "
               "reference material inside it at all today")],
        "id long, text string",
    ).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try:
        stream = spark.readStream.schema("id long, text string").parquet(src)
        q = write_stream_contamination_gate(
            stream, reference, "id", "text",
            str(tmp_path / "adm"), str(tmp_path / "ckpt"),
            n=8, reject_path=str(tmp_path / "rej"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    admitted = {r["id"] for r in spark.read.parquet(str(tmp_path / "adm")).collect()}
    rejected = {r["id"] for r in spark.read.parquet(str(tmp_path / "rej")).collect()}
    assert admitted == {101}
    assert rejected == {100}


def test_batch_contamination_correct_when_reference_cannot_broadcast(spark):
    """Same strategy-independence pin for batch ngram_contamination:
    shrink the broadcast threshold to 1 byte and compare against the
    default-plan result row for row."""
    from rdsa_utils_spark.operators.dedup import ngram_contamination

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "totally different words that never touch the reference")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    base = sorted(
        tuple(r) for r in ngram_contamination(corpus, ref, n=8).collect()
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try:
        forced = sorted(
            tuple(r) for r in ngram_contamination(corpus, ref, n=8).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert base == forced
