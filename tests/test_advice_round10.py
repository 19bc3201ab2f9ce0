"""Regression tests for the round-9 ADVICE findings fixed in round 10:
driver-side half-up quantization now rounds the SHORTEST decimal repr
(``Decimal(repr(x))``) so midpoint-repr doubles agree with Spark's
``F.round`` (``BigDecimal.valueOf`` semantics); ``logreg_score_expr``
scores NULL text ``sigmoid(bias)`` like the batch path instead of
propagating NULL; ``bench.py`` records its spike-rejection policy in
BENCH_DETAIL metadata; and the streaming contamination gate accepts
``ref_id_col``/``ref_text_col`` for differently-named benchmark frames.
"""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

# -------------------------------------------- midpoint-repr quantization

# Doubles whose SHORTEST repr sits exactly on a round-half-up midpoint
# at the paired dp. For each, Decimal(x) (exact binary expansion) and
# Decimal(repr(x)) round in OPPOSITE directions unless the binary value
# happens to be exactly representable — the canonical trap is 2.675,
# whose binary value is 2.67499999999999982236431605997495353221893310546875.
MIDPOINTS = [
    (2.675, 2),
    (1.005, 2),
    (0.045, 2),
    (8.835, 2),
    (2.5, 0),
    (0.125, 2),          # dyadic: exactly representable, still a midpoint
    (1.0000000005, 9),
    (-2.675, 2),         # HALF_UP is away-from-zero on negatives too
]


def test_round_half_up_matches_spark_f_round(spark):
    """classify._round_half_up and preference._dq must quantize exactly
    like Spark's F.round on doubles — including repr-midpoint ties
    (ADVICE r9 medium: Decimal(x) diverged there)."""
    from rdsa_utils_spark.operators.classify import _round_half_up
    from rdsa_utils_spark.operators.preference import _dq

    row = spark.range(1).select(
        *[
            F.round(F.lit(x).cast("double"), nd).alias(f"r{i}")
            for i, (x, nd) in enumerate(MIDPOINTS)
        ],
    ).collect()[0]
    for i, (x, nd) in enumerate(MIDPOINTS):
        want = row[f"r{i}"]
        assert _round_half_up(x, nd) == want, (x, nd, want)
        assert float(_dq(x, nd)) == want, (x, nd, want)


def test_midpoint_directions_are_the_tie_cases():
    """Sanity pin: the fixture really exercises the divergence — on
    2.675 the exact-binary-expansion rounding disagrees with the
    shortest-repr rounding."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-2)
    assert Decimal(2.675).quantize(q, rounding=ROUND_HALF_UP) == Decimal("2.67")
    assert Decimal("2.675").quantize(q, rounding=ROUND_HALF_UP) == Decimal("2.68")


# ------------------------------------------------ logreg NULL-text score

def test_logreg_score_expr_null_text_scores_bias(spark):
    """NULL text must score sigmoid(bias) through logreg_score_expr —
    same as the batch left-join+COALESCE path — not NULL (ADVICE r9
    low: NULL propagated through the aggregate fold)."""
    from rdsa_utils_spark.operators.classify import (
        logreg_score_expr,
        logreg_score_hashed,
        train_logreg_hashed,
    )

    train = spark.createDataFrame(
        [(1, "good fresh clean prose", 1.0),
         (2, "bad spam junk noise", 0.0),
         (3, "good clean text here", 1.0),
         (4, "junk spam noise bad", 0.0)],
        "id long, text string, label double",
    )
    model = train_logreg_hashed(
        train, "label", "text", "id", n_features=32, iterations=2,
    )
    wrows = model.collect()
    bias = next(float(r["weight"]) for r in wrows if r["feature"] == -1)
    score = spark.createDataFrame(
        [(10, "good clean"), (11, None), (12, "")],
        "id long, text string",
    )
    expr_scored = {
        r["id"]: r["prob"]
        for r in score.withColumn(
            "prob", logreg_score_expr(wrows, "text", n_features=32),
        ).collect()
    }
    batch_scored = {
        r["id"]: r["prob"]
        for r in logreg_score_hashed(
            score, model, "text", "id", n_features=32,
        ).collect()
    }
    assert expr_scored == batch_scored
    want_bias_prob = round(1.0 / (1.0 + math.exp(-bias)), 6)
    assert expr_scored[11] == pytest.approx(want_bias_prob)
    assert expr_scored[12] == pytest.approx(want_bias_prob)


def test_presence_buckets_expr_null_is_empty_array(spark):
    from rdsa_utils_spark.operators.classify import presence_buckets_expr

    got = (
        spark.createDataFrame([(1, None), (2, "a b")], "id long, text string")
        .select("id", presence_buckets_expr("text", 16).alias("b"))
        .collect()
    )
    by_id = {r["id"]: r["b"] for r in got}
    assert by_id[1] == []          # NULL text -> EMPTY buckets, not NULL
    assert len(by_id[2]) == 2


def test_logreg_score_expr_long_fold_matches_decimal_contract(spark):
    """The scaled-long scoring fold (round-10 fast path) must equal
    the pure decimal contract — round(w,12) terms summed exactly,
    then sigmoid — replayed in Python over the same buckets."""
    import math
    from decimal import Decimal

    from rdsa_utils_spark.operators.classify import (
        logreg_score_expr,
        presence_buckets_expr,
    )
    from rdsa_utils_spark.operators.preference import _dq

    # adversarial weights: repr-midpoints at 12 dp and sub-quantum dust
    wmap = {
        -1: -0.123456789,
        0: 0.5,
        1: 0.0000000000025,   # repr midpoint AT the 12-dp quantum
        2: -2.675e-12,
        3: 1.000000001,
        7: -0.999999999,
    }
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a"), (3, "")],
        "id long, text string",
    )
    got = {
        r["id"]: r["p"]
        for r in docs.select(
            "id",
            logreg_score_expr(wmap, "text", n_features=8).alias("p"),
            presence_buckets_expr("text", 8).alias("b"),
        ).collect()
    }
    rows = docs.select(
        "id", presence_buckets_expr("text", 8).alias("b"),
    ).collect()
    for r in rows:
        dot = float(sum((_dq(wmap.get(b, 0.0), 12) for b in r["b"]), Decimal(0)))
        want = round(1.0 / (1.0 + math.exp(-(dot + wmap[-1]))), 6)
        assert got[r["id"]] == pytest.approx(want, abs=0), (r["id"], dot)


# ------------------------------------------------- bench policy metadata

def test_bench_detail_records_spike_policy():
    """Cross-round timing comparisons need the measurement policy in
    the artifact (ADVICE r9 low): BENCH_DETAIL.json must carry the
    spike-rejection knobs alongside warmup_runs_per_query."""
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "BENCH_DETAIL.json")
    with open(path) as fh:
        detail = json.load(fh)
    assert detail["spike_retry_max"] == 2
    assert detail["spike_threshold"] == pytest.approx(1.9)
    assert isinstance(detail["spike_retries"], dict)
    assert detail["warmup_runs_per_query"] == 1


# --------------------------------------- contamination gate ref columns

def test_contamination_gate_accepts_renamed_reference(spark, tmp_path):
    """A benchmark frame whose columns are named differently from the
    stream's must work via ref_id_col/ref_text_col (ADVICE r9 low: the
    gate used the stream's names on the reference)."""
    from rdsa_utils_spark.streaming.quality import (
        write_stream_contamination_gate,
    )

    reference = spark.createDataFrame(
        [("q1", "the quick brown fox jumps over the lazy dog today ok")],
        "bench_id string, prompt string",
    )
    src = str(tmp_path / "feed")
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today ok fine"),
         (2, "completely unrelated fresh training document with new words")],
        "id long, text string",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("id long, text string").parquet(src)
    path = str(tmp_path / "adm")
    rej = str(tmp_path / "rej")
    q = write_stream_contamination_gate(
        stream, reference, "id", "text", path, str(tmp_path / "ckpt"),
        n=8,
        ref_id_col="bench_id", ref_text_col="prompt",
        reject_path=rej,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    admitted = {r["id"] for r in spark.read.parquet(path).collect()}
    rejected = {r["id"] for r in spark.read.parquet(rej).collect()}
    assert admitted == {2}
    assert rejected == {1}


def test_contamination_gate_renamed_reference_missing_col_fails(spark, tmp_path):
    from rdsa_utils_spark.streaming.quality import (
        write_stream_contamination_gate,
    )

    reference = spark.createDataFrame(
        [("q1", "some benchmark prompt text")], "bench_id string, prompt string",
    )
    src = str(tmp_path / "feed")
    spark.createDataFrame([(1, "x")], "id long, text string").write.parquet(src)
    stream = spark.readStream.schema("id long, text string").parquet(src)
    # stream's names don't exist on the reference: loud construction
    # failure, never a silent wrong-column hash
    with pytest.raises(Exception):
        write_stream_contamination_gate(
            stream, reference, "id", "text",
            str(tmp_path / "p"), str(tmp_path / "c"),
        )
