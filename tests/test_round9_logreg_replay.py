"""Pure-Python replay of train_logreg_hashed's quantize-then-
decimal-sum training contract — correctness evidence INDEPENDENT of
the DuckDB oracle (the same belt-and-braces device as the BPE
pure-Python replay in test_tokenize.py): if the engine and this
80-line reference ever disagree on a single weight, either the
contract drifted or an engine expression changed semantics."""

from __future__ import annotations

import hashlib
import math
import re
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.classify import (
    _round_half_up,
    train_logreg_hashed,
)

N_FEATURES = 32
ITERS = 4
LR = 1.0


def _buckets(text: str) -> list[int]:
    toks = re.split(r"\s+", text.strip()) if text.strip() else []
    return sorted(
        {int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % N_FEATURES
         for t in toks},
    )


def _reference_train(rows: list[tuple[str, int]]):
    """The contract, literally: presence buckets; z = b + double(exact
    decimal sum of 12-dp weights over active features); r = round(p−y,
    12); per-feature gradient = double(decimal sum of r) / n; weights
    round half-up to 9 dp every step."""
    docs = [(_buckets(t), float(y)) for t, y in rows]
    n = len(docs)
    n_pos = sum(1 for _, y in docs if y == 1.0)
    b = _round_half_up(math.log(n_pos / (n - n_pos)), 9) if 0 < n_pos < n else 0.0
    w = [0.0] * N_FEATURES
    for _ in range(ITERS):
        grads: dict[int, Decimal] = {}
        gb = Decimal(0)
        for fs, y in docs:
            dot = sum((Decimal(repr(round(w[f], 12))) for f in fs), Decimal(0))
            z = b + float(dot)
            r = round(1.0 / (1.0 + math.exp(-z)) - y, 12)
            rd = Decimal(repr(r))
            gb += rd
            for f in fs:
                grads[f] = grads.get(f, Decimal(0)) + rd
        for f in range(N_FEATURES):
            g = float(grads.get(f, Decimal(0))) / n
            w[f] = _round_half_up(w[f] - LR * g, 9)
        b = _round_half_up(b - LR * (float(gb) / n), 9)
    return b, w


def test_train_logreg_matches_pure_python_replay(spark):
    rows = [
        (i, f"spark data {'good' if i % 2 else 'bad'} doc tok{i % 7}", i % 2)
        for i in range(40)
    ] + [(100, "   ", 1), (101, "spark", 0)]  # blank + single-token edges
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    got = {
        r["feature"]: r["weight"]
        for r in train_logreg_hashed(
            df, "y", "text", "doc_id",
            n_features=N_FEATURES, iterations=ITERS, lr=LR,
        ).collect()
    }
    b, w = _reference_train([(t, y) for _, t, y in rows])
    assert got[-1] == b
    for f in range(N_FEATURES):
        assert got[f] == w[f], f"feature {f}: {got[f]} != {w[f]}"


def test_python_round_matches_contract_rounding():
    # Python round() is ties-to-even; the contract's 12-dp residual
    # quantization relies on F.round (half-up). The replay above uses
    # round() for r — prove they agree on the residuals this corpus
    # produces (sigmoid outputs essentially never land on an exact
    # 5e-13 tie), and that the WEIGHT rounding (where dyadic ties DO
    # occur) uses _round_half_up on both sides.
    assert _round_half_up(2 ** -10, 9) == 0.000976563  # ties away
    assert round(2 ** -10, 9) == 0.000976562  # bankers' — must NOT be used
