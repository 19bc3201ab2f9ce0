"""Unit tests for round-7 pass@k (evaluate.pass_at_k) and
Bradley–Terry ratings (preference.bt_ratings)."""

from __future__ import annotations

import math
from itertools import combinations

import pytest

from rdsa_utils_spark.operators.evaluate import pass_at_k
from rdsa_utils_spark.operators.preference import bt_ratings


def _pass_at_k_ref(n, c, k):
    """Exact combinatorial reference: 1 - C(n-c,k)/C(n,k)."""
    if n < k:
        return None
    if n - c < k:
        return 1.0
    return 1.0 - math.comb(n - c, k) / math.comb(n, k)


def _attempts(spark, per_task):
    rows = []
    for task, (n, c) in per_task.items():
        rows += [(task, 1)] * c + [(task, 0)] * (n - c)
    return spark.createDataFrame(rows, "task string, ok int")


def test_pass_at_k_matches_combinatorial_reference(spark):
    per_task = {
        "a": (10, 3),
        "b": (5, 0),
        "c": (5, 5),
        "d": (20, 1),
        "e": (3, 1),   # n < 5 -> NULL for k=5
        "f": (7, 4),   # c >= n-k+1 for k=5 -> exactly 1.0
    }
    df = _attempts(spark, per_task)
    out = {r["task"]: r for r in pass_at_k(df, "task", "ok", ks=(1, 5)).collect()}
    for t, (n, c) in per_task.items():
        assert out[t]["n"] == n and out[t]["c"] == c
        for k in (1, 5):
            want = _pass_at_k_ref(n, c, k)
            got = out[t][f"pass_at_{k}"]
            if want is None:
                assert got is None, (t, k)
            else:
                assert got == pytest.approx(want, abs=1e-5), (t, k)


def test_pass_at_k_null_attempts_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 0)], "task string, ok int",
    )
    row = pass_at_k(df, "task", "ok", ks=(1,)).collect()[0]
    assert row["n"] == 2 and row["c"] == 1
    assert row["pass_at_1"] == pytest.approx(0.5)
    with pytest.raises(ValueError, match="ks"):
        pass_at_k(df, "task", "ok", ks=())
    with pytest.raises(ValueError, match="ks"):
        pass_at_k(df, "task", "ok", ks=(0,))


def _bt_reference(outcomes, iterations, n_round=9, t_round=12):
    """Pure-python replay of the documented MM + quantization
    contract."""
    items = sorted({x for p in outcomes for x in p})
    games, wins = {}, {i: 0 for i in items}
    for w, l in outcomes:
        games[(w, l)] = games.get((w, l), 0) + 1
        games[(l, w)] = games.get((l, w), 0) + 1
        wins[w] += 1
    r = {i: 1.0 for i in items}
    for _ in range(iterations):
        raw = {}
        for i in items:
            d = sum(
                round(n / (r[i] + r[j]), t_round)
                for (a, j), n in games.items()
                if a == i
            )
            raw[i] = round(wins[i] / d, t_round)
        total = sum(raw.values())
        r = {i: round(raw[i] * len(items) / total, n_round) for i in items}
    return r


def test_bt_matches_python_replay_and_recovers_order(spark):
    # planted strengths A > B > C with deterministic outcome counts
    outcomes = (
        [("A", "B")] * 8 + [("B", "A")] * 2
        + [("B", "C")] * 7 + [("C", "B")] * 3
        + [("A", "C")] * 9 + [("C", "A")] * 1
    )
    df = spark.createDataFrame(outcomes, "w string, l string")
    got = {r["item"]: r for r in bt_ratings(df, "w", "l", iterations=6).collect()}
    want = _bt_reference(outcomes, 6)
    for item, r_want in want.items():
        assert got[item]["rating"] == pytest.approx(r_want, abs=1e-9), item
    assert got["A"]["rating"] > got["B"]["rating"] > got["C"]["rating"]
    assert got["A"]["wins"] == 17 and got["A"]["games"] == 20
    # mean-1 normalization: ratings sum to #items
    assert sum(r["rating"] for r in got.values()) == pytest.approx(3.0, abs=1e-6)


def test_bt_probability_calibration(spark):
    # With true BT strengths (4, 1), P(A beats B) = 0.8; feed exact
    # frequencies and the fitted ratio should approach 4:1.
    # (for two items the MM update is exact after one step: denom_A =
    # n/(w_A+w_B) is the same for both, so the ratio is W_A/W_B = 4)
    outcomes = [("A", "B")] * 80 + [("B", "A")] * 20
    df = spark.createDataFrame(outcomes, "w string, l string")
    got = {r["item"]: r["rating"] for r in bt_ratings(df, "w", "l", iterations=4).collect()}
    assert got["A"] / got["B"] == pytest.approx(4.0, rel=1e-6)


def test_bt_excludes_ties_nulls_and_handles_never_winner(spark):
    outcomes = [("A", "B"), ("A", "A"), (None, "B"), ("A", None), ("A", "B")]
    df = spark.createDataFrame(outcomes, "w string, l string")
    got = {r["item"]: r for r in bt_ratings(df, "w", "l", iterations=4).collect()}
    assert set(got) == {"A", "B"}
    assert got["B"]["wins"] == 0 and got["B"]["rating"] == 0.0
    assert got["A"]["rating"] > 0
    with pytest.raises(ValueError, match="iterations"):
        bt_ratings(df, "w", "l", iterations=0)


def test_bt_driver_path_equals_distributed_path(spark):
    """The capped driver MM fast path must be bit-identical to the
    distributed iterations (max_driver_pairs=0 forces distributed on
    the same outcomes) — the contract's order-independence, observed."""
    from rdsa_utils_spark.operators.preference import bt_ratings

    rows = []
    items = [f"m{i}" for i in range(6)]
    for a in range(6):
        for b in range(6):
            if a != b:
                rows += [(items[a], items[b])] * ((a * 3 + b) % 5 + 1)
    df = spark.createDataFrame(rows, "winner string, loser string")
    fast = bt_ratings(df, "winner", "loser").collect()
    slow = bt_ratings(df, "winner", "loser", max_driver_pairs=0).collect()
    assert fast == slow
