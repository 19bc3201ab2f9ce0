"""Cap-boundary equality pins for the round-9 capped driver fallbacks
(round-9 verdict task 5): ``bt_ratings``'s ``max_driver_pairs`` and
``bpe_train``'s ``max_driver_vocab`` each flip between the collected
driver replay and the distributed path on a size guard. These tests
hold the two paths bit-equal exactly WHERE the guard flips — one unit
below the data size (distributed) and exactly at it (fallback) — the
invariant that makes the caps safe to retune later."""

from __future__ import annotations

import pytest


def _bt_games():
    # 4 items, all 6 undirected matchups played with asymmetric
    # outcomes -> 12 directed (i, j) game-matrix rows
    rows = []
    rows += [("a", "b")] * 3 + [("b", "a")] * 1
    rows += [("a", "c")] * 2 + [("c", "a")] * 2
    rows += [("a", "d")] * 1 + [("d", "a")] * 4
    rows += [("b", "c")] * 5 + [("c", "b")] * 1
    rows += [("b", "d")] * 2 + [("d", "b")] * 2
    rows += [("c", "d")] * 1 + [("d", "c")] * 3
    return rows


def test_bt_ratings_paths_agree_at_the_cap_boundary(spark):
    from rdsa_utils_spark.operators.preference import bt_ratings

    df = spark.createDataFrame(_bt_games(), "winner string, loser string")
    n_pairs = 12  # directed game-matrix rows for the fixture above

    # cap == matrix size: guard admits -> driver replay
    fast = bt_ratings(
        df, "winner", "loser", iterations=6, max_driver_pairs=n_pairs,
    ).collect()
    # cap one BELOW the matrix size: guard refuses -> distributed MM
    slow = bt_ratings(
        df, "winner", "loser", iterations=6, max_driver_pairs=n_pairs - 1,
    ).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
    # and the ratings really came out of a fitted model, not a default
    ratings = {r["item"]: r["rating"] for r in fast}
    assert len(set(ratings.values())) == 4  # asymmetric data -> all distinct
    assert sum(ratings.values()) == pytest.approx(4.0, abs=1e-6)  # mean-1 norm


def test_bpe_train_paths_agree_at_the_cap_boundary(spark):
    from rdsa_utils_spark.operators.tokenize import bpe_train

    docs = [
        ("low low low lower lowest",),
        ("new newer newest low",),
        ("wide wider widest new new",),
    ]
    df = spark.createDataFrame(docs, "text string")
    vocab_size = 9  # distinct words across the corpus

    fast = bpe_train(df, "text", num_merges=10, max_driver_vocab=vocab_size)
    slow = bpe_train(
        df, "text", num_merges=10, max_driver_vocab=vocab_size - 1,
    )
    assert fast == slow
    assert len(fast) == 10  # enough pair mass for all requested merges
