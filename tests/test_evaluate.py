"""operators/evaluate.py — AUC / Brier / NDCG@k / simplified
silhouette, against hand-computed and numpy-replayed expectations."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rdsa_utils_spark.operators.evaluate import (
    binary_auc,
    brier_score,
    ndcg_at_k,
    silhouette_simplified,
)


# --------------------------------------------------------------------------
# binary_auc
# --------------------------------------------------------------------------


def test_auc_hand_computed_with_ties(spark):
    # pos scores: 0.9, 0.8, 0.8 ; neg scores: 0.8, 0.1
    # U = 2·(1 + 0.5) + 1·2 = 5 ; AUC = 5 / (3·2) = 0.833333
    rows = [(0.9, True), (0.8, True), (0.8, True), (0.8, False), (0.1, False)]
    df = spark.createDataFrame(rows, ["score", "label"])
    out = binary_auc(df, "score", "label").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_pos"], r["n_neg"]) == (3, 2)
    assert r["auc"] == pytest.approx(0.833333, abs=1e-9)


def test_auc_perfect_and_reversed_and_random(spark):
    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False), (0.1, False)], ["s", "y"]
    )
    assert binary_auc(perfect, "s", "y").collect()[0]["auc"] == 1.0
    reversed_ = spark.createDataFrame(
        [(0.9, False), (0.8, False), (0.2, True), (0.1, True)], ["s", "y"]
    )
    assert binary_auc(reversed_, "s", "y").collect()[0]["auc"] == 0.0
    # all scores identical -> every pair is a tie -> 0.5
    flat = spark.createDataFrame(
        [(0.5, True), (0.5, False), (0.5, True), (0.5, False)], ["s", "y"]
    )
    assert binary_auc(flat, "s", "y").collect()[0]["auc"] == 0.5


def test_auc_single_class_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 0.9, True), ("a", 0.1, False), ("b", 0.7, True), ("b", 0.6, True)],
        ["g", "s", "y"],
    )
    out = {r["g"]: r for r in binary_auc(df, "s", "y", by=["g"]).collect()}
    assert out["a"]["auc"] == 1.0
    assert out["b"]["auc"] is None
    assert out["b"]["n_neg"] == 0


def test_auc_matches_numpy_rank_formula(spark):
    rng = np.random.default_rng(7)
    scores = np.round(rng.random(400), 2)  # heavy ties on a 101-value grid
    labels = rng.random(400) < (0.2 + 0.6 * scores)  # correlated labels
    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in zip(scores, labels)], ["s", "y"]
    )
    got = binary_auc(df, "s", "y").collect()[0]["auc"]

    # tie-averaged rank AUC via scipy-free midrank computation
    order = np.argsort(scores, kind="stable")
    s_sorted = scores[order]
    ranks = np.empty(len(scores))
    i = 0
    while i < len(s_sorted):
        j = i
        while j < len(s_sorted) and s_sorted[j] == s_sorted[i]:
            j += 1
        ranks[order[i:j]] = 0.5 * ((i + 1) + j)  # midrank
        i = j
    p = labels.sum()
    n = len(labels) - p
    u = ranks[labels].sum() - p * (p + 1) / 2
    assert got == pytest.approx(u / (p * n), abs=1e-6)


# --------------------------------------------------------------------------
# brier_score
# --------------------------------------------------------------------------


def test_brier_hand_computed(spark):
    df = spark.createDataFrame([(0.8, True), (0.3, False)], ["s", "y"])
    r = brier_score(df, "s", "y").collect()[0]
    assert r["n"] == 2
    assert r["brier"] == pytest.approx((0.04 + 0.09) / 2, abs=1e-9)


def test_brier_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1.0, True), ("a", 0.0, False), ("b", 0.0, True)], ["g", "s", "y"]
    )
    out = {r["g"]: r["brier"] for r in brier_score(df, "s", "y", by=["g"]).collect()}
    assert out["a"] == 0.0
    assert out["b"] == 1.0


# --------------------------------------------------------------------------
# ndcg_at_k
# --------------------------------------------------------------------------


def _gain(rel: int, rank: int) -> float:
    return round((2.0**rel - 1.0) / math.log2(rank + 1.0), 9)


def test_ndcg_hand_computed(spark):
    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3)], ["query_id", "doc_id", "rank"]
    )
    qrels = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "d", 3)], ["query_id", "doc_id", "rel"]
    )
    r = ndcg_at_k(runs, qrels, k=3).collect()[0]
    dcg = _gain(1, 1) + _gain(2, 2) + _gain(0, 3)
    idcg = _gain(3, 1) + _gain(2, 2) + _gain(1, 3)
    assert r["dcg"] == pytest.approx(dcg, abs=1e-6)
    assert r["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_ndcg_perfect_ranking_is_one(spark):
    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], ["query_id", "doc_id", "rank"]
    )
    qrels = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 1)], ["query_id", "doc_id", "rel"]
    )
    assert ndcg_at_k(runs, qrels, k=2).collect()[0]["ndcg"] == 1.0


def test_ndcg_no_relevant_docs_is_zero(spark):
    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], ["query_id", "doc_id", "rank"]
    )
    qrels = spark.createDataFrame([(2, "z", 3)], ["query_id", "doc_id", "rel"])
    r = ndcg_at_k(runs, qrels, k=2).collect()[0]
    assert (r["dcg"], r["idcg"], r["ndcg"]) == (0.0, 0.0, 0.0)


def test_ndcg_respects_k_cutoff(spark):
    # relevant doc sits at rank 3; with k=2 it contributes nothing
    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3)], ["query_id", "doc_id", "rank"]
    )
    qrels = spark.createDataFrame([(1, "c", 2)], ["query_id", "doc_id", "rel"])
    r = ndcg_at_k(runs, qrels, k=2).collect()[0]
    assert r["dcg"] == 0.0 and r["ndcg"] == 0.0
    # idcg still uses the BEST possible top-k of the qrels
    assert r["idcg"] == pytest.approx(_gain(2, 1), abs=1e-6)


def test_ndcg_validates_k(spark):
    df = spark.createDataFrame([(1, "a", 1)], ["query_id", "doc_id", "rank"])
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(df, df.withColumnRenamed("rank", "rel"), k=0)


# --------------------------------------------------------------------------
# silhouette_simplified
# --------------------------------------------------------------------------


def test_silhouette_two_far_clusters(spark):
    pts = [
        (0, [0.0, 0.0], "A"),
        (1, [0.0, 2.0], "A"),
        (2, [10.0, 0.0], "B"),
        (3, [10.0, 2.0], "B"),
    ]
    df = spark.createDataFrame(pts, ["id", "vec", "cl"])
    out = {r["cluster"]: r for r in silhouette_simplified(df, "id", "vec", "cl").collect()}
    # every point: a = 1 (own centroid), b = sqrt(101) (other centroid)
    s = round((math.sqrt(101.0) - 1.0) / math.sqrt(101.0), 6)
    for c in ("A", "B"):
        assert out[c]["n"] == 2
        assert out[c]["mean_silhouette"] == pytest.approx(s, abs=1e-6)


def test_silhouette_single_cluster_is_zero(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0], "A"), (1, [2.0, 2.0], "A")], ["id", "vec", "cl"]
    )
    r = silhouette_simplified(df, "id", "vec", "cl").collect()[0]
    assert r["mean_silhouette"] == 0.0


def test_silhouette_matches_numpy_replay(spark):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(3, 5)) * 4
    vecs, cls, ids = [], [], []
    for i in range(90):
        c = i % 3
        vecs.append(centers[c] + rng.normal(size=5))
        cls.append(c)
        ids.append(i)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], c) for i, v, c in zip(ids, vecs, cls)],
        ["id", "vec", "cl"],
    )
    got = {r["cluster"]: r["mean_silhouette"]
           for r in silhouette_simplified(df, "id", "vec", "cl").collect()}

    X = np.array(vecs)
    lab = np.array(cls)
    cents = np.stack([
        np.round(X[lab == c].mean(axis=0), 9) for c in range(3)
    ])
    svals = {c: [] for c in range(3)}
    for i in range(len(X)):
        d = np.sqrt(((X[i] - cents) ** 2).sum(axis=1))
        a = d[lab[i]]
        b = np.min(np.delete(d, lab[i]))
        svals[lab[i]].append(round((b - a) / max(a, b), 6))
    for c in range(3):
        assert got[c] == pytest.approx(np.mean(svals[c]), abs=1e-6)
    # points drawn around distinct centers should separate clearly
    assert all(v > 0.5 for v in got.values())


# --------------------------------------------------------------------------
# mrr_at_k / map_at_k
# --------------------------------------------------------------------------


def _runs_qrels(spark):
    # q1: rel doc at rank 1; q2: first rel at rank 3; q3: no rel in top-k.
    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "c", 1), (2, "d", 2), (2, "a", 3),
         (3, "e", 1), (3, "f", 2)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 1), (2, "z", 1), (3, "zz", 1)],
        ["query_id", "doc_id", "rel"],
    )
    return runs, qrels


def test_mrr_hand_computed(spark):
    from rdsa_utils_spark.operators.evaluate import mrr_at_k

    runs, qrels = _runs_qrels(spark)
    out = mrr_at_k(runs, qrels, 10).collect()
    assert len(out) == 1
    assert out[0].n_queries == 3
    assert out[0].mrr == pytest.approx((1.0 + 1.0 / 3.0 + 0.0) / 3.0, abs=1e-6)


def test_mrr_respects_k_cutoff(spark):
    from rdsa_utils_spark.operators.evaluate import mrr_at_k

    runs, qrels = _runs_qrels(spark)
    # k=2 hides q2's rank-3 hit -> only q1 contributes.
    out = mrr_at_k(runs, qrels, 2).collect()[0]
    assert out.mrr == pytest.approx(1.0 / 3.0, abs=1e-6)
    with pytest.raises(ValueError):
        mrr_at_k(runs, qrels, 0)


def test_mrr_zero_relevance_rows_ignored(spark):
    from rdsa_utils_spark.operators.evaluate import mrr_at_k

    runs, _ = _runs_qrels(spark)
    qrels = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 1)], ["query_id", "doc_id", "rel"],
    )
    out = mrr_at_k(runs, qrels, 10).collect()[0]
    # q1's only qrel has rel=0 -> not relevant; q2 hits at rank 3.
    assert out.mrr == pytest.approx((0.0 + 1.0 / 3.0 + 0.0) / 3.0, abs=1e-6)


def test_map_hand_computed(spark):
    from rdsa_utils_spark.operators.evaluate import map_at_k

    # q1 ranking: rel, non, rel, non -> AP = (1/1 + 2/3) / 2
    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (1, "d", 4)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, "a", 1), (1, "c", 1)], ["query_id", "doc_id", "rel"],
    )
    out = map_at_k(runs, qrels, 10).collect()
    assert len(out) == 1
    assert out[0].n_rel == 2
    assert out[0].ap == pytest.approx((1.0 + 2.0 / 3.0) / 2.0, abs=1e-6)


def test_map_denominator_is_min_nrel_k(spark):
    from rdsa_utils_spark.operators.evaluate import map_at_k

    # 3 relevant docs but k=2: denominator min(3, 2) = 2.
    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 1), (1, "c", 1)],
        ["query_id", "doc_id", "rel"],
    )
    out = map_at_k(runs, qrels, 2).collect()[0]
    assert out.ap == pytest.approx((1.0 + 1.0) / 2.0, abs=1e-6)


def test_map_no_relevant_docs_zero(spark):
    from rdsa_utils_spark.operators.evaluate import map_at_k

    runs = spark.createDataFrame([(1, "a", 1)], ["query_id", "doc_id", "rank"])
    qrels = spark.createDataFrame(
        [(9, "zz", 1)], ["query_id", "doc_id", "rel"],
    )
    out = map_at_k(runs, qrels, 5).collect()[0]
    assert out.n_rel == 0 and out.ap == 0.0


# --------------------------------------------------------------------------
# cohens_kappa
# --------------------------------------------------------------------------


def test_kappa_hand_computed_2x2(spark):
    from rdsa_utils_spark.operators.evaluate import cohens_kappa

    # Classic 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no.
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, ["r1", "r2"])
    out = cohens_kappa(df, "r1", "r2").collect()
    assert len(out) == 1
    assert out[0].n == 50
    # po = 0.7, pe = 0.5 -> kappa = 0.4
    assert out[0].kappa == pytest.approx(0.4, abs=1e-6)


def test_kappa_perfect_and_degenerate(spark):
    from rdsa_utils_spark.operators.evaluate import cohens_kappa

    perfect = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")], ["r1", "r2"],
    )
    assert cohens_kappa(perfect, "r1", "r2").collect()[0].kappa == pytest.approx(1.0)
    # Both raters constant: pe = 1, undefined -> NULL.
    degen = spark.createDataFrame([("x", "x")] * 5, ["r1", "r2"])
    assert cohens_kappa(degen, "r1", "r2").collect()[0].kappa is None


def test_kappa_grouped_and_null_excluded(spark):
    from rdsa_utils_spark.operators.evaluate import cohens_kappa

    rows = (
        [("g1", "y", "y")] * 20 + [("g1", "y", "n")] * 5
        + [("g1", "n", "y")] * 10 + [("g1", "n", "n")] * 15
        + [("g2", "y", "y"), ("g2", "n", "n")]
        + [("g1", None, "y"), ("g1", "y", None)]
    )
    df = spark.createDataFrame(rows, ["g", "r1", "r2"])
    out = {r.g: r for r in cohens_kappa(df, "r1", "r2", by=["g"]).collect()}
    assert out["g1"].n == 50  # NULL-rated rows excluded
    assert out["g1"].kappa == pytest.approx(0.4, abs=1e-6)
    assert out["g2"].kappa == pytest.approx(1.0)
