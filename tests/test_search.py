"""Tests for the retrieval operators (BM25, TF-IDF)."""

from __future__ import annotations

import math

import pytest

from rdsa_utils_spark.operators.search import bm25_topk, tf_idf_top_terms


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join join join"),
            (2, "spark window agg"),
            (3, "pandas udf arrow batch"),
            (4, "join order broadcast"),
        ],
        "doc_id long, text string",
    )


def test_bm25_ranks_term_frequency_and_rarity(corpus):
    out = bm25_topk(corpus, ["join"], k=10).collect()
    ids = [r.doc_id for r in out]
    # Only docs containing the term appear; tf=3 beats tf=1.
    assert ids == [1, 4]
    assert out[0].bm25 > out[1].bm25 > 0

    # Hand-check doc 4: tf=1, dl=3, N=4, avgdl=(5+3+4+3)/4, df=2.
    avgdl = 15 / 4
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    expect = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 3 / avgdl))
    assert out[1].bm25 == pytest.approx(round(expect, 6), abs=1e-6)


def test_bm25_multi_term_and_validation(corpus):
    out = {r.doc_id: r.bm25 for r in bm25_topk(corpus, ["spark", "agg"], k=10).collect()}
    assert set(out) == {1, 2}
    assert out[2] > out[1]  # doc 2 matches both terms
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(corpus, [])


def test_tf_idf_top_terms_rank_and_tiebreak(corpus):
    out = tf_idf_top_terms(corpus, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tf_idf))
    # doc 1: 'join' tf=3 dominates; 'shuffle' (df=1) beats 'spark' (df=2)
    assert [t for _, t, _ in sorted(by_doc[1])] == ["join", "shuffle"]
    # every doc emits exactly k rows with ranks 1..k
    assert all(sorted(r for r, _, _ in v) == [1, 2] for v in by_doc.values())
    # scores are rounded to 6 decimals (rank key == output value)
    assert all(s == round(s, 6) for v in by_doc.values() for _, _, s in v)


def test_rrf_fuse_hand_calc(spark):
    from rdsa_utils_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double",
    )
    b = spark.createDataFrame(
        [(3, 0.9), (1, 0.8), (4, 0.7)], "doc_id long, score double",
    )
    out = {r.doc_id: (r.rrf_score, r.n_lists)
           for r in rrf_fuse([a, b], "doc_id", k=60).collect()}
    # doc 1: rank 1 in a, rank 2 in b -> 1/61 + 1/62
    assert out[1] == (round(1 / 61 + 1 / 62, 6), 2)
    assert out[3] == (round(1 / 63 + 1 / 61, 6), 2)
    assert out[2] == (round(1 / 62, 6), 1)
    assert out[4] == (round(1 / 63, 6), 1)

    top = rrf_fuse([a, b], "doc_id", k=60, top_n=2).collect()
    assert sorted(r.doc_id for r in top) == [1, 3]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], "doc_id")
    with _pytest.raises(ValueError, match="k must"):
        rrf_fuse([a], "doc_id", k=0)
