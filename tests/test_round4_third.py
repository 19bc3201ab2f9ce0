"""Round-4 late additions: span_dedup, add_row_index, PCA, JSONL gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.dedup import span_dedup
from rdsa_utils_spark.operators.similarity import pca_project, pca_train
from rdsa_utils_spark.operators.windows import add_row_index
from rdsa_utils_spark.sources.readers import read_jsonl_corpus


# ---------------------------------------------------------------- span_dedup
def test_span_dedup_removes_repeated_blocks(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # blocks (k=3): "a b c", "d e f"
            (2, "a b c x y z"),   # "a b c" repeats -> dropped
            (3, "x y z"),         # "x y z" already seen in doc 2
            (4, "q r"),           # short doc: one partial block
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", 3).collect()}
    assert out[1]["dedup_text"] == "a b c d e f"
    assert out[1]["n_blocks"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["dedup_text"] == "x y z"
    assert out[2]["n_kept"] == 1
    assert out[3]["dedup_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["dedup_text"] == "q r"


def test_span_dedup_first_occurrence_is_by_id_then_position(spark):
    # Same block twice within one doc: second occurrence dropped.
    df = spark.createDataFrame([(7, "p q p q")], ["doc_id", "text"])
    row = span_dedup(df, "doc_id", "text", 2).collect()[0]
    assert row["n_blocks"] == 2 and row["n_kept"] == 1
    assert row["dedup_text"] == "p q"


# ------------------------------------------------------------- add_row_index
def test_add_row_index_matches_global_sort(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = add_row_index(orders, ["o_orderdate", "o_orderkey"], num_partitions=8)
    got = [
        r["o_orderkey"]
        for r in out.orderBy("row_index").select("o_orderkey").collect()
    ]
    want = [
        r["o_orderkey"]
        for r in orders.orderBy("o_orderdate", "o_orderkey")
        .select("o_orderkey")
        .collect()
    ]
    assert got == want
    idx = sorted(r["row_index"] for r in out.select("row_index").collect())
    assert idx == list(range(orders.count()))  # contiguous, 0-based, no gaps


def test_add_row_index_requires_order(spark):
    df = spark.range(5)
    with pytest.raises(ValueError):
        add_row_index(df, [])


# --------------------------------------------------------------------- PCA
def test_pca_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_train(emb, "embedding", k=8)
    mat = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()],
    )
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    np.testing.assert_allclose(model["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(
        model["explained_variance"], evals[order], rtol=1e-8,
    )
    # Components match up to sign; the model pins a deterministic sign.
    want = evecs[:, order].T
    for i in range(8):
        dot = abs(float(np.dot(model["components"][i], want[i])))
        assert dot == pytest.approx(1.0, abs=1e-8)
    ratio = model["explained_variance_ratio"]
    assert np.all(np.diff(ratio) <= 1e-12) and ratio[0] > 0


def test_pca_project_variances_are_eigenvalues(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_train(emb, "embedding", k=4)
    proj = pca_project(emb, model, "embedding", "pca")
    vals = np.stack(
        [np.asarray(r["pca"]) for r in proj.select("pca").collect()],
    )
    np.testing.assert_allclose(
        vals.var(axis=0, ddof=1), model["explained_variance"], rtol=1e-8,
    )
    white = pca_project(emb, model, "embedding", "pca", whiten=True)
    wvals = np.stack(
        [np.asarray(r["pca"]) for r in white.select("pca").collect()],
    )
    np.testing.assert_allclose(
        wvals.var(axis=0, ddof=1), np.ones(4), rtol=1e-6,
    )


def test_pca_train_empty_raises(spark):
    df = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError):
        pca_train(df, "embedding", k=2)


# ------------------------------------------------------------- JSONL gate
def test_read_jsonl_corpus_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2}\n'                       # missing required text
        'not json at all\n'
        '{"doc_id": 3, "text": "ok"}\n',
    )
    good, bad = read_jsonl_corpus(
        spark, str(p), "doc_id long, text string", required=["doc_id", "text"],
    )
    grows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert grows == {1: "hello world", 3: "ok"}
    assert good.columns == ["doc_id", "text"]
    brows = sorted((r["reason"], r["line"]) for r in bad.collect())
    assert [r[0] for r in brows] == ["malformed", "missing:text"]


# ----------------------------------------------------------- collocations
def test_collocation_pmi_hand_computed(spark):
    import math

    from rdsa_utils_spark.operators.text import collocation_pmi

    # "a b" occurs 3x; tokens: a=3, b=3, n_tokens=6, n_bigrams=3.
    df = spark.createDataFrame(
        [("a b",), ("a b",), ("a b",)], ["text"],
    )
    rows = collocation_pmi(df, "text", min_count=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["n_pair"]) == ("a", "b", 3)
    want = math.log((3 / 3) / ((3 / 6) * (3 / 6)))
    assert r["pmi"] == pytest.approx(round(want, 6), abs=1e-9)


def test_collocation_pmi_short_docs_no_bigrams(spark):
    from rdsa_utils_spark.operators.text import collocation_pmi

    df = spark.createDataFrame([("solo",), ("",), ("  ",)], ["text"])
    assert collocation_pmi(df, "text", min_count=1).count() == 0


# ------------------------------------------------------------ bigram LM
def test_bigram_lm_score_hand_computed(spark):
    import math

    from rdsa_utils_spark.operators.text import bigram_lm_score

    # corpus: "a b", "a b c", "solo"; bigrams: (a,b)x2, (b,c)x1
    # V=3 = bigram-participating vocab {a,b,c} ("solo" never appears
    # in a bigram context); s=0.5; c_left(a)=2, c_left(b)=1
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c"), (3, "solo")], ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(df, "text", "doc_id").collect()}
    lp_ab = math.log((2 + 0.5) / (2 + 0.5 * 3))
    lp_bc = math.log((1 + 0.5) / (1 + 0.5 * 3))
    assert out[1]["lm2_logprob"] == round(lp_ab, 6)
    assert out[2]["lm2_logprob"] == round((lp_ab + lp_bc) / 2, 6)
    assert out[2]["n_lm2_tokens"] == 2
    assert out[3]["lm2_logprob"] is None and out[3]["n_lm2_tokens"] == 0


# -------------------------------------------------- negatives (contrastive)
def test_hard_negative_topk_excludes_same_label(spark, sf_dir):
    from rdsa_utils_spark.operators.similarity import hard_negative_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = hard_negative_topk(emb.filter(F.col("vec_id") < 3), emb, k=4).collect()
    assert out, "expected some negatives"
    by_q = {}
    for r in out:
        assert r["candidate_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r["cosine"])
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True) and len(sims) <= 4


def test_negative_sample_deterministic_and_in_corpus(spark, sf_dir):
    from rdsa_utils_spark.operators.sampling import negative_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    anchors = emb.filter(F.col("vec_id") < 20)
    a = sorted(tuple(r) for r in negative_sample(anchors, emb, "vec_id", "vec_id", k=3).collect())
    b = sorted(tuple(r) for r in negative_sample(anchors, emb, "vec_id", "vec_id", k=3).collect())
    assert a == b  # reproducible
    corpus_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for vec_id, draw, neg in a:
        assert neg in corpus_ids and neg != vec_id and 0 <= draw < 3
    # different seed -> (almost surely) different draws
    c = sorted(tuple(r) for r in negative_sample(anchors, emb, "vec_id", "vec_id", k=3, seed="other").collect())
    assert a != c


def test_negative_sample_validates(spark):
    from rdsa_utils_spark.operators.sampling import negative_sample

    df = spark.createDataFrame([(1,)], ["id"])
    empty = spark.createDataFrame([], "id long")
    import pytest as _pt
    with _pt.raises(ValueError):
        negative_sample(df, df, "id", "id", k=0)
    with _pt.raises(ValueError):
        negative_sample(df, empty, "id", "id", k=2)


# ----------------------------------------------------------- observation
def test_write_with_metrics_single_scan(spark, sf_dir, tmp_path):
    from rdsa_utils_spark.plans.diagnostics import observe_frame, write_with_metrics

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = write_with_metrics(
        orders,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_comment": F.sum(F.col("o_orderpriority").isNull().cast("long")),
            "total_price": F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2),
        },
        path=str(tmp_path / "orders_out"),
    )
    want = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderpriority").isNull().cast("long")).alias("n_null_comment"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2).alias("total_price"),
    ).collect()[0]
    assert got["n_rows"] == want["n_rows"]
    assert got["n_null_comment"] == want["n_null_comment"]
    assert got["total_price"] == want["total_price"]
    # round-trip: the write actually happened
    assert spark.read.parquet(str(tmp_path / "orders_out")).count() == got["n_rows"]

    import pytest as _pt
    with _pt.raises(ValueError):
        observe_frame(orders, {})


# ----------------------------------------------------------- term keyness
def test_term_log_odds_symmetry_and_sign(spark):
    from rdsa_utils_spark.operators.text import term_log_odds

    df = spark.createDataFrame(
        [("A", "x x x y"), ("B", "y y y x")], ["g", "text"],
    )
    ab = {r["term"]: r for r in
          term_log_odds(df, "text", "g", "A", "B", min_count=1).collect()}
    ba = {r["term"]: r for r in
          term_log_odds(df, "text", "g", "B", "A", min_count=1).collect()}
    # x over-represented in A, y in B; swapping groups flips sign exactly
    assert ab["x"]["log_odds"] > 0 > ab["y"]["log_odds"]
    for t in ("x", "y"):
        assert ab[t]["log_odds"] == -ba[t]["log_odds"]
        assert ab[t]["z"] == -ba[t]["z"]
        assert ab[t]["count_a"] == ba[t]["count_b"]


# ----------------------------------------------------- cosine histogram
def test_cosine_histogram_counts_and_bounds(spark, sf_dir):
    from rdsa_utils_spark.operators.similarity import cosine_histogram

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    out = cosine_histogram(emb, "vec_id", "embedding", pairs_per_row=2).collect()
    total = sum(r["n_pairs"] for r in out)
    # 2 draws per row minus self-hits (rare)
    assert n * 2 * 0.9 <= total <= n * 2
    for r in out:
        assert 0 <= r["bin"] <= 19
        assert r["lo"] == round(-1.0 + r["bin"] * 0.1, 6)
        assert r["hi"] == round(r["lo"] + 0.1, 6)


# ----------------------------------------------------------- label noise
def test_label_noise_flags_planted_mislabel(spark):
    import numpy as np

    from rdsa_utils_spark.operators.similarity import label_noise_scores

    rng = np.random.default_rng(7)
    rows = []
    # two tight clusters; row 0 gets the WRONG label
    for i in range(10):
        rows.append((i, (rng.normal(0, 0.05, 8) + np.array([1.0]*4 + [0.0]*4)).tolist(),
                     1 if i == 0 else 0))
    for i in range(10, 20):
        rows.append((i, (rng.normal(0, 0.05, 8) + np.array([0.0]*4 + [1.0]*4)).tolist(), 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["vec_id"]: r for r in label_noise_scores(df, df, k=5).collect()}
    assert out[0]["disagreement"] == 1.0      # planted mislabel
    assert out[5]["disagreement"] <= 0.2      # clean row (only row 0 disagrees nearby)
    assert out[15]["disagreement"] == 0.0     # clean cluster B
    assert all(r["n_neighbors"] == 5 for r in out.values())
