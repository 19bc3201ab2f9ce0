"""Empty-input sweep: core operators must return a well-formed empty
(or identity) frame on zero-row input — never raise, never produce a
degenerate schema. At 100 TB an empty partition/day/source is routine
(a filter that matches nothing, a fresh ingest hour), and operators
run inside pipelines where an exception aborts the whole DAG.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture()
def empty_ts(spark):
    return spark.createDataFrame([], "g string, ts timestamp, v double")


def test_dedup_ops_on_empty(spark, empty_docs):
    from rdsa_utils_spark.operators.dedup import (
        dedup_against_corpus,
        exact_dedup,
        minhash_near_dedup,
    )

    assert exact_dedup(empty_docs, "text", "doc_id").count() == 0
    assert minhash_near_dedup(
        empty_docs, "text", "doc_id", num_perm=8, num_bands=4,
    ).count() == 0

    corpus = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    # empty batch vs real corpus -> empty; real batch vs empty corpus -> batch
    assert dedup_against_corpus(empty_docs, corpus, "text", "doc_id").count() == 0
    out = dedup_against_corpus(corpus, empty_docs, "text", "doc_id")
    assert [r.doc_id for r in out.collect()] == [1]


def test_time_series_ops_on_empty(spark, empty_ts):
    from rdsa_utils_spark.operators.events import (
        cohort_retention,
        fill_time_gaps,
        rolling_zscore,
    )
    from rdsa_utils_spark.streaming.windows_time import sessionize_by_gap

    assert fill_time_gaps(empty_ts, "ts", "1 hour", ["g"], fill={"v": "zero"}).count() == 0
    assert rolling_zscore(empty_ts, "ts", "v", window_rows=3, group_cols=["g"]).count() == 0
    assert sessionize_by_gap(empty_ts, "ts", "g", 60.0).count() == 0
    ev = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    assert cohort_retention(ev).count() == 0


def test_joins_on_empty(spark):
    from rdsa_utils_spark.operators.joins import asof_join, range_join

    left = spark.createDataFrame([], "id long, ts timestamp")
    right = spark.createDataFrame([(1, "2024-01-01 00:00:00", 5.0)],
                                  "rid long, ts string, val double")
    right = right.select("rid", F.col("ts").cast("timestamp").alias("ts"), "val")
    out = asof_join(left, right, on="ts")
    assert out.count() == 0 and "val" in out.columns

    pts = spark.createDataFrame([], "p double")
    iv = spark.createDataFrame([(0.0, 10.0)], "lo double, hi double")
    assert range_join(pts, iv, "p", "lo", "hi", bucket_width=5.0).count() == 0


def test_sampling_and_scd_on_empty(spark, empty_docs):
    from rdsa_utils_spark.operators.sampling import (
        deterministic_shuffle,
        deterministic_split,
        stratified_sample,
    )
    from rdsa_utils_spark.operators.scd import scd2_apply, scd2_init

    assert deterministic_shuffle(empty_docs, "doc_id").count() == 0
    assert deterministic_split(empty_docs, "doc_id", {"a": 0.5, "b": 0.5}).count() == 0
    docs = empty_docs.withColumn("source", F.lit("s"))
    assert stratified_sample(docs, "source", 0.5, "doc_id").count() == 0

    dim = scd2_init(spark.createDataFrame([(1, "a")], "k long, tier string"),
                    "2024-01-01 00:00:00")
    empty_upd = spark.createDataFrame([], "k long, tier string, eff timestamp")
    out = scd2_apply(dim, empty_upd, ["k"], ["tier"], "eff")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].is_current


def test_text_and_similarity_on_empty(spark, empty_docs):
    from rdsa_utils_spark.operators.similarity import brute_force_topk
    from rdsa_utils_spark.operators.text import redact_pii, with_text_stats

    assert with_text_stats(empty_docs, "text").count() == 0
    assert redact_pii(empty_docs, "text").count() == 0

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
    # empty corpus -> no results; empty queries -> no results
    assert brute_force_topk(q, emb, k=3).count() == 0
    assert brute_force_topk(emb, q, k=3).count() == 0


def test_round4_ops_on_empty(spark, empty_docs, empty_ts):
    from rdsa_utils_spark.operators.disclosure import (
        dominance_flags,
        k_anonymity_violations,
        suppress_small_cells,
    )
    from rdsa_utils_spark.operators.events import debounce_events, transition_matrix
    from rdsa_utils_spark.operators.filters import impute_nulls
    from rdsa_utils_spark.operators.graph import cooccurrence_pairs, triangle_count
    from rdsa_utils_spark.operators.stats import (
        chi_square_drift,
        correlation_matrix,
        grouped_linear_fit,
        js_divergence,
        rfm_segments,
        winsorize,
    )
    from rdsa_utils_spark.operators.text import boilerplate_ngrams

    assert grouped_linear_fit(empty_ts, "v", "v", ["g"]).count() == 0
    # Global-agg ops on empty input: one well-formed row, not a crash.
    assert correlation_matrix(
        empty_ts.select("v", F.col("v").alias("w")), ["v", "w"],
    ).count() == 1
    empty_cat = spark.createDataFrame([], "c string")
    assert chi_square_drift(empty_cat, empty_cat, "c").count() == 0
    assert js_divergence(empty_cat, empty_cat, "c").count() == 1
    assert winsorize(empty_ts, "v", ["g"]).count() == 0
    ord_empty = spark.createDataFrame([], "cust long, d timestamp, amt double")
    assert rfm_segments(ord_empty, "cust", "d", "amt").count() == 0
    bi = spark.createDataFrame([], "basket long, item string")
    assert cooccurrence_pairs(bi, "basket", "item").count() == 0
    edges = spark.createDataFrame([], "src long, dst long")
    assert triangle_count(edges).collect()[0].n_triangles == 0
    assert boilerplate_ngrams(empty_docs, "text", "doc_id", 1, 0.8).count() == 0
    ev = spark.createDataFrame([], "u long, ts timestamp, s string")
    assert transition_matrix(ev, "u", "ts", "s").count() == 0
    assert debounce_events(ev, "u", "ts", 60).count() == 0
    assert impute_nulls(empty_ts, "v", ["g"], "mean").count() == 0
    assert impute_nulls(empty_ts, "v", ["g"], "mode").count() == 0
    cells = spark.createDataFrame([], "cell string, n long, v double")
    assert suppress_small_cells(cells, "n", ["v"], 5).count() == 0
    micro = spark.createDataFrame([], "cell string, sup long, v double")
    assert dominance_flags(micro, ["cell"], "sup", "v").count() == 0
    assert k_anonymity_violations(cells, ["cell"], 5).count() == 0


def test_round4_stream_ops_on_empty(spark):
    from rdsa_utils_spark.operators.sampling import mix_corpora
    from rdsa_utils_spark.operators.scd import scd2_compact, scd2_init
    from rdsa_utils_spark.operators.similarity import (
        label_centroid_similarity,
        standardize_dims,
    )
    from rdsa_utils_spark.streaming.joins import interval_join

    docs = spark.createDataFrame([], "id string, src string")
    assert mix_corpora(docs, "src", "id", {"a": 1.0}).count() == 0
    emb = spark.createDataFrame([], "id long, v array<double>, label long")
    assert standardize_dims(emb, "v").count() == 0
    assert label_centroid_similarity(emb, "v", "label").count() == 0
    dim = scd2_init(spark.createDataFrame([], "k long, a string"), "2024-01-01 00:00:00")
    assert scd2_compact(dim, ["k"], ["a"]).count() == 0
    l = spark.createDataFrame([], "u long, ts timestamp")
    r = spark.createDataFrame([], "u long, ts timestamp")
    assert interval_join(l, r, ["u"], "ts", "ts").count() == 0


def test_round4_third_wave_ops_on_empty(spark, empty_docs):
    """Jaccard join, bloom dedup, semantic dedup, NB, entropy,
    cumulative distinct, ACF, split leakage on zero-row inputs."""
    from rdsa_utils_spark.operators.classify import (
        naive_bayes_score,
        train_naive_bayes,
    )
    from rdsa_utils_spark.operators.dedup import (
        dedup_against_corpus_bloom,
        jaccard_similarity_join,
    )
    from rdsa_utils_spark.operators.events import cumulative_distinct
    from rdsa_utils_spark.operators.sampling import split_leakage_report
    from rdsa_utils_spark.operators.stats import grouped_autocorrelation
    from rdsa_utils_spark.operators.text import token_entropy_by

    assert jaccard_similarity_join(empty_docs, "doc_id", "text").count() == 0
    assert token_entropy_by(empty_docs, "doc_id", "text").count() == 0

    corpus = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    # empty batch vs real corpus -> empty; real batch vs EMPTY corpus
    # exercises the zero-item bloom build (all-zero bitmap, no rows).
    assert dedup_against_corpus_bloom(
        empty_docs, corpus, "text", "doc_id",
    ).count() == 0
    out = dedup_against_corpus_bloom(corpus, empty_docs, "text", "doc_id")
    assert [r.doc_id for r in out.collect()] == [1]

    empty_split = spark.createDataFrame([], "split string, doc_id long, text string")
    assert split_leakage_report(empty_split, "split", "text").count() == 0

    ev = spark.createDataFrame([], "user_id long, ts timestamp")
    assert cumulative_distinct(ev, "user_id", "ts").count() == 0

    ets = spark.createDataFrame([], "g string, t long, x double")
    assert grouped_autocorrelation(ets, ["g"], "t", "x", lags=(1,)).count() == 0

    labeled = spark.createDataFrame([], "doc_id long, label string, text string")
    model, priors = train_naive_bayes(labeled, "label", "text")
    assert model.count() == 0 and priors.count() == 0
    # scoring an empty frame against an empty model: empty, not an error
    assert naive_bayes_score(
        empty_docs, model, priors, "doc_id", "text",
    ).count() == 0


def test_pq_and_semantic_on_empty(spark):
    from rdsa_utils_spark.operators.similarity import (
        pq_encode,
        semantic_dedup,
    )
    import numpy as np

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    books = np.zeros((4, 8, 4))
    assert pq_encode(empty_emb, books).count() == 0
    # semantic dedup of an empty frame: no pairs, no clusters, empty out
    assert semantic_dedup(empty_emb, dim=16, method="exact").count() == 0


def test_round4_fourth_wave_ops_on_empty(spark, empty_docs):
    from rdsa_utils_spark.operators.dedup import span_dedup
    from rdsa_utils_spark.operators.windows import add_row_index

    out = span_dedup(empty_docs, "doc_id", "text", 10)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_blocks", "n_kept", "dedup_text"]

    idx = add_row_index(empty_docs, ["doc_id"])
    assert idx.count() == 0
    assert "row_index" in idx.columns


def test_round6_drift_ops_on_empty(spark):
    from rdsa_utils_spark.operators.drift import (
        chi2_homogeneity,
        ks_2sample,
        psi,
        psi_from_counts,
    )

    empty = spark.createDataFrame([], "g string, v double, s boolean")
    assert ks_2sample(empty, "v", "s", by=["g"]).count() == 0
    assert psi(empty, "v", "s", n_bins=4, lo=0.0, hi=1.0, by=["g"]).count() == 0
    assert chi2_homogeneity(empty, "v", "s", by=["g"]).count() == 0
    ec = spark.createDataFrame([], "g string, bin long, a long, b long")
    assert psi_from_counts(ec, "bin", "a", "b", 4, by=["g"]).count() == 0
    # Ungrouped empty PSI: the completion grid still emits the n_bins
    # rows but with all-zero counts the smoothed terms cancel -> one
    # row with psi = 0 and zero sizes... or no row; either way no raise.
    out = psi(empty.drop("g"), "v", "s", n_bins=4, lo=0.0, hi=1.0).collect()
    assert len(out) <= 1


def test_round6_metric_ops_on_empty(spark):
    from rdsa_utils_spark.operators.evaluate import cohens_kappa, map_at_k, mrr_at_k
    from rdsa_utils_spark.operators.stats import (
        categorical_entropy,
        mutual_information,
    )

    runs = spark.createDataFrame([], "query_id long, doc_id string, rank long")
    qrels = spark.createDataFrame([], "query_id long, doc_id string, rel long")
    mrr = mrr_at_k(runs, qrels, 10).collect()
    assert len(mrr) == 1 and mrr[0].n_queries == 0
    assert map_at_k(runs, qrels, 10).count() == 0
    raters = spark.createDataFrame([], "g string, r1 string, r2 string")
    assert cohens_kappa(raters, "r1", "r2", by=["g"]).count() == 0
    cats = spark.createDataFrame([], "g string, c string")
    assert categorical_entropy(cats, "c", group_by=["g"]).count() == 0
    pairs = spark.createDataFrame([], "g string, x string, y string")
    assert mutual_information(pairs, "x", "y", group_by=["g"]).count() == 0


def test_round6_sketch_and_event_ops_on_empty(spark):
    from rdsa_utils_spark.operators.events import (
        attribute_conversions,
        time_decayed_agg,
    )
    from rdsa_utils_spark.operators.sketches import (
        kmv_estimate,
        kmv_jaccard,
        kmv_merge,
        kmv_sketch,
    )

    ev = spark.createDataFrame(
        [], "user_id long, event_id long, event_type string, ts timestamp",
    )
    assert attribute_conversions(ev, ["click"], "purchase").count() == 0
    tsf = spark.createDataFrame([], "g string, ts timestamp, v double")
    assert time_decayed_agg(tsf, "ts", 7.0, by=["g"], value_col="v").count() == 0
    vals = spark.createDataFrame([], "g string, v long")
    sk = kmv_sketch(vals, "v", k=16, group_cols=["g"])
    assert sk.count() == 0
    assert kmv_merge(sk, k=16, group_cols=["g"]).count() == 0
    assert kmv_estimate(sk, k=16).count() == 0
    ab = spark.createDataFrame([], "a array<bigint>, b array<bigint>")
    assert kmv_jaccard(ab, "a", "b", k=16).count() == 0
