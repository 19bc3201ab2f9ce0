"""Regression tests for the round-6 self-review findings: NULL-tag
bias in the drift gates, NULL scores in AUC, duplicate qrels in NDCG,
round_to=None contract in the stats façades, dead-key PSI rows, and
the versioned-snapshot crash/orphan/vacuum safety properties."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_drift_ops_exclude_null_sample_flags(spark):
    from rdsa_utils_spark.operators.drift import chi2_homogeneity, ks_2sample, psi

    rows = [(1.0, True), (2.0, True), (3.0, False), (4.0, False),
            (9.0, None), (9.0, None)]
    df = spark.createDataFrame(rows, "v double, s boolean")
    ks = ks_2sample(df, "v", "s").collect()[0]
    assert (ks.n_a, ks.n_b) == (2, 2)  # untagged rows in NEITHER sample
    p = psi(df, "v", "s", n_bins=4, lo=0.0, hi=8.0).collect()[0]
    assert (p.n_a, p.n_b) == (2, 2)
    c = chi2_homogeneity(
        df.select(F.col("v").cast("string").alias("c"), "s"), "c", "s",
    ).collect()[0]
    assert (c.n_a, c.n_b) == (2, 2)


def test_auc_excludes_null_scores_and_labels(spark):
    from rdsa_utils_spark.operators.evaluate import binary_auc

    clean = [(0.9, True), (0.7, True), (0.4, False), (0.2, False)]
    df = spark.createDataFrame(
        clean + [(None, False), (None, False), (0.5, None)],
        "score double, label boolean",
    )
    got = binary_auc(df, "score", "label").collect()[0]
    want = binary_auc(
        spark.createDataFrame(clean, "score double, label boolean"),
        "score", "label",
    ).collect()[0]
    assert (got.n_pos, got.n_neg, got.auc) == (want.n_pos, want.n_neg, want.auc)


def test_ndcg_duplicate_qrels_deduplicated(spark):
    from rdsa_utils_spark.operators.evaluate import ndcg_at_k

    runs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 1)], ["query_id", "doc_id", "rel"],
    )
    dup = qrels.unionByName(
        spark.createDataFrame([(1, "a", 1)], ["query_id", "doc_id", "rel"]),
    )
    base = ndcg_at_k(runs, qrels, 10).collect()[0]
    dedup = ndcg_at_k(runs, dup, 10).collect()[0]
    # The duplicate (lower-grade) row neither double-counts DCG nor
    # occupies an extra ideal slot: max-grade dedup keeps rel=2.
    assert (dedup.dcg, dedup.idcg, dedup.ndcg) == (base.dcg, base.idcg, base.ndcg)


def test_facades_honor_round_to_none(spark):
    from rdsa_utils_spark.operators.stats import cohens_kappa, ks_statistic

    rows = (
        [("y", "y")] * 7 + [("y", "n")] * 3 + [("n", "y")] * 2 + [("n", "n")] * 5
    )
    df = spark.createDataFrame(rows, ["ra", "rb"])
    full = cohens_kappa(df, "ra", "rb", round_to=None).collect()[0]
    rounded = cohens_kappa(df, "ra", "rb", round_to=2).collect()[0]
    assert full.kappa != rounded.kappa  # None = full precision, not 6dp
    assert rounded.kappa == round(full.kappa, 2)
    ks_rows = [(1.05, "l"), (2.0, "l"), (2.0, "l"), (2.9, "r"), (3.0, "r")]
    kdf = spark.createDataFrame(ks_rows, ["v", "s"])
    kfull = ks_statistic(kdf, "v", "s", "l", "r", round_to=None).first()["ks"]
    assert kfull == pytest.approx(1.0)  # disjoint -> exactly 1 either way
    k2 = ks_statistic(kdf, "v", "s", "l", "r", round_to=2).first()["ks"]
    assert k2 == 1.0


def test_psi_vs_reference_emits_dead_key_rows(spark):
    from rdsa_utils_spark.streaming.drift import psi_vs_reference

    ref = spark.createDataFrame(
        [("src_a", 0, 5), ("src_a", 1, 5), ("src_b", 0, 5), ("src_b", 1, 5)],
        ["source", "bin", "n_ref"],
    )
    # Window w1: only src_a emitted anything; src_b is silent.
    wc = spark.createDataFrame(
        [("w1", "w1e", "src_a", 0, 4), ("w1", "w1e", "src_a", 1, 4)],
        ["window_start", "window_end", "source", "bin", "n"],
    )
    out = {
        (r.window_start, r.source): r
        for r in psi_vs_reference(wc, ref, n_bins=2, keys=["source"]).collect()
    }
    assert ("w1", "src_b") in out, "dead key must still get a PSI row"
    dead = out[("w1", "src_b")]
    assert dead.n_b == 0 and dead.psi is not None
    # And the live key's PSI is near zero (same uniform mix).
    assert abs(out[("w1", "src_a")].psi) < 1e-6


class TestVersionedSafety:
    def test_vacuum_ignores_non_snapshot_dirs(self, spark, tmp_path):
        from rdsa_utils_spark.sources.versioned import (
            vacuum_snapshots,
            write_snapshot,
        )

        root = str(tmp_path / "ds")
        write_snapshot(spark.createDataFrame([(1,)], ["id"]), root)
        write_snapshot(spark.createDataFrame([(2,)], ["id"]), root)
        os.makedirs(f"{root}/vocab")
        os.makedirs(f"{root}/v2_experiments")
        removed = vacuum_snapshots(root, keep_last=1)
        names = {d.rsplit("/", 1)[-1] for d in removed}
        assert names == {"v00001"}
        assert os.path.isdir(f"{root}/vocab")
        assert os.path.isdir(f"{root}/v2_experiments")

    def test_vacuum_refuses_manifestless_root(self, spark, tmp_path):
        from rdsa_utils_spark.sources.versioned import (
            vacuum_snapshots,
            write_snapshot,
        )

        root = str(tmp_path / "ds")
        write_snapshot(spark.createDataFrame([(1,)], ["id"]), root)
        os.remove(f"{root}/_manifest.json")
        with pytest.raises(RuntimeError, match="refusing to vacuum"):
            vacuum_snapshots(root, keep_last=1)
        assert os.path.isdir(f"{root}/v00001")

    def test_write_retries_past_crash_orphan(self, spark, tmp_path):
        from rdsa_utils_spark.sources.versioned import (
            read_snapshot,
            snapshot_history,
            write_snapshot,
        )

        root = str(tmp_path / "ds")
        write_snapshot(spark.createDataFrame([(1,)], ["id"]), root)
        # Simulate a crash AFTER the data write, BEFORE the manifest
        # swap: the orphan dir exists but the manifest never saw it.
        spark.createDataFrame([(99,)], ["id"]).write.parquet(f"{root}/v00002")
        v = write_snapshot(spark.createDataFrame([(2,), (3,)], ["id"]), root)
        assert v == 3  # skipped the orphan's number instead of crashing
        assert read_snapshot(spark, root).count() == 2
        assert [h["version"] for h in snapshot_history(root)] == [1, 3]

    def test_manifest_recovered_from_tmp_after_torn_swap(self, spark, tmp_path):
        from rdsa_utils_spark.sources.versioned import (
            read_snapshot,
            write_snapshot,
        )

        root = str(tmp_path / "ds")
        write_snapshot(spark.createDataFrame([(1,)], ["id"]), root)
        # Simulate the non-atomic fallback's torn state: manifest
        # deleted, fully-written .tmp left behind.
        os.rename(f"{root}/_manifest.json", f"{root}/_manifest.json.tmp")
        assert read_snapshot(spark, root).count() == 1

    def test_local_manifest_swap_is_atomic_replace(self, spark, tmp_path):
        from rdsa_utils_spark.sources.objectstore import LocalFileSystemClient

        # The primitive versioned.py relies on: os.replace semantics.
        c = LocalFileSystemClient()
        a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
        c.write_text(b, "old")
        c.write_text(a, "new")
        c.replace_file(a, b)
        assert c.read_text(b) == "new" and not os.path.exists(a)


def test_conversion_attribution_matches_rowlevel_canon(spark):
    """The summary façade equals a groupBy over the canonical
    row-level operator with at-or-same-instant eligibility."""
    from rdsa_utils_spark.operators.events import (
        attribute_conversions,
        conversion_attribution,
    )

    rows = [
        (1, 10, "click", "2024-01-01 00:00:00"),
        (1, 11, "view", "2024-01-02 00:00:00"),     # same instant as conv
        (1, 12, "purchase", "2024-01-02 00:00:00"),
        (2, 20, "purchase", "2024-01-05 00:00:00"),  # organic
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts_s"],
    ).select(
        "user_id", "event_id", "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"),
    )
    summary = {
        r.touch_type: r.n_conversions
        for r in conversion_attribution(
            df, "user_id", "ts", "event_type", "purchase",
            ["click", "view"], tiebreak_col="event_id",
        ).collect()
    }
    # Same-instant view IS eligible in the summary contract.
    assert summary == {"view": 1, "(none)": 1}
    rowlevel = attribute_conversions(
        df, ["click", "view"], "purchase", include_same_instant=True,
    ).collect()
    got = {}
    for r in rowlevel:
        got[r.touch_type or "(none)"] = got.get(r.touch_type or "(none)", 0) + 1
    assert got == summary


# --------------------------------------------------------------------------
# second review pass: text / curation / classify / sampling / similarity
# --------------------------------------------------------------------------


def test_redact_pii_inplace_counts(spark):
    from rdsa_utils_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b@example.com or 10.0.0.1 call +44 1234 567890")],
        ["id", "text"],
    )
    r = redact_pii(df, "text").collect()[0]  # default: overwrite in place
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
    assert "<EMAIL>" in r.text and "<IP>" in r.text and "<PHONE>" in r.text
    # And out_col mode still matches.
    r2 = redact_pii(df, "text", out_col="red").collect()[0]
    assert (r2.n_emails, r2.n_ips, r2.n_phones) == (1, 1, 1)
    assert r2.text.startswith("mail a.b@")  # original untouched


def test_gopher_symbol_ratio_is_per_symbol(spark):
    from rdsa_utils_spark.operators.curation import gopher_rules

    # 100 words with 7 '#' and 7 '...': each ratio 0.07 <= 0.1 passes,
    # though the combined 0.14 would fail the old summed test.
    words = " ".join(["the and that with have word"] * 17)  # 102 words
    text = words + " " + "# " * 7 + "... " * 7
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = gopher_rules(df, min_words=50).collect()[0]
    assert r.rule_symbol_ratio is True
    # 12 '#' alone (ratio > 0.1) must still fail.
    bad = words + " " + "# " * 12
    r2 = gopher_rules(
        spark.createDataFrame([(1, bad)], ["doc_id", "text"]), min_words=50,
    ).collect()[0]
    assert r2.rule_symbol_ratio is False


def test_naive_bayes_keeps_tokenless_label(spark):
    from rdsa_utils_spark.operators.classify import (
        naive_bayes_score,
        train_naive_bayes,
    )

    rows = [(1, "spark rdd shuffle", "tech"), (2, "spark sql join", "tech"),
            (3, "", "empty"), (4, "   ", "empty"), (5, "", "empty")]
    df = spark.createDataFrame(rows, ["id", "text", "label"])
    model, priors = train_naive_bayes(df, "label", "text")
    assert {r.label for r in priors.collect()} == {"tech", "empty"}
    # An empty doc must be scorable as the 'empty' class (dominant prior).
    probe = spark.createDataFrame([(9, "")], ["id", "text"])
    pred = naive_bayes_score(probe, model, priors, "id", "text").collect()[0]
    assert pred.label_pred == "empty"


def test_mix_corpora_absent_source_yields_empty(spark):
    from rdsa_utils_spark.operators.sampling import mix_corpora

    df = spark.createDataFrame(
        [(i, "web") for i in range(40)], ["id", "source"],
    )
    out = mix_corpora(df, "source", "id", {"web": 0.5, "code": 0.5})
    assert out.count() == 0  # only the empty subset achieves 50/50
    ok = mix_corpora(df, "source", "id", {"web": 1.0})
    assert ok.count() == 40


def test_embedding_drift_one_sided_global(spark):
    from rdsa_utils_spark.operators.similarity import embedding_drift

    df = spark.createDataFrame(
        [([1.0, 0.0], True)] * 3, ["v", "s"],
    )  # sample B never arrived
    rows = embedding_drift(df, "v", "s").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_a == 3 and r.n_b is None and r.centroid_cos is None


def test_exact_near_dups_string_ids(spark):
    from rdsa_utils_spark.operators.similarity import cosine_near_dup_pairs_exact

    rows = [("doc-a", [1.0, 0.0]), ("doc-b", [1.0, 0.001]), ("doc-c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_near_dup_pairs_exact(df, 2, threshold=0.99).collect()
    assert [(r.id_a, r.id_b) for r in out] == [("doc-a", "doc-b")]
    assert out[0].cosine > 0.99
    # Long ids unchanged.
    ldf = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001])], ["vec_id", "embedding"],
    )
    lout = cosine_near_dup_pairs_exact(ldf, 2, threshold=0.99).collect()
    assert [(r.id_a, r.id_b) for r in lout] == [(1, 2)]


def test_bpe_and_url_validation(spark):
    from rdsa_utils_spark.operators.text import canonical_url
    from rdsa_utils_spark.operators.tokenize import bpe_train

    df = spark.createDataFrame([(1, "aa ab")], ["id", "text"])
    with pytest.raises(ValueError, match="checkpoint_every"):
        bpe_train(df, "text", num_merges=5, checkpoint_every=0)
    # Regex metacharacters in a custom strip param match literally.
    u = spark.createDataFrame(
        [("https://x.com/p?paid=1&q=2",), ("https://x.com/p?p.id=1&q=2",)],
        ["url"],
    ).select(canonical_url("url", strip_params=("p.id",)).alias("c")).collect()
    assert u[0].c == "https://x.com/p?paid=1&q=2"   # 'paid' NOT stripped
    assert u[1].c == "https://x.com/p?q=2"          # literal 'p.id' stripped


# --------------------------------------------------------------------------
# third review pass: dedup / quality / streaming
# --------------------------------------------------------------------------


def test_lsh_validates_band_split_and_keeps_id_type(spark):
    from rdsa_utils_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [("d1", "a b c d"), ("d2", "a b c d")], ["doc_id", "text"],
    )
    sig = minhash_signatures(docs, "text", num_perm=16)
    with pytest.raises(ValueError, match="divide evenly"):
        lsh_candidate_pairs(sig, "doc_id", "minhash", num_bands=5,
                            signature_length=16)
    with pytest.raises(ValueError, match="divide evenly"):
        lsh_candidate_pairs(sig, "doc_id", "minhash", num_bands=32,
                            signature_length=16)
    # Empty corpus: schema keeps the STRING id type.
    empty = sig.limit(0)
    out = lsh_candidate_pairs(empty, "doc_id", "minhash", num_bands=4)
    assert dict(out.dtypes) == {"id_a": "string", "id_b": "string"}
    assert out.count() == 0


def test_minhash_near_dedup_blank_docs_no_blowup(spark):
    from rdsa_utils_spark.operators.dedup import minhash_near_dedup

    rows = [(1, "the quick brown fox jumps over the lazy dog")] * 1
    rows += [(2, "the quick brown fox jumps over the lazy dog again")]
    rows += [(i, "") for i in range(10, 40)] + [(99, "   ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = minhash_near_dedup(df, "text", "doc_id", num_perm=16, num_bands=4)
    # All blank docs survive (Jaccard 0 — not near-dups of anything),
    # and the sentinel-signature bucket never goes quadratic.
    assert out.filter(F.length(F.trim("text")) == 0).count() == 31
    assert out.count() >= 31


def test_benford_emits_all_nine_digits(spark):
    from rdsa_utils_spark.operators.quality import benford_deviation

    # No value starts with 9 — the missing digit must still contribute.
    df = spark.createDataFrame(
        [(float(v),) for v in (1, 12, 23, 34, 45, 56, 67, 78, 81, 10)], ["v"],
    )
    rows = {r.digit: r for r in benford_deviation(df, "v").collect()}
    assert set(rows) == set(range(1, 10))
    assert rows[9].n_obs == 0
    # (0 - E)^2 / E == E for the absent digit.
    assert rows[9].chi2_contrib == pytest.approx(rows[9].expected, abs=1e-6)


def test_unique_violations_empty_frame_zero_rows_checked(spark):
    from rdsa_utils_spark.operators.quality import unique_violations

    empty = spark.createDataFrame([], "k long, v string")
    r = unique_violations(empty, "k").collect()[0]
    assert (r.violations, r.rows_checked) == (0, 0)


def test_interval_join_how_spelling_normalized(spark):
    from rdsa_utils_spark.streaming.joins import interval_join

    l = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], ["k", "lts"],
    ).select("k", F.col("lts").cast("timestamp").alias("lts"))
    r = spark.createDataFrame(
        [(2, "2024-01-01 00:00:30")], ["k", "rts"],
    ).select("k", F.col("rts").cast("timestamp").alias("rts"))
    out = interval_join(
        l, r, ["k"], "lts", "rts", "0 seconds", "1 minute", how="fullouter",
    ).collect()
    # Right-only row (k=2) must carry its key, not NULL.
    ks = sorted(row.k for row in out)
    assert ks == [1, 2]


def test_batch_dedup_within_watermark_is_deterministic(spark):
    from rdsa_utils_spark.streaming.dedup import dedup_within_watermark

    rows = [("fp1", "2024-01-01 00:05:00", 7), ("fp1", "2024-01-01 00:01:00", 3),
            ("fp2", "2024-01-01 01:00:00", 9)]
    df = spark.createDataFrame(rows, ["fp", "ts_s", "payload"]).select(
        "fp", F.col("ts_s").cast("timestamp").alias("ts"), "payload",
    )
    out = {r.fp: r.payload for r in
           dedup_within_watermark(df, ["fp"], ts_col="ts").collect()}
    # Min-event-time row survives — stable across runs/partitionings.
    assert out == {"fp1": 3, "fp2": 9}
    again = {r.fp: r.payload for r in
             dedup_within_watermark(
                 df.repartition(7), ["fp"], ts_col="ts").collect()}
    assert again == out
