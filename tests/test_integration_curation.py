"""End-to-end incremental curation pipeline (VERDICT r06 task 7):
snapshot versioning + Bloom-prefiltered incremental dedup + quality
gates (Gopher rules, frozen logreg classifier) + streaming-shaped PSI
drift monitor, composed the way a production ingest would run them.

Each piece has its own oracle/unit coverage; this file tests the
COMPOSITION: corpus snapshot in → gated, deduped batch out → next
snapshot version written → drift monitored against the v1 reference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from rdsa_utils_spark.sources.readers import read_parquet

    return read_parquet(spark, f"{sf_dir}/documents.parquet").localCheckpoint()


def test_incremental_curation_pipeline(spark, docs, tmp_path):
    from rdsa_utils_spark.operators.classify import (
        logreg_score_expr,
        train_logreg_hashed,
    )
    from rdsa_utils_spark.operators.curation import gopher_rules
    from rdsa_utils_spark.operators.dedup import (
        dedup_against_corpus,
        dedup_against_corpus_bloom,
    )
    from rdsa_utils_spark.sources.versioned import (
        read_snapshot,
        snapshot_history,
        write_snapshot,
    )
    from rdsa_utils_spark.streaming.drift import (
        psi_vs_reference,
        reference_bin_counts,
        windowed_bin_counts,
    )

    root = str(tmp_path / "corpus")

    # ---- v1: the historical corpus is snapshotted (docs 0..249) ----
    corpus_v1 = docs.filter(F.col("doc_id") < 250)
    v1 = write_snapshot(corpus_v1, root, note="initial corpus")
    assert v1 == 1

    # ---- a new batch arrives (docs 250+, includes near-copies) ----
    batch = docs.filter(F.col("doc_id") >= 250)

    # ---- incremental dedup vs the SNAPSHOT (Bloom prefilter) ----
    corpus = read_snapshot(spark, root)
    survivors = dedup_against_corpus_bloom(
        batch, corpus, "text", "doc_id", expected_items=10_000,
    )
    # bit-identical to the plain anti-join (the Bloom contract)
    plain = dedup_against_corpus(batch, corpus, "text", "doc_id")
    assert sorted(r.doc_id for r in survivors.select("doc_id").collect()) == sorted(
        r.doc_id for r in plain.select("doc_id").collect()
    )

    # ---- quality gates: Gopher rules + frozen logreg classifier ----
    gated = gopher_rules(survivors, "text", min_words=5, min_stop_words=0)
    kept_rules = gated.filter(F.col("gopher_pass"))
    # the classifier trains on the TRUSTED corpus (never the batch)
    labeled = corpus.withColumn(
        "label",
        F.array_contains(F.split(F.trim("text"), r"\s+"), "spark").cast("int"),
    )
    weights = train_logreg_hashed(
        labeled, "label", "text", "doc_id", n_features=64, iterations=3,
    )
    score = logreg_score_expr(weights.collect(), "text", n_features=64)
    kept = kept_rules.withColumn("quality", score).filter(F.col("quality") >= 0.2)
    n_kept = kept.count()
    assert 0 < n_kept <= batch.count()

    # ---- v2: corpus + curated batch becomes the next snapshot ----
    cols = [c for c in corpus.columns]
    v2 = write_snapshot(
        corpus.unionByName(kept.select(*cols)), root, note="batch 1 curated",
    )
    assert v2 == 2
    hist = snapshot_history(root)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["n_rows"] == corpus_v1.count() + n_kept
    # time travel still sees the untouched v1
    assert read_snapshot(spark, root, version=1).count() == corpus_v1.count()
    assert read_snapshot(spark, root).count() == hist[1]["n_rows"]

    # ---- drift monitor: batch n_chars distribution vs v1 reference ----
    ref = reference_bin_counts(
        read_snapshot(spark, root, version=1), "n_chars", n_bins=8, lo=0.0, hi=4000.0,
    )
    # the batch rides the same windowed path a stream would (batch
    # frames are supported by windowed_bin_counts by design)
    monitored = windowed_bin_counts(
        kept.withColumn("ts", F.to_timestamp(F.lit("2024-06-01 00:00:00"))),
        "ts", "1 hour", "n_chars", n_bins=8, lo=0.0, hi=4000.0,
    )
    psi = psi_vs_reference(monitored, ref, n_bins=8).collect()
    assert len(psi) == 1  # one window
    row = psi[0]
    assert row.n_a == corpus_v1.filter(F.col("n_chars").isNotNull()).count()
    assert row.n_b == n_kept
    # same generator distribution -> no major shift (classic 0.25 gate)
    assert row.psi is not None and 0.0 <= row.psi < 0.25


def test_curation_pipeline_rejects_redrifted_batch(spark, docs, tmp_path):
    """The same pipeline flags a genuinely shifted batch: feeding the
    monitor a truncated-text batch (n_chars collapsed toward 0) must
    push PSI over the major-shift gate."""
    from rdsa_utils_spark.sources.versioned import read_snapshot, write_snapshot
    from rdsa_utils_spark.streaming.drift import (
        psi_vs_reference,
        reference_bin_counts,
        windowed_bin_counts,
    )

    root = str(tmp_path / "corpus2")
    write_snapshot(docs.filter(F.col("doc_id") < 250), root)
    ref = reference_bin_counts(
        read_snapshot(spark, root), "n_chars", n_bins=8, lo=0.0, hi=4000.0,
    )
    shifted = (
        docs.filter(F.col("doc_id") >= 250)
        .withColumn("n_chars", (F.col("n_chars") % 50).cast("long"))
        .withColumn("ts", F.to_timestamp(F.lit("2024-06-01 00:00:00")))
    )
    monitored = windowed_bin_counts(
        shifted, "ts", "1 hour", "n_chars", n_bins=8, lo=0.0, hi=4000.0,
    )
    row = psi_vs_reference(monitored, ref, n_bins=8).collect()[0]
    assert row.psi > 0.25
