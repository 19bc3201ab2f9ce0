"""Round-12 ADVICE items:

* ``bpe_encode_ids`` large-vocab fallback (join against
  ``bpe_vocab_ids`` instead of a 2·|vocab|-node map literal) is
  bit-equal to the literal path.
* ``capture_lineage_cuts`` holds its reentrancy guard across the
  WHOLE wrapped call, so a ``toPandas`` whose implementation calls
  ``collect`` internally records exactly ONE segment.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdsa_utils_spark.operators.tokenize import (
    bpe_encode_ids,
    bpe_train,
)


def test_bpe_encode_ids_join_fallback_equals_literal_path(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(40)
        .localCheckpoint(eager=True)
    )
    merges = bpe_train(docs, "text", num_merges=10)
    lit = {
        r["doc_id"]: r["bpe_ids"]
        for r in bpe_encode_ids(docs, "text", "doc_id", merges).collect()
    }
    # max_literal_vocab=1 forces the broadcast-join path on any corpus
    joined = {
        r["doc_id"]: r["bpe_ids"]
        for r in bpe_encode_ids(
            docs, "text", "doc_id", merges, max_literal_vocab=1,
        ).collect()
    }
    assert lit == joined
    assert any(len(v) > 0 for v in lit.values())


def test_bpe_join_fallback_empty_merges(spark):
    df = spark.createDataFrame(
        [(0, "ab ab"), (1, "")], "doc_id long, text string",
    )
    lit = {r["doc_id"]: r["bpe_ids"] for r in
           bpe_encode_ids(df, "text", "doc_id", []).collect()}
    jn = {r["doc_id"]: r["bpe_ids"] for r in
          bpe_encode_ids(df, "text", "doc_id", [], max_literal_vocab=0).collect()}
    assert lit == jn
    assert jn[1] == []


def test_capture_records_one_segment_per_topandas(spark):
    from rdsa_utils_spark.plans.audit import capture_lineage_cuts

    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("x"))
    with capture_lineage_cuts() as segments:
        df.toPandas()
    kinds = [g["kind"] for g in segments]
    assert kinds == ["toPandas"], (
        f"expected exactly one toPandas segment, got {kinds} — a nested "
        "collect re-entered the patch (ADVICE r11 reentrancy hold)"
    )


def test_capture_nested_guard_does_not_leak(spark):
    """After a guarded call, subsequent materializations still record
    (the busy flag must reset even on the nested-return path)."""
    from rdsa_utils_spark.plans.audit import capture_lineage_cuts

    df = spark.range(5)
    with capture_lineage_cuts() as segments:
        df.toPandas()
        df.count()
        df.collect()
    kinds = [g["kind"] for g in segments]
    assert kinds == ["toPandas", "count", "collect"]
