"""Round-12: the streaming near-dedup gate applies the round-11
byte-identical collapse WITHIN each micro-batch
(streaming/dedup.write_stream_near_dedup) — an exact-dup-heavy ingest
batch must produce the same admitted set as before the collapse (the
batch operator's semantics), with within-batch work linear in
duplicate-group size instead of quadratic."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdsa_utils_spark.streaming.dedup import write_stream_near_dedup

SCHEMA = "id long, text string"


def _run(spark, src, path, state, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_near_dedup(
        stream, "text", "id", path, state, ckpt, jaccard_threshold=0.8,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_exact_dup_heavy_batch_keeps_min_id_per_group(spark, tmp_path):
    """One boilerplate page repeated many times in a batch — the
    mega-group adversary. Gate semantics: min id of each identical
    group survives (identical texts verify at J=1), plus distinct
    docs; a second batch of more copies is fully dropped against the
    store."""
    src = str(tmp_path / "feed")
    boiler = " ".join(f"w{i}" for i in range(50))
    other = " ".join(f"x{i}" for i in range(50))

    b1 = [(i, boiler) for i in range(1, 31)] + [(31, other)]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(src)
    _run(spark, src, str(tmp_path / "out"), str(tmp_path / "st"), str(tmp_path / "ck"))
    got1 = {r["id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got1 == {1, 31}

    b2 = [(i, boiler) for i in range(40, 50)]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, str(tmp_path / "out"), str(tmp_path / "st"), str(tmp_path / "ck"))
    got2 = {r["id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got2 == {1, 31}  # every later copy dropped cross-batch

    # state store holds exactly the admitted non-blank docs
    sig_ids = {r["id"] for r in spark.read.parquet(f"{tmp_path}/st/sigs").collect()}
    assert sig_ids == {1, 31}


def test_mixed_exact_and_near_dups_match_batch_semantics(spark, tmp_path):
    """Collapse + LSH interplay: exact copies of A plus a NEAR-dup of
    A in the same batch — the near-dup must still be caught through
    the representative (candidacy is inherited), and agreement with
    the one-shot batch operator holds on the whole feed."""
    from rdsa_utils_spark.operators.dedup import minhash_near_dedup

    src = str(tmp_path / "feed")
    base = [f"w{i}" for i in range(40)]
    doc_a = " ".join(base)
    near_a = " ".join(base[:-1] + ["zz"])
    distinct = " ".join(f"y{i}" for i in range(40))

    rows = [(1, doc_a), (2, doc_a), (3, doc_a), (4, near_a), (5, distinct),
            (6, ""), (7, distinct)]
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.parquet(src)
    _run(spark, src, str(tmp_path / "out"), str(tmp_path / "st"), str(tmp_path / "ck"))
    got = {r["id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}

    batch_kept = {
        r["id"]
        for r in minhash_near_dedup(df, "text", "id", jaccard_threshold=0.8).collect()
    }
    assert got == batch_kept == {1, 5, 6}


def test_replay_is_byte_identical_with_collapse(spark, tmp_path):
    """Exactly-once: re-running the same batch (fresh checkpoint dir
    blocked by ownership — so same checkpoint) overwrites its own
    partitions with identical decisions under the collapse."""
    src = str(tmp_path / "feed")
    boiler = " ".join(f"w{i}" for i in range(30))
    rows = [(i, boiler) for i in range(1, 11)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    out, st, ck = str(tmp_path / "out"), str(tmp_path / "st"), str(tmp_path / "ck")
    _run(spark, src, out, st, ck)
    first = sorted(
        tuple(r) for r in spark.read.parquet(out).select("id", "text").collect()
    )
    _run(spark, src, out, st, ck)  # no new data: replays/no-ops
    second = sorted(
        tuple(r) for r in spark.read.parquet(out).select("id", "text").collect()
    )
    assert first == second == [(1, boiler)]
