"""Unit tests for operators/sampling.py — deterministic splits,
stratified sampling, per-group caps and vocabularies.

The determinism claims are the contract: same input + seed → identical
selection, independent of partitioning and of what OTHER rows exist
(subset invariance — the property ``randomSplit``/``sampleBy`` lack).
"""

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.sampling import (
    cap_per_group,
    deterministic_split,
    hash_uniform,
    stratified_sample,
    vocabulary,
)


def _ids(spark, n, partitions=4):
    return spark.range(0, n, 1, partitions).withColumnRenamed("id", "doc_id")


def test_hash_uniform_in_unit_interval_and_deterministic(spark):
    df = _ids(spark, 500).select(
        "doc_id", hash_uniform("doc_id", "s1").alias("u"),
    )
    stats = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("mean"),
    ).first()
    assert 0.0 <= stats.lo and stats.hi < 1.0
    assert 0.4 < stats.mean < 0.6  # 500 draws, crude uniformity
    again = _ids(spark, 500, partitions=13).select(
        "doc_id", hash_uniform("doc_id", "s1").alias("u"),
    )
    assert df.exceptAll(again).isEmpty()  # partitioning-independent


def test_deterministic_split_weights_and_subset_invariance(spark):
    full = deterministic_split(
        _ids(spark, 2000), "doc_id", {"train": 0.75, "val": 0.125, "test": 0.125},
    )
    counts = {r.split: r.n for r in full.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] - 1500) < 150  # ~0.75 of 2000

    # growing the corpus must not move existing rows between splits
    subset = deterministic_split(
        _ids(spark, 400), "doc_id", {"train": 0.75, "val": 0.125, "test": 0.125},
    )
    joined = subset.alias("s").join(full.alias("f"), "doc_id").filter(
        F.col("s.split") != F.col("f.split"),
    )
    assert joined.isEmpty()


def test_deterministic_split_rejects_bad_weights(spark):
    df = _ids(spark, 10)
    with pytest.raises(ValueError):
        deterministic_split(df, "doc_id", {})
    with pytest.raises(ValueError):
        deterministic_split(df, "doc_id", {"a": 1.0, "b": -0.5})


def test_stratified_sample_composable_and_seed_sensitive(spark):
    df = _ids(spark, 1000).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("zh"),
    )
    once = stratified_sample(df, "lang", 0.5, "doc_id", seed="a")
    twice = stratified_sample(once, "lang", 0.5, "doc_id", seed="a")
    # same seed: idempotent selection (P(keep twice) == P(keep once))
    assert once.exceptAll(twice).isEmpty() and twice.exceptAll(once).isEmpty()
    other = stratified_sample(once, "lang", 0.5, "doc_id", seed="b")
    # independent seeds compose to ~0.25
    assert 150 < other.count() < 350

    mapped = stratified_sample(df, "lang", {"en": 1.0}, "doc_id")
    langs = {r.lang for r in mapped.select("lang").distinct().collect()}
    assert langs == {"en"}  # absent strata default to rate 0

    with pytest.raises(ValueError):
        stratified_sample(df, "lang", 1.5, "doc_id")
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": -0.1}, "doc_id")


def test_cap_per_group_keeps_first_n_deterministically(spark):
    df = _ids(spark, 100).withColumn("grp", (F.col("doc_id") % 4).cast("string"))
    capped = cap_per_group(df, "grp", 5, tiebreak_col="doc_id")
    per = capped.groupBy("grp").agg(
        F.count("*").alias("n"), F.max("doc_id").alias("hi"),
    ).collect()
    assert all(r.n == 5 for r in per)
    # ordered by doc_id: group k keeps k, k+4, ..., k+16
    assert {r.grp: r.hi for r in per} == {"0": 16, "1": 17, "2": 18, "3": 19}
    assert "__cap_rank__" not in capped.columns

    with pytest.raises(ValueError):
        cap_per_group(df, "grp", 0, tiebreak_col="doc_id")
    with pytest.raises(ValueError):
        cap_per_group(df, "grp", 5)  # no ordering -> nondeterministic


def test_cap_per_group_order_col_overrides(spark):
    df = spark.createDataFrame(
        [("a", 1, 9.0), ("a", 2, 1.0), ("a", 3, 5.0), ("b", 4, 2.0)],
        "grp string, id long, score double",
    )
    best = cap_per_group(df, "grp", 1, order_col=F.desc("score"), tiebreak_col="id")
    assert {r.grp: r.id for r in best.collect()} == {"a": 1, "b": 4}


def test_vocabulary_counts_min_count_and_k(spark):
    df = spark.createDataFrame(
        [("The the the cat",), ("cat sat",), ("",), ("   ",)],
        "text string",
    )
    vocab = {r.term: r.term_count for r in vocabulary(df, "text").collect()}
    assert vocab == {"the": 3, "cat": 2, "sat": 1}
    top = vocabulary(df, "text", min_count=2, k=1).collect()
    assert [(r.term, r.term_count) for r in top] == [("the", 3)]


class TestPackSequences:
    def test_offset_packing_single_shard(self, spark):
        from rdsa_utils_spark.operators.sampling import pack_sequences

        df = spark.createDataFrame(
            [(1, 3), (2, 3), (3, 3), (4, 3)], "id long, n_tok long",
        )
        out = pack_sequences(df, "n_tok", "id", target_tokens=6, n_shards=1)
        got = {r.id: (r.pack_shard, r.pack_id) for r in out.collect()}
        # stream: starts 0,3,6,9 → packs 0,0,1,1
        assert got == {1: (0, 0), 2: (0, 0), 3: (0, 1), 4: (0, 1)}

    def test_long_doc_leaves_gap_ids(self, spark):
        from rdsa_utils_spark.operators.sampling import pack_sequences

        df = spark.createDataFrame(
            [(1, 2000), (2, 10)], "id long, n_tok long",
        )
        out = pack_sequences(df, "n_tok", "id", target_tokens=512, n_shards=1)
        got = {r.id: r.pack_id for r in out.collect()}
        assert got[1] == 0        # starts at offset 0
        assert got[2] == 3        # starts at offset 2000 → pack 3

    def test_deterministic_and_bounded_overhang(self, spark, sf_dir):
        from rdsa_utils_spark.operators.sampling import pack_sequences
        from rdsa_utils_spark.operators.text import token_count

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", token_count("text").alias("n_tok"),
        )
        a = pack_sequences(docs, "n_tok", "doc_id", 512, n_shards=4, seed="s")
        b = pack_sequences(docs, "n_tok", "doc_id", 512, n_shards=4, seed="s")
        pa = a.orderBy("doc_id").toPandas()
        assert pa.equals(b.orderBy("doc_id").toPandas())
        # every pack's total ≤ target + (max doc in pack) - 1: docs are
        # laid contiguously and each STARTS inside the pack's window
        stats = (
            a.groupBy("pack_shard", "pack_id")
            .agg(F.sum("n_tok").alias("total"), F.max("n_tok").alias("mx"))
            .collect()
        )
        assert stats and all(r.total <= 512 + r.mx - 1 for r in stats)
        # sharding is a partition of the corpus
        assert a.count() == docs.count()

    def test_rejects_bad_params(self, spark):
        from rdsa_utils_spark.operators.sampling import pack_sequences

        df = spark.createDataFrame([(1, 1)], "id long, n_tok long")
        with pytest.raises(ValueError, match="target_tokens"):
            pack_sequences(df, "n_tok", "id", 0)
        with pytest.raises(ValueError, match="n_shards"):
            pack_sequences(df, "n_tok", "id", 10, n_shards=0)

    def test_single_shuffle_plan(self, spark, sf_dir):
        from rdsa_utils_spark.operators.sampling import pack_sequences
        from rdsa_utils_spark.operators.text import token_count

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", token_count("text").alias("n_tok"),
        )
        out = pack_sequences(docs, "n_tok", "doc_id", 512)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "Join" not in plan and "InPandas" not in plan


class TestDeterministicShuffle:
    def test_reproducible_and_seed_sensitive(self, spark):
        from rdsa_utils_spark.operators.sampling import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(200)], "id long")
        a = [r.id for r in deterministic_shuffle(df, "id", seed="e0").collect()]
        b = [r.id for r in deterministic_shuffle(df, "id", seed="e0").collect()]
        c = [r.id for r in deterministic_shuffle(df, "id", seed="e1").collect()]
        assert a == b                      # identical across runs
        assert a != c                      # a new seed reorders
        assert sorted(a) == list(range(200))  # a permutation, not a sample
        assert a != list(range(200))       # actually shuffled

    def test_partition_layout_invariance(self, spark):
        """The order is a pure function of (id, seed): repartitioning
        the input must not change it — the property orderBy(rand)
        lacks."""
        from rdsa_utils_spark.operators.sampling import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(200)], "id long")
        a = [r.id for r in deterministic_shuffle(df, "id").collect()]
        b = [r.id for r in deterministic_shuffle(df.repartition(7), "id").collect()]
        assert a == b

    def test_no_single_partition_bottleneck(self, spark):
        from rdsa_utils_spark.operators.sampling import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(200)], "id long")
        out = deterministic_shuffle(df, "id", num_partitions=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan
        assert "SinglePartition" not in plan
        assert out.rdd.getNumPartitions() == 8


def test_weighted_sample_proportional_and_deterministic(spark):
    from rdsa_utils_spark.operators.sampling import weighted_sample
    from pyspark.sql import functions as F  # noqa: F401

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample(df, "id", "w", k=100)
    ids = sorted(r.id for r in out.collect())
    assert len(ids) == 100
    # Heavy ids (w=100, 50 of them) should nearly all be selected.
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 45
    # Deterministic: identical rerun.
    again = sorted(r.id for r in weighted_sample(df, "id", "w", k=100).collect())
    assert ids == again
    # Non-positive weights never selected.
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double")
    assert [r.id for r in weighted_sample(df2, "id", "w", k=10).collect()] == [3]
    import pytest

    with pytest.raises(ValueError):
        weighted_sample(df, "id", "w", k=0)


def test_split_leakage_report_counts(spark):
    from rdsa_utils_spark.operators.sampling import split_leakage_report

    df = spark.createDataFrame(
        [
            ("train", 1, "shared text one"),
            ("train", 2, "shared  TEXT one"),   # same fingerprint as 1
            ("train", 3, "train only"),
            ("val", 4, "Shared text ONE"),      # leaks from train (1 row)
            ("val", 5, "val only"),
            ("test", 6, "shared text one"),     # leaks from train AND val
            ("test", 7, "shared text one "),    # second leaked test row
            ("test", 8, "val only"),            # leaks from val
        ],
        "split string, doc_id long, text string",
    )
    out = {
        (r.split_a, r.split_b): (r.n_shared_fingerprints, r.n_leaked_rows_b)
        for r in split_leakage_report(df, "split", "text").collect()
    }
    # NB lexical pair order: test < train < val; n_leaked_rows_b counts
    # rows on the split_b side of each pair.
    assert out[("train", "val")] == (1, 1)    # digest S; val has 1 S-row
    assert out[("test", "train")] == (1, 2)   # digest S; train has 2 S-rows
    assert out[("test", "val")] == (2, 2)     # digests S+V; val rows 1+1


def test_weighted_sample_per_group(spark):
    from rdsa_utils_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_per_group,
    )

    rows = [(g, i, float(1 + i % 7)) for g in ("a", "b", "c") for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    out = weighted_sample_per_group(df, "id", "w", 5, ["g"])
    got = out.groupBy("g").count().collect()
    assert {r.g: r["count"] for r in got} == {"a": 5, "b": 5, "c": 5}
    # Per-group result == global weighted_sample run on that group alone
    # (same key, same tiebreak) — the grouped form is a pure refinement.
    one = sorted(
        r.id for r in out.filter(F.col("g") == "a").collect()
    )
    solo = sorted(
        r.id
        for r in weighted_sample(
            df.filter(F.col("g") == "a"), "id", "w", 5,
        ).collect()
    )
    assert one == solo
    # Zero/negative weights excluded entirely.
    z = spark.createDataFrame([("a", 1, 0.0), ("a", 2, -3.0)], ["g", "id", "w"])
    assert weighted_sample_per_group(z, "id", "w", 3, ["g"]).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_sample_per_group(df, "id", "w", 0, ["g"])
    with _pt.raises(ValueError):
        weighted_sample_per_group(df, "id", "w", 3, [])
