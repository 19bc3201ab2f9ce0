"""Round-11 tokenizer→training-shards pipeline (VERDICT r10 task 6):

* ``bpe_encode_ids`` produces per-doc token-ID SEQUENCES pinned
  bit-equal to the Arrow ``bpe_apply`` symbol arrays (decode through
  the vocab table and compare sequences, including adjacent-repeat
  devices like banana/aaa),
* the vocab id convention (``bpe_vocab_ids``): base chars in binary
  order, EOW closing the base block, merge outputs by rank;
  colliding merge outputs keep the FIRST id (min) with a hole,
* the full link: encode ids → ``pack_sequences`` (fixed-token-budget
  packs) → ``write_training_shards`` (size-bounded shuffled shards),
  roundtripped through parquet with nothing lost.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdsa_utils_spark.operators.tokenize import (
    EOW,
    bpe_apply,
    bpe_encode_ids,
    bpe_train,
    bpe_vocab_ids,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from rdsa_utils_spark.sources.readers import read_parquet

    return read_parquet(spark, f"{SF_DIR}/documents.parquet")


def test_encode_ids_decode_equals_bpe_apply_corpus(spark):
    docs = _docs(spark)
    merges = bpe_train(docs, "text", num_merges=12)
    vocab = {
        r["id"]: r["sym"] for r in bpe_vocab_ids(docs, "text", merges).collect()
    }
    got = {
        r["doc_id"]: [vocab[i] for i in r["bpe_ids"]]
        for r in bpe_encode_ids(docs, "text", "doc_id", merges).collect()
    }
    want = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_apply(docs, "text", merges).collect()
    }
    assert got == want


def test_encode_ids_adjacent_repeats(spark):
    """The round-10 adjacency device: adjacent merge sites both fire,
    overlapping sites don't — id sequences must agree with the Arrow
    encoder on exactly these words."""
    df = spark.createDataFrame(
        [(0, "banana bandana"), (1, "aaa banana"), (2, ""), (3, "na na na")],
        "doc_id long, text string",
    )
    merges = bpe_train(df, "text", num_merges=5)
    vocab = {
        r["id"]: r["sym"] for r in bpe_vocab_ids(df, "text", merges).collect()
    }
    got = {
        r["doc_id"]: [vocab[i] for i in r["bpe_ids"]]
        for r in bpe_encode_ids(df, "text", "doc_id", merges).collect()
    }
    want = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_apply(df, "text", merges).collect()
    }
    assert got == want
    assert got[2] == []  # blank doc → empty sequence


def test_vocab_id_convention_and_collision(spark):
    df = spark.createDataFrame([(0, "abc cab")], "doc_id long, text string")
    # hand-built rules: ranks 1 and 2 both output "abc" → min id wins
    merges = [("a", "b", 9), ("ab", "c", 8), ("a", "bc", 7)]
    rows = {r["sym"]: r["id"] for r in bpe_vocab_ids(df, "text", merges).collect()}
    # block 0: chars binary-ordered then EOW
    assert rows["a"] == 0 and rows["b"] == 1 and rows["c"] == 2
    assert rows[EOW] == 3
    # block 1: merges by rank; the "abc" collision keeps rank-1's id
    # (4+1=5) and leaves rank-2's slot (6) as a hole
    assert rows["ab"] == 4
    assert rows["abc"] == 5
    assert 6 not in rows.values()


def test_encode_ids_no_merges_is_char_ids(spark):
    df = spark.createDataFrame([(0, "ba ab")], "doc_id long, text string")
    out = bpe_encode_ids(df, "text", "doc_id", []).collect()[0]["bpe_ids"]
    # vocab: a=0, b=1, </w>=2; "ba"→[1,0,2], "ab"→[0,1,2]
    assert out == [1, 0, 2, 0, 1, 2]


def test_ids_feed_pack_sequences_and_training_shards(spark, tmp_path):
    """The deliverable shape: id sequences packed to token budgets and
    written as bounded shuffled shards, with nothing lost end to end."""
    from rdsa_utils_spark.operators.sampling import pack_sequences
    from rdsa_utils_spark.sources.readers import read_parquet
    from rdsa_utils_spark.sources.writers import write_training_shards

    docs = _docs(spark).limit(200)
    merges = bpe_train(docs, "text", num_merges=8)
    ids = bpe_encode_ids(docs, "text", "doc_id", merges).withColumn(
        "n_tokens", F.size("bpe_ids").cast("long"),
    )
    packed = pack_sequences(ids, "n_tokens", "doc_id", 512, n_shards=4)
    rows = packed.select("doc_id", "n_tokens", "pack_shard", "pack_id").collect()
    assert len(rows) == 200
    assert {r["pack_shard"] for r in rows} <= set(range(4))
    # pack invariant: within a shard, docs in id order fill packs by
    # START offset — replay the prefix sums and re-derive pack_id
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["pack_shard"], r["doc_id"])):
        by_shard.setdefault(r["pack_shard"], []).append(r)
    for shard_rows in by_shard.values():
        offset = 0
        for r in shard_rows:
            assert r["pack_id"] == offset // 512
            offset += r["n_tokens"]

    out = str(tmp_path / "shards")
    write_training_shards(
        packed.select("doc_id", "bpe_ids", "pack_shard", "pack_id"),
        out, "doc_id", rows_per_shard=64,
    )
    back = read_parquet(spark, out)
    assert back.count() == 200
    assert set(back.columns) == {"doc_id", "bpe_ids", "pack_shard", "pack_id"}
    # shard size bound holds file by file
    import glob

    for f in glob.glob(f"{out}/*.parquet"):
        assert spark.read.parquet(f).count() <= 64
    # sequences survive the roundtrip byte-identically
    orig = {r["doc_id"]: r["bpe_ids"] for r in packed.select("doc_id", "bpe_ids").collect()}
    got = {r["doc_id"]: r["bpe_ids"] for r in back.select("doc_id", "bpe_ids").collect()}
    assert got == orig


def test_bpe_decode_roundtrip_corpus(spark):
    """decode(encode(text)) == whitespace-normalized text — the
    tokenizer API's round-trip law, on real corpus text."""
    from rdsa_utils_spark.operators.tokenize import bpe_decode

    docs = _docs(spark).limit(100)
    merges = bpe_train(docs, "text", num_merges=10)
    vocab = bpe_vocab_ids(docs, "text", merges)
    ids = bpe_encode_ids(docs, "text", "doc_id", merges)
    decoded = {
        r["doc_id"]: r["decoded_text"]
        for r in bpe_decode(ids, "bpe_ids", vocab).collect()
    }
    want = {
        r["doc_id"]: " ".join((r["text"] or "").split())
        for r in docs.select("doc_id", "text").collect()
    }
    assert decoded == want


def test_bpe_decode_unknown_id_is_visible(spark):
    from rdsa_utils_spark.operators.tokenize import bpe_decode

    df = spark.createDataFrame([(0, [0, 99])], "doc_id long, ids array<int>")
    out = bpe_decode(df, "ids", {"a": 0, EOW: 1}).collect()[0]["decoded_text"]
    assert "�" in out and out.startswith("a")


def test_encoders_agree_property(spark):
    """Hypothesis sweep: on random small corpora (including adjacent
    repeats, single chars, unicode letters), the three encoders agree
    — bpe_apply symbol arrays, bpe_encode_counts lengths, and
    bpe_encode_ids decoded through the vocab table."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rdsa_utils_spark.operators.tokenize import bpe_encode_counts

    word = st.text(
        alphabet=st.sampled_from(list("abcdeé¢")), min_size=1, max_size=6,
    )
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=12, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5))
    def run(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string",
        )
        merges = bpe_train(df, "text", num_merges=4)
        applied = {
            r["doc_id"]: list(r["bpe_tokens"])
            for r in bpe_apply(df, "text", merges).collect()
        }
        counts = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_encode_counts(df, "text", "doc_id", merges).collect()
        }
        vocab = {
            r["id"]: r["sym"]
            for r in bpe_vocab_ids(df, "text", merges).collect()
        }
        ids = {
            r["doc_id"]: [vocab[i] for i in r["bpe_ids"]]
            for r in bpe_encode_ids(df, "text", "doc_id", merges).collect()
        }
        assert ids == applied
        assert counts == {k: len(v) for k, v in applied.items()}

    run()
