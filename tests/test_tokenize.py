"""Distributed BPE training/encoding vs an independent pure-Python
reference implementing the same (classic Sennrich) semantics:
adjacent-pair counts weighted by word frequency (overlaps counted),
tie-break (count desc, left asc, right asc), greedy left-to-right
non-overlapping merge application in rank order."""

from __future__ import annotations

from collections import Counter

import pytest

from rdsa_utils_spark.operators.tokenize import (
    EOW,
    bpe_apply,
    bpe_merge_table,
    bpe_train,
)


# ------------------------------------------------------ pure-Python reference
def _ref_merge(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, num_merges):
    words = Counter(w for t in texts for w in t.split())
    vocab = {w: list(w) + [EOW] for w in words}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
        )
        merges.append((left, right, cnt))
        vocab = {w: _ref_merge(s, left, right) for w, s in vocab.items()}
    return merges, vocab


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest new low",
    "lowest newest widest",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = bpe_train(df, "text", num_merges=12)
    want, _ = _ref_train(TEXTS, 12)
    assert got == want


def test_bpe_apply_replays_training(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    merges = bpe_train(df, "text", num_merges=10)
    _, ref_vocab = _ref_train(TEXTS, 10)
    encoded = {
        r["text"]: r["bpe_tokens"]
        for r in bpe_apply(df, "text", merges).collect()
    }
    for t in TEXTS:
        want = [s for w in t.split() for s in ref_vocab[w]]
        assert encoded[t] == want


def test_bpe_train_exhausts_and_stops_early(spark):
    df = spark.createDataFrame([("aa aa",)], ["text"])
    merges = bpe_train(df, "text", num_merges=50)
    # "aa</w>" fully merges in 2 steps; no pairs remain after.
    assert len(merges) == 2
    assert merges[0][:2] in {("a", "a"), ("a", EOW)}


def test_bpe_merge_table_schema(spark):
    df = spark.createDataFrame([("ab ab",)], ["text"])
    merges = bpe_train(df, "text", num_merges=2)
    tbl = bpe_merge_table(spark, merges)
    assert tbl.columns == ["rank", "left", "right", "pair_count"]
    assert tbl.count() == len(merges)


def test_bpe_train_validates(spark):
    df = spark.createDataFrame([("x",)], ["text"])
    with pytest.raises(ValueError):
        bpe_train(df, "text", num_merges=0)


def test_bpe_driver_path_equals_distributed_path(spark):
    """The capped driver fast path (vocab collected once, pure-int
    merge loop) must be bit-identical to the distributed rounds —
    max_driver_vocab=0 forces the distributed path on the same data."""
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    fast = bpe_train(df, "text", num_merges=12)
    slow = bpe_train(df, "text", num_merges=12, max_driver_vocab=0)
    assert fast == slow and len(fast) == 12


def test_bpe_encode_counts_matches_bpe_apply(spark):
    """The JVM chained-replace encoder (round-10) must count exactly
    the tokens the Arrow per-word encoder emits — same rules, same
    greedy left-to-right non-overlapping semantics — including the
    zero-token blank document."""
    from rdsa_utils_spark.operators.tokenize import (
        bpe_apply,
        bpe_encode_counts,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest new newer"),
         (2, "wide wider widest new"),
         (3, ""),
         (4, "low")],
        "id long, text string",
    )
    merges = bpe_train(docs, "text", num_merges=10)
    got = {
        r["id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(docs, "text", "id", merges).collect()
    }
    ref = {
        r["id"]: len(r["bpe_tokens"])
        for r in bpe_apply(docs, "text", merges).collect()
    }
    assert {i: c for i, (_, c) in got.items()} == ref
    assert got[3] == (0, 0)
    # a fully-merged training word encodes to ONE symbol (low</w>)
    assert got[4] == (1, 1)


def test_bpe_encode_counts_no_merges_counts_chars_plus_eow(spark):
    from rdsa_utils_spark.operators.tokenize import bpe_encode_counts

    docs = spark.createDataFrame([(1, "ab cde")], "id long, text string")
    got = bpe_encode_counts(docs, "text", "id", []).collect()[0]
    # "ab" -> a,b,</w> (3) + "cde" -> c,d,e,</w> (4)
    assert (got["n_words"], got["n_bpe_tokens"]) == (2, 7)


def test_bpe_encode_counts_adjacent_merge_sites(spark):
    """The round-10 review catch: a single-separator replace rendering
    consumes the boundary shared by two ADJACENT merge sites and
    silently skips the second ('banana' + (a,n) encoded 6 tokens
    instead of 5). The double-separator device must agree with the
    greedy fold on adjacent repeats, overlapping repeats, and chained
    merges built on merged symbols."""
    from rdsa_utils_spark.operators.tokenize import (
        bpe_apply,
        bpe_encode_counts,
    )

    docs = spark.createDataFrame(
        [(1, "banana"), (2, "aaaa"), (3, "aaa"), (4, "abab abab"),
         (5, "lowlow"), (6, "nn")],
        "id long, text string",
    )
    merges = [("a", "n", 0), ("an", "an", 0), ("a", "a", 0),
              ("aa", "aa", 0), ("a", "b", 0), ("ab", "ab", 0),
              ("l", "o", 0), ("lo", "w", 0), ("n", "</w>", 0)]
    got = {
        r["id"]: r["n_bpe_tokens"]
        for r in bpe_encode_counts(docs, "text", "id", merges).collect()
    }
    ref = {
        r["id"]: len(r["bpe_tokens"])
        for r in bpe_apply(docs, "text", merges).collect()
    }
    assert got == ref
    # the canonical case pinned by value: b·anan·a·</w>
    assert got[1] == 4


def test_shared_words_frame_paths_identical(spark):
    """r12: every BPE entry point accepts a precomputed (word, cnt)
    dictionary via ``words=`` so pipelines chaining train/encode/vocab
    derive the corpus dictionary ONCE. The parameter must be a pure
    plumbing change: identical merges, counts, id sequences and vocab
    table with and without it."""
    from rdsa_utils_spark.operators.tokenize import (
        bpe_encode_counts,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab_ids,
        word_counts,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest"),
         (3, "low new low"), (4, "  "), (5, "wider widest")],
        "id long, text string",
    )
    words = word_counts(docs, "text").localCheckpoint(eager=False)

    m_plain = bpe_train(docs, "text", num_merges=6)
    m_words = bpe_train(docs, "text", num_merges=6, words=words)
    assert m_plain == m_words

    counts = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert counts(
        bpe_encode_counts(docs, "text", "id", m_plain),
    ) == counts(bpe_encode_counts(docs, "text", "id", m_plain, words=words))
    assert counts(
        bpe_encode_ids(docs, "text", "id", m_plain),
    ) == counts(bpe_encode_ids(docs, "text", "id", m_plain, words=words))
    assert counts(
        bpe_vocab_ids(docs, "text", m_plain),
    ) == counts(bpe_vocab_ids(docs, "text", m_plain, words=words))
    # the large-tokenizer broadcast-join path accepts it too
    assert counts(
        bpe_encode_ids(docs, "text", "id", m_plain, max_literal_vocab=1),
    ) == counts(
        bpe_encode_ids(
            docs, "text", "id", m_plain, max_literal_vocab=1, words=words,
        ),
    )
