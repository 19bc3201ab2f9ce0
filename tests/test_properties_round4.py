"""Property tests for the round-4 corpus-curation wave: invariants of
span_dedup (global block uniqueness, subsequence preservation, count
conservation) and add_row_index (partitioning invariance) under
randomized corpora. Few examples each — every example runs Spark."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rdsa_utils_spark.operators.dedup import span_dedup
from rdsa_utils_spark.operators.windows import add_row_index

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

word = st.sampled_from(["a", "b", "c", "dd", "ee"])
doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)


@given(docs=corpus, k=st.integers(min_value=1, max_value=4))
@settings(**SETTINGS)
def test_span_dedup_invariants(spark, docs, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", k).collect()}

    def blocks(text):
        toks = text.split()
        return [
            " ".join(toks[i : i + k]) for i in range(0, len(toks), k)
        ]

    seen = set()
    for i, t in enumerate(docs):
        orig = blocks(t) if t.split() else []
        if not orig:
            assert i not in out  # token-less docs are dropped
            continue
        r = out[i]
        assert r["n_blocks"] == len(orig)
        kept = blocks(r["dedup_text"]) if r["dedup_text"] else []
        assert r["n_kept"] == len(kept)
        # kept blocks are a subsequence of the original blocks
        it = iter(orig)
        assert all(any(b == o for o in it) for b in kept)
        # first-occurrence semantics: kept == blocks not seen before
        # (scanning docs by id, positions in order)
        expect = []
        for b in orig:
            if b not in seen:
                expect.append(b)
                seen.add(b)
        assert kept == expect


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=1000),
        min_size=1, max_size=30, unique=True,
    ),
    parts=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_add_row_index_is_partitioning_invariant(spark, keys, parts):
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(3)
    out = add_row_index(df, ["k"], num_partitions=parts).collect()
    got = sorted((r["k"], r["row_index"]) for r in out)
    want = [(k, i) for i, k in enumerate(sorted(keys))]
    assert got == want
