"""Tests for training-data pipeline operators: text, dedup, similarity,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_near_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from rdsa_utils_spark.operators.multimodal import (
    attach_binary_payload,
    extract_image_metadata,
    sample_frames,
)
from rdsa_utils_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_bucketed_topk,
)
from rdsa_utils_spark.operators.text import (
    bpe_ish_token_count,
    token_count,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_text_stats,
)


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, "   "), (4, "one")], "id long, text string",
    )
    out = {r["id"]: r["n"] for r in df.select("id", token_count("text").alias("n")).collect()}
    assert out == {1: 2, 2: 0, 3: 0, 4: 1}


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello, world 42")], "id long, text string")
    # hello , world 4 2 -> 5 pieces
    assert df.select(bpe_ish_token_count("text").alias("n")).first()["n"] == 5


def test_text_stats(spark):
    df = spark.createDataFrame([(1, "Ab cd.")], "id long, text string")
    row = with_text_stats(df, "text").first()
    assert row["n_tokens"] == 2
    assert row["punct_ratio"] == pytest.approx(1 / 6)
    assert row["upper_ratio"] == pytest.approx(1 / 6)
    assert row["mean_token_len"] == pytest.approx(2.5)  # "Ab", "cd."


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a solid sentence with plenty of ordinary words here"),
         (2, "!!! ??? ...")],
        "id long, text string",
    )
    rows = {r["id"]: r["quality_score"] for r in with_quality_score(df, "text").collect()}
    assert rows[1] == 1.0
    assert rows[2] < 0.75


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house"),
            (2, "le chat est dans la maison pour un moment"),
            (3, "zzz qqq www"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r["lang_pred"] for r in with_language_id(df, "text").collect()}
    assert rows[1] == "en"
    assert rows[2] == "fr"
    assert rows[3] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO WORLD  ")],
        "id long, text string",
    )
    fps = [r["fingerprint"] for r in with_fingerprint(df, "text").collect()]
    assert len(set(fps)) == 1


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same  TEXT "), (3, "different")],
        "doc_id long, text string",
    )
    out = exact_dedup(df, "text", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_minhash_pipeline_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "completely unrelated content about spark partitions and shuffles here"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string",
    )
    sigs = minhash_signatures(df, "text", num_perm=32, shingle_n=3)
    assert len(sigs.first()["minhash"]) == 32
    pairs = lsh_candidate_pairs(sigs, "doc_id", num_bands=16)
    pair_set = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in pair_set
    verified = ngram_jaccard_pairs(df, pairs, "doc_id", "text")
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert jac[(1, 2)] > 0.5
    survivors = minhash_near_dedup(
        df, "text", "doc_id", num_perm=32, num_bands=16, jaccard_threshold=0.5,
    )
    assert sorted(r["doc_id"] for r in survivors.collect()) == [1, 3]


def test_simhash_close_for_similar_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta epsilon"),
         (3, "totally different words entirely")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df, "text").collect()}

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(rows[1], rows[2]) < hamming(rows[1], rows[3])
    # Determinism across runs (hash seeds must not vary per process)
    rows2 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df, "text").collect()}
    assert rows == rows2


def test_cosine_and_brute_force_topk(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = brute_force_topk(df.filter("vec_id = 0"), df, k=2)
    rows = [(r["candidate_id"], r["cosine"]) for r in out.orderBy(F.desc("cosine")).collect()]
    assert rows[0][0] == 1 and rows[0][1] == pytest.approx(0.9938, abs=1e-3)
    assert rows[1][0] == 2


def test_lsh_topk_subset_of_brute_force_scores(spark, sf_dir):
    from rdsa_utils_spark.sources.readers import read_parquet

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(queries, emb, k=5)
    approx = lsh_bucketed_topk(queries, emb, dim=64, k=5, bits=4, num_tables=6)
    exact_rows = {(r["query_id"], r["candidate_id"]) for r in exact.collect()}
    approx_rows = approx.collect()
    assert len(approx_rows) > 0
    # approx results carry correct cosine values (spot-check against exact set)
    overlap = {(r["query_id"], r["candidate_id"]) for r in approx_rows} & exact_rows
    assert len(overlap) > 0  # some recall at these settings


def test_multimodal_metadata_and_frames(spark):
    df = spark.createDataFrame(
        [(1, "x" * 2000), (2, "short")], "doc_id long, text string",
    )
    payloads = attach_binary_payload(df, "text")
    meta = {r["doc_id"]: r for r in extract_image_metadata(payloads).collect()}
    assert meta[1]["n_bytes"] == 2000
    assert meta[1]["width"] == 2000 % 640
    assert meta[2]["n_bytes"] == 5
    frames = sample_frames(payloads, frame_stride=1024, max_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1  # 2000 // 1024 = 1 frame
    assert len(by_doc[2]) == 1  # min 1 frame
    assert len(by_doc[1][0]["frame_bytes"]) == 1024


def test_multimodal_raise_stub(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    payloads = attach_binary_payload(df, "text")
    out = extract_image_metadata(payloads, decode_stub="raise")
    with pytest.raises(Exception, match="NotImplementedError|No image codec"):
        out.collect()


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from rdsa_utils_spark.sources.readers import read_parquet
    from rdsa_utils_spark.operators.similarity import ivf_topk, ivf_train_centroids

    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(queries, emb, k=3)
    approx = ivf_topk(queries, emb, dim=64, k=3, n_cells=4, nprobe=2, iters=2)
    exact_rows = {(r["query_id"], r["candidate_id"]) for r in exact.collect()}
    approx_rows = approx.collect()
    assert len(approx_rows) == 15  # every query fills k at nprobe=2/4 cells
    overlap = {(r["query_id"], r["candidate_id"]) for r in approx_rows} & exact_rows
    assert len(overlap) >= len(exact_rows) // 2  # decent recall

    # training is deterministic: same inputs → identical centroids
    import numpy as np

    c1 = ivf_train_centroids(emb, dim=64, n_cells=4, iters=2)
    c2 = ivf_train_centroids(emb, dim=64, n_cells=4, iters=2)
    assert np.allclose(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_exact_near_dup_pairs_match_naive(spark):
    import itertools

    import numpy as np
    from rdsa_utils_spark.operators.similarity import cosine_near_dup_pairs_exact

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    vecs[11] = vecs[3] + 0.01 * rng.standard_normal(8).astype(np.float32)  # planted dup
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = cosine_near_dup_pairs_exact(df, dim=8, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in out.collect()}

    m = vecs.astype(np.float64)
    unit = m / np.linalg.norm(m, axis=1, keepdims=True)
    want = {
        (a, b): float(unit[a] @ unit[b])
        for a, b in itertools.combinations(range(40), 2)
        if unit[a] @ unit[b] >= 0.5
    }
    assert set(got) == set(want)
    assert (3, 11) in got
    for pair, cos in want.items():
        assert got[pair] == pytest.approx(cos, abs=1e-9)


def test_exact_near_dup_pairs_corpus_guard(spark):
    from rdsa_utils_spark.operators.similarity import cosine_near_dup_pairs_exact

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)], "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="max_corpus_rows"):
        cosine_near_dup_pairs_exact(df, dim=2, threshold=0.9, max_corpus_rows=3)
    # Byte guard: 5 rows × 1536 dims × 8 B = 61 KiB must exceed a 1 KiB
    # budget even though the row cap passes — wide embeddings are
    # guarded by BYTES, not rows.
    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        cosine_near_dup_pairs_exact(
            df, dim=1536, threshold=0.9, max_broadcast_bytes=1024,
        )


def test_chunk_documents_windows_and_edges(spark):
    from rdsa_utils_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "short doc"),                            # < chunk size
            (3, ""),                                     # empty -> no rows
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "text", chunk_tokens=4, overlap_tokens=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_index, r.chunk_text))
    # stride 3, bound greatest(10-1,1)=9 -> starts 1,4,7
    assert [c for _, c in sorted(by_doc[1])] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    assert by_doc[2] == [(0, "short doc")]
    assert 3 not in by_doc
    # consecutive chunks overlap by exactly overlap_tokens
    a, b = by_doc[1][0][1].split(), by_doc[1][1][1].split()
    assert a[-1:] == b[:1]

    with pytest.raises(ValueError):
        chunk_documents(docs, "text", chunk_tokens=4, overlap_tokens=4)


def test_ngram_contamination_bounds(spark):
    from rdsa_utils_spark.operators.dedup import ngram_contamination

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # identical to ref doc -> 1.0
            (2, "x y z w q r"),       # disjoint -> 0.0
            (3, "a b c d zz qq rr"),  # partial overlap
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame([(100, "a b c d e f")], "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_contamination(corpus, ref, n=3).collect()}
    assert out[1].contamination == 1.0
    assert out[2].contamination == 0.0
    assert 0.0 < out[3].contamination < 1.0
    # n_shingles counts distinct shingles: 6 tokens, n=3 -> 4 shingles
    assert out[1].n_shingles == 4 and out[1].n_contaminated == 4


def test_repetition_stats_values(spark):
    from rdsa_utils_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 6 tokens: 2 distinct; bigrams all "a b"/"b a"
            (2, "u v w x y z"),      # all distinct
            (3, "solo"),             # 1 token: no bigrams/trigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs, "text").collect()}
    r1 = out[1]
    assert r1.n_tokens == 6
    assert r1.ttr == round(2 / 6, 6)
    # bigrams: "a b" x3, "b a" x2 -> top 3/5
    assert r1.top_bigram_frac == 0.6
    # trigrams: "a b a" x2, "b a b" x2 -> (4 - 2) / 4
    assert r1.dup_trigram_frac == 0.5
    r2 = out[2]
    assert r2.ttr == 1.0
    assert r2.top_bigram_frac == 0.2  # every bigram unique: 1/5
    assert r2.dup_trigram_frac == 0.0
    r3 = out[3]
    assert (r3.n_tokens, r3.top_bigram_frac, r3.dup_trigram_frac) == (1, 0.0, 0.0)


def test_redact_pii_patterns_and_counts(spark):
    from rdsa_utils_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.1.254 port 80"),
            (3, "call +44 (0)20-7946 0958 today"),
            (4, "clean text with numbers 42 and 3.14"),
        ],
        "id long, text string",
    )
    out = {r.id: r for r in redact_pii(df, "text", out_col="red").collect()}
    assert out[1].red == "mail <EMAIL> now"
    assert out[1].n_emails == 1 and out[1].n_phones == 0
    assert out[2].red == "server at <IP> port 80"
    assert out[2].n_ips == 1
    assert "<PHONE>" in out[3].red and out[3].n_phones == 1
    assert out[4].red == out[4].text
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (0, 0, 0)
    # Counts reflect substitutions actually made: a dotted IPv4 also
    # matches the raw phone pattern but is tagged (and counted) as an
    # IP only; an email whose local part is digit-heavy never leaks
    # into the phone count.
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 1, 0)


def test_redact_pii_counts_on_progressively_redacted_text(spark):
    from rdsa_utils_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "ip 10.20.30.40 and mail 5551234567@sms.example.com end")],
        "id long, text string",
    )
    r = redact_pii(df, "text", out_col="red").collect()[0]
    assert r.red == "ip <IP> and mail <EMAIL> end"
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 0)


def test_dedup_clusters_transitive_closure(spark):
    from rdsa_utils_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3),          # chain -> cluster 1
            (10, 11), (11, 10),      # duplicate symmetric edge
            (20, 21), (21, 22), (20, 22),  # triangle -> cluster 20
            (30, 31),                # isolated pair
        ],
        "id_a long, id_b long",
    )
    out = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_dedup_clusters_deep_chain_converges(spark):
    from rdsa_utils_spark.operators.dedup import dedup_clusters

    # chain of 12 nodes: diameter 11, converges within default cap
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long",
    )
    out = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert set(out.values()) == {0}
    # the convergence cap guards the DISTRIBUTED rounds; the round-12
    # driver union-find path (below max_driver_edges) always converges,
    # so force the distributed path to exercise the guard
    with pytest.raises(RuntimeError, match="converge"):
        dedup_clusters(pairs, max_iterations=1, max_driver_edges=0)


def test_dedup_clusters_driver_path_equals_distributed(spark):
    # round-12: below max_driver_edges the label fixpoint collapses to
    # a driver union-find; both paths must return the identical
    # (id, min-component-id) table — including NULL-endpoint drop and
    # duplicate/symmetric edge handling
    import random

    from rdsa_utils_spark.operators.dedup import dedup_clusters

    rng = random.Random(1212)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(120)]
    edges += [(200, 201), (201, 200), (200, 201)]   # dup + symmetric
    pairs = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    fast = sorted(map(tuple, dedup_clusters(pairs).collect()))
    slow = sorted(map(tuple, dedup_clusters(pairs, max_driver_edges=0).collect()))
    assert fast == slow


def test_dedup_clusters_null_endpoints_fall_back_to_distributed(spark):
    # NULL endpoints define a distributed-only "supernode" semantics
    # (and NaN ids would hang a naive pandas union-find) — the fast
    # path must detect them and yield the distributed result unchanged
    from rdsa_utils_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (None, 7), (8, None), (None, None)], "id_a long, id_b long",
    )
    fast = sorted(map(tuple, dedup_clusters(pairs).collect()), key=str)
    slow = sorted(
        map(tuple, dedup_clusters(pairs, max_driver_edges=0).collect()), key=str,
    )
    assert fast == slow
    assert (1, 1) in fast and (2, 1) in fast and (7, 7) in fast and (8, 8) in fast


def test_normalize_vectors_unit_norm_and_zero_passthrough(spark):
    from rdsa_utils_spark.operators.similarity import _norm, normalize_vectors

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-2.0, 0.0])],
        "id long, embedding array<double>",
    )
    out = normalize_vectors(df, "embedding")
    norms = {r.id: r.n for r in out.select("id", _norm(F.col("embedding")).alias("n")).collect()}
    assert abs(norms[1] - 1.0) < 1e-12 and abs(norms[3] - 1.0) < 1e-12
    assert norms[2] == 0.0  # zero vector untouched, not NaN
    vals = {r.id: r.embedding for r in out.collect()}
    assert vals[1] == [0.6, 0.8] and vals[3] == [-1.0, 0.0]


def test_quantize_int8_bounds_and_reconstruction(spark):
    from rdsa_utils_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, -1.0]), (2, [0.0, 0.0, 0.0, 0.0]), (3, [0.003, 127.0])],
        "id long, embedding array<double>",
    )
    out = {r.id: (r.q, r.q_scale) for r in quantize_int8(df).collect()}
    q1, s1 = out[1]
    assert max(abs(v) for v in q1) == 127  # max-magnitude element saturates exactly
    assert all(-127 <= v <= 127 for v in q1)
    # dequantization error bounded by half a quantization step
    orig = [1.0, -0.5, 0.25, -1.0]
    assert all(abs(orig[i] - q1[i] * s1) <= s1 / 2 + 1e-12 for i in range(4))
    assert out[2] == ([0, 0, 0, 0], 0.0)  # zero vector -> zeros, scale 0
    q3, s3 = out[3]
    assert q3[1] == 127 and s3 == 1.0


def test_dedup_against_corpus(spark):
    from rdsa_utils_spark.operators.dedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lorem ipsum dolor")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "THE  quick   brown fox"),   # normalized dup of corpus 1
            (11, "entirely new document"),
            (12, "another fresh one"),
            (13, "Entirely NEW document"),    # within-batch dup of 11
        ],
        "doc_id long, text string",
    )
    out = sorted(r.doc_id for r in dedup_against_corpus(batch, corpus, "text", "doc_id").collect())
    assert out == [11, 12]  # 10 dies vs corpus; 13 loses to 11 in-batch

    with pytest.raises(ValueError, match="min.*max|max.*min"):
        dedup_against_corpus(batch, corpus, "text", "doc_id", keep="first")


class TestUnigramLmScore:
    def test_common_words_score_higher(self, spark):
        from rdsa_utils_spark.operators.text import unigram_lm_score

        rows = [(i, "the cat sat on the mat") for i in range(8)]
        rows.append((8, "zyzzyva qwertion plompf"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r.lm_logprob for r in
               unigram_lm_score(df, "text", "doc_id").collect()}
        assert out[0] > out[8]

    def test_exact_value_small_corpus(self, spark):
        """Hand-computed: corpus 'a a b' → N=3, V=2, s=0.5.
        p(a)=(2+.5)/(3+1)=0.625, p(b)=(1+.5)/4=0.375.
        doc1 'a a b' mean = (2 ln .625 + ln .375)/3."""
        import math

        from rdsa_utils_spark.operators.text import unigram_lm_score

        df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
        [row] = unigram_lm_score(df, "text", "doc_id").collect()
        expect = (2 * math.log(0.625) + math.log(0.375)) / 3
        assert row.lm_logprob == pytest.approx(round(expect, 6), abs=1e-6)
        assert row.n_lm_tokens == 3

    def test_empty_doc_gets_null_and_zero_tokens(self, spark):
        from rdsa_utils_spark.operators.text import unigram_lm_score

        df = spark.createDataFrame(
            [(1, "hello world"), (2, "   ")], "doc_id long, text string",
        )
        out = {r.doc_id: r for r in unigram_lm_score(df, "text", "doc_id").collect()}
        assert out[2].lm_logprob is None and out[2].n_lm_tokens == 0
        assert out[1].n_lm_tokens == 2

    def test_plan_is_jvm_only(self, spark):
        from rdsa_utils_spark.operators.text import unigram_lm_score

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        out = unigram_lm_score(df, "text", "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "InPandas" not in plan


def test_dedup_against_corpus_bloom_matches_exact(spark):
    """The Bloom-prefiltered variant must return exactly what the
    plain anti-join returns (false positives are removed by the exact
    confirm join), including within-batch dedup, and its plan must
    contain the broadcast bloom + might_contain prefilter."""
    from rdsa_utils_spark.operators.dedup import (
        dedup_against_corpus,
        dedup_against_corpus_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"historical document number {i}") for i in range(200)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        # 20 cross-corpus dups, 30 fresh, one within-batch dup pair.
        [(1000 + i, f"historical document number {i}") for i in range(20)]
        + [(2000 + i, f"brand new text {i}") for i in range(30)]
        + [(3000, "brand new text 0")],
        "doc_id long, text string",
    )
    exact = sorted(
        r.doc_id
        for r in dedup_against_corpus(batch, corpus, "text", "doc_id").collect()
    )
    got = sorted(
        r.doc_id
        for r in dedup_against_corpus_bloom(
            batch, corpus, "text", "doc_id", expected_items=1000,
        ).collect()
    )
    assert got == exact
    assert got[0] == 2000 and len(got) == 30

    # The probe must be pure JVM bit arithmetic against the broadcast
    # bitmap — getbit lookups, no Python, no shuffle of fresh rows.
    # The flagged frame is pinned (localCheckpoint), which hides the
    # probe from the FINAL plan — capture the pin's segment plan too.
    from rdsa_utils_spark.plans.audit import capture_lineage_cuts

    with capture_lineage_cuts() as segs:
        probed = dedup_against_corpus_bloom(batch, corpus, "text", "doc_id")
    plan = probed._jdf.queryExecution().executedPlan().toString() + "".join(
        s.get("plan", "") for s in segs
    )
    assert "getbit" in plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan

    with pytest.raises(ValueError, match="min.*max|max.*min"):
        dedup_against_corpus_bloom(batch, corpus, "text", "doc_id", keep="neither")
    with pytest.raises(ValueError, match="fpp"):
        dedup_against_corpus_bloom(batch, corpus, "text", "doc_id", fpp=1.5)
    with pytest.raises(ValueError, match="max_bloom_bytes"):
        dedup_against_corpus_bloom(
            batch, corpus, "text", "doc_id",
            expected_items=10_000_000_000,
        )


class TestProductQuantization:
    def _emb(self, spark, n=120, dim=16, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, dim)).astype("float32")
        return spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )

    def test_codebook_shape_and_determinism(self, spark):
        from rdsa_utils_spark.operators.similarity import pq_train_codebooks

        df = self._emb(spark)
        bk1 = pq_train_codebooks(df, dim=16, n_subvectors=4, n_codes=8, iters=2)
        bk2 = pq_train_codebooks(df, dim=16, n_subvectors=4, n_codes=8, iters=2)
        assert bk1.shape == (4, 8, 4)
        import numpy as np

        assert np.array_equal(bk1, bk2), "training must be deterministic"

        import pytest as _pytest

        with _pytest.raises(ValueError, match="divide evenly"):
            pq_train_codebooks(df, dim=16, n_subvectors=5)

    def test_encode_codes_in_range(self, spark):
        from rdsa_utils_spark.operators.similarity import (
            pq_encode,
            pq_train_codebooks,
        )

        df = self._emb(spark)
        bk = pq_train_codebooks(df, dim=16, n_subvectors=4, n_codes=8, iters=2)
        coded = pq_encode(df, bk).collect()
        assert len(coded) == 120
        for r in coded:
            assert len(r.pq_code) == 4
            assert all(0 <= c < 8 for c in r.pq_code)

    def test_topk_scoring_is_jvm_side(self, spark):
        """The corpus-sized ADC scoring pass must stay inside JVM
        expression evaluation: the only Python in the plan is the
        per-row encode/lut UDFs (ArrowEvalPython), never a
        MapInPandas/BatchEval over the scored cross product."""
        from rdsa_utils_spark.operators.similarity import pq_topk

        df = self._emb(spark)
        out = pq_topk(df.filter("vec_id < 5"), df, dim=16,
                      n_subvectors=4, n_codes=8, iters=1, k=3)
        rows = out.collect()
        assert {r.query_id for r in rows} == {0, 1, 2, 3, 4}
        for q in range(5):
            assert sum(1 for r in rows if r.query_id == q) == 3
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan
        assert "BatchEvalPython" not in plan


def test_jaccard_similarity_join_exact_vs_naive(spark):
    """Prefix filtering must be lossless: results equal the brute-force
    all-pairs Jaccard at several thresholds, including FP-hostile ones
    (0.9·10 = 9.000000000000002 must not shorten the prefix)."""
    from rdsa_utils_spark.operators.dedup import jaccard_similarity_join

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # 9/11 shared words with doc 1 -> J = 9/11 ≈ 0.818
        (2, "alpha beta gamma delta epsilon zeta eta theta iota lam mu"),
        # identical set to doc 1, different multiplicity/order
        (3, "kappa iota theta eta zeta epsilon delta gamma beta alpha alpha"),
        (4, "totally different words entirely here now"),
        (5, ""),
        # exact 0.9 boundary: shares 9 of its 10 with doc 6's 10 -> not 0.9;
        # instead make J exactly 9/10? impossible for distinct sets; keep edges above
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def naive(t):
        rows = df.collect()
        toks = {r.doc_id: set(r.text.split()) for r in rows if r.text.strip()}
        out = set()
        for a in toks:
            for b in toks:
                if a < b:
                    i = len(toks[a] & toks[b])
                    j = i / (len(toks[a] | toks[b]))
                    if round(j, 6) >= t:
                        out.add((a, b, round(j, 6)))
        return out

    for t in (0.5, 0.8, 0.9, 1.0):
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in jaccard_similarity_join(df, "doc_id", "text", t).collect()
        }
        assert got == naive(t), f"threshold {t}"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="threshold"):
        jaccard_similarity_join(df, "doc_id", "text", 0.0)

    # Plan hygiene: no cartesian, no Python, no global window.
    plan = jaccard_similarity_join(df, "doc_id", "text", 0.9) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan


def test_semantic_dedup_transitive_chain(spark):
    """A~B and B~C (but not A~C) must collapse to one survivor; both
    pair methods agree on this graph; unknown method raises."""
    from rdsa_utils_spark.operators.similarity import semantic_dedup

    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    # 0° ~ 25° ~ 50° chain at threshold cos(30°)≈0.866: (0,25) and
    # (25,50) are dups, (0,50) is not. 170° is isolated.
    df = spark.createDataFrame(
        [
            (1, unit(0.0)),
            (2, unit(math.radians(25))),
            (3, unit(math.radians(50))),
            (4, unit(math.radians(170))),
        ],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, dim=4, threshold=0.866, method="exact")
    assert sorted(r.vec_id for r in out.collect()) == [1, 4]

    out_lsh = semantic_dedup(
        df, dim=4, threshold=0.866, method="lsh", bits=2, num_tables=16,
    )
    assert sorted(r.vec_id for r in out_lsh.collect()) == [1, 4]

    with pytest.raises(ValueError, match="method"):
        semantic_dedup(df, dim=4, method="other")


def test_token_entropy_values(spark):
    import math

    from rdsa_utils_spark.operators.text import token_entropy_by

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one token repeated -> H = 0
            (2, "a b c d"),          # uniform over 4 -> H = ln 4
            (3, "a a b"),            # 2/3, 1/3
            (4, ""),                 # absent from output
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.entropy) for r in
           token_entropy_by(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] == (4, 0.0)
    assert out[2][1] == pytest.approx(round(math.log(4), 6), abs=1e-9)
    want3 = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert out[3][1] == pytest.approx(round(want3, 6), abs=1e-9)


def test_hashed_token_features_deterministic_and_bounded(spark):
    from rdsa_utils_spark.operators.text import hashed_token_features

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha"), (3, "")],
        "doc_id long, text string",
    )
    rows = hashed_token_features(df, "doc_id", "text", n_features=16).collect()
    by_doc = {}
    for r in rows:
        assert 0 <= r.feature < 16
        by_doc.setdefault(r.doc_id, {})[r.feature] = r.value
    # same token -> same bucket & sign on every doc
    f_alpha = [(f, v) for f, v in by_doc[2].items()][0]
    assert abs(f_alpha[1]) == 1.0
    # doc 1 has alpha twice: its bucket carries ±2 (or ±2∓1 if beta
    # collides); magnitudes are integers
    assert all(v == int(v) for d in by_doc.values() for v in d.values())
    assert 3 not in by_doc  # empty doc -> no features

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_features"):
        hashed_token_features(df, "doc_id", "text", n_features=1)


def test_containment_asymmetry_quote_in_page(spark):
    from rdsa_utils_spark.operators.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon"
    page = quote + " " + " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame([(1, quote), (2, page)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    r = containment_pairs(df, pairs, "doc_id", "text", n=3).collect()[0]
    # every shingle of the quote appears in the page
    assert r["containment_a_in_b"] == 1.0
    assert r["containment_b_in_a"] < 0.1
    assert r["jaccard"] < 0.1


# --------------------------------------------------------------------------
# embedding_drift
# --------------------------------------------------------------------------


def test_embedding_drift_identical_and_shifted(spark):
    from rdsa_utils_spark.operators.similarity import embedding_drift

    same = spark.createDataFrame(
        [([1.0, 0.0], s) for s in (True, False) for _ in range(3)],
        ["v", "s"],
    )
    r = embedding_drift(same, "v", "s").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.centroid_cos == pytest.approx(1.0, abs=1e-6)
    assert r.norm_ratio == pytest.approx(1.0, abs=1e-6)
    # B rotated 90° and doubled: cosine 0, norm ratio 2.
    rot = spark.createDataFrame(
        [([1.0, 0.0], True)] * 3 + [([0.0, 2.0], False)] * 3, ["v", "s"],
    )
    r2 = embedding_drift(rot, "v", "s").collect()[0]
    assert r2.centroid_cos == pytest.approx(0.0, abs=1e-6)
    assert r2.norm_ratio == pytest.approx(2.0, abs=1e-6)


def test_embedding_drift_hand_computed_means(spark):
    from rdsa_utils_spark.operators.similarity import embedding_drift

    # A mean = (1, 1)/... rows (2,0),(0,2) -> mean (1,1); B rows (3,3).
    df = spark.createDataFrame(
        [([2.0, 0.0], True), ([0.0, 2.0], True), ([3.0, 3.0], False)],
        ["v", "s"],
    )
    r = embedding_drift(df, "v", "s").collect()[0]
    assert r.centroid_cos == pytest.approx(1.0, abs=1e-6)  # both along (1,1)
    # mean norms: A = (2 + 2)/2 = 2, B = sqrt(18)
    assert r.mean_norm_a == pytest.approx(2.0, abs=1e-6)
    assert r.mean_norm_b == pytest.approx(18 ** 0.5, abs=1e-6)
    assert r.norm_ratio == pytest.approx(18 ** 0.5 / 2.0, abs=1e-6)


def test_embedding_drift_grouped_one_sided(spark):
    from rdsa_utils_spark.operators.similarity import embedding_drift

    rows = [("g1", [1.0, 0.0], True), ("g1", [1.0, 0.0], False),
            ("g2", [1.0, 0.0], True)]  # g2 has no B sample
    df = spark.createDataFrame(rows, ["g", "v", "s"])
    out = {r.g: r for r in embedding_drift(df, "v", "s", by=["g"]).collect()}
    assert out["g1"].centroid_cos == pytest.approx(1.0, abs=1e-6)
    assert out["g2"].n_b is None and out["g2"].centroid_cos is None


# ------------------------------------------------------ payload dedup (r7)


def test_payload_exact_dedup_keeps_min_id(spark):
    from rdsa_utils_spark.operators.multimodal import (
        attach_binary_payload,
        payload_exact_dedup,
    )

    df = attach_binary_payload(
        spark.createDataFrame(
            [(1, "same bytes"), (2, "same bytes"), (3, "other"), (4, "same bytes")],
            "doc_id long, text string",
        ),
        "text",
    )
    got = sorted(r.doc_id for r in payload_exact_dedup(df, "payload", "doc_id").collect())
    assert got == [1, 3]
    kept_max = sorted(
        r.doc_id
        for r in payload_exact_dedup(df, "payload", "doc_id", keep="max").collect()
    )
    assert kept_max == [3, 4]


def test_payload_near_dups_identical_and_edited(spark):
    """Byte-identical payloads pair at hamming 0; a small substitution
    edit pairs within the threshold; unrelated payloads don't pair."""
    from rdsa_utils_spark.operators.multimodal import (
        attach_binary_payload,
        payload_near_dups,
    )

    base = " ".join(f"tok{i:04d}" for i in range(200))
    edited = base.replace("tok0100", "tokXXXX")  # same length, one chunk touched
    other = " ".join(f"zzz{i:04d}" for i in range(200))
    df = attach_binary_payload(
        spark.createDataFrame(
            [(1, base), (2, base), (3, edited), (4, other)],
            "doc_id long, text string",
        ),
        "text",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in payload_near_dups(df, "payload", "doc_id", max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3
    assert (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_payload_near_dups_excludes_empty_and_validates_params(spark):
    import pytest as _pytest

    from rdsa_utils_spark.operators.multimodal import (
        attach_binary_payload,
        payload_near_dups,
    )

    df = attach_binary_payload(
        spark.createDataFrame(
            [(1, ""), (2, ""), (3, "content here")], "doc_id long, text string",
        ),
        "text",
    )
    # two empty payloads share sig 0 but must NOT pair
    assert payload_near_dups(df, "payload", "doc_id").count() == 0
    with _pytest.raises(ValueError, match="pigeonhole"):
        payload_near_dups(df, "payload", "doc_id", max_hamming=4, n_bands=4)
    with _pytest.raises(ValueError, match="divide 64"):
        payload_near_dups(df, "payload", "doc_id", max_hamming=2, n_bands=5)


def test_payload_simhash_matches_text_simhash_on_chunk_tokens(spark):
    """payload_simhash == simhash_signatures over the chunk-token
    string (the reuse contract), and empty payload → signature 0."""
    from rdsa_utils_spark.operators.dedup import simhash_signatures
    from rdsa_utils_spark.operators.multimodal import (
        attach_binary_payload,
        payload_chunk_tokens,
        payload_simhash,
    )

    df = attach_binary_payload(
        spark.createDataFrame(
            [(1, "hello world " * 30), (2, "")], "doc_id long, text string",
        ),
        "text",
    )
    via_payload = {
        r.doc_id: r.psimhash for r in payload_simhash(df, "payload").collect()
    }
    toked = payload_chunk_tokens(df, "payload")
    via_text = {
        r.doc_id: r.sig
        for r in simhash_signatures(toked, "chunk_tokens", "sig").collect()
    }
    assert via_payload == via_text
    assert via_payload[2] == 0
