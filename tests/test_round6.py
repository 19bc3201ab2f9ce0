"""Round-6 regression tests: ADVICE.md fixes — temporal_split /
temperature_resample repairs are covered by the re-enabled round-5b
tests; here we pin the move_file directory-target contract, the
merge_upsert crash-recovery helper, and the streamed zip_folder."""

from __future__ import annotations

import zipfile

import pytest

from rdsa_utils_spark.sources.objectstore import (
    HadoopFileSystemClient,
    LocalFileSystemClient,
)
from rdsa_utils_spark.sources.writers import merge_upsert, recover_merge_upsert


# ---------------------------------------------------------------------------
# move_file with a DIRECTORY at dst (ADVICE medium): must raise without
# overwrite, and must REPLACE (never nest into) the dir with overwrite.
# ---------------------------------------------------------------------------


def _seed_move_case(tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("new")
    dst = tmp_path / "dst"
    dst.mkdir()
    (dst / "stale.txt").write_text("old")
    return str(src), str(dst)


def test_local_move_file_onto_directory(tmp_path):
    fs = LocalFileSystemClient()
    src, dst = _seed_move_case(tmp_path)
    with pytest.raises(FileExistsError):
        fs.move_file(src, dst)
    fs.move_file(src, dst, overwrite=True)
    # dst is now the FILE (replaced, not nested as dst/src.txt)
    assert (tmp_path / "dst").is_file()
    assert (tmp_path / "dst").read_text() == "new"
    assert not (tmp_path / "src.txt").exists()


def test_hadoop_move_file_onto_directory(spark, tmp_path):
    fs = HadoopFileSystemClient(spark)
    src, dst = _seed_move_case(tmp_path)
    with pytest.raises(FileExistsError):
        fs.move_file(src, dst)
    fs.move_file(src, dst, overwrite=True)
    assert (tmp_path / "dst").is_file()
    assert (tmp_path / "dst").read_text() == "new"
    assert not (tmp_path / "src.txt").exists()


# ---------------------------------------------------------------------------
# recover_merge_upsert: roll forward / back after a simulated mid-swap crash.
# ---------------------------------------------------------------------------


def _rows(spark, pairs, part=None):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "k int, v string")
    if part is not None:
        df = df.withColumn("p", F.lit(part))
    return df


def test_recover_noop_on_clean_target(spark, tmp_path):
    path = str(tmp_path / "clean")
    merge_upsert(spark, _rows(spark, [(1, "a")]), path, keys=["k"])
    assert recover_merge_upsert(spark, path) == []
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a")}


def test_recover_whole_dataset_rolls_forward_from_stage(spark, tmp_path):
    import shutil

    path = str(tmp_path / "whole")
    merge_upsert(spark, _rows(spark, [(1, "old")]), path, keys=["k"])
    # Simulate: merged stage written, live moved aside, crash before
    # stage→live.
    _rows(spark, [(1, "new")]).write.parquet(path + "__stage__")
    shutil.move(path, path + "__old__")
    restored = recover_merge_upsert(spark, path)
    assert restored == ["<root>"]
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "new")}  # forward: staged merge wins
    import os

    assert not os.path.exists(path + "__old__")
    assert not os.path.exists(path + "__stage__")


def test_recover_partitioned_missing_partition(spark, tmp_path):
    import os
    import shutil

    path = str(tmp_path / "parts")
    base = _rows(spark, [(1, "a")], part="p1").unionByName(
        _rows(spark, [(2, "b")], part="p2"),
    )
    base.write.partitionBy("p").parquet(path)
    # Simulate crash: partition p=p1 moved aside, staged replacement
    # exists but was not moved in; p=p2 untouched.
    os.makedirs(path + "__old__")
    shutil.move(f"{path}/p=p1", path + "__old__/p=p1")
    os.makedirs(path + "__stage__")
    _rows(spark, [(1, "a2")], part="p1").write.partitionBy("p").parquet(
        path + "__stage__tmp",
    )
    shutil.move(path + "__stage__tmp/p=p1", path + "__stage__/p=p1")
    restored = recover_merge_upsert(spark, path)
    assert restored == ["p=p1"]
    got = {(r.k, r.v, r.p) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a2", "p1"), (2, "b", "p2")}  # forward to staged


def test_recover_partitioned_rolls_back_without_stage(spark, tmp_path):
    import os
    import shutil

    path = str(tmp_path / "parts_rb")
    _rows(spark, [(1, "a")], part="p1").write.partitionBy("p").parquet(path)
    os.makedirs(path + "__old__")
    shutil.move(f"{path}/p=p1", path + "__old__/p=p1")
    restored = recover_merge_upsert(spark, path)
    assert restored == ["p=p1"]
    got = {(r.k, r.v, r.p) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a", "p1")}  # back: old copy restored


# ---------------------------------------------------------------------------
# zip_folder: archive streamed to the FS sink, content still valid.
# ---------------------------------------------------------------------------


def test_hadoop_zip_folder_streamed_archive_is_valid(spark, tmp_path):
    fs = HadoopFileSystemClient(spark)
    src = tmp_path / "zsrc"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("beta")
    out = tmp_path / "out.zip"
    assert fs.zip_folder(str(src), str(out))
    with zipfile.ZipFile(out) as zf:
        names = sorted(zf.namelist())
        assert names == ["a.txt", "sub/b.txt"]
        assert zf.read("a.txt") == b"alpha"
        assert zf.read("sub/b.txt") == b"beta"
        assert zf.testzip() is None


# ---------------------------------------------------------------------------
# Curation operators: DSIR, Gopher rules, C4 line filter.
# ---------------------------------------------------------------------------


def test_dsir_upweights_target_like_docs(spark):
    from pyspark.sql import functions as F

    from rdsa_utils_spark.operators.curation import dsir_log_weights

    rows = [(i, "the quick brown fox jumps over the lazy dog", "en") for i in range(20)]
    rows += [(100 + i, "der schnelle braune fuchs springt über den hund", "de") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    target = df.filter(F.col("lang") == "en")
    w = dsir_log_weights(df, target, "doc_id")
    means = {
        r.lang: r.m
        for r in w.groupBy("lang").agg(F.avg("dsir_logw").alias("m")).collect()
    }
    assert means["en"] > means["de"]


def test_dsir_empty_doc_gets_zero_weight(spark):
    from rdsa_utils_spark.operators.curation import dsir_log_weights

    df = spark.createDataFrame(
        [(1, "some words here"), (2, ""), (3, "   ")], "doc_id int, text string",
    )
    w = dsir_log_weights(df, df.filter("doc_id = 1"), "doc_id")
    got = {r.doc_id: r.dsir_logw for r in w.collect()}
    assert got[2] == 0.0 and got[3] == 0.0


def test_dsir_select_deterministic_and_guards(spark):
    import pytest as _pytest

    from rdsa_utils_spark.operators.curation import dsir_select

    rows = [(i, f"token{i % 7} filler words {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    target = df.filter("doc_id < 10")
    a = [r.doc_id for r in dsir_select(df, target, 10, "doc_id").collect()]
    b = [r.doc_id for r in dsir_select(df, target, 10, "doc_id").collect()]
    assert a == b and len(a) == 10
    with _pytest.raises(ValueError):
        dsir_select(df, target, 0, "doc_id")
    with _pytest.raises(ValueError):
        dsir_select(df, target, 5, "doc_id", temperature=0)


def test_gopher_rules_flags(spark):
    from rdsa_utils_spark.operators.curation import gopher_rules

    good = "the cat and the dog have fun with all of their friends in the sunny park today"
    bullets = "- one two three four five six\n- seven eight nine ten the of"
    symbols = "the of " + "# " * 20
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, "")],
        "doc_id int, text string",
    )
    g = {r.doc_id: r for r in gopher_rules(df, min_words=5).collect()}
    assert g[1].gopher_pass
    assert not g[2].rule_bullet_ratio and not g[2].gopher_pass
    assert not g[3].rule_symbol_ratio and not g[3].gopher_pass
    assert not g[4].rule_word_count and not g[4].gopher_pass


def test_c4_line_filter_rules(spark):
    from rdsa_utils_spark.operators.curation import c4_line_filter

    text = (
        "This line is long enough and ends well.\n"
        "too short.\n"
        "No terminal punctuation on this line\n"
        "Enable javascript to view this page.\n"
        "Lorem Ipsum dolor sit amet here.\n"
        'A quoted line also counts as terminal."'
    )
    df = spark.createDataFrame(
        [(1, text), (2, "nothing survives here")], "doc_id int, text string",
    )
    out = c4_line_filter(df)
    rows = {r.doc_id: r for r in out.collect()}
    assert 2 not in rows  # zero kept lines -> document dropped
    kept = rows[1].clean_text.split("\n")
    assert kept == [
        "This line is long enough and ends well.",
        'A quoted line also counts as terminal."',
    ]
    assert rows[1].n_lines_kept == 2 and rows[1].n_lines_dropped == 4


def test_c4_line_filter_no_terminal_punct_mode(spark):
    from rdsa_utils_spark.operators.curation import c4_line_filter

    df = spark.createDataFrame(
        [(1, "plain line with enough words here")], "doc_id int, text string",
    )
    out = c4_line_filter(df, require_terminal_punct=False)
    assert out.count() == 1


# ---------------------------------------------------------------------------
# Logistic regression over hashed features (classify.py).
# ---------------------------------------------------------------------------


def test_logreg_learns_separable_data(spark):
    from pyspark.sql import functions as F

    from rdsa_utils_spark.operators.classify import (
        logreg_score_hashed,
        train_logreg_hashed,
    )

    rows = [(i, "good clean prose sentence here", 1) for i in range(30)]
    rows += [(100 + i, "zzgarbage qqnoise xxjunk tokens", 0) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, text string, y int")
    w = train_logreg_hashed(df, "y", "text", "doc_id", n_features=64, iterations=8, lr=1.0)
    s = logreg_score_hashed(df, w, "text", "doc_id", n_features=64)
    means = {r.y: r.m for r in s.groupBy("y").agg(F.avg("prob").alias("m")).collect()}
    assert means[1] > 0.9 and means[0] < 0.1
    acc = (
        s.withColumn("pred", (F.col("prob") >= 0.5).cast("int"))
        .filter(F.col("pred") == F.col("y"))
        .count()
    )
    assert acc == 60


def test_logreg_deterministic_across_partitionings(spark):
    from rdsa_utils_spark.operators.classify import train_logreg_hashed

    rows = [(i, f"tok{i % 5} common words {i % 3}", i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string, y int")
    w1 = train_logreg_hashed(df.repartition(1), "y", "text", "doc_id", n_features=32, iterations=4)
    w8 = train_logreg_hashed(df.repartition(8), "y", "text", "doc_id", n_features=32, iterations=4)
    assert w1.orderBy("feature").collect() == w8.orderBy("feature").collect()


def test_logreg_single_class_and_guards(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from rdsa_utils_spark.operators.classify import (
        logreg_score_hashed,
        train_logreg_hashed,
    )

    df = spark.createDataFrame(
        [(1, "all positive here", 1), (2, "also positive text", 1)],
        "doc_id int, text string, y int",
    )
    w = train_logreg_hashed(df, "y", "text", "doc_id", n_features=16, iterations=2)
    s = logreg_score_hashed(df, w, "text", "doc_id", n_features=16)
    assert all(r.prob > 0.5 for r in s.collect())
    with _pytest.raises(ValueError):
        train_logreg_hashed(df, "y", "text", "doc_id", iterations=0)
    with _pytest.raises(ValueError):
        train_logreg_hashed(df, "y", "text", "doc_id", lr=-1)
    with _pytest.raises(ValueError):
        train_logreg_hashed(df.filter("doc_id > 99"), "y", "text", "doc_id")


def test_logreg_feature_modes(spark):
    import pytest as _pytest

    from rdsa_utils_spark.operators.classify import train_logreg_hashed

    df = spark.createDataFrame(
        [(1, "a a a b", 1), (2, "c d", 0)], "doc_id int, text string, y int",
    )
    for mode in ("presence", "tf", "count"):
        w = train_logreg_hashed(
            df, "y", "text", "doc_id", n_features=8, iterations=1, feature_mode=mode,
        )
        assert w.count() == 9
    with _pytest.raises(ValueError):
        train_logreg_hashed(df, "y", "text", "doc_id", feature_mode="nope")


# ---------------------------------------------------------------------------
# Token-budget mixing and leakage-safe splits (sampling.py).
# ---------------------------------------------------------------------------


def test_token_budget_mix_equals_naive_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rdsa_utils_spark.operators.sampling import hash_uniform, token_budget_mix

    rows = [(i, f"s{i % 3}", (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, src string, ntok int")
    budgets = {"s0": 50, "s1": 120, "s2": 3}
    # tiny n_buckets forces multiple boundary-bucket code paths
    out = token_budget_mix(df, "src", "doc_id", "ntok", budgets, n_buckets=4)
    w = Window.partitionBy("src").orderBy(
        F.col("__u"), F.col("doc_id"),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bmap = F.create_map(
        F.lit("s0"), F.lit(50), F.lit("s1"), F.lit(120), F.lit("s2"), F.lit(3),
    )
    naive = (
        df.withColumn("__u", hash_uniform(F.col("doc_id"), "mix"))
        .withColumn("cum", F.sum(F.col("ntok").cast("long")).over(w))
        .filter(F.col("cum") <= bmap[F.col("src")])
    )
    a = sorted((r.doc_id, r.cum_tokens) for r in out.select("doc_id", "cum_tokens").collect())
    b = sorted((r.doc_id, r.cum) for r in naive.select("doc_id", "cum").collect())
    assert a == b and len(a) > 0
    # budgets are hard ceilings per source
    per_src = {
        r.src: r.t
        for r in out.groupBy("src").agg(F.sum("ntok").alias("t")).collect()
    }
    for s, b_ in budgets.items():
        assert per_src.get(s, 0) <= b_


def test_token_budget_mix_guards(spark):
    import pytest as _pytest

    from rdsa_utils_spark.operators.sampling import token_budget_mix

    df = spark.createDataFrame([(1, "a", 5)], "doc_id int, src string, ntok int")
    with _pytest.raises(ValueError):
        token_budget_mix(df, "src", "doc_id", "ntok", {})
    with _pytest.raises(ValueError):
        token_budget_mix(df, "src", "doc_id", "ntok", {"a": -1})
    with _pytest.raises(ValueError):
        token_budget_mix(df, "src", "doc_id", "ntok", {"a": 10}, n_buckets=0)
    # unnamed sources dropped, zero budget keeps nothing
    assert token_budget_mix(df, "src", "doc_id", "ntok", {"b": 10}).count() == 0
    assert token_budget_mix(df, "src", "doc_id", "ntok", {"a": 0}).count() == 0


def test_cluster_safe_split_property(spark):
    from pyspark.sql import functions as F

    from rdsa_utils_spark.operators.sampling import cluster_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id int, text string",
    )
    clusters = spark.createDataFrame(
        [(i, (i // 5) * 5) for i in range(40)], "id int, cluster_id int",
    )
    out = cluster_safe_split(docs, "doc_id", clusters, {"train": 0.7, "valid": 0.3})
    # every cluster maps to exactly one split
    viol = (
        out.join(clusters, out["doc_id"] == clusters["id"])
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert viol == 0
    assert out.count() == 100 and "split" in out.columns


def test_logreg_score_expr_matches_hashed_scorer(spark):
    from pyspark.sql import functions as F

    from rdsa_utils_spark.operators.classify import (
        logreg_score_expr,
        logreg_score_hashed,
        train_logreg_hashed,
    )

    rows = [(i, f"alpha beta{i % 4} gamma common", i % 2) for i in range(30)]
    rows.append((99, "", 0))  # empty doc: bias-only score on both paths
    df = spark.createDataFrame(rows, "doc_id int, text string, y int")
    w = train_logreg_hashed(df, "y", "text", "doc_id", n_features=32, iterations=3)
    a = {
        r.doc_id: r.prob
        for r in logreg_score_hashed(df, w, "text", "doc_id", n_features=32)
        .select("doc_id", "prob")
        .collect()
    }
    expr = logreg_score_expr(w.collect(), "text", n_features=32)
    b = {r.doc_id: r.p for r in df.select("doc_id", expr.alias("p")).collect()}
    assert a == b and len(a) == 31


def test_token_budget_mix_without_cum_col(spark):
    from rdsa_utils_spark.operators.sampling import token_budget_mix

    rows = [(i, "s0", 3) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, src string, ntok int")
    out = token_budget_mix(df, "src", "doc_id", "ntok", {"s0": 12}, cum_col=None)
    assert "cum_tokens" not in out.columns
    assert out.count() == 4  # 4 docs x 3 tokens = 12 <= budget, 5th would exceed


# ---------------------------------------------------------------------------
# Text normalization (text.py).
# ---------------------------------------------------------------------------


def test_normalize_text_full_chain(spark):
    from rdsa_utils_spark.operators.text import normalize_text

    raw = 'He said “hello” — twice…​ and <b>left</b> fast &amp; early\x07 café now'
    df = spark.createDataFrame([(1, raw)], "id int, text string")
    out = normalize_text(df, "text", out_col="clean", strip_html=True).first()
    assert out.clean == 'He said "hello" - twice... and left fast & early café now'
    # defaults: no html stripping, no lowercasing, original column replaced
    kept = normalize_text(df, "text").first()
    assert "<b>" in kept.text and "“" not in kept.text


def test_normalize_text_lowercase_and_entity_order(spark):
    from rdsa_utils_spark.operators.text import normalize_text

    # '&amp;lt;' must decode to '&lt;' (amp decoded LAST), not '<'
    df = spark.createDataFrame([(1, "A &amp;lt; B")], "id int, text string")
    out = normalize_text(df, "text", strip_html=True, lowercase=True).first()
    assert out.text == "a &lt; b"


def test_unicode_normalize_text_forms(spark):
    import pytest as _pytest

    from rdsa_utils_spark.operators.text import unicode_normalize_text

    df = spark.createDataFrame(
        [(1, "café fullｗidth"), (2, None)], "id int, text string",
    )
    nfc = {r.id: r.text for r in unicode_normalize_text(df, "text", "NFC").collect()}
    assert nfc[1] == "café fullｗidth" and nfc[2] is None
    nfkc = {r.id: r.text for r in unicode_normalize_text(df, "text", "NFKC").collect()}
    assert nfkc[1] == "café fullwidth"
    with _pytest.raises(ValueError):
        unicode_normalize_text(df, "text", "NFX")


# ---------------------------------------------------------------------------
# Quantized power-iteration PCA (similarity.py).
# ---------------------------------------------------------------------------


def test_pca_power_converges_on_planted_spectrum(spark):
    import numpy as np

    from rdsa_utils_spark.operators.similarity import pca_power_train, pca_train

    rng = np.random.default_rng(7)
    d, n = 16, 400
    # strong spectral decay: dominant direction 10x the noise floor
    u1 = np.zeros(d); u1[0] = 1.0
    u2 = np.zeros(d); u2[1] = 1.0
    x = (
        rng.normal(size=(n, 1)) * 10.0 @ u1[None, :]
        + rng.normal(size=(n, 1)) * 4.0 @ u2[None, :]
        + rng.normal(size=(n, d)) * 0.5
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id int, embedding array<double>",
    )
    evs, comps = pca_power_train(df, "embedding", k=2, iterations=12)
    model = pca_train(df, "embedding", k=2)
    for c in range(2):
        cos = abs(float(np.dot(model["components"][c], np.asarray(comps[c]))))
        assert cos > 0.999, f"component {c} |cos|={cos}"
        assert abs(evs[c] - model["explained_variance"][c]) < 0.05 * model[
            "explained_variance"
        ][c]
    assert evs[0] > evs[1]


def test_pca_power_deterministic_across_partitionings(spark):
    from rdsa_utils_spark.operators.similarity import pca_power_train
    from rdsa_utils_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    a = pca_power_train(emb.repartition(1), "embedding", k=1, iterations=4)
    b = pca_power_train(emb.repartition(16), "embedding", k=1, iterations=4)
    assert a == b


def test_pca_power_guards(spark):
    import pytest as _pytest

    from rdsa_utils_spark.operators.similarity import pca_power_train

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id int, embedding array<double>")
    with _pytest.raises(ValueError):
        pca_power_train(df, "embedding", k=0)
    with _pytest.raises(ValueError):
        pca_power_train(df, "embedding", iterations=0)
    with _pytest.raises(ValueError):
        pca_power_train(df.filter("vec_id > 5"), "embedding")


def test_random_projection_preserves_distances(spark):
    import numpy as np

    from rdsa_utils_spark.operators.similarity import random_projection
    from rdsa_utils_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet").limit(40)
    out = random_projection(emb, "embedding", out_dim=32, seed=3).collect()
    orig = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in out}
    proj = {r.vec_id: np.asarray(r.projected, dtype=float) for r in out}
    ids = sorted(orig)
    ratios = []
    for a in ids[:10]:
        for b in ids[10:20]:
            d0 = float(np.linalg.norm(orig[a] - orig[b]))
            d1 = float(np.linalg.norm(proj[a] - proj[b]))
            if d0 > 0:
                ratios.append(d1 / d0)
    # JL at k=32: pairwise distances preserved within a loose band
    assert 0.5 < min(ratios) and max(ratios) < 1.6
    # deterministic across calls
    again = random_projection(emb, "embedding", out_dim=32, seed=3).collect()
    assert sorted((r.vec_id, tuple(r.projected)) for r in again) == sorted(
        (r.vec_id, tuple(r.projected)) for r in out
    )


def test_random_projection_guards(spark):
    import pytest as _pytest

    from rdsa_utils_spark.operators.similarity import random_projection

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id int, embedding array<double>")
    with _pytest.raises(ValueError):
        random_projection(df, "embedding", out_dim=0)
    with _pytest.raises(ValueError):
        random_projection(df.filter("vec_id > 5"), "embedding")
