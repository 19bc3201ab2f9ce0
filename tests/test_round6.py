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
