"""Round-9 tests for the bucketed epoch state store's operability
contract: the start-up epoch census + rebuild nudge (nothing surfaced
epoch-count growth before — an operator only discovered the per-epoch
probe fan-out by reading plans) and the epoch schema-evolution
refusals (compacting across a schema drift, or rebuilding epochs that
disagree on schema, must refuse rather than mix incomparable rows)."""

from __future__ import annotations

import json
import logging

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.streaming.dedup import (
    compact_near_dedup_state,
    rebuild_near_dedup_epochs,
    state_epoch_census,
    write_stream_near_dedup,
)

SCHEMA = "id long, text string"


def _doc(prefix):
    return " ".join(f"{prefix}{i}" for i in range(40))


def _append(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append",
    ).parquet(src)


def _run_near(spark, src, path, state, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_near_dedup(
        stream, "text", "id", path, state, ckpt, jaccard_threshold=0.8,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_epoch_census_counts_epochs_and_tail(spark, tmp_path):
    state = str(tmp_path / "state")
    for b in range(3):
        spark.createDataFrame([(b, "t")], SCHEMA).write.parquet(
            f"{state}/bands/__batch__={b}",
        )
    # no manifest yet: all tail, no epochs
    got = state_epoch_census(spark, state, ("bands",))
    assert got == {"bands": {"epochs": 0, "tail_dirs": 3}}
    # manifest-recorded epochs count without touching the catalog
    (tmp_path / "state" / "bands__manifest__").write_text(
        json.dumps({"label": 1, "epochs": [{"x": 1}, {"x": 2}]}),
    )
    got = state_epoch_census(spark, state, ("bands",))
    assert got == {"bands": {"epochs": 2, "tail_dirs": 3}}


def test_epoch_census_runs_without_a_jvm(spark, tmp_path):
    """The census goes through the FileSystemClient protocol (round-10
    change off the r9 verdict nit): with a LocalFileSystemClient it
    needs NO SparkSession at all — pass spark=None to prove no JVM
    call sneaks back in."""
    from rdsa_utils_spark.sources.objectstore import LocalFileSystemClient

    state = str(tmp_path / "state")
    for b in range(2):
        spark.createDataFrame([(b, "t")], SCHEMA).write.parquet(
            f"{state}/sigs/__batch__={b}",
        )
    (tmp_path / "state" / "sigs__manifest__").write_text(
        json.dumps({"label": 0, "epochs": [{"x": 1}]}),
    )
    got = state_epoch_census(
        None, state, ("sigs",), client=LocalFileSystemClient(),
    )
    assert got == {"sigs": {"epochs": 1, "tail_dirs": 2}}


def test_epoch_census_refuses_crashed_swap_marker(spark, tmp_path):
    from rdsa_utils_spark.sources.objectstore import LocalFileSystemClient

    state = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    (tmp_path / "state" / "bands__manifest____tmp__").write_text("{}")
    with pytest.raises(RuntimeError, match="mid-manifest-swap"):
        state_epoch_census(
            None, state, ("bands",), client=LocalFileSystemClient(),
        )


def test_gate_logs_census_and_warns_past_threshold(
    spark, tmp_path, caplog, monkeypatch,
):
    """Live gate run: the census INFO line lands in the gate log on
    the first batch, and (threshold lowered to 0) the rebuild-nudge
    WARNING fires while the probe still answers correctly against the
    bucketed epoch store."""
    import rdsa_utils_spark.streaming.dedup as sd

    src = str(tmp_path / "feed")
    path = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _append(spark, src, [(1, _doc("w")), (2, _doc("x"))])
    _run_near(spark, src, path, state, ckpt)
    _append(spark, src, [(3, _doc("y"))])
    _run_near(spark, src, path, state, ckpt)
    _append(spark, src, [(4, _doc("z"))])
    _run_near(spark, src, path, state, ckpt)
    compact_near_dedup_state(spark, state, bucket=True, num_buckets=4)

    monkeypatch.setattr(sd, "EPOCH_WARN_THRESHOLD", 0)
    # near-dup of doc 1 plus a fresh doc: the probe must still work
    _append(spark, src, [(5, _doc("w")[:-1] + "q"), (6, _doc("v"))])
    with caplog.at_level(logging.INFO, logger="rdsa_utils_spark.streaming.dedup"):
        _run_near(spark, src, path, state, ckpt)
    assert any("state census" in r.message for r in caplog.records)
    warns = [r for r in caplog.records if r.levelno == logging.WARNING]
    assert any("rebuild_near_dedup_epochs" in r.message for r in warns)
    got = {r["id"] for r in spark.read.parquet(path).collect()}
    assert got == {1, 2, 3, 4, 6}


def test_compact_refuses_epoch_schema_drift(spark, tmp_path):
    state = str(tmp_path / "state")
    for b in range(3):
        spark.createDataFrame(
            [(b, 7)], "band int, band_hash long",
        ).write.parquet(f"{state}/bands/__batch__={b}")
    compact_near_dedup_state(
        spark, state, kinds=("bands",), bucket=True, num_buckets=2,
    )
    # two NEW dirs with an extra column — the next compaction would
    # append a drifted epoch; it must refuse before writing anything
    for b in (3, 4):
        spark.createDataFrame(
            [(b, 7, "en")], "band int, band_hash long, lang string",
        ).write.parquet(f"{state}/bands/__batch__={b}")
    with pytest.raises(RuntimeError, match="schema drift"):
        compact_near_dedup_state(
            spark, state, kinds=("bands",), bucket=True, num_buckets=2,
        )
    man = json.loads((tmp_path / "state" / "bands__manifest__").read_text())
    assert len(man["epochs"]) == 1  # nothing appended


def test_rebuild_refuses_epochs_with_mismatched_schema(spark, tmp_path):
    state = str(tmp_path / "state")
    (tmp_path / "state").mkdir()
    entry = {
        "table": "r9_sch_e0", "path": f"{state}/bands__epoch__0",
        "min_batch": 0, "max_batch": 0, "num_buckets": 2,
        "bucket_cols": ["band"], "schema_ddl": "`band` int",
    }
    drifted = dict(entry, table="r9_sch_e1", min_batch=1, max_batch=1,
                   schema_ddl="`band` int, `lang` string")
    (tmp_path / "state" / "bands__manifest__").write_text(
        json.dumps({"label": 1, "epochs": [entry, drifted]}),
    )
    with pytest.raises(RuntimeError, match="schema_ddl"):
        rebuild_near_dedup_epochs(spark, state, kinds=("bands",))
    # quoting-only differences are NOT drift (old manifests recorded
    # unquoted names): the rebuild proceeds and collapses to one epoch
    requoted = dict(drifted, schema_ddl="band INT")
    (tmp_path / "state" / "bands__manifest__").write_text(
        json.dumps({"label": 1, "epochs": [entry, requoted]}),
    )
    try:
        assert rebuild_near_dedup_epochs(spark, state, kinds=("bands",)) == 2
        man = json.loads(
            (tmp_path / "state" / "bands__manifest__").read_text(),
        )
        assert len(man["epochs"]) == 1
    finally:
        for t in ("r9_sch_e0", "r9_sch_e1"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        for t in spark.catalog.listTables():
            if t.name.startswith("ndg_") and "_r1" in t.name:
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
