"""Regression tests for the round-8 ADVICE findings fixed in round 9:
the streaming quality gate's internal flag column no longer clobbers a
user column named ``passed`` (and refuses a ``p_col`` collision at
construction), ``_ensure_epoch_table`` validates and backtick-quotes
every manifest field before interpolating it into DDL, the plain
compaction path refuses on a bucketed compaction's crashed
``__manifest____tmp__`` marker, and ``win_rate_matrix`` derives its
significance flag from the UNROUNDED Wilson interval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- quality gate

QSCHEMA = "id long, score double, passed boolean"


def _calibration(spark):
    rows = []
    for i in range(10):
        s = i / 10.0
        rows += [(s, 1.0)] * i + [(s, 0.0)] * (10 - i)
    train = spark.createDataFrame(rows, "score double, y double")
    from rdsa_utils_spark.operators.classify import isotonic_calibrate

    return isotonic_calibrate(train, "score", "y", score_round=1)


def test_quality_gate_preserves_user_passed_column(spark, tmp_path):
    from rdsa_utils_spark.streaming.quality import write_stream_quality_gate

    cal = _calibration(spark)
    src = str(tmp_path / "feed")
    path = str(tmp_path / "pass")
    rej = str(tmp_path / "rej")
    spark.createDataFrame(
        [(1, 0.85, False), (2, 0.05, True)], QSCHEMA,
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(QSCHEMA).parquet(src)
    q = write_stream_quality_gate(
        stream, cal, "score", 0.5, path, str(tmp_path / "ckpt"),
        reject_path=rej, score_round=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    admitted = {r["id"]: r for r in spark.read.parquet(path).collect()}
    rejected = {r["id"]: r for r in spark.read.parquet(rej).collect()}
    # id 1 admits (cal p >= 0.5), id 2 rejects — and BOTH keep the
    # user's own `passed` values, untouched by the gate's internal flag
    assert set(admitted) == {1} and admitted[1]["passed"] is False
    assert set(rejected) == {2} and rejected[2]["passed"] is True
    assert "__passed__" not in spark.read.parquet(path).columns


def test_quality_gate_refuses_p_col_collision(spark, tmp_path):
    from rdsa_utils_spark.streaming.quality import write_stream_quality_gate

    cal = _calibration(spark)
    src = str(tmp_path / "feed")
    spark.createDataFrame([(1, 0.9, True)], QSCHEMA).write.parquet(src)
    stream = spark.readStream.schema(QSCHEMA).parquet(src)
    with pytest.raises(ValueError, match="collides"):
        write_stream_quality_gate(
            stream, cal, "score", 0.5,
            str(tmp_path / "p"), str(tmp_path / "c"), p_col="passed",
        )


# ------------------------------------------------------- epoch-table DDL guard


def _entry(tmp_path, **over):
    loc = tmp_path / "epoch_data"
    loc.mkdir(exist_ok=True)
    entry = {
        "table": "adv9_epoch_ok",
        "path": str(loc),
        "num_buckets": 4,
        "bucket_cols": ["band", "band_hash"],
        "schema_ddl": "`band` int, `band_hash` bigint, `__batch__` int",
    }
    entry.update(over)
    return entry


def test_ensure_epoch_table_registers_quoted_identifiers(spark, tmp_path):
    from rdsa_utils_spark.streaming.dedup import _ensure_epoch_table

    spark.sql("DROP TABLE IF EXISTS adv9_epoch_ok")
    try:
        name = _ensure_epoch_table(spark, _entry(tmp_path))
        assert spark.table(name).columns == ["band", "band_hash", "__batch__"]
    finally:
        spark.sql("DROP TABLE IF EXISTS adv9_epoch_ok")


def test_ensure_epoch_table_refuses_tampered_manifest(spark, tmp_path):
    from rdsa_utils_spark.streaming.dedup import _ensure_epoch_table

    bad = [
        _entry(tmp_path, table="x; DROP TABLE y"),
        _entry(tmp_path, bucket_cols=["band) SORTED BY (x"]),
        _entry(tmp_path, schema_ddl="a int); DROP TABLE y; --"),
        _entry(tmp_path, schema_ddl="a int' b"),
        _entry(tmp_path, path=str(tmp_path) + "/x' OPTIONS ("),
    ]
    for entry in bad:
        with pytest.raises(ValueError):
            _ensure_epoch_table(spark, entry)
    # none of the refusals may leave a table behind
    assert not spark.catalog.tableExists("adv9_epoch_ok")


# ------------------------------------------- plain compaction vs crashed swap


def test_plain_compact_refuses_on_manifest_tmp_marker(spark, tmp_path):
    from rdsa_utils_spark.streaming.dedup import compact_near_dedup_state

    state = str(tmp_path / "state")
    for b in range(3):
        spark.createDataFrame(
            [(b, 1)], "fp long, one int",
        ).write.parquet(f"{state}/sigs/__batch__={b}")
    # a bucketed compaction that crashed between delete-old-manifest and
    # move-tmp leaves ONLY the tmp marker; the plain dir-merge must
    # refuse (re-merging dirs already captured by the pending epoch
    # would double-represent them after recovery)
    (tmp_path / "state" / "sigs__manifest____tmp__").write_text("{}")
    with pytest.raises(RuntimeError, match="mid-compaction"):
        compact_near_dedup_state(spark, state, kinds=("sigs",))


# ------------------------------------------------- win-rate unrounded bounds


def test_win_rate_significance_uses_unrounded_interval(spark):
    from rdsa_utils_spark.operators.preference import win_rate_matrix

    # 64/100 wins: Wilson ci_lo ≈ 0.542 — display-rounding to 1 dp
    # gives 0.5, which must NOT flip the flag to not-significant
    rows = [("a", "b")] * 64 + [("b", "a")] * 36
    df = spark.createDataFrame(rows, "winner string, loser string")
    got = win_rate_matrix(
        df, "winner", "loser", m_tests=1, round_to=1,
    ).collect()[0]
    assert got["ci_lo"] == pytest.approx(0.5)  # the rounded display value
    assert got["significant"] is True          # ...from the unrounded bound
