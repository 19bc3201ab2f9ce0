"""Tests for pipeline infrastructure: config, logging, runlog, helpers,
object-store client, event-log parser."""

from __future__ import annotations

import json
import logging

import pytest

from rdsa_utils_spark.config import LoadConfig, load_config
from rdsa_utils_spark.eventlog import (
    calculate_pipeline_cost,
    convert_value,
    filter_and_sort_logs_by_app_name,
    iter_events,
    logs_to_dataframe,
    parse_pyspark_logs,
    process_pyspark_logs,
)
from rdsa_utils_spark.exceptions import (
    ConfigError,
    InvalidBucketNameError,
    InvalidS3FilePathError,
)
from rdsa_utils_spark.helpers import (
    calc_product_of_dict_values,
    convert_date_strings_to_datetimes,
    file_size,
    flatten_iterable,
    interleave_iterables,
    list_convert,
    md5_sum,
    overwrite_dictionary,
    pairwise_iterable,
    setdiff,
    tuple_convert,
)
from rdsa_utils_spark.logging_ import (
    init_logger_basic,
    log_rows_in_spark_df,
    log_spark_df_schema,
    print_full_table_and_raise_error,
    time_it,
)
from rdsa_utils_spark.sources.objectstore import (
    LocalFileSystemClient,
    validate_bucket_name,
    validate_file_path,
)


# ------------------------------------------------------------------ config

CONFIG_BODY = {"pipeline": {"name": "demo", "runs": 3}, "flags": {"dry": True}}


def test_load_config_json_toml_yaml(tmp_path):
    j = tmp_path / "c.json"
    j.write_text(json.dumps(CONFIG_BODY))
    t = tmp_path / "c.toml"
    t.write_text('[pipeline]\nname = "demo"\nruns = 3\n[flags]\ndry = true\n')
    y = tmp_path / "c.yaml"
    y.write_text("pipeline:\n  name: demo\n  runs: 3\nflags:\n  dry: true\n")
    parsed = [load_config(p) for p in (j, t, y)]
    assert parsed[0] == parsed[1] == parsed[2] == CONFIG_BODY


def test_load_config_overrides_and_errors(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps(CONFIG_BODY))
    cfg = load_config(p, config_overrides={"pipeline.runs": 9})
    assert cfg["pipeline"]["runs"] == 9
    with pytest.raises(ConfigError, match="not in config"):
        load_config(p, config_overrides={"pipeline.nope": 1})
    with pytest.raises(ConfigError, match="Unsupported config type"):
        load_config(tmp_path / "c.ini", config_type="ini")
    obj = LoadConfig(p)
    assert obj.pipeline["name"] == "demo"


def test_load_config_pydantic_validation(tmp_path):
    pydantic = pytest.importorskip("pydantic")

    class Pipeline(pydantic.BaseModel):
        name: str
        runs: int

    p = tmp_path / "c.json"
    p.write_text(json.dumps(CONFIG_BODY))
    cfg = load_config(p, config_validators={"pipeline": Pipeline})
    assert cfg["pipeline"] == {"name": "demo", "runs": 3}
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"pipeline": {"name": "x", "runs": "lots"}}))
    with pytest.raises(Exception):
        load_config(bad, config_validators={"pipeline": Pipeline})


# ----------------------------------------------------------------- logging

def test_logging_decorators(spark, caplog):
    logger = init_logger_basic(logging.getLogger("t_log"), level=logging.INFO)

    @log_spark_df_schema(logger=logger)
    @log_rows_in_spark_df(logger=logger)
    @time_it(logger=logger)
    def double(df):
        return df.union(df)

    df = spark.createDataFrame([(1,), (2,)], "v long")
    with caplog.at_level(logging.INFO, logger="t_log"):
        out = double(df)
        assert out.count() == 4
    text = caplog.text
    assert "input schema" in text and "output schema" in text
    assert "input rows: 2" in text and "output rows: 4" in text
    assert "took" in text


def test_timer_args_shape():
    from rdsa_utils_spark.logging_ import timer_args

    seen = []
    args = timer_args("step", logger=seen.append)
    assert set(args) == {"name", "text", "logger", "initial_text"}
    assert args["name"] == "step"
    assert args["text"](1.5) == "step: 1.500s"
    args["logger"]("hello")
    assert seen == ["hello"]


def test_print_full_table_and_raise_error(spark, caplog):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    logger = logging.getLogger("t_log2")
    with caplog.at_level(logging.ERROR, logger="t_log2"):
        print_full_table_and_raise_error(df, "bad rows", logger=logger)
    assert "bad rows" in caplog.text and "x" in caplog.text
    with pytest.raises(ValueError, match="stop now"):
        print_full_table_and_raise_error(df, "stop now", stop_pipeline=True, logger=logger)


# ------------------------------------------------------------------ runlog

def test_runlog_roundtrip(spark, tmp_path):
    from rdsa_utils_spark.runlog import (
        add_runlog_entry,
        create_runlog_table,
        get_last_run_id,
        get_penultimate_run_id,
        reserve_id,
        write_runlog_file,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS runlog_test")
    try:
        create_runlog_table(spark, "runlog_test")
        table = "runlog_test.pipeline_runlog"
        rid1 = add_runlog_entry(
            spark, table, "first run", "demo_pipeline", "1.0", {"k": 1},
        )
        rid2 = add_runlog_entry(spark, table, "second run", "demo_pipeline")
        assert rid2 == rid1 + 1
        assert get_last_run_id(spark, table) == rid2
        assert get_penultimate_run_id(spark, table) == rid1
        assert get_last_run_id(spark, table, pipeline="nope") is None
        nxt = reserve_id(spark, table)
        assert nxt == rid2 + 1
        out = tmp_path / "runlog.txt"
        write_runlog_file(spark, table, rid1, str(out))
        body = out.read_text()
        assert "first run" in body and "demo_pipeline" in body
    finally:
        spark.sql("DROP DATABASE IF EXISTS runlog_test CASCADE")


# ----------------------------------------------------------------- helpers

def test_iterable_helpers():
    assert list_convert("abc") == ["abc"]
    assert list_convert([1, 2]) == [1, 2]
    assert list_convert(None) == []
    assert tuple_convert(5) == (5,)
    assert flatten_iterable([[1, 2], 3, "xy"]) == [1, 2, 3, "xy"]
    assert interleave_iterables([1, 3], [2, 4]) == [1, 2, 3, 4]
    assert list(pairwise_iterable([1, 2, 3])) == [(1, 2), (2, 3)]
    assert setdiff([3, 1, 2, 3], [2]) == [3, 1]


def test_overwrite_dictionary_and_product():
    base = {"a": {"b": 1}, "c": 2}
    assert overwrite_dictionary(base, {"a": {"b": 5}}) == {"a": {"b": 5}, "c": 2}
    with pytest.raises(ValueError, match="unknown key"):
        overwrite_dictionary(base, {"zz": 0})
    combos = list(calc_product_of_dict_values(x=[1, 2], y="s"))
    assert combos == [{"x": 1, "y": "s"}, {"x": 2, "y": "s"}]


def test_date_conversion():
    start, end = convert_date_strings_to_datetimes("2024-01-01", "2024-02")
    assert start.day == 1
    assert end.month == 2 and end.day == 29 and end.hour == 23  # leap year month end
    _, day_end = convert_date_strings_to_datetimes("2024-01-01", "2024-01-15")
    assert day_end.hour == 23 and day_end.minute == 59


def test_file_helpers(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("hello")
    assert file_size(p) == 5
    assert md5_sum(p) == "5d41402abc4b2a76b9719d911017c592"


# ------------------------------------------------------------- objectstore

def test_bucket_and_path_validation():
    assert validate_bucket_name("my-bucket.data") == "my-bucket.data"
    for bad in ["AB", "a..b", "-x-", "1.2.3.4", "x" * 80]:
        with pytest.raises(InvalidBucketNameError):
            validate_bucket_name(bad)
    assert validate_file_path("a/b/c.txt") == "a/b/c.txt"
    for bad in ["", "a\\b", "a/../b"]:
        with pytest.raises(InvalidS3FilePathError):
            validate_file_path(bad)


def test_local_fs_client(tmp_path):
    fs = LocalFileSystemClient()
    src_dir = tmp_path / "d"
    fs.create_folder(str(src_dir))
    fs.write_text(str(src_dir / "a.txt"), "one")
    fs.write_text(str(src_dir / "b.log"), "two")
    assert fs.file_exists(str(src_dir / "a.txt"))
    assert fs.list_files(str(src_dir), "*.txt") == [str(src_dir / "a.txt")]
    fs.copy_file(str(src_dir / "a.txt"), str(tmp_path / "a2.txt"))
    assert fs.read_text(str(tmp_path / "a2.txt")) == "one"
    with pytest.raises(FileExistsError):
        fs.copy_file(str(src_dir / "a.txt"), str(tmp_path / "a2.txt"))
    fs.move_file(str(tmp_path / "a2.txt"), str(tmp_path / "a3.txt"))
    assert not fs.file_exists(str(tmp_path / "a2.txt"))
    assert fs.zip_folder(str(src_dir), str(tmp_path / "d.zip"))
    assert fs.file_size(str(tmp_path / "d.zip")) > 0
    assert len(fs.walk(str(src_dir))) == 2
    fs.delete_file(str(src_dir / "b.log"))
    fs.delete_folder(str(src_dir))
    assert not fs.folder_exists(str(src_dir))


def test_fs_protocol_conformance(spark, tmp_path):
    """Every FileSystemClient verb behaves identically on both
    implementations (Local on plain paths, Hadoop on file:// URIs) —
    the guarantee that lets pipeline code swap s3a://hdfs:// for
    local paths without behavioural drift (reference scope: the
    parallel s3/gcs/hdfs helper suites expose one verb set)."""
    from rdsa_utils_spark.sources.objectstore import (
        HadoopFileSystemClient,
        LocalFileSystemClient,
    )

    def run_verbs(fs, root: str, strips):
        def clean(p):
            for s in strips:  # Hadoop normalizes file:// to file:/
                p = p.replace(s, "")
            return p

        out = {}
        fs.create_folder(f"{root}/d/sub")
        fs.write_text(f"{root}/d/a.txt", "alpha")
        fs.write_text(f"{root}/d/b.log", "beta")
        fs.write_text(f"{root}/d/sub/c.txt", "gamma")
        with pytest.raises(FileExistsError):
            fs.write_text(f"{root}/d/a.txt", "clobber", overwrite=False)
        out["read"] = fs.read_text(f"{root}/d/a.txt")
        out["file_exists"] = fs.file_exists(f"{root}/d/a.txt")
        out["file_on_dir"] = fs.file_exists(f"{root}/d")
        out["folder_exists"] = fs.folder_exists(f"{root}/d")
        out["folder_on_file"] = fs.folder_exists(f"{root}/d/a.txt")
        out["size"] = fs.file_size(f"{root}/d/a.txt")
        out["list"] = [clean(p) for p in fs.list_files(f"{root}/d", "*.txt")]
        out["walk"] = [clean(p) for p in fs.walk(f"{root}/d")]
        fs.copy_file(f"{root}/d/a.txt", f"{root}/d/a2.txt")
        with pytest.raises(Exception):
            fs.copy_file(f"{root}/d/a.txt", f"{root}/d/a2.txt")  # no overwrite
        fs.move_file(f"{root}/d/a2.txt", f"{root}/d/a3.txt")
        with pytest.raises(FileExistsError):
            fs.move_file(f"{root}/d/a.txt", f"{root}/d/a3.txt")
        fs.rename_file(f"{root}/d/a.txt", f"{root}/d/a3.txt", overwrite=True)
        out["after_rename"] = [clean(p) for p in fs.walk(f"{root}/d")]
        out["folders"] = [clean(p) for p in fs.list_folders(f"{root}/d")]
        assert fs.zip_folder(f"{root}/d", f"{root}/d.zip")
        out["zip_nonempty"] = fs.file_size(f"{root}/d.zip") > 0
        fs.delete_file(f"{root}/d/b.log")
        fs.delete_folder(f"{root}/d")
        out["gone"] = fs.folder_exists(f"{root}/d")
        return out

    local_root = tmp_path / "local"
    hadoop_root = tmp_path / "hadoop"
    local_root.mkdir()
    hadoop_root.mkdir()
    got_local = run_verbs(LocalFileSystemClient(), str(local_root), [str(local_root)])
    got_hadoop = run_verbs(
        HadoopFileSystemClient(spark), f"file://{hadoop_root}",
        [f"file://{hadoop_root}", f"file:{hadoop_root}"],
    )
    assert got_local == got_hadoop
    # zip archives hold the same members under the same arcnames
    import zipfile

    with zipfile.ZipFile(local_root / "d.zip") as z:
        local_members = sorted(z.namelist())
    with zipfile.ZipFile(hadoop_root / "d.zip") as z:
        hadoop_members = sorted(z.namelist())
    assert local_members == hadoop_members == ["a3.txt", "b.log", "sub/c.txt"]


def test_hadoop_fs_client(spark, tmp_path):
    from rdsa_utils_spark.sources.objectstore import HadoopFileSystemClient

    fs = HadoopFileSystemClient(spark)
    base = f"file://{tmp_path}"
    fs.create_folder(f"{base}/hd")
    local = tmp_path / "hd" / "x.txt"
    local.write_text("payload")
    assert fs.file_exists(f"{base}/hd/x.txt")
    assert fs.file_size(f"{base}/hd/x.txt") == 7
    fs.copy_file(f"{base}/hd/x.txt", f"{base}/hd/y.txt")
    assert sorted(p.rsplit("/", 1)[-1] for p in fs.list_files(f"{base}/hd")) == ["x.txt", "y.txt"]
    fs.move_file(f"{base}/hd/y.txt", f"{base}/hd/z.txt")
    assert fs.file_exists(f"{base}/hd/z.txt") and not fs.file_exists(f"{base}/hd/y.txt")
    fs.delete_folder(f"{base}/hd")
    assert not fs.file_exists(f"{base}/hd/x.txt")


# ---------------------------------------------------------------- eventlog

EVENTS = [
    {"Event": "SparkListenerApplicationStart", "App Name": "demo", "App ID": "app-1",
     "Timestamp": 1_700_000_000_000},
    {"Event": "SparkListenerEnvironmentUpdate",
     "Spark Properties": {"spark.executor.memory": "10g", "spark.driver.memory": "4g"}},
    {"Event": "SparkListenerExecutorAdded", "Executor Info": {"Total Cores": 4}},
    {"Event": "SparkListenerExecutorAdded", "Executor Info": {"Total Cores": 4}},
    {"Event": "SparkListenerTaskEnd", "Task End Reason": {"Reason": "Success"},
     "Task Metrics": {"Input Metrics": {"Bytes Read": 1000},
                      "Shuffle Read Metrics": {"Remote Bytes Read": 10, "Local Bytes Read": 5},
                      "Shuffle Write Metrics": {"Shuffle Bytes Written": 7}}},
    {"Event": "SparkListenerTaskEnd", "Task End Reason": {"Reason": "TaskKilled"}},
    {"Event": "SparkListenerApplicationEnd", "Timestamp": 1_700_000_360_000},
]


def test_eventlog_parser(tmp_path):
    log = tmp_path / "app-1"
    log.write_text("\n".join(json.dumps(e) for e in EVENTS))
    summary = parse_pyspark_logs(iter_events(str(log)))
    assert summary["app_name"] == "demo"
    assert summary["runtime_seconds"] == 360.0
    assert summary["peak_executors"] == 2
    assert summary["total_cores"] == 8
    assert summary["executor_memory_gb"] == 10.0
    assert summary["n_tasks"] == 2 and summary["failed_tasks"] == 1
    assert summary["input_bytes"] == 1000
    assert summary["shuffle_read_bytes"] == 15

    summaries = process_pyspark_logs(str(tmp_path))
    assert len(summaries) == 1
    assert filter_and_sort_logs_by_app_name(summaries, "demo")[0]["app_id"] == "app-1"
    assert filter_and_sort_logs_by_app_name(summaries, "other") == []
    df = logs_to_dataframe(summaries)
    assert df.loc[0, "app_name"] == "demo"

    cost = calculate_pipeline_cost(summary, rate_per_core_hour=1.0, rate_per_gb_hour=0.0)
    assert cost["core_hours"] == pytest.approx(0.8)
    assert cost["estimated_cost"] == pytest.approx(0.8)


def test_convert_value():
    assert convert_value("10g") == 10.0
    assert convert_value("512m") == 0.5
    assert convert_value("1t") == 1024.0


def test_pandas_file_io_roundtrip(tmp_path):
    import pandas as pd

    from rdsa_utils_spark.sources.objectstore import (
        LocalFileSystemClient,
        load_pandas_csv,
        load_pandas_json,
        write_pandas_csv,
    )

    client = LocalFileSystemClient()
    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    p = str(tmp_path / "t.csv")
    write_pandas_csv(client, df, p)
    back = load_pandas_csv(client, p)
    assert back.equals(df)

    j = str(tmp_path / "t.json")
    client.write_text(j, '{"k": 1}')
    assert load_pandas_json(client, j) == {"k": 1}
    nd = str(tmp_path / "t.ndjson")
    client.write_text(nd, '{"a": 1}\n{"a": 2}\n')
    assert list(load_pandas_json(client, nd, multi_line=True)["a"]) == [1, 2]


def test_logger_advanced_and_env_helpers(tmp_path):
    from rdsa_utils_spark.helpers import (
        dump_environment_requirements,
        parse_pyproject_metadata,
    )
    from rdsa_utils_spark.logging_ import init_logger_advanced

    log_file = str(tmp_path / "run.log")
    logger = init_logger_advanced(level=20, log_file=log_file)
    logger.info("hello-advanced")
    assert "hello-advanced" in open(log_file).read()

    req = str(tmp_path / "req.txt")
    text = dump_environment_requirements(req)
    assert "pyspark" in text and "==" in text

    py = tmp_path / "pyproject.toml"
    py.write_text('[project]\nname = "x"\nversion = "1.0"\ndependencies = ["pandas"]\n')
    meta = parse_pyproject_metadata(str(py))
    assert meta["name"] == "x" and meta["dependencies"] == ["pandas"]


def test_testing_utils_roundtrip(spark):
    import datetime

    import pytest as _pytest

    from rdsa_utils_spark.testing import (
        assert_approx_df_equality,
        assert_df_equality,
        create_dataframe,
        create_spark_df,
        to_date,
        to_datetime,
        to_spark,
    )

    # tuple-header builder, DDL-schema builder, pandas bridge
    pdf = create_dataframe([("a", "b"), ("x", 1), ("y", 2)])
    assert list(pdf.columns) == ["a", "b"] and len(pdf) == 2
    df1 = create_spark_df(spark, [("a", "b"), ("x", 1), ("y", 2)])
    df2 = create_spark_df(spark, ["a STRING, b BIGINT", ("x", 1), ("y", 2)])
    df3 = to_spark(spark, pdf, schema="a string, b long")
    assert_df_equality(df1, df2, sort_cols="a")
    assert_df_equality(df2, df3, sort_cols="a")

    assert to_date("2001-02-03") == datetime.date(2001, 2, 3)
    assert to_datetime("2001-02-03 04:05") == datetime.datetime(2001, 2, 3, 4, 5)

    close = create_spark_df(spark, ["a STRING, v DOUBLE", ("x", 1.0), ("y", 2.0)])
    nudged = create_spark_df(
        spark, ["a STRING, v DOUBLE", ("x", 1.0 + 1e-9), ("y", 2.0)],
    )
    assert_approx_df_equality(close, nudged, precision=1e-7, sort_cols="a")
    with _pytest.raises(AssertionError, match="col v"):
        assert_df_equality(close, nudged, sort_cols="a")
    with _pytest.raises(AssertionError, match="schemas differ"):
        assert_df_equality(df1, close)


def test_parametrize_cases_builds_params():
    from rdsa_utils_spark.testing import Case, parametrize_cases

    mark = parametrize_cases(
        Case(label="one", foo=1, bar="a"),
        Case(label="two", foo=2),  # bar filled with None
    )
    assert mark.args[0] == "bar,foo"
    params = mark.args[1]
    assert [p.id for p in params] == ["one", "two"]
    assert params[0].values == ("a", 1)
    assert params[1].values == (None, 2)

    import pytest as _pytest

    with _pytest.raises(TypeError, match="not an instance of Case"):
        parametrize_cases(("not", "a", "case"))


def test_refresh_table_metadata(spark, tmp_path):
    from rdsa_utils_spark.sources.catalog import refresh_table_metadata

    df = spark.range(5)
    df.write.mode("overwrite").saveAsTable("refresh_probe")
    try:
        refresh_table_metadata(spark, "refresh_probe")  # no-op correctness probe
        assert spark.table("refresh_probe").count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS refresh_probe")


def test_extend_lists_and_warning_decorator(caplog):
    import logging as _logging

    from rdsa_utils_spark.helpers import extend_lists
    from rdsa_utils_spark.logging_ import add_warning_message_to_function

    a, b = ["col_a", "col_b"], ["col_b"]
    extend_lists([a, b], ["col_c"])
    assert a == ["col_a", "col_b", "col_c"]
    assert b == ["col_b", "col_c"]
    extend_lists([a], ["col_c"])  # idempotent: no duplicate append
    assert a == ["col_a", "col_b", "col_c"]

    @add_warning_message_to_function(message="here be dragons")
    def risky(x):
        return x + 1

    with caplog.at_level(_logging.WARNING, logger="rdsa_utils_spark"):
        assert risky(1) == 2
    assert "risky: here be dragons" in caplog.text


def test_object_uri_helpers():
    import pytest as _pytest

    from rdsa_utils_spark.exceptions import InvalidS3FilePathError
    from rdsa_utils_spark.sources.objectstore import create_uri, split_uri

    uri = create_uri("my-bucket", "/path/to/obj.txt", scheme="s3a")
    assert uri == "s3a://my-bucket/path/to/obj.txt"
    assert split_uri(uri) == ("my-bucket", "path/to/obj.txt")
    assert split_uri("s3://b/k") == ("b", "k")
    with _pytest.raises(InvalidS3FilePathError):
        split_uri("not-a-uri")


def test_local_client_mtime_perms_and_cleanup(tmp_path):
    import os
    import time

    from rdsa_utils_spark.sources.objectstore import LocalFileSystemClient

    client = LocalFileSystemClient()
    old = tmp_path / "old.txt"
    new = tmp_path / "sub" / "new.txt"
    new.parent.mkdir()
    old.write_text("old")
    new.write_text("new")
    stale = time.time() - 10 * 86400
    os.utime(old, (stale, stale))

    assert client.get_date_modified(str(new)).year >= 2026
    assert client.change_permissions(str(tmp_path), "755", recursive=True)

    victims = client.delete_old_files(str(tmp_path), older_than_days=7, dry_run=True)
    assert victims == [str(old)] and old.exists()
    victims = client.delete_old_files(str(tmp_path), older_than_days=7)
    assert victims == [str(old)] and not old.exists() and new.exists()


def test_hadoop_client_mtime_and_cleanup(spark, tmp_path):
    import os
    import time

    from rdsa_utils_spark.sources.objectstore import HadoopFileSystemClient

    client = HadoopFileSystemClient(spark)
    old = tmp_path / "old.txt"
    keep = tmp_path / "keep.txt"
    old.write_text("old")
    keep.write_text("keep")
    stale = time.time() - 10 * 86400
    os.utime(old, (stale, stale))

    assert client.get_date_modified(f"file:{keep}").year >= 2026
    victims = client.delete_old_files(f"file:{tmp_path}", older_than_days=7, dry_run=True)
    assert len(victims) == 1 and victims[0].endswith("old.txt") and old.exists()
    victims = client.delete_old_files(f"file:{tmp_path}", older_than_days=7)
    assert len(victims) == 1 and not old.exists() and keep.exists()


def test_catalog_run_query_and_columns(spark):
    from rdsa_utils_spark.sources.catalog import get_table_columns, run_query

    spark.range(3).selectExpr("id", "id * 2 AS dbl").createOrReplaceTempView("rq_probe")
    try:
        assert run_query(spark, "SELECT SUM(dbl) AS s FROM rq_probe").collect()[0]["s"] == 6
        assert get_table_columns(spark, "rq_probe") == ["id", "dbl"]
    finally:
        spark.catalog.dropTempView("rq_probe")


# ----------------------------------------------------- EC2 cost model + report


def test_extract_instance_specs():
    from rdsa_utils_spark.eventlog import extract_instance_specs

    specs = extract_instance_specs("m5.2xlarge")
    assert specs == {"vcpu": 8, "memory_gb": 32.0, "family": "General Purpose"}
    assert extract_instance_specs("r5.xlarge")["memory_gb"] == 32.0
    assert extract_instance_specs("c5.large")["family"] == "Compute optimised"
    assert extract_instance_specs("zz9.mega") is None
    assert extract_instance_specs("not-an-instance") is None


def test_get_matching_instance_cheapest_fit():
    from rdsa_utils_spark.eventlog import InstanceType, get_matching_instance

    # cheapest instance covering 12 GB / 8 cores: c6a.8xlarge has the
    # lowest per-vCPU rate but 8xlarge jumps to 32 vCPU; among 8-vCPU
    # shapes c6a.2xlarge (16 GB) fits and is cheapest.
    inst = get_matching_instance(memory_gb=12, cores=8)
    assert inst.vcpu >= 8 and inst.memory_gb >= 12
    assert inst.name == "c6a.2xlarge"

    # explicit catalog override wins
    tiny = [InstanceType("x.test", 96, 1024.0, 1.0, "General Purpose")]
    assert get_matching_instance(500, 64, tiny).name == "x.test"

    with pytest.raises(ValueError):
        get_matching_instance(10_000_000, 4)
    with pytest.raises(ValueError):
        get_matching_instance(1, 1, instances=[])


def test_calculate_emr_pipeline_cost():
    from rdsa_utils_spark.eventlog import calculate_emr_pipeline_cost

    summary = {
        "executor_memory_gb": 6.0,
        "peak_executors": 2,
        "total_cores": 8,
        "start_time_ms": 1_700_000_000_000,
        "end_time_ms": 1_700_003_600_000,  # exactly 1 hour
    }
    cost = calculate_emr_pipeline_cost(summary)
    rec = cost["instance_recommendation"]
    assert rec["vcpu"] >= 8 and rec["memory_gb"] >= 12.0
    assert cost["runtime"]["hours"] == pytest.approx(1.0)
    assert rec["emr_price"] == pytest.approx(rec["ec2_price"] * 1.25, abs=1e-4)
    assert cost["costs"]["pipeline_cost"] == pytest.approx(rec["emr_price"], abs=1e-3)
    assert cost["costs"]["emr_surcharge"] > 0

    flat = calculate_emr_pipeline_cost(summary, apply_emr_surcharge=False)
    assert flat["costs"]["pipeline_cost"] == pytest.approx(rec["ec2_price"], abs=1e-3)
    assert flat["costs"]["emr_surcharge"] == 0


def test_generate_report(tmp_path):
    from rdsa_utils_spark.report import generate_report

    engine_summary = {
        "app_name": "demo",
        "start_time_ms": 1_700_000_000_000,
        "end_time_ms": 1_700_000_360_000,
        "runtime_seconds": 360.0,
        "total_cores": 8,
        "executor_memory_gb": 10.0,
        "peak_executors": 2,
        "log_file": "/logs/app-1",
    }
    reference_shape = {
        "file_path": "user/test/eventlog_v2_spark-1234/events_1_spark-1234",
        "log_metrics": {"Pipeline Name": "TestApp", "Timestamp": 1_739_793_526_775},
        "cost_metrics": {
            "runtime": {"milliseconds": 10_000},
            "costs": {"pipeline_cost": 0.0001},
        },
    }
    out = tmp_path / "report.html"
    text = generate_report([engine_summary, reference_shape], str(out))
    assert out.exists() and out.read_text() == text
    assert "demo" in text and "TestApp" in text and "<table>" in text
    assert "app-1" in text  # log file column

    md = generate_report([engine_summary], str(tmp_path / "report.md"), fmt="md")
    assert md.startswith("# PySpark pipeline report")
    assert "| demo |" in md

    with pytest.raises(ValueError):
        generate_report([], str(tmp_path / "x.txt"), fmt="pdf")


def test_hadoop_client_change_permissions(spark, tmp_path):
    from rdsa_utils_spark.sources.objectstore import HadoopFileSystemClient

    client = HadoopFileSystemClient(spark)
    f = tmp_path / "perm.txt"
    f.write_text("x")
    assert client.change_permissions(f"file:{tmp_path}", "755", recursive=True)
