"""Pipeline run-logging on catalog tables.

Capability parity: reference ``rdsa_utils/cdp/io/pipeline_runlog.py``
(:40-405): runlog + reserved-ids tables, id reservation, entry
creation/append, last/penultimate run lookup, text export. Re-designed
on the public catalog API (``saveAsTable``/``insertInto``) — parquet
in tests, Hive/Iceberg in deployments.
"""

from __future__ import annotations

import datetime as dt
import getpass
import json
from typing import Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RUNLOG_SCHEMA = (
    "run_id long, desc string, user string, datetime timestamp, "
    "pipeline_name string, pipeline_version string, config string"
)


def create_runlog_table(
    spark: SparkSession,
    database: str,
    tablename: str = "pipeline_runlog",
) -> None:
    """Create the runlog table and its ``_reserved_ids`` companion."""
    spark.sql(
        f"""CREATE TABLE IF NOT EXISTS {database}.{tablename} (
            run_id BIGINT, desc STRING, user STRING, datetime TIMESTAMP,
            pipeline_name STRING, pipeline_version STRING, config STRING
        ) USING parquet""",
    )
    spark.sql(
        f"""CREATE TABLE IF NOT EXISTS {database}.{tablename}_reserved_ids (
            run_id BIGINT, reserved_date TIMESTAMP
        ) USING parquet""",
    )


def reserve_id(spark: SparkSession, log_table: str) -> int:
    """Reserve the next run id: max(reserved)+1, recorded in the
    reserved-ids table.

    Note (scale/concurrency): like the reference, this is
    read-max-then-append — atomic only under an external scheduler
    lock or a table format with transactional appends (Delta/Iceberg).
    """
    reserved = f"{log_table}_reserved_ids"
    row = spark.read.table(reserved).agg(F.max("run_id").alias("m")).first()
    next_id = int(row["m"] or 0) + 1
    spark.createDataFrame(
        [(next_id, dt.datetime.now())], "run_id long, reserved_date timestamp",
    ).write.mode("append").insertInto(reserved)
    return next_id


def create_runlog_entry(
    spark: SparkSession,
    run_id: int,
    desc: str,
    pipeline_name: str,
    pipeline_version: str = "",
    config: Optional[Mapping] = None,
) -> DataFrame:
    """One-row runlog entry frame."""
    return spark.createDataFrame(
        [
            (
                int(run_id),
                desc,
                getpass.getuser(),
                dt.datetime.now(),
                pipeline_name,
                pipeline_version,
                json.dumps(dict(config or {}), default=str),
            ),
        ],
        RUNLOG_SCHEMA,
    )


def add_runlog_entry(
    spark: SparkSession,
    log_table: str,
    desc: str,
    pipeline_name: str,
    pipeline_version: str = "",
    config: Optional[Mapping] = None,
    run_id: Optional[int] = None,
) -> int:
    """Reserve (unless given) a run id and append the entry."""
    if run_id is None:
        run_id = reserve_id(spark, log_table)
    entry = create_runlog_entry(
        spark, run_id, desc, pipeline_name, pipeline_version, config,
    )
    entry.write.mode("append").insertInto(log_table)
    return run_id


def _get_run_ids(
    spark: SparkSession,
    log_table: str,
    limit: int,
    pipeline: Optional[str] = None,
) -> list[int]:
    """Most recent ``limit`` run ids (desc by timestamp). Catalyst
    plans TakeOrderedAndProject — no full sort materializes."""
    df = spark.read.table(log_table)
    if pipeline:
        df = df.filter(F.col("pipeline_name") == pipeline)
    rows = (
        df.orderBy(F.col("datetime").desc(), F.col("run_id").desc())
        .select("run_id")
        .limit(limit)
        .collect()
    )
    return [int(r["run_id"]) for r in rows]


def get_last_run_id(
    spark: SparkSession, log_table: str, pipeline: Optional[str] = None,
) -> Optional[int]:
    ids = _get_run_ids(spark, log_table, 1, pipeline)
    return ids[0] if ids else None


def get_penultimate_run_id(
    spark: SparkSession, log_table: str, pipeline: Optional[str] = None,
) -> Optional[int]:
    ids = _get_run_ids(spark, log_table, 2, pipeline)
    return ids[1] if len(ids) > 1 else None


def _parse_runlog_as_string(spark: SparkSession, log_table: str, run_id: int) -> str:
    """Render one runlog entry as key: value text."""
    row = (
        spark.read.table(log_table)
        .filter(F.col("run_id") == F.lit(int(run_id)))
        .first()
    )
    if row is None:
        raise ValueError(f"run_id {run_id} not found in {log_table}")
    return "\n".join(f"{k}: {row[k]}" for k in row.asDict())


def write_runlog_file(
    spark: SparkSession, log_table: str, run_id: int, path: str,
) -> None:
    """Export one runlog entry to a local text file."""
    with open(path, "w") as fh:
        fh.write(_parse_runlog_as_string(spark, log_table, run_id) + "\n")
