"""Catalog introspection.

Capability parity: reference ``rdsa_utils/cdp/io/input.py:14-118``
(current database, table listing, db-name extraction) and
``gcp/helpers/gcp_utils.py:42-69`` (table existence). All pure
``spark.catalog`` calls — metadata only, no jobs.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import SparkSession


def get_current_database(spark: SparkSession) -> str:
    """Current catalog database name."""
    return spark.catalog.currentDatabase()


def get_tables_in_database(spark: SparkSession, database: Optional[str] = None) -> List[str]:
    """Table names in ``database`` (default: current database)."""
    db = database or spark.catalog.currentDatabase()
    return [t.name for t in spark.catalog.listTables(db)]


def extract_database_name(table_path: str) -> tuple[Optional[str], str]:
    """Split ``[catalog.]db.table`` / ``db.table`` / ``table`` into
    (database, table). Reference: ``cdp/io/input.py:61-118``."""
    parts = table_path.split(".")
    if len(parts) == 1:
        return None, parts[0]
    if len(parts) == 2:
        return parts[0], parts[1]
    if len(parts) == 3:
        return parts[1], parts[2]
    raise ValueError(f"Invalid table path {table_path!r} (expect ≤3 dotted parts)")


def table_exists(spark: SparkSession, table_name: str) -> bool:
    """Whether a table/view is resolvable in the catalog."""
    return spark.catalog.tableExists(table_name)


def refresh_table_metadata(spark: SparkSession, table_name: str) -> None:
    """Invalidate and reload cached metadata/file listings for a table.

    Capability parity: reference ``cdp/helpers/impala.py:10-80``
    (``invalidate_impala_metadata`` — shells out to impala-shell to run
    ``INVALIDATE METADATA`` after writing an intermediate Hive table).
    Spark-native equivalent: ``spark.catalog.refreshTable`` drops the
    table's cached metadata and file index so the next query re-lists
    files — same staleness problem, no subprocess, works for any
    catalog table or path-backed view.
    """
    spark.catalog.refreshTable(table_name)


def run_query(spark: SparkSession, query: str):
    """Run a SQL query and return the (lazy) result DataFrame.

    Capability parity: reference ``gcp/helpers/gcp_utils.py:29-31``
    (``run_bq_query`` — submits SQL to the BigQuery client). Here the
    engine IS the SQL executor: ``spark.sql`` parses/plans through
    Catalyst against registered tables and views.
    """
    return spark.sql(query)


def get_table_columns(spark: SparkSession, table_name: str) -> List[str]:
    """Column names of a catalog table (reference:
    ``gcp/helpers/gcp_utils.py:34-39`` — BigQuery schema fetch)."""
    return spark.table(table_name).columns
