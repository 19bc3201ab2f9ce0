"""Readers: parquet / CSV / JSON / catalog tables with column post-processing.

Capability parity (re-designed, not translated):
- ``load_csv`` — reference ``rdsa_utils/helpers/pyspark.py:799-929``
  (CSV scan + keep/drop/rename).
- ``load_and_validate_table`` — reference ``rdsa_utils/cdp/io/input.py:121-292``
  (table scan + emptiness validation + filter + keep/drop/rename).
- ``read_table`` / ``build_sql_query`` — reference
  ``rdsa_utils/gcp/io/inputs.py:25-265`` (SQL-pushdown read with
  column/date/partition/run-id filters). Ours targets the Spark
  catalog / parquet views; Catalyst performs the pushdown the
  reference delegated to BigQuery.

Scale notes: every filter here is expressed declaratively so Catalyst
pushes predicates and prunes columns into the parquet scan. Emptiness
validation uses ``df.isEmpty()`` (one partition-0 task) instead of the
reference's ``df.rdd.isEmpty()`` (which forfeits plan optimization),
and runs at most once per load.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdsa_utils_spark.exceptions import DataframeEmptyError

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _postprocess_columns(
    df: DataFrame,
    keep_columns: Optional[Sequence[str]] = None,
    rename_columns: Optional[Mapping[str, str]] = None,
    drop_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Apply keep → rename → drop, validating that names exist.

    Order matches the reference contract (keep first, then rename,
    then drop; rename/drop refer to post-keep names).
    """
    if keep_columns:
        missing = [c for c in keep_columns if c not in df.columns]
        if missing:
            raise ValueError(f"keep_columns not in dataframe: {missing}")
        df = df.select(*keep_columns)
    if rename_columns:
        missing = [c for c in rename_columns if c not in df.columns]
        if missing:
            raise ValueError(f"rename_columns keys not in dataframe: {missing}")
        # Single select → one projection node, not N withColumnRenamed.
        df = df.select(
            *[F.col(c).alias(rename_columns.get(c, c)) for c in df.columns],
        )
    if drop_columns:
        missing = [c for c in drop_columns if c not in df.columns]
        if missing:
            raise ValueError(f"drop_columns not in dataframe: {missing}")
        df = df.drop(*drop_columns)
    return df


def _read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan tolerant of TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type and (≥3.2) refuses NANOS
    parquet columns outright. Fallback: re-read with
    ``spark.sql.legacy.parquet.nanosAsLong`` and convert each
    nanos column (identified from the parquet footer via pyarrow)
    to a microsecond TimestampType — the same truncation DuckDB and
    pandas apply when downcasting ns→us.
    """
    nano_cols: list[str] = []
    try:
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        probe = path
        if _os.path.isdir(path):
            files = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
            probe = files[0] if files else path
        pf = _pq.ParquetFile(probe)
        # pyarrow reports BOTH real TIMESTAMP(NANOS) and legacy INT96
        # timestamps as timestamp[ns]. Spark reads INT96 natively —
        # only INT64-backed NANOS columns need the nanosAsLong detour
        # (converting an INT96 column would hit a TIMESTAMP div BIGINT
        # type error).
        phys = {
            pf.schema.column(i).name: pf.schema.column(i).physical_type
            for i in range(len(pf.schema))
        }
        schema = pf.schema_arrow
        nano_cols = [
            name
            for name, typ in zip(schema.names, schema.types)
            if str(typ).startswith("timestamp[ns") and phys.get(name) == "INT64"
        ]
    except Exception:  # pragma: no cover — remote path: let Spark try/raise
        nano_cols = []
    if not nano_cols:
        return spark.read.parquet(path)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        # Integer division: ns-epoch longs exceed double's 53-bit
        # mantissa, so float division here would corrupt microseconds.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df


def read_parquet(
    spark: SparkSession,
    path: str,
    keep_columns: Optional[Sequence[str]] = None,
    rename_columns: Optional[Mapping[str, str]] = None,
    drop_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Parquet scan with optional column post-processing."""
    return _postprocess_columns(
        _read_parquet_nanos_safe(spark, path), keep_columns, rename_columns, drop_columns,
    )


def load_csv(
    spark: SparkSession,
    filepath: str,
    keep_columns: Optional[Sequence[str]] = None,
    rename_columns: Optional[Mapping[str, str]] = None,
    drop_columns: Optional[Sequence[str]] = None,
    **kwargs: str,
) -> DataFrame:
    """CSV → DataFrame with keep/drop/rename post-processing.

    ``header=True`` by default; any Spark CSV option can be overridden
    via ``**kwargs`` (e.g. ``inferSchema="true"``, ``multiLine="true"``,
    ``lineSep="\\r"`` for the reference's multiLine carriage-return fix).
    """
    options = {"header": "true", **kwargs}
    df = spark.read.options(**options).csv(filepath)
    return _postprocess_columns(df, keep_columns, rename_columns, drop_columns)


def load_json(
    spark: SparkSession,
    filepath: str,
    multi_line: bool = False,
    keep_columns: Optional[Sequence[str]] = None,
    rename_columns: Optional[Mapping[str, str]] = None,
    drop_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """JSON / NDJSON → DataFrame (reference small-data path was pandas:
    ``cdp/helpers/s3_utils.py:1368``; ours stays distributed)."""
    df = spark.read.option("multiLine", str(multi_line).lower()).json(filepath)
    return _postprocess_columns(df, keep_columns, rename_columns, drop_columns)


def load_and_validate_table(
    spark: SparkSession,
    table_name: str,
    skip_validation: bool = False,
    err_msg: Optional[str] = None,
    filter_cond: Optional[str] = None,
    keep_columns: Optional[Sequence[str]] = None,
    rename_columns: Optional[Mapping[str, str]] = None,
    drop_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Catalog-table scan + filter + emptiness validation + column ops.

    Unlike the reference (which runs two ``rdd.isEmpty()`` actions —
    one pre-filter, one post-filter), we validate once on the final
    plan: a single ``isEmpty`` probe that Catalyst can satisfy with a
    pushed-down scan of one row group.
    """
    df = spark.read.table(table_name)
    if filter_cond:
        df = df.filter(filter_cond)
    df = _postprocess_columns(df, keep_columns, rename_columns, drop_columns)
    if not skip_validation and df.isEmpty():
        raise DataframeEmptyError(
            err_msg or f"Table {table_name} is empty after load/filter.",
        )
    return df


def build_sql_query(
    table_path: str,
    columns: Optional[Sequence[str]] = None,
    date_column: Optional[str] = None,
    date_range: Optional[Sequence[str]] = None,
    column_filter_dict: Optional[Mapping[str, Sequence[object]]] = None,
    partition_column: Optional[str] = None,
    partition_type: Optional[str] = None,
    partition_value: Optional[str] = None,
) -> str:
    """Build ``SELECT … FROM … WHERE …`` ANSI SQL.

    Parity with reference ``gcp/io/inputs.py:129-265``: projection
    list, partition filter (``date_trunc`` to hour/day/month/year),
    date ``BETWEEN`` range, and per-column OR-lists. Emitted SQL is
    ANSI (``date_trunc(part, col)``) so it runs on Spark SQL and
    DuckDB alike, rather than BigQuery's ``TIMESTAMP_TRUNC``.
    """
    select_cols = ", ".join(columns) if columns else "*"
    where_clauses: list[str] = []

    if partition_column and partition_type and partition_value:
        part = partition_type.lower()
        if part not in {"hour", "day", "month", "year"}:
            raise ValueError(f"partition_type must be hour/day/month/year, got {partition_type!r}")
        where_clauses.append(
            f"date_trunc('{part}', {partition_column}) = '{partition_value}'",
        )

    if date_column and date_range:
        if len(date_range) != 2:
            raise ValueError("date_range must be [start, end]")
        where_clauses.append(
            f"{date_column} BETWEEN '{date_range[0]}' AND '{date_range[1]}'",
        )

    if column_filter_dict:
        for col, values in column_filter_dict.items():
            formatted = [
                # ANSI quoting: double any embedded single quote so a
                # value like "O'Brien" yields 'O''Brien' instead of
                # malformed (and injectable) SQL.
                "'" + v.replace("'", "''") + "'" if isinstance(v, str) else str(v)
                for v in values
            ]
            ors = " OR ".join(f"{col} = {v}" for v in formatted)
            where_clauses.append(f"({ors})")

    query = f"SELECT {select_cols} FROM {table_path}"
    if where_clauses:
        query += " WHERE " + " AND ".join(where_clauses)
    return query


def read_table(
    spark: SparkSession,
    table_path: str,
    columns: Optional[Sequence[str]] = None,
    date_column: Optional[str] = None,
    date_range: Optional[Sequence[str]] = None,
    column_filter_dict: Optional[Mapping[str, Sequence[object]]] = None,
    run_id_column: Optional[str] = None,
    run_id: Optional[object] = None,
    partition_column: Optional[str] = None,
    partition_type: Optional[str] = None,
    partition_value: Optional[str] = None,
    flatten_struct_cols: bool = False,
) -> DataFrame:
    """SQL-filtered read of a registered table/view.

    The reference pushed a generated SQL string into BigQuery; ours
    hands the same string to ``spark.sql`` and lets Catalyst push the
    predicates into the parquet scan — equivalent pushdown without an
    external service.
    """
    filters = dict(column_filter_dict or {})
    if run_id_column and run_id is not None:
        filters[run_id_column] = [run_id]
    query = build_sql_query(
        table_path,
        columns=columns,
        date_column=date_column,
        date_range=date_range,
        column_filter_dict=filters or None,
        partition_column=partition_column,
        partition_type=partition_type,
        partition_value=partition_value,
    )
    df = spark.sql(query)
    if flatten_struct_cols:
        from rdsa_utils_spark.operators.reshape import flatten_struct_columns

        df = flatten_struct_columns(df, recursive=True)
    return df


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: Sequence[str] = TABLE_NAMES,
) -> dict[str, DataFrame]:
    """Register the testdata parquet tables as temp views.

    Returns name -> DataFrame so callers can use either API. Missing
    files are skipped (e.g. a scale dir without ``documents``).
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = f"{sf_dir}/{name}.parquet"
        try:
            df = spark.read.parquet(path)
        except Exception:
            continue
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_jsonl_corpus(
    spark: SparkSession,
    filepath: str,
    schema: str,
    required: Optional[Sequence[str]] = None,
) -> tuple[DataFrame, DataFrame]:
    """Ingest-gated JSONL corpus reader: returns ``(good, bad)``.

    The standard LLM-corpus interchange format is line-delimited JSON
    with a long tail of malformed lines; silently coercing them to
    nulls (Spark's default PERMISSIVE read) poisons training data.
    This reader splits instead: ``good`` carries exactly ``schema``'s
    columns for lines that parse AND have every ``required`` field
    non-null; ``bad`` carries (``line``, ``reason``) for quarantine.

    Implementation: ``spark.read.text`` + ``from_json`` with an
    appended ``_corrupt_record`` sink column — one distributed parse,
    no caching workaround (the classic gotcha: filtering a native
    JSON read on its corrupt-record column alone is disallowed /
    requires a cache; parsing text lines explicitly sidesteps it).
    Both outputs derive from one scan; at 100 TB the text source
    splits by line ranges exactly like the native JSON reader.
    """
    corrupt = "_corrupt_record"
    full_schema = f"{schema}, {corrupt} string"
    parsed = (
        spark.read.text(filepath)
        .select(
            F.col("value").alias("line"),
            F.from_json(
                "value",
                full_schema,
                {"columnNameOfCorruptRecord": corrupt},
            ).alias("rec"),
        )
    )
    is_corrupt = F.col(f"rec.{corrupt}").isNotNull() | F.col("rec").isNull()
    missing = F.lit(False)
    reason = F.when(is_corrupt, F.lit("malformed"))
    for field in required or []:
        f_null = F.col(f"rec.{field}").isNull()
        missing = missing | f_null
        reason = reason.when(f_null, F.lit(f"missing:{field}"))
    good = (
        parsed.filter(~is_corrupt & ~missing)
        .select("rec.*")
        .drop(corrupt)
    )
    bad = parsed.filter(is_corrupt | missing).select(
        "line", reason.alias("reason"),
    )
    return good, bad


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob_filter: Optional[str] = None,
    max_bytes: Optional[int] = None,
) -> DataFrame:
    """Raw-file ingest for multimodal corpora: Spark's ``binaryFile``
    source — one row per file with (``path``, ``modificationTime``,
    ``length``, ``content`` binary) — feeding the
    ``operators/multimodal`` decode/featurize plumbing.

    ``glob_filter`` (e.g. ``"*.jpg"``) prunes AT THE LISTING, not
    after reading; ``max_bytes`` guards against a stray huge file
    poisoning executor memory (filter on the ``length`` metadata
    column — pushed down, the content of oversized files is never
    materialized).
    """
    reader = spark.read.format("binaryFile")
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def load_orc(
    spark: SparkSession,
    filepath: str,
    keep_columns: Optional[Sequence[str]] = None,
    rename_columns: Optional[Mapping[str, str]] = None,
    drop_columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """ORC → DataFrame with the same keep/drop/rename post-processing
    as :func:`load_csv` (columnar pushdown/pruning apply as with
    parquet)."""
    df = spark.read.orc(filepath)
    return _postprocess_columns(df, keep_columns, rename_columns, drop_columns)
