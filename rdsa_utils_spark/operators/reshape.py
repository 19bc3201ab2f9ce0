"""Reshape operators: unpivot/melt, explode, struct pack/flatten.

Capability parity (re-designed):
- ``melt`` — reference ``rdsa_utils/helpers/pyspark.py:80-160`` built
  an array<struct> + explode by hand; Spark ≥3.4 has a native
  ``DataFrame.unpivot`` (single ``Expand`` node, no array
  materialization) which we use directly.
- ``unpack_list_col`` — reference ``helpers/pyspark.py:259-280``.
- ``pack_struct_column`` — reference ``convert_cols_to_struct_col``
  ``helpers/pyspark.py:396-452`` incl. the placeholder-field contract
  for empty struct column lists.
- ``flatten_struct_columns`` — reference ``convert_struc_col_to_columns``
  ``helpers/pyspark.py:498-537``.

All are pure projections (narrow, no shuffle) — they scale linearly.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Pandas-style unpivot: keep ``id_vars``, fold each column of
    ``value_vars`` into (variable, value) rows.

    Uses native ``unpivot`` (Catalyst ``Expand``): one pass, no
    intermediate array<struct>, value columns are cast to a common
    type exactly as pandas ``melt`` would.
    """
    missing = [c for c in [*id_vars, *value_vars] if c not in df.columns]
    if missing:
        raise ValueError(f"melt: columns not in dataframe: {missing}")
    return df.unpivot(
        ids=list(id_vars),
        values=list(value_vars),
        variableColumnName=var_name,
        valueColumnName=value_name,
    )


def unpack_list_col(
    df: DataFrame,
    list_col: str,
    unpacked_col: str,
) -> DataFrame:
    """Explode an array column into one row per element."""
    if list_col not in df.columns:
        raise ValueError(f"unpack_list_col: {list_col!r} not in dataframe")
    df = df.withColumn(unpacked_col, F.explode(F.col(list_col)))
    if unpacked_col != list_col:
        df = df.drop(list_col)
    return df


def pack_struct_column(
    df: DataFrame,
    struct_col_name: str,
    struct_cols: Optional[Sequence[str]],
    placeholder_type: T.DataType = T.BooleanType(),
    placeholder_value: Optional[object] = None,
) -> DataFrame:
    """Pack ``struct_cols`` into a single struct column, dropping the
    originals.

    With an empty/None ``struct_cols`` the struct still must exist for
    schema-stable sinks (the reference's BigQuery quirk): emit a
    one-field struct ``no_<name>`` of ``placeholder_type`` holding
    ``placeholder_value``.
    """
    if struct_cols:
        missing = [c for c in struct_cols if c not in df.columns]
        if missing:
            raise ValueError(f"pack_struct_column: columns not in dataframe: {missing}")
        return df.withColumn(
            struct_col_name, F.struct(*[F.col(c) for c in struct_cols]),
        ).drop(*struct_cols)
    placeholder = F.lit(placeholder_value).cast(placeholder_type)
    return df.withColumn(
        struct_col_name,
        F.struct(placeholder.alias(f"no_{struct_col_name}")),
    )


def flatten_struct_columns(df: DataFrame, recursive: bool = False) -> DataFrame:
    """Flatten every struct column into ``parent_child`` top-level
    columns; ``recursive=True`` repeats until no struct remains.

    Pure projection — Catalyst collapses the nested field accesses, so
    a parquet scan still reads only referenced leaves.
    """

    def _flatten_once(frame: DataFrame) -> DataFrame:
        cols = []
        for field in frame.schema.fields:
            if isinstance(field.dataType, T.StructType):
                cols.extend(
                    F.col(f"`{field.name}`.`{sub.name}`").alias(f"{field.name}_{sub.name}")
                    for sub in field.dataType.fields
                )
            else:
                cols.append(F.col(f"`{field.name}`"))
        return frame.select(*cols)

    df = _flatten_once(df)
    if recursive:
        while any(isinstance(f.dataType, T.StructType) for f in df.schema.fields):
            df = _flatten_once(df)
    return df
