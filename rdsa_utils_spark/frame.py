"""DataFrame API sugar.

Capability parity:
- ``to_spark_col`` decorator — reference ``rdsa_utils/helpers/pyspark.py:163-216``
  (coerce string args of a Column-builder to ``F.col``).
- ``transform_`` pipe — reference ``helpers/pyspark.py:246-248``
  (built-in ``DataFrame.transform`` since 3.0; re-exported for parity).
- ``apply_col_func`` — reference ``helpers/pyspark.py:1224-1263``.
- ``is_df_empty`` — reference ``helpers/pyspark.py:251-256`` (ours uses
  the public ``df.isEmpty()``).
- ``find_spark_dataframes`` — reference ``helpers/pyspark.py:595-644``.
"""

from __future__ import annotations

import functools
from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_spark_col(_func: Callable | None = None, *, exclude: Sequence[str] = ()) -> Callable:
    """Decorator: string positional/keyword args become ``F.col(arg)``
    (except names listed in ``exclude``)."""

    def decorate(func: Callable) -> Callable:
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            new_args = [
                F.col(a) if isinstance(a, str) else a for a in args
            ]
            new_kwargs = {
                k: (F.col(v) if isinstance(v, str) and k not in exclude else v)
                for k, v in kwargs.items()
            }
            return func(*new_args, **new_kwargs)

        return wrapper

    return decorate(_func) if callable(_func) else decorate


def transform_(df: DataFrame, func: Callable, *args, **kwargs) -> DataFrame:
    """Pipe-style chaining: ``transform_(df, f, x) == f(df, x)``."""
    return func(df, *args, **kwargs)


def apply_col_func(
    df: DataFrame,
    cols: Sequence[str],
    func: Callable[[DataFrame, str], DataFrame],
) -> DataFrame:
    """Fold a ``(df, col) -> df`` function over the named columns."""
    for c in cols:
        df = func(df, c)
    return df


def is_df_empty(df: DataFrame) -> bool:
    return df.isEmpty()


def find_spark_dataframes(namespace: Mapping[str, object]) -> dict[str, DataFrame]:
    """Names → DataFrames found in a namespace dict (pass ``locals()``
    or ``globals()``; notebook convenience)."""
    return {
        name: obj
        for name, obj in namespace.items()
        if isinstance(obj, DataFrame) and not name.startswith("_")
    }
