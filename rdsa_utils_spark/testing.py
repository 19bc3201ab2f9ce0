"""Public testing utilities.

Reference surface: ``rdsa_utils/test_utils.py`` — the reference ships
its test harness as user-facing API (labelled case parametrization
via ``Case``/``parametrize_cases`` [test_utils.py:40-157], tuple-data
DataFrame builders [:160-206], date coercers [:165-172], and a
configured local session fixture [:19-37]). This module re-expresses
that surface for the engine, self-contained (no chispa dependency —
the equality asserts are implemented here).

``pytest`` is imported lazily so the engine package stays importable
in production images without test dependencies.
"""

from __future__ import annotations

import datetime
from typing import Any, List, Optional, Sequence, Tuple, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


class Case:
    """A labelled test scenario for ``parametrize_cases``.

    ``label`` becomes the pytest test id; ``marks`` (a pytest mark or
    list of marks) is applied to just this case; every other keyword
    becomes a test-function argument. Kwargs are also dot-accessible
    on the instance. (Concept from the public
    pytest-parametrize-cases pattern, as in the reference.)
    """

    def __init__(
        self,
        label: Optional[str] = None,
        marks: Any = None,
        **kwargs: Any,
    ) -> None:
        self.label = label
        self.marks = marks
        self.kwargs = kwargs
        self.__dict__.update(kwargs)

    def __repr__(self) -> str:
        return f"Case({self.label!r}, **{self.kwargs!r})"


def parametrize_cases(*cases: Case):
    """Decorator: ``pytest.mark.parametrize`` over ``Case`` objects.

    The argument list is the union of all cases' kwargs (missing keys
    filled with ``None``), argument order is alphabetical, and each
    case's label is its test id.
    """
    import pytest

    for case in cases:
        if not isinstance(case, Case):
            raise TypeError(f"{case!r} is not an instance of Case")

    arg_names = sorted({k for case in cases for k in case.kwargs})
    params = []
    for case in cases:
        values = tuple(case.kwargs.get(k) for k in arg_names)
        if len(arg_names) == 1:
            values = values[0]  # pytest expects a scalar for 1 argname
            params.append(
                pytest.param(values, id=case.label, marks=case.marks or ()),
            )
        else:
            params.append(
                pytest.param(*values, id=case.label, marks=case.marks or ()),
            )
    return pytest.mark.parametrize(",".join(arg_names), params)


def create_dataframe(data: List[Tuple], **kwargs: Any) -> pd.DataFrame:
    """pandas DataFrame from tuple rows where row 0 is the header."""
    return pd.DataFrame.from_records(data[1:], columns=data[0], **kwargs)


def to_date(dt: str) -> datetime.date:
    """'2001-01-01' → ``datetime.date``."""
    return pd.to_datetime(dt).date()


def to_datetime(dt: str) -> datetime.datetime:
    """'2001-01-01 12:00' → ``datetime.datetime``."""
    return pd.to_datetime(dt).to_pydatetime()


def create_spark_df(
    spark: SparkSession,
    data: Sequence,
) -> DataFrame:
    """Spark DataFrame from tuple rows; element 0 is the schema —
    either a tuple of column names or a DDL string
    ('a STRING, b INT')."""
    return spark.createDataFrame(data[1:], schema=data[0])


def to_spark(spark: SparkSession, df: pd.DataFrame, *args: Any, **kwargs: Any) -> DataFrame:
    """pandas → Spark DataFrame."""
    return spark.createDataFrame(df, *args, **kwargs)


def _schema_signature(df: DataFrame, ignore_nullable: bool) -> list:
    if ignore_nullable:
        return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    return [(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema.fields]


def assert_df_equality(
    actual: DataFrame,
    expected: DataFrame,
    sort_cols: Optional[Union[str, Sequence[str]]] = None,
    approx: Optional[float] = None,
    ignore_nullable: bool = True,
) -> None:
    """Exact frame equality (column names + types + row values), with
    ``approx`` absolute tolerance for float cells and optional
    pre-sort for order-insensitive comparison."""
    a_sig = _schema_signature(actual, ignore_nullable)
    e_sig = _schema_signature(expected, ignore_nullable)
    assert a_sig == e_sig, f"schemas differ: {a_sig} vs {e_sig}"
    if sort_cols:
        cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        actual = actual.orderBy(*cols)
        expected = expected.orderBy(*cols)
    a_rows = [tuple(r) for r in actual.collect()]
    e_rows = [tuple(r) for r in expected.collect()]
    assert len(a_rows) == len(e_rows), (
        f"row counts differ: {len(a_rows)} vs {len(e_rows)}"
    )
    names = actual.columns
    for i, (a, e) in enumerate(zip(a_rows, e_rows)):
        for j, (av, ev) in enumerate(zip(a, e)):
            if approx is not None and isinstance(av, float) and isinstance(ev, float):
                assert abs(av - ev) <= approx, (
                    f"row {i} col {names[j]}: {av} != {ev} (±{approx})"
                )
            else:
                assert av == ev, f"row {i} col {names[j]}: {av!r} != {ev!r}"


def assert_approx_df_equality(
    actual: DataFrame,
    expected: DataFrame,
    precision: float = 1e-7,
    sort_cols: Optional[Union[str, Sequence[str]]] = None,
    ignore_nullable: bool = True,
) -> None:
    """Float-tolerant frame equality (reference tests use chispa's
    ``assert_approx_df_equality(precision=1e-7)``)."""
    assert_df_equality(
        actual,
        expected,
        sort_cols=sort_cols,
        approx=precision,
        ignore_nullable=ignore_nullable,
    )
