"""Average / share Column builders.

Capability parity: reference ``rdsa_utils/methods/averaging_methods.py:11-36``.
Each function returns a lazy ``Column``; callers apply via ``.agg()``
or ``.withColumn()`` — all JVM-side, codegen'd, map-side-combinable.

Domain contract for geometric averages (SURVEY.md §7.4 trap #3):
``F.log`` of zero/negative yields NULL, which ``sum``/``mean`` silently
skip — the result is then the geometric mean of the POSITIVE subset.
``strict=True`` (default) instead poisons the aggregate to NULL when
any non-positive value is present, making the domain violation visible.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def _col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def weighted_arithmetic_average(val: Union[str, Column], weight: Union[str, Column]) -> Column:
    """Σ(value · weight) — weights assumed pre-normalised to sum 1."""
    return F.sum(_col(val) * _col(weight))


def unweighted_arithmetic_average(val: Union[str, Column]) -> Column:
    """Plain mean."""
    return F.mean(_col(val))


def weighted_geometric_average(
    val: Union[str, Column],
    weight: Union[str, Column],
    strict: bool = True,
) -> Column:
    """exp(Σ(ln(value) · weight)) — weights pre-normalised to sum 1."""
    v, w = _col(val), _col(weight)
    body = F.exp(F.sum(F.log(v) * w))
    if strict:
        return F.when(F.max(F.when(v <= 0, 1).otherwise(0)) == 1, F.lit(None)).otherwise(body)
    return body


def unweighted_geometric_average(val: Union[str, Column], strict: bool = True) -> Column:
    """exp(mean(ln value))."""
    v = _col(val)
    body = F.exp(F.mean(F.log(v)))
    if strict:
        return F.when(F.max(F.when(v <= 0, 1).otherwise(0)) == 1, F.lit(None)).otherwise(body)
    return body


def get_weight_shares(
    weights: Union[str, Column],
    levels: Union[str, Column, Sequence[Union[str, Column]]] = None,
) -> Column:
    """weight / Σ(weight) within ``levels`` (sum-over-partition window)."""
    w = _col(weights)
    if levels is None:
        parts: list = []
    elif isinstance(levels, (str, Column)):
        parts = [levels]
    else:
        parts = list(levels)
    return w / F.sum(w).over(Window.partitionBy(*parts))
