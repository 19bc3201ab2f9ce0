"""Scalar / array Column builders.

Capability parity:
- ``create_colname_to_value_map`` — reference
  ``rdsa_utils/helpers/pyspark.py:33-37``.
- ``random_uniform`` — reference ``helpers/pyspark.py:1266-1313``.
- ``cumulative_array`` — reference ``helpers/pyspark.py:1316-1357``
  (prefix sums over an array column via SQL higher-order functions —
  no UDF). The reference's transform+aggregate form is O(n²) per
  array; ours keeps the same one-liner but documents the cost and
  exposes a posexplode+window alternative for long arrays.
- ``group_median`` / ``exact_median`` — reference ``calc_median_price``
  ``helpers/pyspark.py:372-393``. Exact ``median`` for oracle-checked
  results; ``percentile_approx`` kept as the documented fast path
  (SURVEY.md §7.4 trap #1).
"""

from __future__ import annotations

from itertools import chain
from typing import Sequence, Union

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


_UTC_ZONES = {"UTC", "Etc/UTC", "GMT", "Etc/GMT", "Z", "+00:00", "GMT0", "UTC0"}


def require_utc_for_ntz(df, col_name: str) -> None:
    """Reinterpreting TIMESTAMP_NTZ as an instant is only exact when
    the session time zone is UTC — under a DST-observing zone the
    mapping shifts near transitions and fall-back makes it
    non-injective. Raise rather than silently compute shifted epochs.
    """
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in _UTC_ZONES:
        raise ValueError(
            f"column {col_name!r} is TIMESTAMP_NTZ but the session time zone "
            f"is {tz!r}; NTZ↔epoch arithmetic is only exact under UTC. Set "
            "spark.sql.session.timeZone=UTC (the engine default via "
            "create_spark_session) or read the column as TIMESTAMP "
            "(spark.sql.parquet.inferTimestampNTZ.enabled=false).",
        )


def resolve_field_type(df, col_name: str):
    """The DataType of ``col_name`` resolved the way Spark's analyzer
    would: exact match first, then a UNIQUE case-insensitive match
    (the default ``spark.sql.caseSensitive=false``). A plain
    ``df.schema[name]`` lookup is case-SENSITIVE and raises KeyError
    for casings every ``F.col`` reference in the same function would
    happily resolve."""
    for f in df.schema.fields:
        if f.name == col_name:
            return f.dataType
    low = col_name.lower()
    matches = [f for f in df.schema.fields if f.name.lower() == low]
    if len(matches) == 1:
        return matches[0].dataType
    raise ValueError(
        f"column {col_name!r} not found"
        f"{' (ambiguous case-insensitive match)' if matches else ''} "
        f"in {df.columns}",
    )


def epoch_double(df, col_name: str) -> Column:
    """The named column as a DOUBLE suitable for ordering/difference
    arithmetic: numerics cast directly; TIMESTAMP casts to epoch
    seconds (microsecond precision preserved); TIMESTAMP_NTZ — which
    Spark forbids casting straight to DOUBLE — routes via an LTZ cast,
    exact under a UTC session time zone (enforced:
    :func:`require_utc_for_ntz` raises on any other zone rather than
    silently computing DST-shifted epochs).

    Needs the owning ``df`` for the dtype dispatch — a bare Column
    carries no schema.
    """
    dtype = resolve_field_type(df, col_name).typeName()
    c = F.col(col_name)
    if dtype == "timestamp_ntz":
        require_utc_for_ntz(df, col_name)
        c = c.cast("timestamp")
    return c.cast("double")


def create_colname_to_value_map(cols: Sequence[str]) -> Column:
    """``map<colname, value>`` column over the named columns."""
    return F.create_map(*chain.from_iterable((F.lit(c), F.col(c)) for c in cols))


def random_uniform(
    lower_bound: float = 0.0,
    upper_bound: float = 1.0,
    seed: int | None = None,
) -> Column:
    """Seeded uniform random column in [lower_bound, upper_bound)."""
    if upper_bound <= lower_bound:
        raise ValueError("random_uniform: upper_bound must exceed lower_bound")
    r = F.rand(seed) if seed is not None else F.rand()
    return r * F.lit(upper_bound - lower_bound) + F.lit(lower_bound)


def cumulative_array(array_col: Union[str, Column]) -> Column:
    """Prefix-sum array of a numeric array column.

    Pure SQL higher-order expression (no UDF, no shuffle). Quadratic
    in array length — fine for the short arrays it's meant for; for
    arrays with thousands of elements, posexplode + a running-sum
    window + collect_list is the linear alternative.
    """
    name = array_col if isinstance(array_col, str) else None
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    expr = F.transform(
        col,
        lambda x, i: F.aggregate(
            F.slice(col, F.lit(1), i),
            F.lit(0.0),
            lambda acc, y: acc + y.cast("double"),
        ) + x.cast("double"),
    )
    return expr.alias(f"cumulative_{name}") if name else expr


def exact_median(col: Union[str, Column]) -> Column:
    """Exact median aggregate (matches ANSI ``median`` in oracles)."""
    return F.median(F.col(col) if isinstance(col, str) else col)


def approx_median(col: Union[str, Column], accuracy: int = 10_000) -> Column:
    """Approximate median — the scale path (single-pass sketch)."""
    return F.percentile_approx(F.col(col) if isinstance(col, str) else col, 0.5, accuracy)


def group_median(
    groups: Union[str, Sequence[str]],
    value_col: Union[str, Column],
    exact: bool = True,
) -> Column:
    """Per-group median attached to every row (aggregate-as-window).

    ``exact=False`` switches to ``percentile_approx`` — the 100 TB
    path, where an exact median's full sort per group is not worth it.
    """
    parts = [groups] if isinstance(groups, str) else list(groups)
    w = Window.partitionBy(*parts)
    agg = exact_median(value_col) if exact else approx_median(value_col)
    return agg.over(w)
