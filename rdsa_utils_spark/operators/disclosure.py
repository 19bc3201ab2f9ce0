"""Statistical disclosure control (SDC) primitives.

Extension surface: the reference (ONS rdsa-utils) ships the pipeline
plumbing around official statistics but leaves disclosure control to
downstream tooling; a statistics-office analytics engine should make
the table-publication gates first-class operators. These are the
classic pre-publication checks — threshold (small-cell) suppression,
(n,p) dominance rules, k-anonymity screening, and rounding to base —
each expressed as plain aggregations so they run on microdata at any
scale.

Design rules:

- Everything is ``groupBy().agg()`` + JVM expressions: one shuffle on
  the cell/quasi-identifier key, map-side combined. The dominance
  rule adds one partitioned window over the (cells × contributors)
  aggregate — already reduced data, never the microdata.
- Deterministic: rounding is half-away-from-zero in exact integer
  arithmetic; dominance ties break by contributor id, so flags are a
  pure function of the data.
- Suppression REMOVES values (NULL), never perturbs them — primary
  suppression only. Complementary (secondary) suppression is a
  combinatorial optimization over the published table, a
  driver-side concern at table size, out of engine scope.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "round_to_base",
    "suppress_small_cells",
    "dominance_flags",
    "k_anonymity_violations",
    "l_diversity_violations",
]


def round_to_base(col: Column | str, base: int = 5) -> Column:
    """Round to the nearest multiple of ``base`` (half away from
    zero) — the conventional SDC counts treatment. Integer-exact:
    computed as ``sign · floor(|x|/base + 0.5) · base``, so there is
    no float midpoint ambiguity to disagree with an external replay.
    """
    if base < 1:
        raise ValueError(f"base must be >= 1, got {base}")
    c = F.col(col) if isinstance(col, str) else col
    magnitude = F.floor(F.abs(c) / F.lit(base) + F.lit(0.5)) * F.lit(base)
    return (
        F.when(c < 0, -magnitude).otherwise(magnitude).cast("long")
    )


def suppress_small_cells(
    df: DataFrame,
    count_col: str,
    value_cols: Sequence[str],
    min_count: int,
    flag_col: str = "suppressed",
) -> DataFrame:
    """Primary threshold suppression on an aggregated table: cells
    whose ``count_col`` is below ``min_count`` get every column in
    ``value_cols`` set to NULL and ``flag_col`` = true. The count
    itself is left for the caller (publish it rounded via
    :func:`round_to_base`, or suppress it too by listing it in
    ``value_cols``). Pure projection — no shuffle.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    small = F.col(count_col) < F.lit(min_count)
    out = df
    for c in value_cols:
        out = out.withColumn(
            c, F.when(small, F.lit(None).cast(df.schema[c].dataType)).otherwise(F.col(c)),
        )
    return out.withColumn(flag_col, small)


def dominance_flags(
    df: DataFrame,
    cell_cols: Sequence[str],
    contributor_col: str,
    value_col: str,
    n: int = 1,
    p: float = 0.8,
    round_to: int = 6,
) -> DataFrame:
    """(n, p) dominance rule: a published cell is disclosive when its
    top ``n`` contributors account for more than fraction ``p`` of
    the cell total — the largest supplier could be re-identified from
    the magnitude. One row per cell: ``cell_cols``, ``cell_total``,
    ``top_share`` (combined share of the top n contributors, tie
    broken by contributor id), ``dominated`` boolean.

    Shuffle shape: microdata aggregates once to (cell, contributor)
    sums, a window ranks contributors WITHIN each cell (partitioned —
    never global), and a final cell aggregate emits the flag. Cells
    with a non-positive total report NULL ``top_share`` and are
    flagged dominated (indeterminate shares are not publishable).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    cell_cols = list(cell_cols)
    # Decimal accumulation end to end: double sums are addition-order
    # dependent, and a disclosure flag must be a pure function of the
    # data, not of partitioning.
    contrib = df.groupBy(*cell_cols, contributor_col).agg(
        F.sum(F.col(value_col).cast("decimal(38,6)")).alias("__v"),
    )
    w = Window.partitionBy(*cell_cols).orderBy(
        F.col("__v").desc(), F.col(contributor_col).asc(),
    )
    ranked = contrib.withColumn("__rk", F.row_number().over(w))
    zero = F.lit(0).cast("decimal(38,6)")
    cells = ranked.groupBy(*cell_cols).agg(
        F.sum("__v").alias("__total"),
        F.sum(F.when(F.col("__rk") <= n, F.col("__v")).otherwise(zero)).alias(
            "__topn",
        ),
    )
    share = F.when(
        F.col("__total") > 0,
        (F.col("__topn").cast("double") / F.col("__total").cast("double")),
    ).otherwise(F.lit(None).cast("double"))
    return cells.select(
        *cell_cols,
        F.round(F.col("__total").cast("double"), round_to).alias("cell_total"),
        F.round(share, round_to).alias("top_share"),
        F.coalesce(share > F.lit(float(p)), F.lit(True)).alias("dominated"),
    )


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Groups of quasi-identifier values shared by fewer than ``k``
    rows — the records an intruder could narrow down to a small set.
    Returns only the violating groups: ``quasi_cols`` + ``n_rows``.
    One map-side-combined ``groupBy`` over the quasi key; NULL quasi
    values form their own group, per SQL GROUP BY (a NULL segment is
    just as linkable).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") < k)
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int,  # noqa: E741 — the established SDC parameter name
) -> DataFrame:
    """Quasi-identifier groups whose SENSITIVE attribute takes fewer
    than ``l`` distinct values — the k-anonymity follow-up (Machanavajjhala
    et al. 2007): a group can be k-anonymous yet still leak the
    sensitive value outright when every member shares it (homogeneity
    attack). Returns only the violating groups: ``quasi_cols`` +
    ``n_rows`` + ``n_distinct_sensitive``.

    NULL sensitive values are excluded from the distinct count (an
    absent attribute discloses nothing); a group whose sensitive
    column is entirely NULL reports 0 distinct values. One exact
    ``count_distinct`` aggregation over the quasi key — map-side
    partial on (quasi, sensitive) pairs, never a window.
    """
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col(sensitive_col)).alias("n_distinct_sensitive"),
        )
        .filter(F.col("n_distinct_sensitive") < l)
    )
