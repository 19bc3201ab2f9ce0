"""Multi-dimensional data layout: z-order (Morton) clustering.

Extension surface (no reference equivalent — the reference writes
tables ordered however the engine left them). At 100 TB the write
LAYOUT is a query-speed feature: parquet keeps per-row-group min/max
stats, and a reader's predicate on any clustered column prunes row
groups only if rows with nearby values sit together in the same file.
A plain ``sortWithinPartitions(col_a)`` clusters one column and
scatters the rest; interleaving the bits of several columns into one
Morton key gives every clustered column locality at once, so filters
on ANY of them skip most files.

Everything is Column arithmetic (shift/mask/sum — whole-stage
codegen-friendly, no UDF): normalize each column to a ``bits``-wide
integer over a fixed [lo, hi] range, then interleave bit b of column
j into position ``b * ncols + j``. Ranges are explicit parameters —
the caller pins them (from domain knowledge or a prior stats job) so
the key is stable across incremental writes; ``column_ranges`` runs
the one tiny stats job when pinning is not needed.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["column_ranges", "zorder_key", "zorder_repartition"]


def column_ranges(
    df: DataFrame,
    cols: Sequence[str],
) -> dict[str, Tuple[float, float]]:
    """One aggregate job returning ``{col: (min, max)}`` for pinning
    z-order ranges. Driver gather is one row — safe at any scale."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__lo_{c}"))
        aggs.append(F.max(c).alias(f"__hi_{c}"))
    [row] = df.agg(*aggs).collect()
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def zorder_key(
    ranges: Mapping[str, Tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton key interleaving ``bits`` bits of each column in
    ``ranges`` (insertion order = bit-significance order). Values are
    clamped into [lo, hi] then scaled to [0, 2^bits - 1]; the result
    fits a long for ``bits * ncols <= 63``."""
    cols = list(ranges)
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits({bits}) * ncols({len(cols)}) > 63 — Morton key overflows a long",
        )
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = ranges[c]
        if not hi > lo:
            scaled.append(F.lit(0).cast("long"))
            continue
        frac = (
            F.least(F.greatest(F.col(c).cast("double"), F.lit(float(lo))), F.lit(float(hi)))
            - F.lit(float(lo))
        ) / F.lit(float(hi) - float(lo))
        scaled.append(F.round(frac * top).cast("long"))
    key = F.lit(0).cast("long")
    ncols = len(cols)
    for j, s in enumerate(scaled):
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)), b * ncols + j,
            )
    return key


def zorder_repartition(
    df: DataFrame,
    ranges: Mapping[str, Tuple[float, float]],
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Range-partition + sort by the Morton key of the columns in
    ``ranges`` — call immediately before a write so each output file
    covers a compact hyper-rectangle of the clustered columns.

    One shuffle (range partitioner samples the key), one local sort;
    the helper key column is projected away afterwards, which keeps
    the row order (a projection does not re-order partitions)."""
    keyed = df.withColumn("__zkey", zorder_key(ranges, bits))
    return (
        keyed.repartitionByRange(num_partitions, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
