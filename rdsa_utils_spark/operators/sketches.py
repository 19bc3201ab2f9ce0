"""Mergeable sketches: distinct counts (Apache DataSketches HLL via
Spark's ``hll_sketch_agg`` family) and frequencies (count-min).

Extension surface (no reference equivalent — the reference's
``get_unique``/distinct paths are exact only): the 100 TB pattern for
distinct counting is INCREMENTAL — persist one small binary sketch
per (partition, group) as data lands, then answer "distinct users
over any date range / group rollup" by merging sketches, never
rescanning the facts. ``approx_count_distinct`` alone can't do this:
its estimate is final, not mergeable state.

All three operators are plain JVM aggregates (no UDF, no Python):
- ``distinct_sketch``  — facts → per-group sketch rows (the state you
  persist; bytes per sketch ≈ 2^lg_k, default lg_k=12 → ~4 KiB).
- ``merge_sketches``   — sketch rows → coarser groups (union_agg).
- ``sketch_estimate``  — attach the distinct estimate column.

Merging is exact over the sketch state: merging daily sketches gives
the IDENTICAL estimate as sketching the whole range directly (HLL
union is lossless for same-lg_k sketches) — asserted in
tests/test_sketches.py, alongside a measured error bound vs exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketch",
    "merge_sketches",
    "sketch_estimate",
    "freq_sketch",
    "merge_freq_sketches",
    "freq_estimate",
    "histogram_quantiles",
]


def distinct_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch row per group over ``value_col`` — the
    persistable increment of a distinct-count pipeline. ``lg_k``
    trades size for accuracy (relative error ≈ 1.04/√2^lg_k; 12 →
    ~1.6%)."""
    groups = [F.col(g) for g in group_cols]
    return df.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col),
    )


def merge_sketches(
    df: DataFrame,
    sketch_col: str = "sketch",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Union sketch rows up to coarser groups (or one global row when
    ``group_cols`` is empty). Lossless over the sketch state — the
    merged sketch equals the sketch of the concatenated inputs."""
    groups = [F.col(g) for g in group_cols]
    return df.groupBy(*groups).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col),
    )


def sketch_estimate(
    df: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Attach the distinct-count estimate for each sketch row."""
    return df.withColumn(out_col, F.hll_sketch_estimate(F.col(sketch_col)))


# ---------------------------------------------------------------------------
# Count-min frequency sketch (sparse row representation)
# ---------------------------------------------------------------------------
#
# State is the classic d×w counter matrix, stored SPARSE as one row per
# non-zero cell: (group…, depth, pos, cnt). That makes every phase a
# plain JVM shuffle aggregate:
#   build  — explode each fact into d (depth, xxhash64(v, depth) % w)
#            cells, groupBy-sum. Map-side partial aggregation collapses
#            the ×d blowup before the shuffle.
#   merge  — sum cnt by (group…, depth, pos). Counter addition is the
#            CMS merge, so (like the HLL union above) merging partial
#            sketches is LOSSLESS: sum-by-key is associative and the
#            merged state is bit-identical to a direct build.
#   query  — compute the same d cells for each probe value, left-join
#            against the sketch, take min(cnt) over depth (absent cell
#            → 0). Estimate ≥ true count always; overshoot ≤ 2N/w with
#            probability 1 − 2^−d (asserted in tests/test_sketches.py).
# At 100 TB the sketch for w=8192, d=5 is ≤ 40960 rows per group
# regardless of fact volume — the persistable increment stays tiny.


def _cms_cells(value: str, depth: int, width: int) -> Column:
    """Array of ``depth`` structs (depth, pos) for one value — seeded
    xxhash64 rows as the d pairwise-independent hash functions."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                F.pmod(F.xxhash64(F.col(value), F.lit(d)), F.lit(width)).alias("pos"),
            )
            for d in range(depth)
        ],
    )


def freq_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 5,
    width: int = 8192,
    count_col: str = "cnt",
) -> DataFrame:
    """Sparse count-min sketch rows per group: (group…, depth, pos,
    cnt). ``width`` sets the additive error (≤ 2·N/width w.h.p.),
    ``depth`` the failure probability (2^−depth)."""
    cell = F.explode(_cms_cells(value_col, depth, width)).alias("cell")
    groups = [F.col(g) for g in group_cols]
    return (
        df.select(*groups, cell)
        .select(*groups, F.col("cell.depth").alias("depth"), F.col("cell.pos").alias("pos"))
        .groupBy(*groups, "depth", "pos")
        .agg(F.count(F.lit(1)).alias(count_col))
    )


def merge_freq_sketches(
    df: DataFrame,
    group_cols: Sequence[str] = (),
    count_col: str = "cnt",
) -> DataFrame:
    """Merge sketch rows up to coarser groups by summing counters —
    bit-identical to building the sketch over the concatenated input."""
    groups = [F.col(g) for g in group_cols]
    return (
        df.groupBy(*groups, "depth", "pos")
        .agg(F.sum(count_col).alias(count_col))
    )


def freq_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 5,
    width: int = 8192,
    count_col: str = "cnt",
    out_col: str = "est_freq",
) -> DataFrame:
    """Point-query the sketch for every row of ``probes``: attach
    ``out_col`` = min over depth of the matching counter (0 when a
    cell is empty). ``depth``/``width`` must match the build. The
    probe side explodes ×depth and equi-joins on (group…, depth, pos)
    — broadcastable when the sketch is small, linear-shuffle
    otherwise."""
    cell = F.explode(_cms_cells(value_col, depth, width)).alias("cell")
    keyed = probes.select(
        *[F.col(c) for c in probes.columns],
        cell,
    ).select(
        *[F.col(c) for c in probes.columns],
        F.col("cell.depth").alias("depth"),
        F.col("cell.pos").alias("pos"),
    )
    joined = keyed.join(sketch, on=[*group_cols, "depth", "pos"], how="left")
    return (
        joined.groupBy(*[F.col(c) for c in probes.columns])
        .agg(F.min(F.coalesce(F.col(count_col), F.lit(0))).alias(out_col))
    )


def histogram_quantiles(
    hist: DataFrame,
    ps: Sequence[float],
    group_cols: Sequence[str] = (),
    round_to: int = 6,
) -> DataFrame:
    """Quantile estimates from a pinned-range equi-width histogram
    (the output of ``plans/diagnostics.numeric_histogram`` with
    ``value_range`` set) — completing the mergeable-sketch family:
    HLL for distincts, count-min for frequencies, and the pinned
    histogram for quantiles. Histogram rows MERGE BY ADDING COUNTS
    (same pinned range ⇒ same bins), so per-day sketches answer
    any-range quantiles without rescanning facts; estimation error
    is bounded by one bin width (test-asserted).

    One row per (group…, p): ``p``, ``quantile`` — the linear
    interpolation of rank ``p·N`` inside the bin where the
    cumulative count crosses it (p=0 reads the first bin's lower
    edge). Pure windows over the tiny (groups × bins) sketch table —
    the facts are never touched.
    """
    from pyspark.sql import Window

    if not ps:
        raise ValueError("ps must be non-empty")
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"quantiles must be in [0, 1], got {p}")
    groups = list(group_cols)
    gcols = [F.col(g) for g in groups] if groups else [F.lit(1)]
    w = Window.partitionBy(*gcols).orderBy("bin")
    cum = hist.select(
        *groups,
        "bin", "bin_lo", "bin_hi", "n_rows",
        F.sum("n_rows").over(w).alias("__cum"),
        F.sum("n_rows").over(
            Window.partitionBy(*gcols),
        ).alias("__total"),
    ).withColumn("__cum_prev", F.col("__cum") - F.col("n_rows"))
    p_arr = F.array(*[F.lit(float(p)) for p in ps])
    expanded = cum.withColumn("p", F.explode(p_arr))
    target = F.col("p") * F.col("__total").cast("double")
    first_bin_floor = F.col("p") == 0.0
    hit = expanded.filter(
        (
            (F.col("__cum_prev").cast("double") < target)
            & (F.col("__cum").cast("double") >= target)
        )
        | (first_bin_floor & (F.col("__cum_prev") == 0)),
    )
    frac = F.when(
        first_bin_floor, F.lit(0.0),
    ).otherwise(
        (target - F.col("__cum_prev").cast("double"))
        / F.col("n_rows").cast("double"),
    )
    est = F.col("bin_lo") + frac * (F.col("bin_hi") - F.col("bin_lo"))
    return hit.select(
        *groups,
        "p",
        F.round(est, round_to).alias("quantile"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — deterministic, engine-replayable
# ---------------------------------------------------------------------------
#
# The HLL path above is the production default, but its binary state is
# opaque to any other engine. KMV is the complement: the state is just
# the k SMALLEST distinct 48-bit md5 hash values per group — a plain
# bigint array any SQL engine can recompute bit-for-bit, so estimates
# cross-check against DuckDB exactly (no tolerance band needed), and the
# sketch doubles as a uniform distinct-value sample (hashes are a
# uniform draw from the value universe — the classic KMV bonus).
#
#   build  — distinct (group, hash) aggregate (map-side combined: raw
#            rows collapse before the shuffle), then a per-group window
#            over DISTINCT hashes keeps rank ≤ k. The window input is
#            |distinct values| rows per group, not |rows|.
#   merge  — k smallest of the union of member arrays: explode, dedup,
#            re-rank. Lossless w.r.t. KMV semantics: merge(sketch(A),
#            sketch(B)) == sketch(A ∪ B), asserted in tests.
#   est    — |arr| < k → |arr| is the EXACT distinct count (every hash
#            seen is in the sketch); else (k−1)·M/h_(k) with M = 16^12.
#            Relative error ≈ 1/√(k−2) (k=256 → ~6%).
#
# 48-bit hashes collide two distinct values with probability ~d²/2^49 —
# negligible to beyond 10^6 distincts per group and exactly mirrored by
# the oracle (both engines hash identically, so even a collision
# reproduces). Estimator output is deterministic: integer inputs, one
# double division, round once.

_KMV_HEX = 12  # 48-bit hash: exact in a double, foldable in DuckDB SQL
_KMV_M = float(16**_KMV_HEX)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_cols: Sequence[str] = (),
    sketch_col: str = "kmv",
) -> DataFrame:
    """One KMV sketch row per group: the ascending array of the ``k``
    smallest distinct 48-bit hashes of ``value_col`` (NULLs excluded,
    they carry no identity)."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("kmv_sketch: k must be >= 2")
    groups = [F.col(g) for g in group_cols]
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, _KMV_HEX), 16, 10
    ).cast("long")
    distinct = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, h.alias("__h__"))
        .distinct()
    )
    w = Window.partitionBy(*groups).orderBy("__h__") if group_cols else (
        Window.partitionBy(F.lit(1)).orderBy("__h__")
    )
    return (
        distinct.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .groupBy(*groups)
        .agg(F.array_sort(F.collect_list("__h__")).alias(sketch_col))
    )


def kmv_merge(
    df: DataFrame,
    k: int = 256,
    sketch_col: str = "kmv",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Union member sketches up to coarser groups (or one global row):
    k smallest of the deduplicated union of the input arrays."""
    from pyspark.sql import Window

    groups = [F.col(g) for g in group_cols]
    exploded = (
        df.select(*groups, F.explode(F.col(sketch_col)).alias("__h__")).distinct()
    )
    w = Window.partitionBy(*groups).orderBy("__h__") if group_cols else (
        Window.partitionBy(F.lit(1)).orderBy("__h__")
    )
    return (
        exploded.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .groupBy(*groups)
        .agg(F.array_sort(F.collect_list("__h__")).alias(sketch_col))
    )


def kmv_estimate(
    df: DataFrame,
    k: int = 256,
    sketch_col: str = "kmv",
    out_col: str = "n_distinct_est",
    round_to: int = 6,
) -> DataFrame:
    """Attach the KMV distinct-count estimate: exact ``|arr|`` while
    the sketch is unsaturated, else ``(k−1)·M / h_(k)``."""
    arr = F.col(sketch_col)
    est = F.when(
        F.size(arr) < k, F.size(arr).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_M) / F.element_at(arr, k).cast("double")
    )
    return df.withColumn(out_col, F.round(est, round_to))


def kmv_jaccard(
    df: DataFrame,
    a_col: str,
    b_col: str,
    k: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """Estimate set overlap between two KMV sketch columns — the
    corpus-vs-corpus question ("how much does the new crawl overlap
    what we already have?") answered from two sketch rows instead of
    a full anti-join.

    The classic KMV combination: with ``M`` = the ``k`` smallest of
    the union of the two sketch arrays, the fraction of ``M``'s
    members present in BOTH sketches is an unbiased Jaccard estimate
    (``M`` is a uniform size-k sample of the union, and membership in
    both sketches decides intersection membership EXACTLY for any
    hash ≤ both sketches' k-th minima — which every element of ``M``
    satisfies). Then ``union_est`` comes from ``M``'s k-th value
    (exact when the union is unsaturated) and ``intersection_est =
    jaccard_est · union_est``.

    Everything is integer array arithmetic over ≤ 2k-element arrays
    (JVM higher-order functions, no shuffle, no UDF) plus one final
    division — deterministic and engine-replayable like the sketches
    themselves. Appends ``jaccard_est, union_est, intersection_est``.
    """
    a, b = F.col(a_col), F.col(b_col)
    uni = F.array_sort(F.array_union(a, b))
    m = F.slice(uni, 1, F.least(F.size(uni), F.lit(k)))
    both = F.array_intersect(m, F.array_intersect(a, b))
    jac = F.when(
        F.size(m) > 0,
        F.size(both).cast("double") / F.size(m).cast("double"),
    ).otherwise(F.lit(0.0))
    union_est = F.when(
        F.size(uni) < k, F.size(uni).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_M) / F.element_at(m, k).cast("double")
    )
    return (
        df.withColumn("jaccard_est", F.round(jac, round_to))
        .withColumn("union_est", F.round(union_est, round_to))
        .withColumn(
            "intersection_est",
            F.round(F.col("jaccard_est") * F.col("union_est"), round_to),
        )
    )
