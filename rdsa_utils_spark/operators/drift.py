"""Distribution-drift detection between two samples of a corpus.

No reference equivalent (extension surface — the monitoring
counterpart to the curation operators in ``operators/curation.py``
and the divergence helpers in ``operators/stats.py``: a 100 TB
training-data pipeline re-ingests continuously, and every refresh
needs a cheap, engine-replayable answer to "did the distribution
move?" before the new slice is admitted to the mix).

Three complementary tests, each a pure DataFrame aggregation:

- ``ks_2sample`` — two-sample Kolmogorov-Smirnov D, computed in EXACT
  integer arithmetic over the distinct-value aggregate (the same
  distinct-alphabet discipline as ``evaluate.binary_auc``): the
  statistic is ``max |cumA·nB − cumB·nA| / (nA·nB)`` and everything up
  to the single final division is integral, so the result is
  order-independent to the last bit.
- ``psi`` — Population Stability Index over fixed-width bins, the
  industry-standard scorecard drift metric (PSI < 0.1 stable,
  0.1-0.25 moderate, > 0.25 major shift).
- ``chi2_homogeneity`` — Pearson chi-squared test of homogeneity for
  CATEGORICAL columns (the KS test is for ordered values; event types
  / languages / sources need this one). The per-category
  decomposition view (which categories moved, expected counts) is
  ``operators/stats.chi_square_drift``; this one is the scalar gate.

Scale posture at 100 TB: all three shuffle ONCE to a (group, value)
or (group, bin) count aggregate — map-side combined, so raw rows
never move. ``ks_2sample`` then windows only the distinct-value table
of each group: for continuous columns, quantize upstream (pass a
pre-rounded column) so the alphabet — not the row count — bounds the
window; ``psi`` and ``chi2_homogeneity`` reduce to ``n_bins`` /
``|categories|`` rows per group before any window or join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _mr(col: Column, round_to: int | None) -> Column:
    """Round unless the caller asked for full precision (None)."""
    return F.round(col, round_to) if round_to is not None else col


def _dec_sum(col: Column, alias: str, round_to: int = 6) -> Column:
    """Order-independent sum of pre-quantized doubles: decimal(38,12)
    accumulate → double → round (repo-wide quantize-then-sum idiom)."""
    return F.round(F.sum(col.cast("decimal(38,12)")).cast("double"), round_to).alias(
        alias,
    )


def ks_2sample(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    by: list[str] | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per group.

    ``sample_col`` must be boolean-like (true = sample A, false =
    sample B); ``value_col`` any orderable column. NULL values AND
    NULL sample flags are excluded (a NULL has no rank in an ECDF,
    and an untagged row belongs to neither sample — counting it as B
    would bias the statistic silently).

    D = sup_x |F_A(x) − F_B(x)| evaluated at every distinct observed
    value:

        D·nA·nB = max over distinct v of |cumA(v)·nB − cumB(v)·nA|

    — pure integers until the one division at the end, so the result
    replays bit-for-bit on any engine and any partitioning.

    For continuous 100 TB columns, pre-quantize the value (e.g.
    ``F.round(col, 2)`` or a coarser grid): KS on the quantized column
    is exactly the KS of the binned distributions, and the per-group
    window then runs over the bounded alphabet instead of every
    distinct double. Returns ``by… , n_a, n_b, ks`` (NULL when either
    sample is empty).
    """
    by = list(by or [])
    flag = F.col(sample_col).cast("boolean")
    g = (
        df.filter(F.col(value_col).isNotNull() & flag.isNotNull())
        .groupBy(*by, F.col(value_col).alias("__v__"))
        .agg(
            F.sum(F.when(flag, 1).otherwise(0)).alias("__a__"),
            F.sum(F.when(flag, 0).otherwise(1)).alias("__b__"),
        )
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = (
        Window.partitionBy(*[F.col(c) for c in by])
        if by
        else Window.partitionBy(F.lit(1))
    )
    cum = g.select(
        *by,
        F.sum("__a__").over(w).alias("__ca__"),
        F.sum("__b__").over(w).alias("__cb__"),
        F.sum("__a__").over(wg).alias("__ta__"),
        F.sum("__b__").over(wg).alias("__tb__"),
    )
    # Products run in double: exact below 2^53 (a 9·10^15-row group), and
    # past that still deterministic — the oracle mirrors the same IEEE
    # expression shape. Long×long would THROW on overflow under ANSI.
    tot = cum.groupBy(*by).agg(
        F.max("__ta__").alias("n_a"),
        F.max("__tb__").alias("n_b"),
        F.max(
            F.abs(
                F.col("__ca__").cast("double") * F.col("__tb__").cast("double")
                - F.col("__cb__").cast("double") * F.col("__ta__").cast("double"),
            ),
        ).alias("__dnum__"),
    )
    return tot.select(
        *by,
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            _mr(
                F.col("__dnum__")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                round_to,
            ),
        ).alias("ks"),
    )


def fixed_bin(value_col: str, n_bins: int, lo: float, hi: float) -> Column:
    """The shared fixed-grid binning expression: ``floor((x − lo) /
    width)`` clamped to ``[0, n_bins−1]``. Exposed so batch PSI and
    the streaming window counts bin IDENTICALLY — a drift monitor
    whose reference and actual sides disagree on edges is noise."""
    width = (hi - lo) / n_bins
    return F.least(
        F.greatest(
            F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )


def psi_from_counts(
    counts: DataFrame,
    bin_col: str,
    a_col: str,
    b_col: str,
    n_bins: int,
    by: list[str] | None = None,
    smoothing: float = 0.5,
    round_to: int = 6,
    complete_grid: bool = True,
) -> DataFrame:
    """PSI from pre-aggregated (group…, bin, count_a, count_b) rows —
    the batch half of the streaming drift monitor (persisted
    per-window bin counts in, one PSI row per group out) and the
    shared core of :func:`psi`.

    With Laplace smoothing a bin absent from BOTH samples still
    contributes a term whenever the sample sizes differ, so the sum
    must run over the full ``n_bins`` grid: ``complete_grid`` fills
    missing (group, bin) rows with (0, 0) counts (the completion
    frame is |groups|·n_bins rows — metadata-sized). Pass False only
    when the caller already completed the grid.
    """
    by = list(by or [])
    src = counts.select(
        *by,
        F.col(bin_col).cast("long").alias("__bin__"),
        F.col(a_col).cast("long").alias("__a__"),
        F.col(b_col).cast("long").alias("__b__"),
    )
    if complete_grid:
        bins = F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("__bin__")
        grid = (
            src.select(*by).distinct().select(*by, bins)
            if by
            else src.sparkSession.range(1).select(bins)
        )
        src = (
            grid.join(src, [*by, "__bin__"], "left")
            .select(
                *by,
                "__bin__",
                F.coalesce(F.col("__a__"), F.lit(0)).alias("__a__"),
                F.coalesce(F.col("__b__"), F.lit(0)).alias("__b__"),
            )
        )
    wg = Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy(
        F.lit(1),
    )
    withn = src.select(
        *by,
        "__a__",
        "__b__",
        F.sum("__a__").over(wg).alias("__na__"),
        F.sum("__b__").over(wg).alias("__nb__"),
    )
    s = float(smoothing)
    pa = (F.col("__a__") + F.lit(s)) / (F.col("__na__") + F.lit(s * n_bins))
    pb = (F.col("__b__") + F.lit(s)) / (F.col("__nb__") + F.lit(s * n_bins))
    term = F.round((pb - pa) * F.log(pb / pa), 9)
    return (
        withn.groupBy(*by)
        .agg(
            F.max("__na__").alias("n_a"),
            F.max("__nb__").alias("n_b"),
            _dec_sum(term, "psi", round_to),
        )
        .select(*by, "n_a", "n_b", "psi")
    )


def psi(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    n_bins: int,
    lo: float,
    hi: float,
    by: list[str] | None = None,
    smoothing: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index per group over a FIXED bin grid.

    Sample A (``sample_col`` truthy) is the expected/reference
    distribution, sample B the actual/new one. Values bin by
    ``floor((x − lo) / width)`` clamped to ``[0, n_bins−1]`` (the grid
    must be fixed and shared — quantile bins recomputed per refresh
    would hide drift inside the bin edges). NULLs are excluded.

    Proportions are Laplace-smoothed — ``p = (cnt + smoothing) /
    (n + smoothing·n_bins)`` — so empty bins contribute a finite
    term instead of ±inf; per-bin terms ``(pB − pA)·ln(pB/pA)``
    quantize to 9 dp before the decimal-exact sum (``ln`` of the
    smoothed ratio is irrational, so the rounding is engine-stable),
    and the sum runs over the FULL n_bins grid (a bin empty in both
    samples still carries a smoothing term when the sample sizes
    differ — see :func:`psi_from_counts`, which this delegates to).

    One shuffle to (group, bin) counts, then ``n_bins`` rows per
    group. Returns ``by… , n_a, n_b, psi``.
    """
    if n_bins < 2:
        raise ValueError("psi: n_bins must be >= 2")
    if not hi > lo:
        raise ValueError("psi: hi must be > lo")
    by = list(by or [])
    flag = F.col(sample_col).cast("boolean")
    g = (
        df.filter(F.col(value_col).isNotNull() & flag.isNotNull())
        .groupBy(*by, fixed_bin(value_col, n_bins, lo, hi).alias("__bin__"))
        .agg(
            F.sum(F.when(flag, 1).otherwise(0)).alias("__a__"),
            F.sum(F.when(flag, 0).otherwise(1)).alias("__b__"),
        )
    )
    return psi_from_counts(
        g, "__bin__", "__a__", "__b__", n_bins,
        by=by, smoothing=smoothing, round_to=round_to,
    )


def chi2_homogeneity(
    df: DataFrame,
    cat_col: str,
    sample_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-squared test of homogeneity: did the CATEGORY
    distribution (event types, languages, sources) shift between
    sample A and sample B?  Per group.

    With observed count O_{s,c}, row totals n_s, column totals m_c and
    grand total n, each cell's term is

        (O·n − n_s·m_c)² / (n · n_s · m_c)

    — an integer numerator over an integer denominator, evaluated in
    ONE double division per cell and quantized to 9 dp before the
    decimal-exact sum; the oracle mirrors the identical expression
    shape so the IEEE operations agree bit-for-bit. Cells whose
    expected count is zero (a category absent from one sample entirely
    is still fine — only an empty SAMPLE zeroes n_s) contribute
    nothing.

    Returns ``by… , n_a, n_b, dof, chi2`` where ``dof =
    (categories − 1)·(2 − 1)``. One shuffle to (group, category)
    counts; everything after runs on |categories| rows per group.
    """
    by = list(by or [])
    flag = F.col(sample_col).cast("boolean")
    g = (
        df.filter(F.col(cat_col).isNotNull() & flag.isNotNull())
        .groupBy(*by, F.col(cat_col).alias("__c__"))
        .agg(
            F.sum(F.when(flag, 1).otherwise(0)).alias("__a__"),
            F.sum(F.when(flag, 0).otherwise(1)).alias("__b__"),
        )
    )
    wg = Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy(F.lit(1))
    withn = g.select(
        *by,
        "__a__",
        "__b__",
        (F.col("__a__") + F.col("__b__")).alias("__m__"),
        F.sum("__a__").over(wg).alias("__na__"),
        F.sum("__b__").over(wg).alias("__nb__"),
        F.count(F.lit(1)).over(wg).alias("__k__"),
    )
    n = (F.col("__na__") + F.col("__nb__")).cast("double")

    def _term(obs: Column, rowtot: Column) -> Column:
        # All products in double (exact < 2^53, ANSI-safe, oracle mirrors
        # the identical left-associated expression shape).
        num = obs.cast("double") * n - rowtot.cast("double") * F.col("__m__").cast(
            "double",
        )
        return F.when(
            (rowtot > 0) & (F.col("__m__") > 0),
            F.round(
                (num * num)
                / (n * rowtot.cast("double") * F.col("__m__").cast("double")),
                9,
            ),
        ).otherwise(F.lit(0.0))

    cells = withn.withColumn(
        "__t__", _term(F.col("__a__"), F.col("__na__")) + _term(F.col("__b__"), F.col("__nb__")),
    )
    return (
        cells.groupBy(*by)
        .agg(
            F.max("__na__").alias("n_a"),
            F.max("__nb__").alias("n_b"),
            (F.max("__k__") - 1).alias("dof"),
            _dec_sum(F.col("__t__"), "chi2", round_to),
        )
        .select(*by, "n_a", "n_b", "dof", "chi2")
    )
