"""THE driver-side half-up quantizer — one definition, shared by every
replay contract (logreg/Platt parameter rounding in ``operators.
classify``, the Bradley–Terry MM fallback in ``operators.preference``,
the scaled-long scoring folds).

Quantizes ``repr(x)`` — Python's shortest round-trip decimal — HALF_UP,
matching Spark's ``F.round`` on doubles (``BigDecimal.valueOf`` ==
``Double.toString``, the shortest-repr string). ``Decimal(x)`` (the
exact binary expansion) rounds midpoint-repr doubles like 2.675 the
OTHER way and ``round()`` is ties-to-even; both genuinely diverge from
SQL ROUND on real values (dyadic rationals at 9 dp; shortest-repr
midpoints at 2 dp). Round 9's copy-per-module arrangement required a
lockstep two-file fix when the convention changed — hence one module.
Tie cases are pinned against live Spark in
tests/test_advice_round10.py.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def dq(x: float, nd: int) -> Decimal:
    """``x`` quantized to ``nd`` dp half-up on its shortest decimal
    repr, as an exact :class:`~decimal.Decimal`."""
    return Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP,
    )


def round_half_up(x: float, digits: int) -> float:
    """:func:`dq` as a float — the SQL-ROUND-compatible replacement
    for Python's ties-to-even ``round``."""
    return float(dq(x, digits))
