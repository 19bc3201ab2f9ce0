"""Blocked fuzzy record linkage (entity resolution).

Extension surface (no reference equivalent): matching records that
refer to the same entity despite typos / formatting drift — customer
lists from two systems, supplier masters after a migration. The text
dedup suite (``operators/dedup.py``) handles documents; this handles
short structured STRINGS (names, addresses) where edit distance is
the right similarity and candidate generation must never be all-pairs.

Design — the classic two-stage shape, kept entirely JVM-side:
1. **Block**: both sides compute a cheap deterministic blocking key
   (prefix / soundex / a caller expression); candidates are an
   equi-join on the key — a linear hash shuffle, never a cross join.
2. **Verify**: ``levenshtein`` (codegen'd) scores each candidate
   pair; pairs pass at ``max_distance`` (absolute edits) and/or
   ``min_ratio`` (1 − edits/longer-length, robust across lengths).

100 TB posture: cost is candidate volume = Σ_b |L_b|·|R_b| over
blocks. Pick the blocking key so blocks stay O(1)-ish (e.g. soundex
+ zip, or two keys unioned for recall). The verify stage is a narrow
projection on the joined pairs; no Python, no window, no state.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["blocking_key", "fuzzy_join_blocked"]


def blocking_key(col: Column | str, method: str = "soundex", prefix_len: int = 4) -> Column:
    """A deterministic blocking key for a string column:
    ``'soundex'`` (phonetic — survives vowel typos), ``'prefix'``
    (first ``prefix_len`` chars of the lower-cased, space-stripped
    value), or ``'length'`` (value length bucket — pair it with
    another key; alone it blocks too coarsely)."""
    c = F.col(col) if isinstance(col, str) else col
    if method == "soundex":
        return F.soundex(c)
    if method == "prefix":
        return F.substring(F.regexp_replace(F.lower(c), r"\s+", ""), 1, prefix_len)
    if method == "length":
        return F.length(c)
    raise ValueError(f"blocking method must be soundex|prefix|length, got {method!r}")


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_col: str,
    right_col: str,
    block: Column | Callable[[Column], Column] | str = "prefix",
    max_distance: Optional[int] = None,
    min_ratio: Optional[float] = None,
) -> DataFrame:
    """Candidate pairs ``(left_id, right_id, distance, ratio)`` whose
    strings agree on the blocking key AND pass the edit-distance
    gate(s).

    ``block`` is a :func:`blocking_key` method name, a ready Column,
    or a callable ``Column -> Column`` applied to each side's string
    column. At least one of ``max_distance`` / ``min_ratio`` is
    required — an ungated fuzzy join is a recall trap (every
    co-blocked pair would return).

    ``ratio`` is ``1 − levenshtein/greatest(len_l, len_r)`` in
    [0, 1]; 1.0 = exact match. Identical (id, id) self-pairs are NOT
    filtered — pass disjoint id spaces or filter downstream.
    """
    if max_distance is None and min_ratio is None:
        raise ValueError("pass max_distance and/or min_ratio")

    def key_for(c: Column) -> Column:
        if isinstance(block, str):
            return blocking_key(c, method=block)
        if callable(block) and not isinstance(block, Column):
            return block(c)
        return block  # a ready Column — caller ensures side-correctness

    l = left.select(
        F.col(left_id).alias("left_id"),
        F.col(left_col).alias("__l__"),
        key_for(F.col(left_col)).alias("__bk__"),
    )
    r = right.select(
        F.col(right_id).alias("right_id"),
        F.col(right_col).alias("__r__"),
        key_for(F.col(right_col)).alias("__bk__"),
    )
    pairs = l.join(r, "__bk__")
    dist = F.levenshtein(F.col("__l__"), F.col("__r__"))
    longer = F.greatest(F.length("__l__"), F.length("__r__"))
    ratio = F.when(longer == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - dist.cast("double") / longer,
    )
    out = pairs.select(
        "left_id", "right_id", dist.alias("distance"), F.round(ratio, 6).alias("ratio"),
    )
    if max_distance is not None:
        out = out.filter(F.col("distance") <= max_distance)
    if min_ratio is not None:
        out = out.filter(F.col("ratio") >= min_ratio)
    return out


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Exact edit-distance-1 self-join via the deletion neighborhood
    (FastSS / SymSpell blocking): two strings are within Levenshtein
    distance 1 iff they share an element of
    ``{s} ∪ {s with one char deleted}`` — so candidates come from ONE
    equi-join on a generated variant key, never an all-pairs scan.
    The final ``levenshtein() <= 1`` verify removes the only false
    positives (variant collisions between distance-2 strings).

    Scale: each row explodes into len+1 variants (linear); the join
    key is a near-unique string (uniform shuffle); verification
    touches candidates only. For distance k, apply k-deletion
    neighborhoods — the same shape with C(len, k) variants; this
    implementation pins k = 1, the entity-resolution workhorse.

    Returns (``id_a``, ``id_b``, ``text_a``, ``text_b``, ``dist``)
    with id_a < id_b and dist ∈ {0, 1}.
    """
    s = F.col(text_col)
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, 1, i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )
    variants = F.array_union(F.array(s), deletions)
    exploded = df.select(
        F.col(id_col).alias("__id"),
        s.alias("__s"),
        F.explode(variants).alias("__v"),
    )
    a = exploded.select(
        F.col("__id").alias("id_a"), F.col("__s").alias("text_a"), "__v",
    )
    b = exploded.select(
        F.col("__id").alias("id_b"), F.col("__s").alias("text_b"), "__v",
    )
    cands = (
        a.join(b, "__v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )
    dist = F.levenshtein("text_a", "text_b")
    return (
        cands.withColumn("dist", dist)
        .filter(F.col("dist") <= 1)
    )
