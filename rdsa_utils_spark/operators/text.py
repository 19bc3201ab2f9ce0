"""Text-analysis operators for training-data pipelines.

No reference equivalent (extension surface, SURVEY.md §0/§7): the
operations a 100 TB text-corpus pipeline needs, all expressed as
native Spark SQL expressions (JVM-side, codegen'd) — no Python in the
hot path.

- ``with_token_count`` — whitespace tokenization count.
- ``with_text_stats`` — length / punctuation / digit / whitespace /
  uppercase ratios.
- ``with_quality_score`` — composite heuristic quality score
  (length, mean word length, punctuation ratio, stopword presence).
- ``with_language_id`` — n-gram/stopword-overlap language heuristic.
- ``with_fingerprint`` — document fingerprints: exact (md5 of
  normalized text) and shingle fingerprint arrays for near-dup work.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the language heuristic. Deliberately
# short — this is a deterministic, dependency-free heuristic, not a
# model; swap in fasttext/cld3 via mapInPandas where available.
_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "fr": ("le", "la", "les", "des", "est", "et", "un", "une", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "por", "para", "con"),
}


def tokens(text_col: Column | str) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+"),
    )


def token_count(text_col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """Sub-word-ish token count: splits on word/number/punct boundaries
    (a cheap regex stand-in for BPE tokenizers when estimating LLM
    token budgets)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    pieces = F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])"), 1)
    return F.size(pieces)


def with_token_count(df: DataFrame, text_col: str, out_col: str = "n_tokens") -> DataFrame:
    return df.withColumn(out_col, token_count(text_col))


def with_text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Attach deterministic per-document statistics:
    n_chars_calc, n_tokens, punct_ratio, digit_ratio, space_ratio,
    upper_ratio, mean_token_len."""
    col = F.col(text_col)
    n = F.length(col)
    nz = F.when(n == 0, F.lit(1)).otherwise(n)  # avoid /0; ratios → 0
    toks = tokens(text_col)
    n_toks = F.size(toks)
    return (
        df.withColumn("n_chars_calc", n)
        .withColumn("n_tokens", n_toks)
        .withColumn(
            "punct_ratio",
            (n - F.length(F.regexp_replace(col, r"[\.,;:!\?'\"()\[\]{}-]", ""))) / nz,
        )
        .withColumn(
            "digit_ratio", (n - F.length(F.regexp_replace(col, r"[0-9]", ""))) / nz,
        )
        .withColumn(
            "space_ratio", (n - F.length(F.regexp_replace(col, r"\s", ""))) / nz,
        )
        .withColumn(
            "upper_ratio", (n - F.length(F.regexp_replace(col, r"[A-Z]", ""))) / nz,
        )
        .withColumn(
            "mean_token_len",
            F.when(n_toks == 0, F.lit(0.0)).otherwise(
                F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_toks,
            ),
        )
    )


def with_quality_score(
    df: DataFrame,
    text_col: str,
    out_col: str = "quality_score",
    min_tokens: int = 5,
    max_mean_token_len: float = 15.0,
) -> DataFrame:
    """Composite [0,1] quality heuristic (Gopher/C4-style cheap rules):
    rewards reasonable length, penalizes extreme punctuation/digit
    ratios and degenerate token lengths. Deterministic arithmetic only.
    """
    df = with_text_stats(df, text_col)
    length_ok = (F.col("n_tokens") >= min_tokens).cast("double")
    mean_len_ok = (
        (F.col("mean_token_len") >= 2.0) & (F.col("mean_token_len") <= max_mean_token_len)
    ).cast("double")
    punct_ok = (F.col("punct_ratio") <= 0.2).cast("double")
    digit_ok = (F.col("digit_ratio") <= 0.3).cast("double")
    score = (length_ok + mean_len_ok + punct_ok + digit_ok) / F.lit(4.0)
    return df.withColumn(out_col, score)


def with_language_id(
    df: DataFrame,
    text_col: str,
    out_col: str = "lang_pred",
    stopwords: Mapping[str, Sequence[str]] = _STOPWORDS,
) -> DataFrame:
    """Stopword-overlap language heuristic.

    Scores each language by the count of its stopwords present in the
    lower-cased token set; highest score wins ('und' = undetermined
    when no stopword hits). One pass, pure expressions.
    """
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(lang)
        for lang, words in stopwords.items()
    ]
    langs = list(stopwords.keys())
    df = df.withColumn("__lang_scores__", F.array(*scores))
    best_idx = F.expr(
        "array_position(__lang_scores__, array_max(__lang_scores__))",
    ).cast("int")
    lang_arr = F.array(*[F.lit(l) for l in langs])
    return df.withColumn(
        out_col,
        F.when(F.array_max("__lang_scores__") <= 0, F.lit("und")).otherwise(
            F.element_at(lang_arr, best_idx),
        ),
    ).drop("__lang_scores__")


def with_fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Exact-dup fingerprint: md5 of whitespace-normalized, lower-cased
    text (stable across engines; DuckDB md5 produces the same hex)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(normalized))


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (for MinHash/Jaccard).

    Documents shorter than ``n`` tokens yield a single shingle of the
    whole text so they can still bucket.
    """
    toks = tokens(text_col)
    k = F.size(toks)
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k == 0, F.array().cast("array<string>")).otherwise(ngrams)
