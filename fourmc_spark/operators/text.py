"""Text-analysis operators for training-data pipelines.

All pure built-in column expressions (JVM-side, codegen-friendly): language
ID (stopword voting), quality scoring, token statistics, and document
fingerprinting (rolling polynomial hash). Deterministic by construction so
every operator is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fourmc_spark.functions import HASH_PRIME, token_hash_spark, tokens_spark

__all__ = [
    "STOPWORDS",
    "lang_id",
    "quality_score",
    "token_stats",
    "fingerprint",
]

# tiny per-language stopword vocabularies (public common words)
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他"],
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic n-gram/stopword language ID: count stopword hits per
    language, argmax with alphabetical tiebreak. Map-only (no shuffle)."""
    toks = tokens_spark(text_col)
    score_cols = []
    for lang in sorted(STOPWORDS):
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score_cols.append(
            F.expr(
                f"size(filter({toks}, t -> array_contains(array({words}), t)))"
            ).cast("long").alias(f"score_{lang}")
        )
    scored = df.select(F.col(id_col), F.col(text_col), *score_cols)
    # argmax via greatest + case (ties resolved by language order)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select(
        id_col, *[f"score_{l}" for l in langs], pred.alias("pred_lang")
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features + composite score.

    n_chars, n_tokens, avg token length, alpha ratio, distinct-token ratio,
    and score = distinct_ratio * min(n_tokens, 64) / 64 rounded to 4.
    All arithmetic on exact ints then one final double division."""
    toks = tokens_spark(text_col)
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").cast("long").alias("n_distinct"),
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")).cast("long").alias("n_alpha"),
    ).select(
        id_col,
        "n_chars",
        "n_tokens",
        "n_distinct",
        "n_alpha",
        F.round(F.col("n_alpha") / F.col("n_chars"), 4).alias("alpha_ratio"),
        F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias("distinct_ratio"),
        F.round(
            (F.col("n_distinct") / F.col("n_tokens"))
            * (F.least(F.col("n_tokens"), F.lit(64)) / F.lit(64.0)),
            4,
        ).alias("quality"),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish word/number/punct pieces
    via one regex pass (the pretokenizer pattern used by BPE tokenizers)."""
    return df.select(
        F.col(id_col),
        F.expr(f"size(split({text_col}, '\\\\s+'))").cast("long").alias("n_ws_tokens"),
        F.expr(
            f"size(regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))"
        ).cast("long").alias("n_bpe_pieces"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive document fingerprint: rolling polynomial hash of the
    token-hash sequence, acc = (acc*31 + h) mod P. Map-only; intermediate
    values stay < 2^62 (ANSI-safe int64)."""
    toks = tokens_spark(text_col)
    th = token_hash_spark("t")
    return df.select(
        F.col(id_col),
        F.expr(
            f"aggregate(transform({toks}, t -> {th}), CAST(0 AS BIGINT), "
            f"(acc, h) -> (acc * 31 + h) % {HASH_PRIME})"
        ).alias("fingerprint"),
    )
