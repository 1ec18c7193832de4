"""Document-level text analysis operators (DataFrame -> DataFrame).

Thin declarative layers over functions.text — everything stays in
whole-stage codegen; one narrow projection, no shuffle at all.  These
are the per-document map stage of a 100 TB curation pipeline: filters
compose on top (e.g. ``quality >= 0.5 AND lang_pred = 'en'``) and push
down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from astro_vectordb_spark.functions import text as T

STAT_DECIMALS = 6


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics: token/char/punct/digit counts, average
    token length, stopword ratio, BPE-ish subword count."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        T.token_count(t).cast("long").alias("n_tokens"),
        T.bpe_ish_token_count(t).cast("long").alias("n_subwords"),
        T.char_count(t).cast("long").alias("n_chars_m"),
        T.punct_count(t).cast("long").alias("n_punct"),
        T.digit_count(t).cast("long").alias("n_digits"),
        F.round(T.avg_token_len(t), STAT_DECIMALS).alias("avg_token_len"),
        F.round(T.stopword_ratio(t), STAT_DECIMALS).alias("stopword_ratio"),
    )


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.round(T.quality_score(F.col(text_col)), STAT_DECIMALS).alias("quality"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-heuristic language identification with per-language hit
    counts (the evidence columns make the decision auditable)."""
    t = F.col(text_col)
    scores = T.lang_scores(t)
    return df.select(
        F.col(id_col),
        *[scores[lang].cast("long").alias(f"hits_{lang}") for lang in sorted(T.STOPWORDS)],
        T.lang_id(t).alias("lang_pred"),
    )


def doc_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact + bag-of-words fingerprints for dedup joins."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        T.fingerprint(t).alias("fp_exact"),
        T.sorted_token_fingerprint(t).alias("fp_sorted"),
        T.rolling_hash(t).alias("fp_rolling"),
    )
