"""Composed training-data cleaning pipeline — the operators chained the way
a pretraining-data job actually runs them, as ONE declarative plan.

``clean_corpus``: language id + quality gates + fingerprint computed in a
single projection over the scan (all column expressions), then exact dedup
(first-wins by normalized fingerprint) as the one shuffle.  At 100 TB this
is scan -> map -> one shuffle; no operator boundary materializes anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import fingerprint_col, pred_lang_col, tokens_col


def clean_corpus(docs: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text", lang: str = "en",
                 min_tokens: int = 5, max_punct_ratio: float = 0.2,
                 min_distinct_ratio: float = 0.3) -> DataFrame:
    """Keep documents that are (a) identified as ``lang``, (b) above the
    token floor, (c) below the punctuation ratio ceiling, (d) above the
    lexical-diversity floor, then (e) drop exact duplicates keeping the
    lowest doc_id per normalized fingerprint.

    Returns (doc_id, pred_lang, n_tokens, n_distinct_tokens, fingerprint).
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    annotated = docs.select(
        F.col(id_col).alias("doc_id"),
        pred_lang_col(text).alias("pred_lang"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (F.length(text)
         - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))).alias("n_punct"),
        F.length(text).alias("n_chars"),
        fingerprint_col(text).alias("fingerprint"),
    )
    gated = annotated.filter(
        (F.col("pred_lang") == lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_punct") <= F.col("n_chars") * max_punct_ratio)
        & (F.col("n_distinct_tokens") >= F.col("n_tokens") * min_distinct_ratio)
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "pred_lang", "n_tokens", "n_distinct_tokens", "fingerprint")
    )
