"""Corpus hygiene: PII redaction and benchmark decontamination.

Both are standard pre-training steps (CCNet/Dolma-style scrubbing; the
GPT-3-style n-gram decontamination pass) expressed as pure column
expressions / one broadcast join, so an ANSI-SQL oracle replays them
exactly.

Regex portability: every pattern below uses only explicit character
classes, ``{m,}`` quantifiers, and ``\\b`` word boundaries — constructs
Java regex (Spark) and RE2 (DuckDB) interpret identically.  ``\\s`` is
avoided (the engines disagree on vertical tab); greedy leftmost-first
matching agrees because RE2 implements PCRE-style leftmost-first
semantics for replace/extract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import token_hash_col, tokens_col

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9][A-Za-z0-9.\-]*\.[A-Za-z]{2,}"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# international-ish phone: optional +, then 9+ digits allowing -/space/()
# separators, anchored on digits at both ends so it never eats stray text.
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def pii_scrub(docs: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses, and phone numbers.

    Output: ``(doc_id, clean_text, n_emails, n_ips, n_phones)``.  Counts
    are measured on the ORIGINAL text; ``clean_text`` applies the three
    replacements in a fixed order (email -> ip -> phone, so the phone
    pattern can never re-match digits inside an already-redacted email or
    IP).  Redaction tokens are ``<EMAIL>`` / ``<IP>`` / ``<PHONE>``.

    Map-side only — a projection, no shuffle, no UDF; at 100 TB this is a
    free rider on whatever scan already touches the text column.
    """
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            IP_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    count = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(t, F.lit(pat), 0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        scrubbed.alias("clean_text"),
        count(EMAIL_RE).alias("n_emails"),
        count(IP_RE).alias("n_ips"),
        count(PHONE_RE).alias("n_phones"),
    )


def ngram_hashes_col(toks: Column, n: int) -> Column:
    """Distinct 60-bit hashes of a token array's ``n``-grams (the shared
    md5 token hash, so DuckDB reproduces every value).

    ``toks`` must be a MATERIALIZED token-array column (aliased in a
    previous select), never an inline ``tokens_col(text)`` expression —
    Catalyst re-evaluates an inlined expression once per ``element_at``
    in the gram lambda (measured 6x on this shape; see ``ngram_topk``)."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(idx, lambda i: token_hash_col(F.concat_ws(
        " ", *[F.element_at(toks, (i + j + 1).cast("int"))
               for j in range(n)])))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>"))


def decontaminate(docs: DataFrame, benchmark: DataFrame, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text", n: int = 13) -> DataFrame:
    """GPT-3-style training-set decontamination: flag every training
    document sharing at least one token ``n``-gram with a held-out
    benchmark corpus (Brown et al. 2020 use 13-grams).

    Output: one row per input document —
    ``(doc_id, n_doc_grams, n_overlap_grams, contaminated)`` where
    ``n_overlap_grams`` counts the document's *distinct* n-grams that
    appear anywhere in the benchmark.

    Scale shape: the benchmark's distinct gram-hash set is tiny next to a
    100 TB corpus (benchmarks are MBs), so it is aggregated once and
    BROADCAST; the corpus side explodes its per-doc distinct grams
    (dedup'd map-side, so the flow carries O(distinct grams/doc)), hits
    the broadcast hash join, and re-aggregates per doc — the corpus is
    never shuffled by gram, only by ``doc_id``.
    """
    bench_grams = (
        benchmark.select(tokens_col(F.col(bench_text_col)).alias("toks"))
        .select(F.explode(ngram_hashes_col(F.col("toks"), n)).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).select(
        "doc_id",
        ngram_hashes_col(F.col("toks"), n).alias("grams"),
    ).select(
        "doc_id",
        F.size("grams").alias("n_doc_grams"),
        F.explode_outer("grams").alias("g"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams.withColumn(
            "hit", F.lit(1))), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_doc_grams").alias("n_doc_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("int")
            .alias("n_overlap_grams"),
        )
    )
    return hits.select(
        "doc_id", "n_doc_grams", "n_overlap_grams",
        (F.col("n_overlap_grams") > 0).alias("contaminated"),
    )
