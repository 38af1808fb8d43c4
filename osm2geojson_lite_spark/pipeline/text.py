"""Text analysis operators: token stats, quality counts, language id,
document fingerprinting.  All pure column expressions (JVM-side); every
result is integer- or string-typed so cross-engine oracles compare exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-id
# heuristic.  Deliberately small + deterministic; argmax with alphabetical
# tiebreak keeps the predicate oracle-reproducible.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "por", "con", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "une", "pour"],
    "de": ["der", "die", "und", "das", "von", "mit", "ein", "für"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不"],
}


def token_hash_col(token: Column) -> Column:
    """Shared 60-bit token hash: ``bigint(substr(md5(token),1,15))``.

    Chosen over ``xxhash64`` because the identical value is computable in
    ANSI SQL (DuckDB: ``('0x'||substr(md5(t),1,15))::bigint``), keeping every
    hash-derived operator fully oracle-checkable.
    """
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("bigint")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of the lowercased text (empties dropped)."""
    return F.filter(F.split(F.lower(text), " "), lambda t: t != F.lit(""))


def quality_counts(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Integer quality metrics per document: char/token/punct/stopword/digit
    counts plus distinct-token count (lexical diversity numerator)."""
    toks = tokens_col(F.col(text_col))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))).alias("n_stopwords"),
        (F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))).alias("n_punct"),
        (F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))).alias("n_digits"),
    )


def pred_lang_col(text: Column) -> Column:
    """Stopword-hit language id as a single column expression: per language,
    count tokens in its stopword list; argmax wins, alphabetical language
    code breaks ties, zero hits everywhere -> 'und'."""
    toks = tokens_col(text)

    def stop_score(words):
        wl = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))

    scores = [
        F.struct(stop_score(words).alias("score"), F.lit(lang).alias("lang"))
        for lang, words in sorted(STOPWORDS.items())
    ]
    # array_max over (score, lang) structs: max score, then max lang — to get
    # the *alphabetically first* lang on ties we order by (score, reversed-lang)
    # instead: encode lang rank descending.
    ranked = [
        F.struct(
            s["score"].alias("score"),
            F.lit(len(STOPWORDS) - i).alias("rank"),
            s["lang"].alias("lang"),
        )
        for i, s in enumerate(scores)
    ]
    best = F.array_max(F.array(*ranked))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def language_id(docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """DataFrame form of :func:`pred_lang_col`."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred_lang_col(F.col(text_col)).alias("pred_lang"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks —
# the split a byte-pair tokenizer sees before merges.  Plain character
# classes only, so Java regex (Spark) and RE2 (DuckDB) agree exactly.
BPE_SPLIT_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_counts(docs: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Token counting three ways (all integer, all oracle-exact):

    - ``n_ws_tokens`` — whitespace tokens (the `tokens_col` split);
    - ``n_pre_tokens`` — BPE-ish pre-tokenizer pieces (``BPE_SPLIT_RE``);
    - ``n_subword_est`` — estimated post-merge subword count: each piece
      contributes ``ceil(len/4)`` (the ~4-chars-per-token rule of thumb),
      computed with integer arithmetic ``(len+3) div 4``.

    Pure column expressions — scales as a projection.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), 0)
    subword = F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + ((F.length(p) + 3) / 4).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).alias("n_ws_tokens"),
        F.size(pieces).alias("n_pre_tokens"),
        subword.alias("n_subword_est"),
    )


def fingerprint_col(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercased, whitespace-collapsed,
    trimmed text — the exact-dedup key that survives formatting noise."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def doc_fingerprint(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """DataFrame form of :func:`fingerprint_col`."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_col(F.col(text_col)).alias("fingerprint"),
    )


def winnowing_fingerprints(docs: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 3,
                           w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS rolling-window scheme): hash every token ``k``-gram in
    position order, slide a window of ``w`` consecutive gram hashes, select
    each window's minimum; the fingerprint set is the sorted distinct
    selection.  Guarantees any shared run of ``w+k-1`` tokens between two
    documents shares a fingerprint, while keeping only ~``2/(w+1)`` of the
    gram hashes.

    Returns exploded rows ``(doc_id, fp)``.  The gram hash is the shared
    60-bit md5 (``token_hash_col``) rather than a Rabin rolling hash — the
    window-minimum *selection* is what winnowing is; Rabin is a per-gram
    constant-factor trick that whole-stage-codegen md5 doesn't need, and
    md5 keeps the fingerprints reproducible in ANSI SQL.

    Shape: two projections and one explode — no shuffle, no UDF.  The gram
    array is materialized as a real column between the two selects so the
    window expression references it once per row (inlining it into the
    window lambda would re-hash every gram per window — the Catalyst
    common-subexpression blowup).
    """
    toks = tokens_col(F.col(text_col))
    gram_at = lambda i: token_hash_col(  # noqa: E731
        F.concat_ws(" ", *[F.element_at(F.col("toks"), (i + j + 1).cast("int"))
                           for j in range(k)])
    )
    with_grams = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).select(
        "doc_id",
        F.when(
            F.size("toks") >= k,
            F.transform(F.sequence(F.lit(0), F.size("toks") - k), gram_at),
        ).otherwise(F.array().cast("array<bigint>")).alias("grams"),
    )
    windows = F.transform(
        F.sequence(F.lit(1), F.size("grams") - (w - 1)),
        lambda j: F.array_min(F.slice("grams", j, w)),
    )
    fps = F.when(F.size("grams") == 0, F.array().cast("array<bigint>")).when(
        F.size("grams") < w, F.array(F.array_min("grams"))
    ).otherwise(F.array_sort(F.array_distinct(windows)))
    return with_grams.select("doc_id", F.explode(fps).alias("fp"))


def repetition_stats(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1): how much of the document is the same line or the same
    token ``n``-gram said again.

    Output columns (fractions rounded to 9 dp, NULL when the denominator
    is zero, so cross-engine comparison is exact):

    - ``n_lines``            — ``\\n``-split line count;
    - ``dup_line_frac``      — fraction of line *characters* living in
      lines that occur more than once (all copies counted, the Gopher
      "fraction of characters in duplicate lines");
    - ``n_ngrams``           — token ``n``-gram occurrences
      (``max(n_tokens - n + 1, 0)`` over lowercased whitespace tokens);
    - ``top_ngram_frac``     — occurrences of the single most frequent
      ``n``-gram / ``n_ngrams`` ("fraction in most common n-gram");
    - ``dup_ngram_frac``     — occurrences of ``n``-grams seen more than
      once / ``n_ngrams`` ("fraction in duplicate n-grams").

    Scale shape: both signals are explode → ``groupBy(doc, unit)`` with
    map-side partial aggregation (shuffle carries one row per *distinct*
    unit per doc) → ``groupBy(doc)``; the two branches re-meet on a
    doc-partitioned join, co-partitioned because both just aggregated on
    ``doc_id``.  No in-row O(len²) HOF counting, no UDF, nothing driver-
    side — a mega-document costs its token count, not its square.
    """
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))

    lines = base.select(
        "doc_id", F.explode(F.split("t", "\n")).alias("line"))
    line_stats = (
        lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("int").alias("n_lines"),
            F.sum(F.when(F.col("c") > 1,
                         F.col("c") * F.length("line"))
                  .otherwise(F.lit(0))).alias("dup_chars"),
            F.sum(F.col("c") * F.length("line")).alias("tot_chars"),
        )
    )

    # materialize the token array before the gram lambda — inlining it
    # re-splits the text once per element_at (measured 6x slower)
    tc = F.col("toks")
    idx = F.sequence(F.lit(0), F.size(tc) - n)
    grams = F.when(
        F.size(tc) >= n,
        F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.element_at(tc, (i + j + 1).cast("int"))
                   for j in range(n)])),
    ).otherwise(F.array().cast("array<string>"))
    gram_stats = (
        base.select("doc_id", tokens_col(F.col("t")).alias("toks"))
        .select("doc_id", F.explode_outer(grams).alias("g"))
        .groupBy("doc_id", "g").agg(
            F.count(F.col("g")).alias("c"))  # count(col) skips the NULL row
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("int").alias("n_ngrams"),
            F.max("c").alias("top_c"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            .alias("dup_c"),
        )
    )

    frac = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.round(F.col(num) / F.col(den), 9))
    return line_stats.join(gram_stats, "doc_id").select(
        "doc_id",
        "n_lines",
        frac("dup_chars", "tot_chars").alias("dup_line_frac"),
        F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
        frac("top_c", "n_ngrams").alias("top_ngram_frac"),
        frac("dup_c", "n_ngrams").alias("dup_ngram_frac"),
    )


def unigram_logprob(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the cheap perplexity proxy quality signal (a KenLM-style
    LM score without the LM): gibberish and rare-token soup scores low,
    natural prose scores high.  Output: ``(doc_id, n_tokens, avg_logprob)``
    with ``avg_logprob = (Σ_{t∈doc} tf_t·ln(c_t/T)) / n_tokens`` where
    ``c_t`` is the corpus count of token ``t`` and ``T`` the corpus total;
    zero-token docs keep a NULL score.

    Determinism contract (hash-comparable across engines): per-distinct-term
    contributions ``tf·ln(c/T)`` are rounded to 9 dp and folded in ascending
    sorted order; final mean rounded to 6 dp.

    Scale shape: reuses the inverted-index build — ONE corpus-sized shuffle
    makes the (doc, term, tf) table with map-side partial aggregation; term
    counts are a second, distinct-row-sized aggregation joined back on
    ``term`` (both sides already term-clustered from the first shuffle); the
    per-doc fold is a partial-agg groupBy.  The corpus total is a one-row
    broadcast.  No token is out-of-vocabulary by construction (the model is
    the corpus itself), so there is no smoothing knob to disagree on.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    contrib = F.round(
        F.col("tf") * F.log(F.col("c") / F.col("t")), 9
    )
    scored = (
        tf.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", contrib.alias("lp"), "tf")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.array_sort(F.collect_list("lp")).alias("lps"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.aggregate(F.col("lps"), F.lit(0.0), lambda a, x: a + x)
                / F.col("n_tokens"),
                6,
            ).alias("avg_logprob"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id")).distinct()
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            "avg_logprob",
        )
    )
