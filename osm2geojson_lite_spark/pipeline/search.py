"""Keyword search and corpus-statistics operators.

- :func:`bm25_topk` — BM25 (Robertson/Sparck Jones, the Lucene ``k1``/``b``
  variant) keyword top-k over a document corpus via a real inverted-index
  plan: the distinct query-term set is broadcast onto the exploded corpus
  tokens *before* any aggregation, so the corpus is scanned map-side and
  **never shuffled** — only matching (doc, query-term) rows enter the tf
  shuffle, and df/N/avgdl are tiny aggregated sides.
- :func:`corpus_term_stats` — the persistable inverted-index statistics
  table (one row per (doc, term) with tf/dl/df); at 100 TB with a standing
  query workload this is written once, bucketed by term, and probed.
- :func:`ngram_topk` — corpus-level most-frequent token n-grams, the
  boilerplate/contamination signal (top grams are the "Terms of Service"
  lines and licence headers worth inspecting before training).

Both are deterministic across engines and partitionings: every hash is the
shared md5-based 60-bit ``token_hash_col``; BM25 scores are summed in
*sorted contribution order* via a per-group fold, so an ANSI-SQL oracle
(``list_reduce(list_sort(...))``) reproduces the exact doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_col


def corpus_term_stats(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """The inverted-index statistics table: one row per (doc_id, term) with
    ``tf`` (occurrences in the doc), ``dl`` (doc token length), and ``df``
    (number of docs containing the term).

    Shape: explode tokens → ``groupBy(doc, term)`` with map-side partial
    aggregation (the one corpus-sized shuffle) → a second, *distinct-row*
    sized ``groupBy(term)`` for df joined back on ``term``.  At 100 TB this
    table is written once, bucketed by ``term`` — the standard inverted
    index — and queries only ever broadcast-probe it.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    tf = (
        toks.select("doc_id", F.size("toks").alias("dl"),
                    F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(df_tbl, "term").select("doc_id", "term", "tf", "dl", "df")


def bm25_topk(queries: DataFrame, docs: DataFrame, k: int, *,
              query_id: str = "query_id", q_text: str = "query_text",
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 keyword top-k: (query_id, doc_id, score, rank).

    ``score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with the Lucene idf ``ln(1 + (N-df+0.5)/(df+0.5))`` (always positive).
    Query terms are de-duplicated (set semantics, the standard bag-of-words
    query model).

    Determinism contract (what makes this hash-comparable across engines):

    - ``idf`` is rounded to 9 dp and each per-term contribution is rounded
      to 9 dp *before* summation;
    - the per-(query, doc) sum folds the contributions in **ascending
      sorted order** (``aggregate(array_sort(collect_list(c)), 0d, +)``),
      so the IEEE addition sequence — and therefore the result bits — are
      identical regardless of partitioning, shuffle order, or engine;
    - the final score is rounded to 6 dp and ranked with ``doc_id``
      tiebreak.

    Scale shape: **the corpus is never shuffled.**  The distinct query-term
    set is BROADCAST onto the exploded tokens *before* any aggregation, so
    the scan+explode is map-side and only matching (doc, query-term) rows
    enter the tf shuffle; ``df`` is computed from that already-matched set
    (document frequency per term is unchanged by dropping other terms);
    ``N``/``avgdl`` are a one-row map-side-partial aggregate cross-joined
    in (broadcast nested-loop over one row).  The candidate set per query
    is the union of its terms' postings — never the corpus.  (At 100 TB
    with a standing query workload, build :func:`corpus_term_stats` once —
    bucketed by ``term`` — and probe that instead of re-scanning; this
    function is the scan-time shape for ad-hoc query panels.)
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    glob = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    qt = queries.select(
        F.col(query_id).alias("query_id"),
        F.explode(F.array_distinct(tokens_col(F.col(q_text)))).alias("term"),
    )
    qterms = qt.select("term").distinct()
    matched_toks = (
        toks.select("doc_id", F.size("toks").alias("dl"),
                    F.explode("toks").alias("term"))
        .join(F.broadcast(qterms), "term")
    )
    tf = (
        matched_toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = tf.join(F.broadcast(df_tbl), "term")
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        9,
    )
    contrib = F.round(
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        9,
    )
    matched = (
        F.broadcast(qt)
        .join(stats, "term")
        .crossJoin(F.broadcast(glob))
        .select("query_id", "doc_id", contrib.alias("c"))
    )
    scored = (
        matched.groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_list("c")).alias("cs"))
        .select(
            "query_id", "doc_id",
            F.round(
                F.aggregate(F.col("cs"), F.lit(0.0), lambda acc, x: acc + x), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def corpus_globals(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """The one-row corpus-wide statistics table BM25 needs next to the
    postings: ``(n_docs, avgdl)``.  ``avgdl`` averages over ALL documents
    (including ones matching no standing query), exactly like
    :func:`bm25_topk`'s inline computation — sum-of-ints / count, so the
    double is bit-identical at any partitioning.  At 100 TB this row is
    written once with the index and broadcast at query time."""
    return docs.select(
        tokens_col(F.col(text_col)).alias("toks")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )


def bm25_topk_indexed(queries: DataFrame, postings: DataFrame,
                      globals_df: DataFrame, k: int, *,
                      query_id: str = "query_id", q_text: str = "query_text",
                      k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 top-k over a PRE-BUILT inverted index — the standing-workload
    face of :func:`bm25_topk`: (query_id, doc_id, score, rank).

    ``postings`` is a :func:`corpus_term_stats` table (doc_id, term, tf,
    dl, df) and ``globals_df`` a :func:`corpus_globals` row.  Given the
    same corpus, output is IDENTICAL to :func:`bm25_topk` (pinned by
    ``tests/test_search_ops.py``): the per-term ``df`` in the index is the
    global document frequency, which equals the matched-set df the scan
    path computes, and every rounding/fold step is shared.

    Scale shape — why this is the 100 TB plan for repeated queries:
    :func:`bm25_topk` re-scans and re-tokenizes the corpus per query panel;
    here the corpus text is tokenized ONCE at index-build time, and a query
    touches only its terms' postings rows: the distinct query-term set is
    broadcast onto the postings (a semi-probe with no corpus shuffle), so
    with the index written bucketed/partitioned by ``term`` the scan prunes
    to the probed buckets and the per-query cost is O(matching postings),
    independent of corpus size.  The candidate set per query is the union
    of its terms' postings lists — the classic inverted-index bound.
    """
    qt = queries.select(
        F.col(query_id).alias("query_id"),
        F.explode(F.array_distinct(tokens_col(F.col(q_text)))).alias("term"),
    )
    qterms = qt.select("term").distinct()
    matched = postings.join(F.broadcast(qterms), "term")
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        9,
    )
    contrib = F.round(
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        9,
    )
    scored = (
        F.broadcast(qt)
        .join(matched, "term")
        .crossJoin(F.broadcast(globals_df))
        .select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_list("c")).alias("cs"))
        .select(
            "query_id", "doc_id",
            F.round(
                F.aggregate(F.col("cs"), F.lit(0.0), lambda acc, x: acc + x), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def ngram_topk(docs: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text", n: int = 2,
               top: int = 20) -> DataFrame:
    """Corpus-wide most frequent token ``n``-grams:
    (gram, n_occurrences, n_docs) — the top ``top`` by occurrence count,
    ties broken by gram text ascending (fully deterministic boundary).

    Shape: explode each doc's grams (all occurrences, in-row positions not
    needed) → ``groupBy(gram, doc)`` with map-side partial aggregation (the
    shuffle carries one row per *distinct* gram per doc) → ``groupBy(gram)``
    folding both total occurrences and document frequency in one pass →
    global top-``top`` via ``orderBy(...).limit(top)``, which Spark executes
    as TakeOrdered (per-partition top-``top``, merge of ``top``-row heaps —
    no global sort, no single-reducer shuffle).  The full gram-frequency
    table never leaves the executors.

    The token array is materialized as a real column between two selects —
    inlining it into the gram lambda re-splits the text once per
    ``element_at`` (the Catalyst common-subexpression blowup; measured 6x
    on this exact shape).
    """
    with_toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    tc = F.col("toks")
    idx = F.sequence(F.lit(0), F.size(tc) - n)
    grams = F.when(
        F.size(tc) >= n,
        F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.element_at(tc, (i + j + 1).cast("int"))
                   for j in range(n)])),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = (
        with_toks.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("gram", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = per_doc.groupBy("gram").agg(
        F.sum("c").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return totals.orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(top)
