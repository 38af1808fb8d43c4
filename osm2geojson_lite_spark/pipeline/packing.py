"""Sequence packing: lay documents end-to-end into fixed-token-budget
training sequences (the "packed pretraining batch" primitive).

Semantics — deterministic at any partitioning / cluster size:

1. Documents are globally shuffled by ``md5(seed || ':' || doc_id)``
   (ties impossible: doc_id is unique).  This is the standard "hash
   shuffle" a training pipeline applies before packing so neighboring
   source documents don't land in the same sequence.
2. Token counts (whitespace tokens, :func:`..text.tokens_col`) are laid
   end-to-end in that order; sequence ``s`` owns global token span
   ``[s*capacity, (s+1)*capacity)``.  A document overlapping several
   sequences is SPLIT across them (GPT-style packing) — every sequence
   except the global last is exactly full, so no padding waste and no
   bin-packing heuristic whose output would depend on scan order.
3. Output: one row per (sequence, document fragment):
   ``(seq_id, doc_id, part_idx, tok_start, n_toks)`` where ``part_idx``
   numbers the document's fragments from 0 and ``tok_start`` is the
   fragment's first token *within the document*.

Scale shape (the part that must survive 100 TB): the global prefix sum is
the textbook two-phase distributed scan, NOT a single-partition window —

- bucket = first 2 hex chars of the shuffle key.  Because the bucket is a
  *prefix* of the sort key, global key order == (bucket, key) order, so
  per-bucket scans compose into the global scan;
- phase 1: one shuffle partitions rows by bucket; the within-bucket
  exclusive cumulative sum runs as an ordinary window per bucket
  (256 independent partitions, each ~1/256 of the data);
- phase 2: per-bucket token totals (256 rows) get their own exclusive
  cumulative sum on a single tiny partition and broadcast-join back.

The DuckDB oracle replays the same arithmetic with one flat
``sum() over (order by key, doc_id)`` window — same numbers, which is
exactly the point of the bucket-prefix construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_col


def pack_sequences(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", capacity: int = 256,
                   seed: int = 0, n_char_bucket: int = 2) -> DataFrame:
    """(seq_id, doc_id, part_idx, tok_start, n_toks) packing plan.

    ``capacity`` is the token budget per training sequence.  Zero-token
    documents are dropped (they contribute nothing to any sequence).
    ``n_char_bucket`` hex chars of the shuffle key form the scan bucket
    (2 -> 256 buckets; raise to 3/4096 when a bucket's rows no longer fit
    an executor's window sort).
    """
    if capacity <= 0:
        raise ValueError("pack_sequences: capacity must be positive")

    key = F.md5(F.concat_ws(
        ":", F.lit(str(seed)), F.col(id_col).cast("string")))
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens_col(F.col(text_col))).cast("bigint").alias("n"),
            key.alias("k"),
        )
        .filter(F.col("n") > 0)
        .withColumn("bucket", F.substring("k", 1, n_char_bucket))
    )

    # phase 1: exclusive running total within each bucket
    in_bucket = Window.partitionBy("bucket").orderBy("k", "doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    local = base.withColumn(
        "local_off", F.coalesce(F.sum("n").over(in_bucket), F.lit(0)))

    # phase 2: exclusive running total of bucket totals (<= 16^n_char_bucket
    # rows — a deliberate single tiny partition, then broadcast back)
    bucket_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy("bucket").agg(F.sum("n").alias("bucket_total"))
        .select(
            "bucket",
            F.coalesce(F.sum("bucket_total").over(bucket_w),
                       F.lit(0)).alias("bucket_off"),
        )
    )

    placed = local.join(F.broadcast(offsets), "bucket").select(
        "doc_id", "n",
        (F.col("bucket_off") + F.col("local_off")).alias("off"),
    )

    cap = F.lit(int(capacity)).cast("bigint")
    first_seq = F.floor(F.col("off") / cap)
    last_seq = F.floor((F.col("off") + F.col("n") - 1) / cap)
    spans = placed.select(
        "doc_id", "n", "off",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        first_seq.alias("first_seq"),
    )
    seq_lo = F.col("seq_id") * cap            # sequence's global span start
    seq_hi = (F.col("seq_id") + 1) * cap
    return spans.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        (F.col("seq_id") - F.col("first_seq")).cast("int").alias("part_idx"),
        F.greatest(seq_lo - F.col("off"), F.lit(0)).cast("int")
        .alias("tok_start"),
        (F.least(seq_hi, F.col("off") + F.col("n"))
         - F.greatest(seq_lo, F.col("off"))).cast("int").alias("n_toks"),
    )


def chunk_documents(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 128,
                    stride: int | None = None) -> DataFrame:
    """Split each document into token-window chunks — the context-length
    prep that precedes embedding or packing: one output row per chunk
    ``(doc_id, chunk_id, n_tokens, chunk_text)``.

    Windows start at token positions ``1, 1+stride, 1+2*stride, …`` (1-based)
    while the start lands inside the document, each spanning up to
    ``chunk_tokens`` tokens; the final window may be shorter (GPT-style, no
    padding).  ``stride`` defaults to ``chunk_tokens`` (disjoint chunks);
    ``stride < chunk_tokens`` yields the overlapping windows retrieval
    pipelines use.  Zero-token documents produce zero chunks.

    Scale shape: pure map-side projection — tokenize once (the token array
    is materialized BEFORE the slice lambda; inlining it re-tokenizes per
    ``element_at``, the measured 6x Catalyst CSE blowup), explode the
    start-position sequence, slice.  No shuffle, no UDF: a 100 TB corpus
    chunks at scan speed and output partitioning follows the input's.
    """
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).withColumn("n", F.size("toks"))
    starts = toks.filter(F.col("n") > 0).select(
        "doc_id", "toks", "n",
        F.explode(
            F.sequence(F.lit(1), F.col("n"), F.lit(int(stride)))
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / int(stride)).cast("bigint").alias("chunk_id"),
        F.least(F.lit(int(chunk_tokens)), F.col("n") - F.col("start") + 1)
        .cast("bigint").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start"), F.lit(int(chunk_tokens))),
            " ",
        ).alias("chunk_text"),
    )
