"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale shape (the part that must survive 100 TB):
- shingle sets are deduplicated *per document* before any shuffle
  (map-side ``array_distinct``), so shuffles carry O(distinct shingles);
- MinHash collapses each document to a fixed-width signature (one row), and
  LSH band buckets bound pair expansion to candidates that share a band —
  never all-pairs;
- pair generation joins bucket members on ``(band, key)`` with the
  ``id_a < id_b`` triangle predicate, so each pair appears once;
- exact verification (n-gram Jaccard) runs only on the candidate set.

All hashes are md5-based 60-bit bigints (``token_hash_col``) so a DuckDB
oracle reproduces signatures, buckets, and pairs exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import token_hash_col, tokens_col


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text (order-free set).

    Built with higher-order functions only: tokenize -> sliding window via
    ``transform(sequence(...))`` -> ``array_distinct``.  Documents with
    fewer than ``n`` tokens (incl. empty text) yield an *empty* shingle set:
    ``sequence(0, size-n)`` with ``size-n < 0`` would step backwards to
    ``[0,-1]`` and ``element_at`` would throw out-of-bounds under ANSI mode,
    so the window is gated on ``size(toks) >= n``.
    """
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def exact_duplicates(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5(text): (text_hash, n_dups, doc_ids).

    One hash-groupBy; ids sorted so output is order-independent.
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def minhash_signatures(docs: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 64,
                       ngram: int = 3) -> DataFrame:
    """(doc_id, sig: array<bigint>[num_hashes]).

    Permutation ``i`` hashes shingle ``s`` as ``h(i || ':' || s)``; the
    signature element is the min over the document's shingle set.  Computed
    in the canonical distributed form: explode shingles once, then one
    ``groupBy(doc).agg(min(h_i) ...)`` — each shingle row is hashed
    ``num_hashes`` times and partially aggregated map-side, so the shuffle
    carries one signature row per document.  (The tempting in-row
    ``transform``+``array_min`` form re-inlines the shingle construction
    into all ``num_hashes`` expressions — a Catalyst common-subexpression
    blowup measured ~100x slower.)
    """
    sh_rows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(F.col(text_col), ngram)).alias("s"),
    )
    aggs = [
        F.min(token_hash_col(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = sh_rows.groupBy("doc_id").agg(*aggs, F.count(F.lit(1)).alias("n_shingles"))
    return sigs.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
        F.col("n_shingles").cast("int").alias("n_shingles"),
    )


def minhash_near_duplicates(docs: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text", num_hashes: int = 64,
                            bands: int = 16, ngram: int = 3,
                            threshold: float = 0.8) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, jaccard) with exact verification.

    LSH: ``bands`` bands of ``num_hashes/bands`` rows; a candidate pair
    shares at least one band key.  Candidates are verified with exact
    shingle-set Jaccard, so the (rare) LSH false positives drop out and the
    output equals the brute-force pair set up to LSH recall
    (P[detect | J=0.8, 16x4] > 0.999).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(
        docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes, ngram=ngram
    )
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *[
                        F.element_at("sig", b * rows + r + 1).cast("string")
                        for r in range(rows)
                    ])).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )

    sh = docs.select(
        F.col(id_col).alias("doc_id"), shingles_col(F.col(text_col), ngram).alias("sh")
    )
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.size(F.array_intersect("sh_a", "sh_b"))
             / F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def simhash(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 48) -> DataFrame:
    """(doc_id, simhash: bigint) — ``bits``-wide SimHash over token hashes.

    Bit ``b`` of the fingerprint is set iff the count of tokens whose hash
    has bit ``b`` set is >= half the token count (majority vote with +1/-1
    weights, ties -> set).  Distributed form: explode tokens, hash each once,
    fold ``bits`` conditional sums in one partial-aggregated ``groupBy`` —
    the shuffle carries one row per document.  (The in-row
    ``aggregate``-per-bit form re-inlines the token hashing ``bits`` times —
    a Catalyst common-subexpression blowup.)  Token-less documents come back
    through a left join with fingerprint 0.
    """
    tok_rows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).select("doc_id", token_hash_col(F.col("t")).alias("h"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok_rows.groupBy("doc_id").agg(*bit_aggs)
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    fp = agg.select("doc_id", fingerprint.alias("simhash"))
    return docs.select(F.col(id_col).alias("doc_id")).join(fp, "doc_id", "left").select(
        "doc_id", F.coalesce("simhash", F.lit(0)).alias("simhash")
    )


def simhash_near_duplicates(docs: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text", bits: int = 48,
                            max_hamming: int = 3,
                            max_band_count: int | None = None) -> DataFrame:
    """(id_a, id_b, hamming) — all pairs whose ``bits``-wide SimHash
    fingerprints differ in at most ``max_hamming`` bits.  The batch face of
    the streaming XOR+popcount scan (`streaming/dedup.py`); fingerprint-level
    near-dup per Manku, Jain & Das Sarma, WWW 2007 ("Detecting
    near-duplicates for web crawling").

    EXACT under banding (no recall loss): the fingerprint splits into
    ``max_hamming + 1`` bit bands, and by pigeonhole any pair within
    ``max_hamming`` differing bits agrees *exactly* on at least one whole
    band — so an equi-join on (band, band_value) produces a candidate
    superset, and the popcount-of-XOR refine keeps exactly the true pairs.

    Scale shape (100 TB): one row per (doc, band) — a ``max_hamming + 1``-way
    map-side explode, never all-pairs — then a self-equi-join on
    (band, band_value).  Expected bucket occupancy is n / 2^width per band,
    so at large n either widen ``bits`` (keeping candidate cost ~n²/2^width
    per band, tiny for 64-bit fingerprints) or cap degenerate buckets:
    ``max_band_count`` drops band buckets holding more docs than the cap
    BEFORE the join (near-identical boilerplate floods — e.g. millions of
    empty docs share fingerprint 0).  A dropped bucket can only lose pairs
    that match on NO other band — the same explicit recall-for-cost contract
    as `shared_token_runs`'s ``max_gram_count``; moderate skew is left to
    AQE skew-join splitting.  The refine is join-local column algebra
    (fingerprints ride the exploded rows; no join-back).
    """
    if not 0 <= max_hamming < bits:
        raise ValueError("need 0 <= max_hamming < bits")
    n_bands = max_hamming + 1
    base, rem = divmod(bits, n_bands)
    widths = [base + (1 if i < rem else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]

    fp = simhash(docs, id_col=id_col, text_col=text_col, bits=bits)
    bvals = F.array(*[
        F.shiftright(F.col("simhash"), offsets[i])
        .bitwiseAND(F.lit((1 << widths[i]) - 1))
        for i in range(n_bands)
    ])
    keys = fp.select(
        "doc_id", "simhash", F.posexplode(bvals).alias("band", "bv")
    )
    if max_band_count is not None:
        ok = (keys.groupBy("band", "bv").count()
              .filter(F.col("count") <= max_band_count)
              .select("band", "bv"))
        keys = keys.join(ok, ["band", "bv"])

    a = keys.select("band", "bv", F.col("doc_id").alias("id_a"),
                    F.col("simhash").alias("sh_a"))
    b = keys.select("band", "bv", F.col("doc_id").alias("id_b"),
                    F.col("simhash").alias("sh_b"))
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    return (
        cand.select(
            "id_a", "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def passage_windows_col(text: Column, window: int = 16) -> Column:
    """Non-overlapping ``window``-token passages of the lowercased text
    (array<string>; the trailing partial window is kept).  The corpus-level
    unit for passage dedup — the token-stream analog of the line/paragraph
    split used on newline-structured corpora (CCNet/Dolma-style)."""
    toks = tokens_col(text)
    n_win = F.floor((F.size(toks) + window - 1) / window).cast("int")
    idx = F.sequence(F.lit(0), n_win - 1)
    wins = F.transform(
        idx,
        lambda w: F.concat_ws(" ", F.slice(toks, w * window + 1, window)),
    )
    return F.when(F.size(toks) > 0, wins).otherwise(
        F.array().cast("array<string>")
    )


def passage_dedup(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", window: int = 16) -> DataFrame:
    """Corpus-wide first-wins passage dedup: every ``window``-token passage
    appears at most once in the whole corpus; later occurrences (by
    ``(doc_id, window position)``) are deleted from their documents.

    Output: ``(doc_id, clean_text, n_windows, n_kept)`` for every input
    document — a fully-deduplicated document survives with empty
    ``clean_text`` and ``n_kept = 0``, so the caller chooses the drop
    policy.  ``clean_text`` is the kept passages re-joined in document
    order.

    Scale shape: explode to one row per passage (O(tokens/window) rows);
    the first occurrence per passage is ``min(struct(doc_id, w))`` from a
    ``groupBy(h)`` — a PARTIALLY-AGGREGABLE reduction, so even a passage
    occurring 10^8 times (the boilerplate passage dedup exists to remove)
    combines map-side before one row per distinct passage crosses the
    shuffle.  The winner marks keepers via an equi-join back on ``h``
    (skewed hot hashes there are splittable by AQE skew-join, since the
    winner side is one row per key — a window rank, which round 4 used,
    funnels every copy of a hot passage through a single unsplittable
    partition with no combiner).  One groupBy(doc) reassembles.  This is
    the passage-granular sibling of :func:`exact_duplicates` — same
    hash-meet pattern, finer unit.
    """
    wins = docs.select(
        F.col(id_col).alias("doc_id"),
        passage_windows_col(F.col(text_col), window).alias("ws"),
    )
    exploded = (
        wins.select(
            "doc_id", F.size("ws").alias("n_windows"),
            F.posexplode_outer("ws").alias("w", "wtext"),
        )
        .filter(F.col("wtext").isNotNull())
        .withColumn("h", F.md5("wtext"))
    )
    winners = exploded.groupBy("h").agg(
        F.min(F.struct("doc_id", "w")).alias("_first")
    )
    kept = exploded.join(winners, "h").withColumn(
        "keep",
        (F.col("doc_id") == F.col("_first.doc_id"))
        & (F.col("w") == F.col("_first.w")),
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(F.col("keep"),
                               F.struct(F.col("w"), F.col("wtext"))))),
                    lambda s: s["wtext"],
                ),
            ).alias("clean_text"),
            F.max("n_windows").alias("n_windows"),
            F.sum(F.col("keep").cast("int")).alias("n_kept"),
        )
        # empty docs never exploded a passage row; restore them
        .join(wins.select("doc_id", F.size("ws").alias("nw0")), "doc_id",
              "right")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_windows", F.col("nw0")).cast("int")
            .alias("n_windows"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        )
    )


ALL_PAIRS_MAX_ROWS = 10_000


def _guard_all_pairs(df: DataFrame, allow_all_pairs: bool, what: str) -> None:
    """Refuse to go silently quadratic: the unblocked all-pairs path is an
    exact *baseline* for bounded inputs, not a scale path.  Above
    ``ALL_PAIRS_MAX_ROWS`` rows the caller must opt in explicitly (or pass a
    ``block_col``/LSH-bucketed variant, which is the 100 TB shape)."""
    if allow_all_pairs:
        return
    n = df.limit(ALL_PAIRS_MAX_ROWS + 1).count()
    if n > ALL_PAIRS_MAX_ROWS:
        raise ValueError(
            f"{what}: unblocked all-pairs over >{ALL_PAIRS_MAX_ROWS} rows is "
            f"quadratic; pass block_col= (or use the LSH variant), or opt in "
            f"with allow_all_pairs=True"
        )


def shared_token_runs(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", gram: int = 8,
                      min_tokens: int = 16,
                      max_gram_count: int | None = None) -> DataFrame:
    """Exact shared-substring detection between documents (the scalable
    reformulation of suffix-array substring dedup, Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"): for every
    document pair sharing a run of at least ``min_tokens`` consecutive
    tokens, report ``(id_a, id_b, n_shared_grams, max_run_tokens)``.

    Method — gram-diagonal run detection:

    1. every position-indexed token ``gram``-gram is hashed (shared 60-bit
       md5) → rows ``(doc, pos, h)``;
    2. a *blocked* self equi-join on ``h`` (``id_a < id_b`` triangle) yields
       matching gram occurrences ``(id_a, id_b, pos_a, pos_b)`` — only
       grams that actually collide ever join, so this is linear in the
       true overlap, never all-pairs;
    3. matches on the same **diagonal** (``pos_a - pos_b``) at consecutive
       ``pos_a`` form a run: a maximal island of ``R`` consecutive matching
       grams is a shared span of ``R + gram - 1`` tokens.  Islands via the
       classic gaps-and-islands window (``pos_a - row_number()`` per
       (pair, diagonal)) — one extra shuffle on the (small) match set.

    A run of ``min_tokens`` tokens is guaranteed to produce
    ``min_tokens - gram + 1 >= 1`` consecutive gram matches as long as
    ``gram <= min_tokens``, so detection is *exact* (no false negatives, and
    the verification is built in — a reported run IS consecutive matching
    grams).  60-bit hash collisions are the only false-positive source
    (~1e-18 per candidate pair).

    ``max_gram_count`` drops grams occurring more than that many times in
    the corpus *before* the self-join (the Lee-et-al guard against
    boilerplate grams exploding the match set quadratically — a gram shared
    by 10⁶ documents would otherwise join 10¹² times).  Dropping a gram can
    only split/shorten runs through pathologically frequent content, so at
    scale this trades recall on boilerplate for a bounded join; ``None``
    keeps detection exact.

    Scale shape: one explode (O(tokens) rows), the hash-blocked self-join,
    two window/agg shuffles over match rows.  At 100 TB the gram table is
    bucketed by ``h`` so the self-join is co-partitioned.  The token array
    is materialized as a real column first — inlining it into the gram
    lambda re-splits the text per ``element_at`` (measured 6x slower).
    """
    with_toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    tc = F.col("toks")
    idx = F.sequence(F.lit(0), F.size(tc) - gram)
    gram_hashes = F.when(
        F.size(tc) >= gram,
        F.transform(idx, lambda i: token_hash_col(F.concat_ws(
            " ", *[F.element_at(tc, (i + j + 1).cast("int"))
                   for j in range(gram)]))),
    ).otherwise(F.array().cast("array<bigint>"))
    pos = with_toks.select(
        "doc_id",
        F.posexplode(gram_hashes).alias("pos", "h"),
    )
    if max_gram_count is not None:
        counts = pos.groupBy("h").agg(F.count(F.lit(1)).alias("hc"))
        pos = pos.join(
            counts.filter(F.col("hc") <= max_gram_count).select("h"), "h"
        )
    a = pos.select(F.col("doc_id").alias("id_a"), F.col("pos").alias("pa"),
                   "h")
    b = pos.select(F.col("doc_id").alias("id_b"), F.col("pos").alias("pb"),
                   "h")
    matches = a.join(b, "h").filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", "pa", (F.col("pa") - F.col("pb")).alias("diag")
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    islands = matches.withColumn(
        "island", F.col("pa") - F.row_number().over(w)
    )
    runs = islands.groupBy("id_a", "id_b", "diag", "island").agg(
        F.count(F.lit(1)).alias("run_grams")
    )
    return (
        runs.groupBy("id_a", "id_b")
        .agg(
            F.sum("run_grams").alias("n_shared_grams"),
            (F.max("run_grams") + (gram - 1)).alias("max_run_tokens"),
        )
        .filter(F.col("max_run_tokens") >= min_tokens)
    )


def ngram_jaccard_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", block_col: str | None = None,
                        ngram: int = 3, threshold: float = 0.5,
                        allow_all_pairs: bool = False) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold, optionally blocked.

    Without ``block_col`` this is the O(n^2) exact baseline (use on bounded
    inputs / verification sets); with it, pairs form only within a block —
    the classic blocking pattern that keeps the join linear in block sizes.
    Unblocked inputs above ``ALL_PAIRS_MAX_ROWS`` are refused unless
    ``allow_all_pairs=True``.
    """
    if block_col is None:
        _guard_all_pairs(docs, allow_all_pairs, "ngram_jaccard_pairs")
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        *( [F.col(block_col).alias("block")] if block_col else [] ),
        shingles_col(F.col(text_col), ngram).alias("sh"),
    ).filter(F.size("sh") > 0)
    keys = ["block"] if block_col else []
    a = sh.select(*keys, F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(*keys, F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = a.join(b, keys, "inner") if keys else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (F.size(F.array_intersect("sh_a", "sh_b"))
             / F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
