"""Similarity search over embedding columns (``array<float>``).

- :func:`brute_force_topk` — the exact baseline: JVM-side dot products via
  ``aggregate(zip_with(...))`` (whole-stage codegen, no Python), window
  top-k.  Right shape for broadcastable query sets.
- :func:`sign_lsh_topk` — the scale path: sign-bit bucketing over the
  first ``code_bits`` dimensions prunes the candidate space; queries probe
  their own bucket plus all Hamming-distance-1 buckets (guaranteed recall
  for near-identical vectors, approximate beyond).
- :func:`embedding_near_duplicates` — cosine >= threshold pairs within
  blocks (label or LSH bucket), the embedding leg of near-dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int, *,
                     query_id: str = "query_id", corpus_id: str = "vec_id",
                     q_vec: str = "embedding", c_vec: str = "embedding",
                     broadcast_queries: bool = True) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank).

    Scores stay internal (cross-engine float drift); ordering rounds cosine
    to 9 decimals with id tiebreak so ranks are deterministic everywhere.
    """
    q = queries.select(F.col(query_id).alias("query_id"), F.col(q_vec).alias("qv"))
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(c_vec).alias("cv"))
    left = F.broadcast(q) if broadcast_queries else q
    scored = left.crossJoin(c).select(
        "query_id", "neighbor_id",
        F.round(cosine_col(F.col("qv"), F.col("cv")), 9).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def sign_code_col(vec: Column, code_bits: int = 16) -> Column:
    """Sign-bit bucket code of the first ``code_bits`` dimensions."""
    code = None
    for b in range(code_bits):
        term = F.when(
            F.element_at(vec, b + 1).cast("double") >= 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        code = term if code is None else code + term
    return code


def sign_lsh_topk(queries: DataFrame, corpus: DataFrame, k: int, *,
                  query_id: str = "query_id", corpus_id: str = "vec_id",
                  q_vec: str = "embedding", c_vec: str = "embedding",
                  code_bits: int = 12) -> DataFrame:
    """Approximate cosine top-k via sign-bucket + Hamming-1 probe.

    Corpus is bucketed once (one column, no shuffle until the join); each
    query probes ``code_bits + 1`` buckets.  Candidates then rank exactly.
    At 100 TB the bucket column becomes the table's partition/bucketing key
    so the probe join is shuffle-free.
    """
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(c_vec).alias("cv"),
        sign_code_col(F.col(c_vec), code_bits).alias("bucket"),
    )
    qcode = sign_code_col(F.col(q_vec), code_bits)
    probes = F.array(*([qcode] + [qcode.bitwiseXOR(F.lit(1 << b)) for b in range(code_bits)]))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(q_vec).alias("qv"),
        F.explode(probes).alias("bucket"),
    )
    # probe buckets are distinct by construction (code and its 1-bit flips)
    # and each corpus row sits in exactly one bucket, so every
    # (query, neighbor) pair joins at most once — no dedup shuffle needed
    scored = F.broadcast(q).join(c, "bucket", "inner").select(
        "query_id", "neighbor_id",
        F.round(cosine_col(F.col("qv"), F.col("cv")), 9).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int, *,
             n_centroids: int = 16, n_probe: int = 4,
             query_id: str = "query_id", corpus_id: str = "vec_id",
             q_vec: str = "embedding", c_vec: str = "embedding") -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) coarse quantization.

    The second ANN scale path next to :func:`sign_lsh_topk`:

    1. A small centroid table partitions the corpus: every vector is
       assigned to its nearest centroid **map-side** (centroids are driver-
       collected and inlined as literals — no shuffle, no UDF), giving the
       inverted lists.  At 100 TB the centroid id is the table's partition/
       bucketing key, so each query touches only ``n_probe`` partitions.
    2. Each query ranks the centroids, probes its top ``n_probe`` lists via
       a broadcast equi-join on centroid id, and re-ranks candidates
       exactly.

    Centroids here are the ``n_centroids`` lowest-id corpus vectors — a
    deterministic, training-free quantizer so a DuckDB oracle replays the
    exact assignment; a real deployment trains them offline (k-means) and
    the assignment/probe mechanics (the scale-critical part) are identical.
    All comparisons round cosine to 9 decimals with centroid-id/neighbor-id
    tiebreaks, so results are bit-stable across engines and partitionings.
    """
    import math

    cent_rows = (
        corpus.select(F.col(corpus_id).alias("cid"), F.col(c_vec).alias("cv"))
        .orderBy("cid").limit(n_centroids).collect()
    )
    cents = [[float(x) for x in r["cv"]] for r in cent_rows]

    # ONE nested literal array + ONE transform lambda, with the row vector's
    # norm hoisted to a column computed once.  The earlier form inlined
    # n_centroids separate dot+norm expressions (the same row norm
    # recomputed 16x) — arithmetic-identical, but the Catalyst tree was
    # ~16x larger and optimizer/codegen time dominated small inputs.
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in cv]) for cv in cents])
    norm_arr = F.array(*[F.lit(math.sqrt(sum(x * x for x in cv))) for cv in cents])
    idx = F.sequence(F.lit(0), F.lit(len(cents) - 1))

    def cent_structs(vec: Column, vnorm: Column) -> Column:
        # sort_array()/array_max() compare struct fields in order:
        # cosine first, then -i so ties go to the LOWEST centroid id
        return F.transform(
            idx,
            lambda i: F.struct(
                F.round(
                    _dot(vec, F.element_at(cent_arr, i + 1))
                    / (vnorm * F.element_at(norm_arr, i + 1)),
                    9,
                ).alias("cos"),
                (-i).alias("ni"),
                i.alias("cid"),
            ),
        )

    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(c_vec).alias("cv"))
    assigned = c.withColumn("_vnorm", _norm(F.col("cv"))).select(
        "neighbor_id", "cv",
        F.array_max(cent_structs(F.col("cv"), F.col("_vnorm")))["cid"].alias("cid"),
    )

    q0 = queries.select(F.col(query_id).alias("query_id"), F.col(q_vec).alias("qv"))
    probe_cids = F.slice(
        F.sort_array(cent_structs(F.col("qv"), F.col("_qnorm")), asc=False), 1, n_probe
    )
    q = q0.withColumn("_qnorm", _norm(F.col("qv"))).select(
        "query_id", "qv",
        F.explode(F.transform(probe_cids, lambda s: s["cid"])).alias("cid"),
    )
    scored = F.broadcast(q).join(assigned, "cid", "inner").select(
        "query_id", "neighbor_id",
        F.round(cosine_col(F.col("qv"), F.col("cv")), 9).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_duplicates(vectors: DataFrame, *, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              block_col: str | None = None,
                              threshold: float = 0.95,
                              allow_all_pairs: bool = False) -> DataFrame:
    """Cosine >= threshold pairs (id_a, id_b, cos), blocked when asked.

    Cosine is rounded to 9 decimals *before* the threshold compare so the
    pair set is reproducible across engines and partitionings.  Unblocked
    inputs above ``ALL_PAIRS_MAX_ROWS`` are refused unless
    ``allow_all_pairs=True`` — the scale path is blocking by label or a
    sign-LSH bucket column (:func:`sign_code_col`).
    """
    if block_col is None:
        from .dedup import _guard_all_pairs

        _guard_all_pairs(vectors, allow_all_pairs, "embedding_near_duplicates")
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        *( [F.col(block_col).alias("block")] if block_col else [] ),
    )
    keys = ["block"] if block_col else []
    a = v.select(*keys, F.col("vid").alias("id_a"), F.col("vec").alias("va"))
    b = v.select(*keys, F.col("vid").alias("id_b"), F.col("vec").alias("vb"))
    joined = a.join(b, keys, "inner") if keys else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 9).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
