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


def kmeans_centroids(corpus: DataFrame, *, n_centroids: int = 16,
                     n_iters: int = 5, sample_size: int = 512, seed: int = 0,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic seeded Lloyd's k-means for the IVF quantizer.

    The offline-training pattern: train on a driver-sized sample, broadcast
    the centroids — assignment (the scale-critical part) stays map-side in
    :func:`ivf_topk`.  Every step is engine-agnostic so an independent
    implementation reproduces the exact centroids:

    - **sample** = the ``sample_size`` corpus rows with the smallest
      ``md5(seed || ':' || id)`` (a standard hash both Spark and ANSI SQL
      compute identically; at 100 TB this is a TABLESAMPLE-shaped top-M);
    - **init** = the first ``n_centroids`` sample rows in hash order;
    - each iteration assigns sample vectors to their nearest centroid by
      cosine rounded to 9 dp (lowest centroid id wins ties) and recomputes
      each centroid as the member mean **rounded to 6 dp** — rounding makes
      the fixpoint invariant to float summation order, so numpy pairwise
      sums and a plain sequential sum commit identical centroids.  Empty
      clusters keep their previous centroid.

    The committed golden (``tests/golden/ivf_centroids.json``, regenerated
    by ``tools/gen_ivf_centroids.py`` with an independent DuckDB+pure-Python
    implementation) pins the result; the ``ann_ivf_kmeans`` oracle reads it.
    """
    import numpy as np

    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    rows = (
        corpus.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("sv"),
                      key.alias("hk"))
        .orderBy("hk", "sid").limit(sample_size).collect()
    )
    vecs = np.array([[float(x) for x in r["sv"]] for r in rows], dtype=np.float64)
    cents = vecs[:n_centroids].copy()
    for _ in range(n_iters):
        vn = np.linalg.norm(vecs, axis=1)
        cn = np.linalg.norm(cents, axis=1)
        cos = np.round(vecs @ cents.T / np.outer(vn, cn), 9)
        assign = np.argmax(cos, axis=1)  # first max -> lowest-cid tiebreak
        new = cents.copy()
        for c in range(len(cents)):
            members = vecs[assign == c]
            if len(members):
                new[c] = np.round(members.mean(axis=0), 6)
        cents = new
    return [[float(x) for x in c] for c in cents]


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int, *,
             n_centroids: int = 16, n_probe: int = 4,
             query_id: str = "query_id", corpus_id: str = "vec_id",
             q_vec: str = "embedding", c_vec: str = "embedding",
             centroids: list[list[float]] | None = None) -> DataFrame:
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

    ``centroids`` (a list of vectors, e.g. from :func:`kmeans_centroids`)
    supplies a trained quantizer; when omitted, centroids default to the
    ``n_centroids`` lowest-id corpus vectors — a training-free quantizer a
    DuckDB oracle replays without a committed table.  Either way the
    assignment/probe mechanics (the scale-critical part) are identical.
    All comparisons round cosine to 9 decimals with centroid-id/neighbor-id
    tiebreaks, so results are bit-stable across engines and partitionings.
    """
    import math

    if centroids is not None:
        cents = [[float(x) for x in cv] for cv in centroids]
    else:
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


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Measured ANN quality: per query, |approx ∩ exact| / |exact|.

    Both inputs are (query_id, neighbor_id[, rank]) top-k result sets (the
    shape every ``*_topk`` here returns).  The denominator is the exact
    result count (min(k, |corpus|)), so recall is 1.0 exactly when the
    approximate index returned every true neighbor.  One broadcast-sized
    semi-join + two tiny aggregations — the measurement itself never scans
    the corpus.
    """
    hits = (
        approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 6
        ).alias("recall_at_k"),
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
