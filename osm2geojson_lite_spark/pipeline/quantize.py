"""Int8 embedding quantization — the storage/shuffle-size leg of the
similarity stack.

At 100 TB the embedding column dominates the table's byte size; symmetric
per-vector int8 quantization cuts the ANN index (and every shuffle that
carries vectors) 4x while keeping cosine ordering nearly intact, because
cosine is scale-invariant: ``cos(q, dequant(v)) == cos(q, qvec)`` exactly
(the per-vector scale cancels), so the quantized search path never
materializes dequantized floats at all.

Everything is a deterministic column expression an ANSI-SQL oracle
replays bit-for-bit:

- ``scale = round(max_i |v_i| / 127, 9)`` (9 dp so both engines commit the
  identical double before it feeds the division below);
- ``q_i = clamp(floor(v_i / scale + 0.5), -127, 127)`` — explicit
  floor(x+0.5) instead of round() so negative-halfway cases tie-break the
  same way everywhere; an all-zero vector (scale 0) quantizes to zeros.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .similarity import _dot, _norm


def _scale_col(vec: Column) -> Column:
    max_abs = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.round(max_abs / F.lit(127.0), 9)


def _qvec_col(vec: Column, scale: Column) -> Column:
    def q(x: Column) -> Column:
        raw = F.floor(x.cast("double") / scale + F.lit(0.5))
        return F.greatest(F.lit(-127), F.least(F.lit(127), raw)).cast("int")

    return F.when(scale > 0, F.transform(vec, q)).otherwise(
        F.transform(vec, lambda x: F.lit(0).cast("int"))
    )


def quantize_embeddings(vectors: DataFrame, *, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(vec_id, qvec: array<int> in [-127,127], scale, max_abs_err, cos_fid).

    ``max_abs_err`` = max_i |v_i - q_i*scale| (bounded by scale/2 except at
    the +-127 clamp), ``cos_fid`` = cos(v, qvec) — both rounded to 9 dp so
    cross-engine comparison is exact.  Map-side only: no shuffle, no UDF.
    """
    scale = _scale_col(F.col(vec_col))
    out = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        scale.alias("scale"),
    ).withColumn("qvec", _qvec_col(F.col("v"), F.col("scale")))
    err = F.array_max(
        F.zip_with(
            "v", "qvec",
            lambda x, q: F.abs(x.cast("double") - q.cast("double") * F.col("scale")),
        )
    )
    cos_fid = F.when(
        (F.col("scale") > 0) & (_norm(F.col("qvec")) > 0),
        F.round(_dot(F.col("v"), F.col("qvec"))
                / (_norm(F.col("v")) * _norm(F.col("qvec"))), 9),
    ).otherwise(F.lit(None).cast("double"))
    return out.select(
        "vec_id", "qvec", "scale",
        F.round(err, 9).alias("max_abs_err"),
        cos_fid.alias("cos_fid"),
    )


def quantized_topk(queries: DataFrame, vectors: DataFrame, k: int, *,
                   query_id: str = "query_id", corpus_id: str = "vec_id",
                   q_vec: str = "embedding",
                   c_vec: str = "embedding") -> DataFrame:
    """Exact top-k against the INT8-quantized corpus: (query_id,
    neighbor_id, rank).

    The corpus is quantized map-side and scored as raw int8 arrays —
    ``cos(q, qvec)`` equals ``cos(q, dequant(qvec))`` because the scale
    cancels, so the search never pays a dequantization pass.  Cosine is
    rounded to 9 dp with a neighbor-id tiebreak (same rank contract as
    :func:`..similarity.brute_force_topk`, whose result this approximates
    to quantization error).  Queries stay full-precision (the standard
    asymmetric-distance setup: only the corpus — the 100 TB side — is
    compressed).
    """
    qcorp = quantize_embeddings(vectors, id_col=corpus_id, vec_col=c_vec) \
        .select(F.col("vec_id").alias("neighbor_id"), "qvec")
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(q_vec).alias("qv"))
    scored = F.broadcast(q).crossJoin(qcorp).select(
        "query_id", "neighbor_id",
        F.when(
            _norm(F.col("qvec")) > 0,
            F.round(_dot(F.col("qv"), F.col("qvec"))
                    / (_norm(F.col("qv")) * _norm(F.col("qvec"))), 9),
        ).otherwise(F.lit(-2.0)).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
