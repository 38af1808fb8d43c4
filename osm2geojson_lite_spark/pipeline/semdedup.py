"""SemDeDup: semantic deduplication of an embedding corpus.

Implements the two-stage semantic-dedup recipe published as SemDeDup
(Abbas et al. 2023, arXiv:2303.09540): cluster the embedding space with
k-means, then — *within each cluster only* — drop every vector that has a
cosine-similar neighbor ranked "more keepable", where the paper's keep
rule prefers the point with the LOWEST similarity to the cluster centroid
(keeping edge points preserves diversity; near-centroid copies are the
redundant ones).

Scale shape (the reason the paper clusters first):

- Centroid assignment is **map-side** — the trained centroid table is a
  literal array baked into one ``transform`` lambda
  (:func:`~..pipeline.similarity._centroid_scorer`), so the corpus-sized
  side is a pure projection with no shuffle and no UDF.
- The only shuffle is the self-join on ``cid``; pairwise work is
  cluster-local and quadratic **per cluster, not per corpus**.  The
  SemDeDup contract is that ``k`` grows with the corpus (the paper uses
  50k clusters for LAION-440M) so expected cluster size is a constant
  and total work stays linear.  A runaway cluster (all-zero embeddings,
  a degenerate centroid) would silently re-quadratize the job, so the
  operator refuses clusters above ``max_cluster_rows`` unless the caller
  opts in — same policy as ``dedup._guard_all_pairs``.
- The keep decision is evaluated per *pair* (each duplicate pair
  contributes exactly one drop candidate: its more-keepable endpoint
  survives that pair), so no iteration, no connected components, and the
  result is a single distinct + left join — every step map-side
  combinable.

Determinism (cross-engine hash-green, see the repo's determinism notes):
cosines rounded to 9 dp before any comparison; keepability ties broken by
lowest vector id; output ``kept`` is a pure function of the input and the
centroid table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _centroid_scorer, _norm, cosine_col

#: refuse per-cluster all-pairs above this many rows unless opted in
MAX_CLUSTER_ROWS = 20_000


def semantic_dedup(vectors: DataFrame, centroids: list[list[float]], *,
                   threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cluster_rows: int = MAX_CLUSTER_ROWS,
                   allow_large_clusters: bool = False) -> DataFrame:
    """Label every vector with its cluster and a keep/drop decision.

    Output: ``(vec_id, cid, cent_cos, kept)`` — one row per input vector.
    ``cent_cos`` is the cosine to the assigned centroid (9 dp);
    ``kept=false`` marks vectors dropped as semantic duplicates.
    ``vectors.filter(kept)`` is the deduplicated corpus.

    A vector ``x`` is dropped iff some same-cluster vector ``y`` has
    ``round(cos(x, y), 9) >= threshold`` and ``y`` is more keepable:
    ``(cent_cos, id)`` lexicographically lower (the SemDeDup keep-low-
    centroid-similarity rule with a deterministic id tiebreak).
    """
    cents = [[float(x) for x in cv] for cv in centroids]
    cent_structs = _centroid_scorer(cents)
    # norm inlined as an expression (not an intermediate column): a
    # projected-away attribute inside the scorer trips localCheckpoint's
    # physical planning on Spark 4.1 ("key not found" on the dropped col)
    best = F.array_max(cent_structs(F.col(vec_col), _norm(F.col(vec_col))))
    asg = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"),
        best["cid"].alias("cid"), best["cos"].alias("cent_cos"),
    ).localCheckpoint(eager=True)
    # The assignment subtree has THREE consumers (the guard count and both
    # sides of the cluster-local pair join), and its scorer is a k x dim
    # literal expression whose planning/codegen alone costs more than the
    # scan — measured 1.9s per pass at bench size, three passes.  One
    # eager checkpoint runs it once; the blocks are freed by the
    # ContextCleaner when the result frame is released (the dbscan pairs
    # convention, which holds a strictly larger working set).

    if not allow_large_clusters:
        # One bounded driver scalar over the materialized assignment.
        biggest = (asg.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
                   .agg(F.max("n")).collect()[0][0]) or 0
        if biggest > max_cluster_rows:
            raise ValueError(
                f"semantic_dedup: largest cluster has {biggest} rows "
                f"(> {max_cluster_rows}); per-cluster pairwise work would "
                f"be quadratic in that. Retrain with more centroids, or "
                f"opt in with allow_large_clusters=True")

    a = asg.select("cid", F.col("vec_id").alias("ia"),
                   F.col("_v").alias("va"), F.col("cent_cos").alias("ca"))
    b = asg.select("cid", F.col("vec_id").alias("ib"),
                   F.col("_v").alias("vb"), F.col("cent_cos").alias("cb"))
    dup = (
        a.join(b, "cid")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.round(cosine_col(F.col("va"), F.col("vb")), 9)
                >= F.lit(float(threshold)))
    )
    # ia < ib, so on a cent_cos tie the LOWER id (ia) is the keeper.
    dropped = (
        dup.select(
            F.when(F.col("ca") <= F.col("cb"), F.col("ib"))
            .otherwise(F.col("ia")).alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        asg.join(dropped, "vec_id", "left")
        .select("vec_id", "cid", "cent_cos",
                F.col("_dropped").isNull().alias("kept"))
    )
