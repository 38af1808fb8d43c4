"""Deterministic random-projection dimensionality reduction (JL lemma).

Reference scope note: tibetty/osm2geojson-lite has no embedding layer;
this extends the engine's ANN/dedup family (``similarity.py``, ``pq.py``)
with the standard preprocessing step a 100 TB embedding pipeline needs:
shrink ``d``-dim vectors to ``k`` dims before indexing/clustering, with
pairwise geometry preserved to ``O(sqrt(log n / k))`` distortion
(Johnson-Lindenstrauss; sign matrices per Achlioptas 2003, "Database-
friendly random projections").

Scale shape: the projection matrix is a ``k x d`` SIGN matrix derived
from the repo md5 hash — ~2 KB as ONE literal array-of-arrays baked into
the plan (no sidecar table, no join, no shuffle; a map-side transform at
scan speed).  The single-literal + single-``transform``-lambda form
matters: unrolling k expression trees inflates task binaries ~1.8 MB and
drops out of codegen (the round-5 PQ lesson — 4.5x measured).

Determinism: signs come from python md5 (engine-independent), each
component is ``round(scale * fold(x_i * s_i), 9)`` with the fold running
in index order from an exact 0.0 — bit-identical at any partitioning and
replayable in DuckDB with ``list_reduce(list_prepend(0.0, …))``.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, functions as F

__all__ = ["projection_signs", "random_projection"]


def projection_signs(k: int, d: int, *, salt: str = "rp") -> list[list[float]]:
    """The ``k x d`` deterministic ±1 sign matrix (row j = output dim j).

    Entry (j, i) is +1 iff the low bit of ``md5("{salt}:{j}:{i}")`` is
    set — i.i.d. fair signs under the random-oracle model, reproducible
    in any language for oracle replays.
    """
    return [
        [1.0 if int(hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest(),
                    16) & 1 else -1.0
         for i in range(d)]
        for j in range(k)
    ]


def random_projection(df: DataFrame, *, vec_col: str = "embedding",
                      out_col: str = "proj", k: int = 16, dims: int,
                      salt: str = "rp") -> DataFrame:
    """Append ``out_col``: the input vector projected to ``k`` dims.

    ``y_j = round((1/sqrt(k)) * sum_i x_i * s_ji, 9)`` — the Achlioptas
    sign projection, an unbiased estimator of inner products with JL
    concentration.  ``dims`` must match the stored vector length (the
    sign matrix is baked per-(k, dims, salt)).  Pure map-side column
    algebra; composes with ``brute_force_topk`` / k-means / LSH on the
    reduced vectors.
    """
    if k < 1 or dims < 1:
        raise ValueError("k and dims must be positive")
    signs = F.array(*[
        F.array(*[F.lit(s) for s in row])
        for row in projection_signs(k, dims, salt=salt)
    ])
    scale = 1.0 / math.sqrt(k)
    x = F.col(vec_col).cast("array<double>")
    proj = F.transform(
        signs,
        lambda srow: F.round(
            F.lit(scale) * F.aggregate(
                F.zip_with(x, srow, lambda xi, si: xi * si),
                F.lit(0.0), lambda acc, v: acc + v),
            9),
    )
    return df.withColumn(out_col, proj)
