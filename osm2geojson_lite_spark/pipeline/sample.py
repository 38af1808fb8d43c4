"""Deterministic corpus sampling / quota operators.

Training-data curation needs samples that are *reproducible across cluster
sizes and reruns* — ``df.sample()`` is seed-stable only per partition
layout, so repartitioning changes the sample.  These operators key every
decision on a hash of the row's own key instead:

- :func:`deterministic_sample` — keep a row iff
  ``xxhash64(key, salt) mod D < rate*D``.  The same row set survives any
  partitioning, any cluster size, any execution order; rates compose
  (a 0.5 sample of a 0.5 sample with different salts is an exact 0.25
  sample in expectation, and repeating a salt is idempotent).
- :func:`quota_cap` — cap rows per group (per-domain / per-source caps,
  the Common-Crawl-style curation primitive): rank rows within each group
  by the same key hash (deterministic, uniform — no bias toward any
  natural ordering) and keep the first ``quota``.  One window shuffle on
  the group key; skew in group sizes is bounded because output per group
  is capped at ``quota``.

Both are pure column expressions (JVM-side, codegen) — no UDFs.  The hash
is the repo's shared md5-derived bigint (`text.token_hash_col` rationale)
rather than ``xxhash64`` so the identical decision is computable in ANSI
SQL and every sample stays fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DENOM = 1 << 32


def sample_hash_col(key, salt: int = 0):
    """Uniform bucket in [0, 2^32) from the row key — the shared primitive.

    ``bigint(substr(md5(salt ':' key),1,8))``: 32 hex-derived bits, exactly
    reproducible in DuckDB as ``('0x'||substr(md5(...),1,8))::bigint``.
    """
    tagged = F.concat(F.lit(f"{salt}:"), key.cast("string"))
    return F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("bigint")


def deterministic_sample(df: DataFrame, rate: float, *, key: str = "doc_id",
                         salt: int = 0) -> DataFrame:
    """Keep ~``rate`` of rows, decided per row key — reproducible at any
    parallelism, stable under repartitioning, idempotent per salt."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    threshold = int(rate * _DENOM)
    return df.filter(sample_hash_col(F.col(key), salt) < F.lit(threshold))


def quota_cap(df: DataFrame, group_col: str, quota: int, *,
              key: str = "doc_id", salt: int = 0) -> DataFrame:
    """Keep at most ``quota`` rows per group, selected by deterministic
    hash rank (ties broken by the key itself, so output is total-ordered
    and byte-stable)."""
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    w = Window.partitionBy(group_col).orderBy(
        sample_hash_col(F.col(key), salt).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= quota)
        .drop("_qrank")
    )
