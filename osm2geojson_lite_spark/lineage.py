"""Per-partition checkpoint / lineage / resume (X6, north rule).

A killed run must resume without recomputing completed partitions.  The
lineage log is an append-only table keyed ``(run_id, partition_key)`` with
status + metrics; on restart, pending work = all partitions anti-joined
against the completed set.

Storage: Iceberg when a catalog is configured (``table://`` identifiers);
this sandbox has no Iceberg runtime jar, so the default backend is an
append-only parquet directory with identical schema and semantics — the
``_lineage`` layout matches what an Iceberg ``_lineage`` table would hold,
and the writer is the single swap point.

The work unit is a deterministic *bucket* of the document key
(``pmod(xxhash64(doc_id), n_buckets)``), giving uniform, scale-independent
partitions: the same doc always lands in the same bucket at any cluster
size, so resume is byte-stable.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "run_id string, partition_key string, status string, n_rows long, "
    "wall_ms long, finished_at_ms long"
)


class LineageLog:
    def __init__(self, path: str):
        self.path = path

    def completed_keys(self, spark: SparkSession, run_id: str) -> list[str]:
        try:
            df = spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)
        except Exception:
            return []
        rows = (
            df.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .select("partition_key").distinct().collect()
        )
        return [r["partition_key"] for r in rows]

    def mark_done(self, spark: SparkSession, run_id: str, keys_rows: list[tuple[str, int]],
                  wall_ms: int) -> None:
        """Append one 'done' record per (partition_key, n_rows) — a single
        commit per job, not per bucket."""
        now = int(time.time() * 1000)
        rows = [(run_id, k, "done", n, wall_ms, now) for k, n in keys_rows]
        spark.createDataFrame(rows, LINEAGE_SCHEMA).coalesce(1).write.mode("append").parquet(self.path)


def bucket_col(key, n_buckets: int):
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def convert_with_lineage(docs: DataFrame, output_path: str, lineage_path: str, *,
                         run_id: str | None = None, n_buckets: int = 16,
                         buckets_per_job: int = 4, opts=None,
                         fail_after_jobs: int | None = None,
                         fail_mid_commit: int | None = None) -> str:
    """Run the conversion pipeline checkpointed per bucket group.

    Each job converts ``buckets_per_job`` buckets and *overwrites* exactly
    those bucket partitions of ``output_path`` (parquet partitioned by
    ``bucket``, ``partitionOverwriteMode=dynamic``), then marks them done in
    the lineage log.  Overwrite-per-partition makes the write idempotent: a
    crash *between* the data write and ``mark_done`` re-runs the job on
    resume and replaces the same partitions instead of appending duplicates.
    Re-invoking with the same ``run_id`` anti-joins completed buckets and
    processes only the remainder.

    Per-bucket row counts ride on the write via ``df.observe`` — no second
    scan of the sink (at scale that would be a full re-read per checkpoint).

    ``fail_after_jobs`` injects a crash after N jobs (kill/resume tests);
    ``fail_mid_commit`` injects one *between* job N's data write and its
    ``mark_done`` — the window the dynamic-overwrite write makes safe.
    Returns the run_id.
    """
    from pyspark.sql import Observation

    from .operators.convert import Options, convert

    spark = docs.sparkSession
    opts = opts or Options(complete_feature=True)
    run_id = run_id or uuid.uuid4().hex
    log = LineageLog(lineage_path)

    done = set(log.completed_keys(spark, run_id))
    all_buckets = [b for b in range(n_buckets) if str(b) not in done]

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed = docs.withColumn("bucket", bucket_col(F.col("doc_id"), n_buckets))
    jobs = [
        all_buckets[i: i + buckets_per_job]
        for i in range(0, len(all_buckets), buckets_per_job)
    ]
    for ji, group in enumerate(jobs):
        if fail_after_jobs is not None and ji >= fail_after_jobs:
            raise RuntimeError(f"injected failure before job {ji} (run {run_id})")
        t0 = time.time()
        subset = bucketed.filter(F.col("bucket").isin(group))
        result = convert(subset.drop("bucket"), opts).join(
            bucketed.select("doc_id", "bucket"), "doc_id"
        )
        obs = Observation(f"lineage-{run_id}-{ji}")
        observed = result.observe(
            obs,
            *[
                F.sum(F.when(F.col("bucket") == b, 1).otherwise(0)).alias(f"b{b}")
                for b in group
            ],
        )
        observed.write.mode("overwrite").partitionBy("bucket").parquet(output_path)
        if fail_mid_commit is not None and ji >= fail_mid_commit:
            raise RuntimeError(
                f"injected failure after write, before mark_done of job {ji} "
                f"(run {run_id})"
            )
        wall_ms = int((time.time() - t0) * 1000)
        counts = obs.get
        log.mark_done(spark, run_id,
                      [(str(b), int(counts.get(f"b{b}") or 0)) for b in group], wall_ms)
    return run_id


def read_converted(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(output_path)
