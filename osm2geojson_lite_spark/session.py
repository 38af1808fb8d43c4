"""SparkSession factory tuned for the engine.

Local-mode defaults match the sandbox (local[32], single JVM); on a real
cluster the same conf applies minus master/driver-memory, submitted via
``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "osm2geojson-lite-spark", *, cpus: int | None = None,
              shuffle_partitions: int | None = None,
              adaptive: bool = True) -> SparkSession:
    """``adaptive``: AQE on by default (cluster-correct: runtime coalesce,
    skew-join splitting).  The benchmark runners pass ``adaptive=False``: at
    local scale the conversion DAG has ~50 small exchanges and AQE turns each
    into a sub-job — measured 4.7x slower from driver-side orchestration
    alone.  On a real cluster with multi-GB partitions AQE pays for itself;
    skew in this engine is additionally handled explicitly (salting)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true" if adaptive else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches: fewer JVM<->Python round trips per kernel task
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Compression ON everywhere (round 5; rounds 2-4 ran local with it
        # off on a "RAM is plentiful, CPU is contended" trade).  Round 5's
        # host calibration showed this box's wide-parallelism legs are
        # DRAM-bandwidth-bound in many windows (2->8-core scaling: 0.95
        # frequency-bound vs 0.63 DRAM-bound kernels), where lz4 spends
        # cheap ALU to cut bytes through the memory subsystem: interleaved
        # A/B at local[8]/24k docs (tools/compress_ab.py) measured
        # compression-on faster at best-of (+7.6%) and far more stable
        # (walls 43-62s vs 46-75s).  It is also the cluster-correct
        # setting - network >> CPU - so local and spark-submit runs now
        # share one transport config.
        .config("spark.sql.inMemoryColumnarStorage.compressed", "true")
        .config("spark.shuffle.compress", "true")
        .config("spark.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -Djava.io.tmpdir=/tmp")
    )
    spark = builder.getOrCreate()
    # getOrCreate() silently ignores builder configs when a session already
    # exists in this process.  The SQL confs that matter for plan shape are
    # runtime-mutable — enforce them on whatever session came back so a bench
    # never runs with a stale AQE/shuffle-partition setting (the 4.7x effect
    # documented above).  Immutable mismatches (master/core count) can only
    # be surfaced, not fixed.
    spark.conf.set("spark.sql.adaptive.enabled", "true" if adaptive else "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    actual_master = spark.sparkContext.master
    if actual_master != f"local[{cpus}]":
        import warnings

        warnings.warn(
            f"get_spark requested local[{cpus}] but reused an existing session "
            f"on {actual_master}; core budget differs (stop() it first for a "
            f"pinned run)",
            stacklevel=2,
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def wave_aligned(n: int, cores: int) -> int:
    """Smallest multiple of ``cores`` >= ``n`` (and >= ``cores``).

    A reduce stage whose partition count is not a multiple of the core
    budget leaves the remainder of its last scheduling wave idle for the
    stage's whole tail: 21 partitions on 32 cores idles 11 cores — that
    alone caps a 4-executor leg at 0.66 efficiency (measured 0.574 in an
    early cluster pair with exactly that shape).
    """
    if cores <= 0:
        return max(1, n)
    return max(1, -(-max(1, n) // cores)) * cores


def wave_partitions(spark: SparkSession, n_rows: int | None = None, *,
                    rows_per_partition: int = 1500,
                    cores: int | None = None) -> int:
    """Engine default partition count: data-sized, then wave-aligned.

    Sizes partitions by ``rows_per_partition`` (fat enough to amortize
    per-task overhead) and rounds UP to fill whole scheduling waves of the
    cluster (``defaultParallelism`` unless ``cores`` pins a specific budget
    — e.g. a scaling benchmark aligning BOTH legs to the larger leg for
    plan identity).  This is the automatic form of the partition-count
    overrides the cluster benchmarks used to pass by hand.
    """
    if cores is None:
        cores = spark.sparkContext.defaultParallelism
    if n_rows is None:
        return cores
    return wave_aligned(n_rows // rows_per_partition, cores)


from contextlib import contextmanager


@contextmanager
def data_sized_shuffle(spark: SparkSession, n_rows: int, *,
                       rows_per_partition: int = 20_000):
    """Temporarily size ``spark.sql.shuffle.partitions`` to a MEASURED row
    count for an eagerly-executed region (iterative loops whose per-round
    tables are far smaller than the corpus the session conf is tuned for).

    Scale-adaptive in both directions: above one scheduling wave the count
    is wave-aligned to ``defaultParallelism`` (cluster-width multiples, no
    idle remainder wave); below it, tiny inputs stop paying a full wave of
    near-empty tasks per shuffle stage (measured ~6s/round -> ~0.7s/round
    on a 20k-row graph at local[32]).  Restores the previous value on
    exit; lazily-returned DataFrames evaluated after the region run on
    the caller's partitioning.
    """
    cores = spark.sparkContext.defaultParallelism
    target = max(1, int(n_rows) // rows_per_partition)
    p = wave_aligned(target, cores) if target >= cores else int(target)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        yield p
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def prewarm_python_workers(spark: SparkSession, *, cores: int | None = None) -> None:
    """Boot one Arrow-capable Python worker per task slot NOW.

    Python workers otherwise start lazily inside the first Arrow-kernel
    stage, serializing interpreter startup into the first data wave's
    critical path.  One trivial ``mapInPandas`` over ``defaultParallelism``
    single-row partitions forces every slot to spawn (and, with the default
    ``spark.python.worker.reuse``, keep) its worker while the job is
    otherwise idle — session setup overlaps worker startup instead of the
    first kernel stage paying it.
    """
    if cores is None:
        cores = spark.sparkContext.defaultParallelism
    (
        spark.range(cores).repartition(cores)
        .mapInPandas(lambda batches: batches, schema="id long")
        .write.format("noop").mode("overwrite").save()
    )
