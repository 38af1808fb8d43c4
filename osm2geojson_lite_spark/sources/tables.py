"""Table source/sink layer: Iceberg when a catalog is configured, parquet
otherwise.

The production deployment (BASELINE.json north rule) reads/writes Iceberg
tables; this sandbox ships no Iceberg runtime jar, so the same call sites
degrade to parquet directories with identical schemas and identical
partitioning columns.  The switch is one predicate — ``has_iceberg`` — so
pointing the engine at a real catalog is a config change, not a code
change.

Layout conventions:
- ``documents``   partitioned by ``bucket(doc_id)`` (lineage work unit)
- ``features``    partitioned by ``cell_r7`` (repartition-by-cell, X1)
- ``_lineage``    append-only run log (see lineage.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..spatial.cells import cell_col


def has_iceberg(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured on this session
    (any ``spark.sql.catalog.<name>`` whose impl mentions iceberg)."""
    try:
        items = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
               for k, v in items)


def read_documents(spark: SparkSession, location: str) -> DataFrame:
    """Read the interleaved-documents table (Iceberg identifier or parquet
    path)."""
    if has_iceberg(spark) and not location.startswith("/"):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_features(df: DataFrame, location: str, *, mode: str = "append") -> None:
    """Write feature rows partitioned by their res-7 cell — co-locates all
    downstream tile work (X1 repartition-by-cell) and gives Iceberg/parquet
    partition pruning on cell predicates."""
    out = df
    if "cell_r7" not in df.columns and {"lon", "lat"} <= set(df.columns):
        out = df.withColumn(
            "cell_r7", cell_col(F.col("lon").cast("double"),
                                F.col("lat").cast("double"), 7)
        )
    spark = out.sparkSession
    if has_iceberg(spark) and not location.startswith("/"):
        out.writeTo(location).append()
        return
    (out.repartition("cell_r7")
        .write.mode(mode).partitionBy("cell_r7").parquet(location))


def write_geojson(df: DataFrame, location: str, *, mode: str = "append",
                  n_buckets: int = 64) -> None:
    """Write (doc_id, geojson) results bucketed by doc id — the same
    deterministic work unit the lineage log tracks."""
    from ..lineage import bucket_col

    out = df.withColumn("bucket", bucket_col(F.col("doc_id"), n_buckets))
    spark = out.sparkSession
    if has_iceberg(spark) and not location.startswith("/"):
        out.writeTo(location).append()
        return
    out.write.mode(mode).partitionBy("bucket").parquet(location)
