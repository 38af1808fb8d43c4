"""stratified_split — determinism, coverage, proportions, folds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.sample import stratified_split


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("stratum"),
    )


FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_disjoint_exhaustive_and_proportions(spark):
    out = stratified_split(_docs(spark), FRACS)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert abs(counts["train"] / 2000 - 0.8) < 0.04
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_partitioning_invariance_and_stability(spark):
    df = _docs(spark)
    a = sorted(map(tuple, stratified_split(df.repartition(1), FRACS).collect()))
    b = sorted(map(tuple, stratified_split(df.repartition(13), FRACS).collect()))
    assert a == b
    # re-running yields the identical assignment (unlike randomSplit)
    c = sorted(map(tuple, stratified_split(df, FRACS).collect()))
    assert a == c


def test_each_stratum_split_at_same_rate(spark):
    out = stratified_split(_docs(spark, 7000), FRACS)
    per = (out.groupBy("stratum").agg(
        (F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
         / F.count("*")).alias("rate")).collect())
    for r in per:
        assert abs(r["rate"] - 0.8) < 0.06, r


def test_salt_gives_independent_fold(spark):
    df = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in stratified_split(df, FRACS, salt=0).collect()}
    b = {r["doc_id"]: r["split"] for r in stratified_split(df, FRACS, salt=1).collect()}
    diff = sum(1 for k in a if a[k] != b[k])
    assert diff > 400  # assignments decorrelate across salts


def test_validation(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError, match="sum to 1"):
        stratified_split(df, {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="non-empty"):
        stratified_split(df, {})
    # single split takes everything
    out = stratified_split(df, {"all": 1.0}).collect()
    assert all(r["split"] == "all" for r in out)
