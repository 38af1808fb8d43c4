"""k-mins distinct/set-ops sketch — register parity vs a pure-python
oracle, merge exactness, distinct / Jaccard / intersection accuracy,
identity cases, partitioning invariance."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.sketch import (
    kmv_estimate,
    kmv_merge,
    kmv_set_ops,
    kmv_sketch,
)


def _py_mins(vals, k, salt="kmv"):
    mins = {}
    for v in vals:
        for i in range(k):
            h = int(hashlib.md5(
                f"{salt}{i}:{v}".encode()).hexdigest()[:15], 16)
            if i not in mins or h < mins[i]:
                mins[i] = h
    return mins


def _py_estimate(mins, k):
    return (k - 1) / sum(m / float(1 << 60) for m in sorted(mins.values()))


def _vals(spark, n=4000, dom=2500, groups=4):
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        F.concat(F.lit("u"), ((F.col("id") * 13) % dom).cast("string"))
         .alias("u"),
    )


def test_registers_match_python_oracle(spark):
    df = _vals(spark, n=800, dom=500)
    got = {(r.g, r.i): r.mn
           for r in kmv_sketch(df, ["g"], "u", k=8).collect()}
    for g in range(4):
        vals = {"u" + str((i * 13) % 500) for i in range(800) if i % 4 == g}
        want = _py_mins(vals, 8)
        assert {i: mn for (gg, i), mn in got.items() if gg == g} == want


def test_estimate_within_error_bound(spark):
    # k=64 -> rel stderr ~1/sqrt(62) = 12.7%; assert 4 sigma per group
    df = _vals(spark, n=8000, dom=6000, groups=4)
    exact = {r.g: r.n for r in
             df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()}
    est = kmv_estimate(kmv_sketch(df, ["g"], "u", k=64), ["g"], k=64)
    rows = est.collect()
    assert len(rows) == 4
    for r in rows:
        assert r.n_mins == 64
        assert abs(r.distinct_est - exact[r.g]) / exact[r.g] < 0.51


def test_merge_equals_direct(spark):
    # sketch halves separately, merge, compare register-exact vs direct
    df = _vals(spark)
    a = kmv_sketch(df.where("id is null or g >= 0").where(
        F.xxhash64("u") % 2 == 0), ["g"], "u", k=16)
    b = kmv_sketch(df.where(F.xxhash64("u") % 2 != 0), ["g"], "u", k=16)
    merged = {(r.g, r.i): r.mn
              for r in kmv_merge(a.unionByName(b), ["g"]).collect()}
    direct = {(r.g, r.i): r.mn
              for r in kmv_sketch(df, ["g"], "u", k=16).collect()}
    assert merged == direct


def test_set_ops_identity_and_planted_overlap(spark):
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    k = 128
    # A = u0..u2999, B = u2000..u5999: |A∩B| = 1000, |A∪B| = 6000, J = 1/6
    base = spark.range(6000).select(
        F.lit(0).alias("g"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("u"),
        "id")
    a = kmv_sketch(base.where("id < 3000"), ["g"], "u", k=k)
    b = kmv_sketch(base.where("id >= 2000"), ["g"], "u", k=k)

    # identity: A vs A -> J = 1, inter == union == the distinct estimate
    same = kmv_set_ops(a, a, ["g"], k=k).collect()[0]
    est_a = kmv_estimate(a, ["g"], k=k).collect()[0].distinct_est
    assert same.n_match == k and same.jaccard_est == 1.0
    assert same.union_est == est_a and same.inter_est == est_a

    r = kmv_set_ops(a, b, ["g"], k=k).collect()[0]
    j_true = 1000 / 6000
    sd_j = math.sqrt(j_true * (1 - j_true) / k)
    assert abs(r.jaccard_est - j_true) < 4 * sd_j
    assert abs(r.union_est - 6000) / 6000 < 0.51  # 4/sqrt(k-2)
    assert abs(r.inter_est - 1000) / 1000 < 1.2   # product of two noisy ests


def test_set_ops_disjoint_groups_dropped(spark):
    a = kmv_sketch(_vals(spark, n=100, groups=2), ["g"], "u", k=8)
    b = kmv_sketch(_vals(spark, n=100, groups=4).where("g >= 1"),
                   ["g"], "u", k=8)
    got = {r.g for r in kmv_set_ops(a, b, ["g"], k=8).collect()}
    assert got == {1}  # group 0 absent from b, groups 2-3 absent from a


def test_partitioning_invariance_and_nulls(spark):
    df = _vals(spark, n=2000, dom=900).withColumn(
        "u", F.when(F.col("u") == "u13", None).otherwise(F.col("u")))
    one = kmv_sketch(df.coalesce(1), ["g"], "u", k=16)
    many = kmv_sketch(df.repartition(37), ["g"], "u", k=16)
    assert sorted(map(tuple, one.collect())) == \
        sorted(map(tuple, many.collect()))
    e1 = kmv_estimate(one, ["g"], k=16).collect()
    e2 = kmv_estimate(many, ["g"], k=16).collect()
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e2))  # bit-identical


def test_validation(spark):
    df = _vals(spark, n=10)
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, ["g"], "u", k=2)
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, ["g"], "u", k=1024)
