"""HLL distinct sketch — register parity vs a pure-python oracle, merge
exactness, estimate accuracy on both the raw and linear-counting paths,
partitioning invariance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.sketch import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _py_registers(vals, p, salt="hll"):
    m, w, regs = 1 << p, 60 - p, {}
    for v in vals:
        h = int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16)
        j, r = h & (m - 1), h >> p
        rho = (w + 1) if r == 0 else w - r.bit_length() + 1
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def _vals(spark, n=4000, dom=2500, groups=4):
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        F.concat(F.lit("u"), ((F.col("id") * 13) % dom).cast("string"))
         .alias("u"),
    )


def test_registers_match_python_oracle(spark):
    df = _vals(spark)
    got = {(r.g, r.j): r.rho
           for r in hll_sketch(df, ["g"], "u", p=9).collect()}
    for g in range(4):
        vals = {"u" + str((i * 13) % 2500) for i in range(4000) if i % 4 == g}
        want = _py_registers(vals, 9)
        assert {j: rho for (gg, j), rho in got.items() if gg == g} == want


def test_estimate_within_error_bound(spark):
    # p=10 -> stderr 3.25%; assert 4 sigma on every group
    df = _vals(spark, n=8000, dom=6000, groups=4)
    exact = {r.g: r.n for r in
             df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()}
    est = hll_estimate(hll_sketch(df, ["g"], "u", p=10), ["g"], p=10)
    for r in est.collect():
        assert abs(r.distinct_est - exact[r.g]) / exact[r.g] < 0.13


def test_linear_counting_small_range(spark):
    # tiny cardinality vs m=1024 registers: the correction path is very
    # accurate (each value occupies its own register w.h.p.)
    df = spark.range(40).select(F.lit(0).alias("g"),
                                F.col("id").cast("string").alias("u"))
    est = hll_estimate(hll_sketch(df, ["g"], "u", p=10), ["g"], p=10)
    r = est.collect()[0]
    assert r.n_registers_used <= 40
    assert abs(r.distinct_est - 40) / 40 < 0.05


def test_merge_equals_direct_sketch(spark):
    # max is associative: merging fine-grained sketches is BIT-IDENTICAL
    # to sketching the union directly (no approximation added by rollup)
    df = _vals(spark).withColumn("sub", F.col("u").substr(2, 1))
    fine = hll_sketch(df, ["g", "sub"], "u", p=8)
    merged = hll_merge(fine, ["g"])
    direct = hll_sketch(df, ["g"], "u", p=8)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_partitioning_invariance(spark):
    df = _vals(spark)
    a = sorted(map(tuple,
                   hll_estimate(hll_sketch(df.repartition(1), ["g"], "u",
                                           p=9), ["g"], p=9).collect()))
    b = sorted(map(tuple,
                   hll_estimate(hll_sketch(df.repartition(11), ["g"], "u",
                                           p=9), ["g"], p=9).collect()))
    assert a == b


def test_nulls_ignored_and_p_validated(spark):
    df = spark.range(10).select(
        F.lit(0).alias("g"),
        F.when(F.col("id") < 5, F.col("id").cast("string")).alias("u"))
    regs = hll_sketch(df, ["g"], "u", p=6)
    assert regs.count() == len(_py_registers([str(i) for i in range(5)], 6))
    with pytest.raises(ValueError):
        hll_sketch(df, ["g"], "u", p=3)
