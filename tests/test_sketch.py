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


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

from osm2geojson_lite_spark.pipeline.sketch import (  # noqa: E402
    cms_merge,
    cms_query,
    cms_sketch,
)


def _py_cms(weighted_vals, width_bits, depth, salt="cms"):
    w, regs = 1 << width_bits, {}
    for v, wt in weighted_vals:
        for d in range(depth):
            h = int(hashlib.md5(f"{salt}{d}:{v}".encode()).hexdigest()[:15], 16)
            key = (d, h & (w - 1))
            regs[key] = regs.get(key, 0) + wt
    return regs


def _py_cms_query(regs, v, width_bits, depth, salt="cms"):
    w = 1 << width_bits
    ests = []
    for d in range(depth):
        h = int(hashlib.md5(f"{salt}{d}:{v}".encode()).hexdigest()[:15], 16)
        ests.append(regs.get((d, h & (w - 1)), 0))
    return min(ests)


def _zipf_df(spark, n=6000, groups=2):
    # value v occurs ~ n/v times within each group (heavy head)
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        F.concat(F.lit("t"), ((F.col("id") * F.col("id")) % 97).cast("string"))
         .alias("v"),
    )


def test_cms_registers_match_python_oracle(spark):
    df = _zipf_df(spark)
    got = {(r.g, r.d, r.j): r.cnt
           for r in cms_sketch(df, ["g"], "v", width_bits=6, depth=3).collect()}
    for g in range(2):
        vals = [("t" + str((i * i) % 97), 1) for i in range(6000) if i % 2 == g]
        want = _py_cms(vals, 6, 3)
        assert {(d, j): c for (gg, d, j), c in got.items() if gg == g} == want


def test_cms_query_one_sided_and_bounded(spark):
    df = _zipf_df(spark)
    exact = {(r.g, r.v): r.n for r in
             df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n")).collect()}
    regs = cms_sketch(df, ["g"], "v", width_bits=8, depth=4)
    probes = df.select("g", "v").distinct()
    est = {(r.g, r.v): r.est for r in
           cms_query(regs, probes, ["g"], "v",
                     width_bits=8, depth=4).collect()}
    n_per_group = 3000
    for k, true in exact.items():
        assert est[k] >= true                       # never under-counts
        assert est[k] <= true + (2.72 / 256) * n_per_group * 4


def test_cms_merge_equals_direct(spark):
    df = _zipf_df(spark).withColumn("sub", F.col("v").substr(2, 1))
    fine = cms_sketch(df, ["g", "sub"], "v", width_bits=6, depth=3)
    merged = cms_merge(fine, ["g"])
    direct = cms_sketch(df, ["g"], "v", width_bits=6, depth=3)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_weighted_and_partitioning_invariance(spark):
    rows = [(0, "a", 5), (0, "a", 7), (0, "b", 1), (0, "c", 100)]
    df = spark.createDataFrame(rows, "g int, v string, wt long")
    want = _py_cms([(v, wt) for _, v, wt in rows], 5, 2)
    for parts in (1, 8):
        got = {(r.d, r.j): r.cnt for r in
               cms_sketch(df.repartition(parts), ["g"], "v", width_bits=5,
                          depth=2, weight_col="wt").collect()}
        assert got == want
    # python query replay agrees on a present and an absent key
    assert _py_cms_query(want, "a", 5, 2) >= 12
    with pytest.raises(ValueError):
        cms_sketch(df, ["g"], "v", width_bits=2)
