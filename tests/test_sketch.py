"""HLL distinct sketch — register parity vs a pure-python oracle, merge
exactness, estimate accuracy on both the raw and linear-counting paths,
partitioning invariance."""

from __future__ import annotations

import hashlib
import math

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


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------

from osm2geojson_lite_spark.pipeline.sketch import (  # noqa: E402
    hist_merge,
    hist_quantiles,
    hist_sketch,
)


def _py_hist(vals, lo, hi, bins):
    regs = {}
    for v in vals:
        b = min(bins - 1, max(0, math.floor((v - lo) / (hi - lo) * bins)))
        regs[b] = regs.get(b, 0) + 1
    return regs


def _py_quantile(vals, q, lo, hi, bins):
    regs = _py_hist(vals, lo, hi, bins)
    n = len(vals)
    r = max(1, math.ceil(q * n))
    cum = 0
    for b in sorted(regs):
        cum += regs[b]
        if cum >= r:
            frac = (r - (cum - regs[b])) / regs[b]
            return round(lo + (b + frac) * ((hi - lo) / bins), 9)
    raise AssertionError


def test_hist_registers_and_quantiles_match_python(spark):
    import random
    rng = random.Random(5)
    rows = [(i % 3, rng.uniform(-50, 1050)) for i in range(5000)]
    df = spark.createDataFrame(rows, "g int, v double")
    regs = hist_sketch(df, ["g"], "v", lo=0.0, hi=1000.0, bins=64)
    got = {(r.g, r.bin): r.cnt for r in regs.collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        want = _py_hist(vals, 0.0, 1000.0, 64)
        assert {b: c for (gg, b), c in got.items() if gg == g} == want
    est = {(r.g, r.q): (r.n, r.est) for r in
           hist_quantiles(regs, ["g"], [0.1, 0.5, 0.99, 1.0],
                          lo=0.0, hi=1000.0, bins=64).collect()}
    for g, vals in by_g.items():
        for q in (0.1, 0.5, 0.99, 1.0):
            n, e = est[(g, q)]
            assert n == len(vals)
            assert e == _py_quantile(vals, q, 0.0, 1000.0, 64)


def test_hist_quantile_accuracy_within_bin_width(spark):
    import random
    rng = random.Random(6)
    vals = [rng.uniform(0, 1000) for _ in range(8000)]
    df = spark.createDataFrame([(0, v) for v in vals], "g int, v double")
    regs = hist_sketch(df, ["g"], "v", lo=0.0, hi=1000.0, bins=256)
    est = {r.q: r.est for r in
           hist_quantiles(regs, ["g"], [0.5, 0.9],
                          lo=0.0, hi=1000.0, bins=256).collect()}
    srt = sorted(vals)
    for q in (0.5, 0.9):
        true = srt[max(1, math.ceil(q * len(vals))) - 1]
        assert abs(est[q] - true) <= 1000.0 / 256 + 1e-9  # one bin width


def test_hist_merge_equals_direct_and_invariance(spark):
    import random
    rng = random.Random(7)
    rows = [(i % 2, i % 5, rng.uniform(0, 100)) for i in range(3000)]
    df = spark.createDataFrame(rows, "g int, sub int, v double")
    fine = hist_sketch(df, ["g", "sub"], "v", lo=0.0, hi=100.0, bins=32)
    merged = hist_merge(fine, ["g"])
    direct = hist_sketch(df, ["g"], "v", lo=0.0, hi=100.0, bins=32)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    a = sorted(map(tuple, hist_quantiles(
        hist_sketch(df.repartition(1), ["g"], "v", lo=0.0, hi=100.0,
                    bins=32), ["g"], [0.5], lo=0.0, hi=100.0,
        bins=32).collect()))
    b = sorted(map(tuple, hist_quantiles(
        hist_sketch(df.repartition(17), ["g"], "v", lo=0.0, hi=100.0,
                    bins=32), ["g"], [0.5], lo=0.0, hi=100.0,
        bins=32).collect()))
    assert a == b
    with pytest.raises(ValueError):
        hist_sketch(df, ["g"], "v", lo=5.0, hi=5.0)
