"""asof_join / interval_join vs an exact in-test python oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.temporal import asof_join, interval_join


def _mk(spark, rows, cols):
    if not rows:  # schema can't be inferred from an empty list
        schema = ", ".join(f"{c} double" if c in ("lv", "rv")
                           else f"{c} bigint" for c in cols)
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows, cols)


def _gen(seed, n_left=400, n_right=300, n_keys=7, tmax=10_000):
    rng = random.Random(seed)
    left = [(i, rng.randrange(n_keys), rng.randrange(tmax),
             round(rng.uniform(0, 100), 2)) for i in range(n_left)]
    right = [(1000 + i, rng.randrange(n_keys), rng.randrange(tmax),
              round(rng.uniform(0, 100), 2)) for i in range(n_right)]
    return left, right


def _asof_oracle(left, right, *, direction="backward", tolerance=None):
    """Exact per-row scan: greatest right t <= left t (backward), ties by
    greatest rid; forward mirrors."""
    out = {}
    for lid, k, lt, _ in left:
        best = None
        for rid, rk, rt, rv in right:
            if rk != k:
                continue
            if direction == "backward":
                if rt > lt or (tolerance is not None and lt - rt > tolerance):
                    continue
                cand = (rt, rid, rv)
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
            else:
                if rt < lt or (tolerance is not None and rt - lt > tolerance):
                    continue
                # forward: SMALLEST rt at-or-after; ties by greatest rid
                if (best is None or rt < best[0]
                        or (rt == best[0] and rid > best[1])):
                    best = (rt, rid, rv)
        out[lid] = best
    return out


def _run_asof(spark, left, right, **kw):
    ldf = _mk(spark, left, ["lid", "k", "t", "lv"])
    rdf = _mk(spark, right, ["rid", "k", "t", "rv"])
    got = asof_join(ldf, rdf, on="k", left_time="t", right_time="t",
                    right_values=["rid", "rv"], **kw).collect()
    return {r["lid"]: (r["t_r"], r["rid_r"], r["rv_r"])
            if r["rid_r"] is not None else None for r in got}


@pytest.mark.parametrize("seed", [1, 2])
def test_asof_backward_matches_oracle(spark, seed):
    left, right = _gen(seed)
    assert _run_asof(spark, left, right) == _asof_oracle(left, right)


def test_asof_forward_matches_oracle(spark):
    left, right = _gen(3)
    assert (_run_asof(spark, left, right, direction="forward")
            == _asof_oracle(left, right, direction="forward"))


def test_asof_tolerance(spark):
    left, right = _gen(4)
    assert (_run_asof(spark, left, right, tolerance=150)
            == _asof_oracle(left, right, tolerance=150))


def test_asof_equal_time_is_inclusive_and_tiebreaks_by_id(spark):
    left = [(0, 1, 500, 0.0)]
    right = [(1001, 1, 500, 1.0), (1002, 1, 500, 2.0), (1003, 1, 499, 3.0)]
    assert _run_asof(spark, left, right) == {0: (500, 1002, 2.0)}


def test_asof_empty_right_keeps_left_with_nulls(spark):
    left, _ = _gen(5, n_left=20)
    got = _run_asof(spark, left, [])
    assert got == {lid: None for lid, *_ in left}


def test_asof_hot_key_and_partitioning_invariance(spark):
    # one key owns 90% of rows; result must not depend on partitioning
    # or bucket count (different grids, same answer).
    rng = random.Random(6)
    left = [(i, 0 if i % 10 else 1, rng.randrange(2000), 0.0)
            for i in range(500)]
    right = [(1000 + i, 0 if i % 10 else 1, rng.randrange(2000), float(i))
             for i in range(400)]
    want = _asof_oracle(left, right)
    ldf = _mk(spark, left, ["lid", "k", "t", "lv"]).repartition(13)
    rdf = _mk(spark, right, ["rid", "k", "t", "rv"]).repartition(3)
    for nb in (4, 256):
        got = asof_join(ldf, rdf, on="k", left_time="t", right_time="t",
                        right_values=["rid", "rv"], num_buckets=nb).collect()
        as_map = {r["lid"]: (r["t_r"], r["rid_r"], r["rv_r"])
                  if r["rid_r"] is not None else None for r in got}
        assert as_map == want


def test_asof_composite_key(spark):
    """on=[k1, k2]: matches must respect BOTH key columns."""
    rng = random.Random(8)
    left = [(i, rng.randrange(3), rng.randrange(2), rng.randrange(1000), 0.0)
            for i in range(150)]
    right = [(1000 + i, rng.randrange(3), rng.randrange(2),
              rng.randrange(1000), float(i)) for i in range(120)]
    want = {}
    for lid, k1, k2, lt, _ in left:
        best = None
        for rid, rk1, rk2, rt, rv in right:
            if (rk1, rk2) == (k1, k2) and rt <= lt:
                cand = (rt, rid, rv)
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        want[lid] = best
    ldf = spark.createDataFrame(left, ["lid", "k1", "k2", "t", "lv"])
    rdf = spark.createDataFrame(right, ["rid", "k1", "k2", "t", "rv"])
    got = asof_join(ldf, rdf, on=["k1", "k2"], left_time="t", right_time="t",
                    right_values=["rid", "rv"]).collect()
    as_map = {r["lid"]: (r["t_r"], r["rid_r"], r["rv_r"])
              if r["rid_r"] is not None else None for r in got}
    assert as_map == want


def _interval_oracle(left, right, lower, upper):
    out = set()
    for lid, k, lt, _ in left:
        for rid, rk, rt, _ in right:
            if rk == k and lt + lower <= rt <= lt + upper:
                out.add((lid, rid))
    return out


@pytest.mark.parametrize("lower,upper", [(-300, 0), (-100, 100), (50, 400)])
def test_interval_join_matches_oracle(spark, lower, upper):
    left, right = _gen(7, n_left=200, n_right=200, tmax=3000)
    ldf = _mk(spark, left, ["lid", "k", "t", "lv"])
    rdf = _mk(spark, right, ["rid", "k", "t", "rv"])
    got = interval_join(ldf, rdf, on="k", left_time="t", right_time="t",
                        lower=lower, upper=upper,
                        right_values=["rid"]).collect()
    assert {(r["lid"], r["rid_r"]) for r in got} == _interval_oracle(
        left, right, lower, upper)
    # band edges are inclusive on both ends
    l2 = [(0, 1, 1000, 0.0)]
    r2 = [(1, 1, 1000 + lower, 0.0), (2, 1, 1000 + upper, 0.0),
          (3, 1, 1000 + lower - 1, 0.0), (4, 1, 1000 + upper + 1, 0.0)]
    got2 = interval_join(_mk(spark, l2, ["lid", "k", "t", "lv"]),
                         _mk(spark, r2, ["rid", "k", "t", "rv"]),
                         on="k", left_time="t", right_time="t",
                         lower=lower, upper=upper,
                         right_values=["rid"]).collect()
    assert {r["rid_r"] for r in got2} == {1, 2}
