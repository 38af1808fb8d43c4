"""segment_trips / trip_stats — python-oracle parity, bucket-width
invariance (the bounded phases are an implementation detail), partitioning
invariance, handcrafted gap semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.temporal import (od_matrix, segment_trips,
                                              stay_points, trip_stats)


def _py_trips(points, gap_s):
    """Naive oracle: sort per entity, split on gaps, return both the
    per-point labels and the per-trip stats."""
    labels, stats = {}, {}
    by_e = {}
    for e, t, lon, lat in points:
        by_e.setdefault(e, []).append((t, lon, lat))
    for e, pts in by_e.items():
        pts.sort()
        seq, prev_t = 0, None
        legs, first, last, n, t0 = [], None, None, 0, None
        def close():
            if first is None:
                return
            path = round(math.fsum(sorted(round(l, 9) for l in legs)), 6)
            disp = round(math.sqrt((last[1] - first[1]) ** 2
                                   + (last[2] - first[2]) ** 2), 9)
            stats[(e, seq)] = (n, t0, last[0], last[0] - t0, path, disp,
                               round(disp / path, 6) if path > 0 else None)
        for t, lon, lat in pts:
            if prev_t is None or t - prev_t > gap_s:
                close()
                seq += 1
                legs, first, n, t0 = [], (t, lon, lat), 0, t
                labels[(e, t, lon, lat)] = (seq, None)
            else:
                leg = round(math.sqrt((lon - last[1]) ** 2
                                      + (lat - last[2]) ** 2), 9)
                legs.append(leg)
                labels[(e, t, lon, lat)] = (seq, leg)
            last, prev_t, n = (t, lon, lat), t, n + 1
        close()
    return labels, stats


def _points(n=400, entities=3, seed=7):
    import random
    rng = random.Random(seed)
    pts = []
    for i in range(n):
        e = i % entities
        t = rng.randrange(0, 500_000)
        pts.append((e, t, round(rng.uniform(-10, 10), 4),
                    round(rng.uniform(-5, 5), 4)))
    # dedupe on the sort key so oracle and engine agree on identity
    return sorted(set(pts))


@pytest.mark.parametrize("bucket_s", [1000, 40_000, 10_000_000])
def test_matches_python_oracle_at_any_bucket_width(spark, bucket_s):
    pts = _points()
    df = spark.createDataFrame(pts, "entity int, t long, lon double, lat double")
    got = segment_trips(df, gap_s=5000, bucket_s=bucket_s)
    labels, stats = _py_trips(pts, 5000)
    got_labels = {(r.entity, r.t, r.lon, r.lat): (r.trip_seq, r.leg)
                  for r in got.collect()}
    assert got_labels == labels
    got_stats = {(r.entity, r.trip_seq):
                 (r.n_points, r.t_start, r.t_end, r.duration_s,
                  r.path_len, r.displacement, r.straightness)
                 for r in trip_stats(got).collect()}
    assert got_stats == stats


def test_hot_entity_and_partitioning_invariance(spark):
    # one entity owns 90% of the points; output identical at 1 vs 16
    # partitions and at two bucket widths
    pts = [(0, 100 * i, float(i), 0.0) for i in range(360)]
    pts += [(k, 7000 * k, 1.0, 1.0) for k in range(1, 5)]
    df = spark.createDataFrame(pts, "entity int, t long, lon double, lat double")
    outs = []
    for parts, bucket in ((1, 3_600), (16, 86_400)):
        out = trip_stats(segment_trips(df.repartition(parts),
                                       gap_s=900, bucket_s=bucket))
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1]
    labels, stats = _py_trips(pts, 900)
    assert outs[0] == sorted(
        (e, s) + v for (e, s), v in stats.items())


def test_handcrafted_gap_semantics(spark):
    # 3-4-5 triangle legs, one gap exactly at the threshold (NOT a split),
    # one just past it (split), a single-point trip
    pts = [(1, 0, 0.0, 0.0), (1, 3600, 3.0, 0.0), (1, 7200, 3.0, 4.0),
           (1, 10_800 + 1, 0.0, 0.0),   # gap 3601 -> new trip
           (2, 50, 9.0, 9.0)]
    df = spark.createDataFrame(pts, "entity int, t long, lon double, lat double")
    out = {(r.entity, r.trip_seq): r
           for r in trip_stats(segment_trips(
               df, gap_s=3600, bucket_s=1000)).collect()}
    t1 = out[(1, 1)]
    assert t1.n_points == 2 + 1 and t1.path_len == 7.0  # 3 + 4
    assert t1.displacement == 5.0 and t1.straightness == round(5 / 7, 6)
    t2 = out[(1, 2)]
    assert (t2.n_points, t2.path_len, t2.straightness) == (1, 0.0, None)
    assert out[(2, 1)].n_points == 1


def test_od_matrix_matches_python_oracle(spark):
    pts = _points(n=500, entities=5)
    df = spark.createDataFrame(pts, "entity int, t long, lon double, lat double")
    res = 8
    n = 1 << res

    def cell(lon, lat):
        x = min(n - 1, max(0, math.floor((lon - -180.0) / 360.0 * n)))
        y = min(n - 1, max(0, math.floor((lat - -90.0) / 180.0 * n)))
        return res * (1 << 56) + x * (1 << 28) + y

    _, stats = _py_trips(pts, 5000)
    flows = {}
    by_trip = {}
    for e, t, lon, lat in pts:
        by_trip.setdefault(e, []).append((t, lon, lat))
    # rebuild per-trip endpoints from the oracle labels
    labels, _ = _py_trips(pts, 5000)
    ends = {}
    for (e, t, lon, lat), (seq, _leg) in labels.items():
        k = (e, seq)
        cur = ends.get(k)
        if cur is None:
            ends[k] = [(t, lon, lat), (t, lon, lat)]
        else:
            ends[k][0] = min(cur[0], (t, lon, lat))
            ends[k][1] = max(cur[1], (t, lon, lat))
    for (_, _), (o, d) in ends.items():
        key = (cell(o[1], o[2]), cell(d[1], d[2]))
        flows[key] = flows.get(key, 0) + 1
    for parts in (1, 16):
        got = {(r.o_cell, r.d_cell): r.n_trips
               for r in od_matrix(
                   segment_trips(df.repartition(parts), gap_s=5000,
                                 bucket_s=40_000), res=res).collect()}
        assert got == flows


def _py_stays(points, max_dist, min_dur, gap_s):
    out = {}
    by_e = {}
    for e, t, lon, lat in points:
        by_e.setdefault(e, []).append((t, lon, lat))
    for e, pts in by_e.items():
        pts.sort()
        runs, cur = [], [pts[0]]
        for prev, nxt in zip(pts, pts[1:]):
            leg = round(math.sqrt((nxt[1] - prev[1]) ** 2
                                  + (nxt[2] - prev[2]) ** 2), 9)
            if nxt[0] - prev[0] > gap_s or leg > max_dist:
                runs.append(cur)
                cur = [nxt]
            else:
                cur.append(nxt)
        runs.append(cur)
        for seq, run in enumerate(runs, start=1):
            dur = run[-1][0] - run[0][0]
            if dur >= min_dur:
                n = len(run)
                out[(e, seq)] = (
                    n, run[0][0], run[-1][0], dur,
                    round(math.fsum(sorted(p[1] for p in run)) / n, 9),
                    round(math.fsum(sorted(p[2] for p in run)) / n, 9))
    return out


@pytest.mark.parametrize("bucket_s", [900, 86_400])
def test_stay_points_match_python_oracle(spark, bucket_s):
    import random
    rng = random.Random(9)
    pts, t = [], 0
    for e in range(3):
        t = 0
        loc = (rng.uniform(-5, 5), rng.uniform(-5, 5))
        for _ in range(200):
            if rng.random() < 0.1:      # jump to a new location
                loc = (rng.uniform(-5, 5), rng.uniform(-5, 5))
            t += rng.randrange(30, 400)
            pts.append((e, t, round(loc[0] + rng.uniform(-0.005, 0.005), 5),
                        round(loc[1] + rng.uniform(-0.005, 0.005), 5)))
    pts = sorted(set(pts))
    want = _py_stays(pts, max_dist=0.05, min_dur=600, gap_s=1800)
    df = spark.createDataFrame(pts, "entity int, t long, lon double, lat double")
    got = {(r.entity, r.stay_seq):
           (r.n_points, r.t_start, r.t_end, r.duration_s, r.c_lon, r.c_lat)
           for r in stay_points(df, max_dist=0.05, min_duration_s=600,
                                gap_s=1800, bucket_s=bucket_s).collect()}
    assert len(want) >= 5
    assert got == want


def test_stay_points_handcrafted(spark):
    pts = ([(1, 60 * i, 10.0 + 0.001 * (i % 2), 20.0) for i in range(30)]
           + [(1, 1800 + 300 * i, 10.0 + 0.5 * i, 20.0) for i in range(5)]
           + [(1, 4000 + 60 * i, 15.0, 25.0) for i in range(20)])
    df = spark.createDataFrame(pts, "entity int, t long, lon double, lat double")
    got = stay_points(df, max_dist=0.01, min_duration_s=500,
                      gap_s=3600, bucket_s=600).collect()
    assert len(got) == 2                       # parked, moving, parked
    stays = sorted((r.t_start, r.t_end, r.c_lat) for r in got)
    assert stays[0][0] == 0 and stays[0][2] == 20.0
    assert stays[1][2] == 25.0


def test_validation(spark):
    df = spark.createDataFrame([(1, 0, 0.0, 0.0)],
                               "entity int, t long, lon double, lat double")
    with pytest.raises(ValueError):
        segment_trips(df, gap_s=0)
    with pytest.raises(ValueError):
        stay_points(df, max_dist=0.0, min_duration_s=1)
