"""zone_transitions (temporal.geofence) vs a naive in-test python oracle."""

from __future__ import annotations

import random

from osm2geojson_lite_spark.temporal import zone_transitions


def _naive(rows: list[tuple[int, int, int | None]]) -> set[tuple]:
    """rows: (entity, t, zone) -> set of (entity, t, prev_t, prev_zone,
    zone, kind)."""
    by_e: dict[int, list] = {}
    for e, t, z in rows:
        by_e.setdefault(e, []).append((t, z))
    out = set()
    for e, pts in by_e.items():
        # (t, zone) order with None (NULL) first, matching the operator
        pts.sort(key=lambda p: (p[0], p[1] is not None, p[1]))
        prev_t, prev_z = None, None
        for i, (t, z) in enumerate(pts):
            if i == 0:
                if z is not None:
                    out.add((e, t, None, None, z, "enter"))
            elif prev_z is None and z is not None:
                out.add((e, t, prev_t, None, z, "enter"))
            elif prev_z is not None and z is None:
                out.add((e, t, prev_t, prev_z, None, "exit"))
            elif prev_z != z:
                out.add((e, t, prev_t, prev_z, z, "switch"))
            prev_t, prev_z = t, z
    return out


def _run(spark, rows, **kw) -> set[tuple]:
    df = spark.createDataFrame(rows, "entity long, t long, zone long")
    got = zone_transitions(df, **kw).collect()
    return {(r["entity"], r["t"], r["prev_t"], r["prev_zone"], r["zone"],
             r["kind"]) for r in got}


def test_enter_exit_switch_and_silence(spark):
    rows = [
        # entity 1: out -> A -> A (silent) -> B (switch) -> out -> out
        (1, 10, None), (1, 20, 7), (1, 30, 7), (1, 40, 8),
        (1, 50, None), (1, 60, None),
        # entity 2: first-ever ping inside a fence = enter with NULL prev_t
        (2, 10, 5), (2, 20, 5),
        # entity 3: never inside, never emits
        (3, 10, None), (3, 20, None),
    ]
    got = _run(spark, rows)
    assert got == {
        (1, 20, 10, None, 7, "enter"),
        (1, 40, 30, 7, 8, "switch"),
        (1, 50, 40, 8, None, "exit"),
        (2, 10, None, None, 5, "enter"),
    }
    assert got == _naive(rows)


def test_cross_bucket_carry_and_bucket_invariance(spark):
    # predecessor in a much earlier bucket, empty buckets in between
    rows = [(1, 100, 3), (1, 1_000_000, 3), (1, 2_000_000, None),
            (2, 100, None), (2, 3_000_000, 9)]
    exp = _naive(rows)
    for bucket_s in (50, 86400, 10_000_000):
        assert _run(spark, rows, bucket_s=bucket_s) == exp


def test_random_streams_match_naive_any_partitioning(spark):
    rng = random.Random(42)
    rows = []
    for e in range(12):
        t = 0
        for _ in range(60):
            t += rng.randrange(1, 40_000)
            z = rng.choice([None, None, 1, 2, 3])
            rows.append((e, t, z))
    exp = _naive(rows)
    df = spark.createDataFrame(rows, "entity long, t long, zone long")
    for parts, bucket_s in ((1, 86400), (7, 86400), (7, 3600)):
        got = zone_transitions(df.repartition(parts), bucket_s=bucket_s)
        vals = {(r["entity"], r["t"], r["prev_t"], r["prev_zone"],
                 r["zone"], r["kind"]) for r in got.collect()}
        assert vals == exp
