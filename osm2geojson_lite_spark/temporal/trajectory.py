"""Trajectory segmentation and per-trip statistics.

Reference scope note: tibetty/osm2geojson-lite has no trajectory
operators; this extends the engine for the movement-data shape a
large-scale geospatial event pipeline needs (GPS pings → trips), per the
build brief's custom-operator list.  It composes the repo's two existing
primitives: gap-based sessionization (``events_sessionize``) and exact
planar geometry measures (``spatial/geomstats.py``).

Semantics: points of one entity, ordered by time, split into *trips*
wherever the time gap between consecutive points exceeds ``gap_s``.  Per
trip: point count, time span, path length (sum of consecutive-point
distances), net displacement (first→last point), and straightness
(displacement / path length — 1.0 is a straight line, → 0 is wandering).

Scale shape — the naive form is one ``lag`` window over
``partitionBy(entity)``: a hot entity (one fleet vehicle's multi-year
history) funnels through a single task.  Like ``temporal/asof.py``, the
implementation is bounded phases instead:

1. per ``(entity, time-bucket)`` local window — bounded by the bucket,
   not the entity; computes in-bucket gap flags, in-bucket legs, and a
   per-bucket local trip index;
2. a per-``(entity, bucket)`` EDGE table (first/last point + local trip
   count per bucket — 1 row per nonempty bucket) carries trip continuity
   across buckets with one tiny window over buckets, the asof-join
   carry-in pattern: the global predecessor of a bucket's first point is
   exactly the previous nonempty bucket's last point;
3. the edge table's exclusive prefix sum of trip starts converts local
   trip indices to global per-entity trip ids, broadcast-joined back.

Bucket width is a latency/size knob only — output is IDENTICAL at any
``bucket_s`` (pinned by tests), because phase 2 uses the previous
*nonempty* bucket regardless of adjacency.

Float determinism (repo-wide rules): legs are ``round(sqrt(dx²+dy²), 9)``
(IEEE sqrt is correctly rounded), path length folds the ``array_sort``-ed
leg list, finals round to 6 dp — bit-identical at any partitioning and in
any IEEE-754 engine, so the DuckDB oracle replays trips byte-for-byte.

Distances are planar in the coordinates' own units (degrees here, meters
for projected input).  Great-circle distance is intentionally NOT used:
libm trig is not cross-engine reproducible, and for trip-relative measures
(straightness, relative lengths) the planar metric is monotone-equivalent
at trip scale away from the poles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["clean_track", "segment_trips", "trip_stats", "od_matrix",
           "stay_points"]


def _dist(x0: Column, y0: Column, x1: Column, y1: Column) -> Column:
    dx = x1.cast("double") - x0.cast("double")
    dy = y1.cast("double") - y0.cast("double")
    return F.round(F.sqrt(dx * dx + dy * dy), 9)


def segment_trips(pts: DataFrame, *, entity_col: str = "entity",
                  ts_col: str = "t", lon_col: str = "lon",
                  lat_col: str = "lat", gap_s: int = 3600,
                  bucket_s: int = 86400,
                  max_leg: float | None = None) -> DataFrame:
    """Label every point with its per-entity trip id.

    Output: ``(entity, t, lon, lat, trip_seq, leg)`` — ``trip_seq`` is
    1-based in time order per entity; ``leg`` is the distance from the
    point's in-trip predecessor (NULL on each trip's first point).

    A new trip starts when the time gap exceeds ``gap_s`` OR (when
    ``max_leg`` is set) the distance from the predecessor exceeds
    ``max_leg`` — the movement-split mode ``stay_points`` builds on
    (``max_leg=None`` preserves pure gap segmentation exactly).

    Order within an entity is ``(t, lon, lat)`` — the coordinate tiebreak
    makes simultaneous pings deterministic at any partitioning.
    """
    if gap_s <= 0 or bucket_s <= 0:
        raise ValueError("gap_s and bucket_s must be positive")
    e, t = F.col(entity_col), F.col(ts_col).cast("long")
    base = pts.select(
        e.alias("entity"), t.alias("t"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
        F.floor(t / F.lit(bucket_s)).alias("b"),
    )

    # phase 1: bucket-local window (bounded by bucket_s worth of points)
    wl = Window.partitionBy("entity", "b").orderBy("t", "lon", "lat")
    prev_t = F.lag("t").over(wl)
    raw_leg = _dist(F.lag("lon").over(wl), F.lag("lat").over(wl),
                    F.col("lon"), F.col("lat"))
    brk = prev_t.isNull() | (F.col("t") - prev_t > gap_s)
    if max_leg is not None:
        brk = brk | (raw_leg > F.lit(float(max_leg)))
    local = base.select(
        "*",
        F.when(brk, 1).otherwise(0).alias("local_new"),
        F.when(~brk & prev_t.isNotNull(), raw_leg).alias("local_leg"),
    ).withColumn(
        "local_idx",
        F.sum("local_new").over(
            wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )

    # phase 2: per-(entity, bucket) edge table — first/last point + local
    # trip count; one row per NONEMPTY bucket, so the per-entity window
    # below is over buckets (tiny), never over points
    edges = local.groupBy("entity", "b").agg(
        F.min(F.struct("t", "lon", "lat")).alias("first_pt"),
        F.max(F.struct("t", "lon", "lat")).alias("last_pt"),
        F.sum("local_new").alias("n_local_trips"),
    )
    we = Window.partitionBy("entity").orderBy("b")
    prev_last = F.lag("last_pt").over(we)
    cross_gap_ok = (prev_last.isNotNull()
                    & (F.col("first_pt.t") - prev_last["t"] <= gap_s))
    cross_leg = _dist(prev_last["lon"], prev_last["lat"],
                      F.col("first_pt.lon"), F.col("first_pt.lat"))
    joins = cross_gap_ok
    if max_leg is not None:
        joins = joins & (cross_leg <= F.lit(float(max_leg)))
    edges = edges.select(
        "entity", "b", "n_local_trips",
        joins.alias("joins_prev"),
        F.when(joins, cross_leg).alias("crossing_leg"),
    ).withColumn(
        "trips_before",
        F.coalesce(
            F.sum(F.col("n_local_trips")
                  - F.when(F.col("joins_prev"), 1).otherwise(0)).over(
                we.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)),
    )

    # phase 3: broadcast the tiny edge table back onto the points
    out = local.join(F.broadcast(edges), ["entity", "b"])
    is_bucket_first = F.col("local_idx") == 1  # row with NULL local lag
    return out.select(
        "entity", "t", "lon", "lat",
        (F.col("trips_before") + F.col("local_idx")
         - F.when(F.col("joins_prev"), 1).otherwise(0))
        .cast("bigint").alias("trip_seq"),
        F.when(is_bucket_first & F.col("joins_prev")
               & (F.col("local_new") == 1), F.col("crossing_leg"))
         .otherwise(F.col("local_leg")).alias("leg"),
    )


def trip_stats(trips: DataFrame) -> DataFrame:
    """Per-trip aggregates over ``segment_trips`` output.

    ``(entity, trip_seq, n_points, t_start, t_end, duration_s, path_len,
    displacement, straightness)`` — one partial+final aggregation; the
    path length folds the sorted leg list (engine-/order-independent),
    displacement uses the struct-min/max endpoints under the same
    ``(t, lon, lat)`` order the segmentation used.
    """
    legs = F.array_sort(F.collect_list("leg"))
    first_pt = F.min(F.struct("t", "lon", "lat"))
    last_pt = F.max(F.struct("t", "lon", "lat"))
    agg = trips.groupBy("entity", "trip_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min("t").alias("t_start"),
        F.max("t").alias("t_end"),
        F.aggregate(legs, F.lit(0.0), lambda a, x: a + x).alias("_path"),
        first_pt.alias("_first"),
        last_pt.alias("_last"),
    )
    disp = _dist(F.col("_first.lon"), F.col("_first.lat"),
                 F.col("_last.lon"), F.col("_last.lat"))
    path = F.round(F.col("_path"), 6)
    return agg.select(
        "entity", "trip_seq", "n_points",
        "t_start", "t_end",
        (F.col("t_end") - F.col("t_start")).cast("bigint")
        .alias("duration_s"),
        path.alias("path_len"),
        disp.alias("displacement"),
        F.when(path > 0, F.round(disp / path, 6)).alias("straightness"),
    )


def stay_points(pts: DataFrame, *, max_dist: float, min_duration_s: int,
                gap_s: int = 3600, bucket_s: int = 86400,
                entity_col: str = "entity", ts_col: str = "t",
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Dwell detection: maximal runs of consecutive pings that stay put.

    A run continues while the step to the next ping is ``<= max_dist``
    AND the time gap is ``<= gap_s``; runs lasting ``>= min_duration_s``
    are stays (Li et al. 2008 stay-point semantics with the
    consecutive-step criterion, which distributes).  Output per stay:
    ``(entity, stay_seq, n_points, t_start, t_end, duration_s, c_lon,
    c_lat)`` with the centroid as index-independent sorted-fold means
    rounded to 9 dp.

    Rides the same bounded bucket phases as ``segment_trips`` (movement
    split = the ``max_leg`` mode), so a parked fleet vehicle emitting
    pings for a year never funnels through one window task.
    """
    if max_dist <= 0 or min_duration_s < 0:
        raise ValueError("max_dist must be positive, min_duration_s >= 0")
    runs = segment_trips(
        pts, entity_col=entity_col, ts_col=ts_col, lon_col=lon_col,
        lat_col=lat_col, gap_s=gap_s, bucket_s=bucket_s, max_leg=max_dist)
    n = F.count(F.lit(1)).cast("bigint")
    agg = runs.groupBy("entity", F.col("trip_seq").alias("stay_seq")).agg(
        n.alias("n_points"),
        F.min("t").alias("t_start"),
        F.max("t").alias("t_end"),
        F.aggregate(F.array_sort(F.collect_list("lon")), F.lit(0.0),
                    lambda a, x: a + x).alias("_slon"),
        F.aggregate(F.array_sort(F.collect_list("lat")), F.lit(0.0),
                    lambda a, x: a + x).alias("_slat"),
    )
    dur = (F.col("t_end") - F.col("t_start")).cast("bigint")
    return agg.filter(dur >= min_duration_s).select(
        "entity", "stay_seq", "n_points", "t_start", "t_end",
        dur.alias("duration_s"),
        F.round(F.col("_slon") / F.col("n_points"), 9).alias("c_lon"),
        F.round(F.col("_slat") / F.col("n_points"), 9).alias("c_lat"),
    )


def od_matrix(trips: DataFrame, *, res: int = 8) -> DataFrame:
    """Origin-destination flow matrix over ``segment_trips`` output.

    ``(o_cell, d_cell, n_trips)`` — each trip contributes one flow from
    the grid cell of its first point to the cell of its last point (the
    transit-planning rollup).  Two partial+final aggregations and nothing
    else: trip endpoints shrink each trip to one row map-side before the
    per-trip shuffle, and the flow count combines map-side before the
    per-cell-pair shuffle — no window, no join, no funnel.  Cell ids are
    the rational-arithmetic grid of ``spatial/cells.py``, so the oracle
    replays them exactly.
    """
    from ..spatial.cells import cell_col

    ends = trips.groupBy("entity", "trip_seq").agg(
        F.min(F.struct("t", "lon", "lat")).alias("_o"),
        F.max(F.struct("t", "lon", "lat")).alias("_d"),
    )
    return (
        ends.select(
            cell_col(F.col("_o.lon"), F.col("_o.lat"), res).alias("o_cell"),
            cell_col(F.col("_d.lon"), F.col("_d.lat"), res).alias("d_cell"),
        )
        .groupBy("o_cell", "d_cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trips"))
    )


def clean_track(pts: DataFrame, *, entity_col: str = "entity",
                ts_col: str = "t", lon_col: str = "lon",
                lat_col: str = "lat", max_speed: float,
                bucket_s: int = 86400) -> DataFrame:
    """Per-point kinematics + implausible-jump flags — the GPS-cleaning
    pass a movement pipeline runs BEFORE trips/stays/OD: flag "teleports"
    (speed from the time-predecessor exceeding ``max_speed`` units/s, or
    a zero-time jump to a different place) so downstream ops can drop or
    down-weight them.

    Output: ``(entity, t, lon, lat, dt_s, leg, speed, is_teleport)`` —
    ``dt_s`` exact integer seconds from the predecessor, ``leg`` the
    planar distance (``round(sqrt, 9)``), ``speed = round(leg/dt_s, 9)``
    (NULL when ``dt_s`` is 0 or on each entity's first point).  Flags are
    AGAINST THE RAW PREDECESSOR by design: re-linking after a drop is a
    sequential chain (each verdict depends on the previous one), which
    neither distributes nor replays in SQL — callers wanting it iterate
    ``clean_track`` + filter to a fixed point (2 passes catch the
    overwhelmingly common lone-spike case).

    Scale shape: the same two bounded phases as ``segment_trips`` — an
    in-bucket lag window (bounded by ``bucket_s`` worth of points, never
    a whole hot entity) plus the per-(entity, bucket) edge table whose
    previous *nonempty* bucket's last point supplies each bucket-first
    row's predecessor, broadcast back.  Output is IDENTICAL at any
    ``bucket_s`` (pinned by tests).  Order within an entity is
    ``(t, lon, lat)`` — deterministic under simultaneous pings.
    """
    if max_speed <= 0 or bucket_s <= 0:
        raise ValueError("max_speed and bucket_s must be positive")
    e, t = F.col(entity_col), F.col(ts_col).cast("long")
    base = pts.select(
        e.alias("entity"), t.alias("t"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
        F.floor(t / F.lit(bucket_s)).alias("b"),
    )

    wl = Window.partitionBy("entity", "b").orderBy("t", "lon", "lat")
    prev_t = F.lag("t").over(wl)
    local = base.select(
        "*",
        prev_t.isNull().alias("is_bucket_first"),
        (F.col("t") - prev_t).alias("local_dt"),
        _dist(F.lag("lon").over(wl), F.lag("lat").over(wl),
              F.col("lon"), F.col("lat")).alias("local_leg"),
    )

    edges = local.groupBy("entity", "b").agg(
        F.min(F.struct("t", "lon", "lat")).alias("first_pt"),
        F.max(F.struct("t", "lon", "lat")).alias("last_pt"),
    )
    we = Window.partitionBy("entity").orderBy("b")
    prev_last = F.lag("last_pt").over(we)
    edges = edges.select(
        "entity", "b",
        (F.col("first_pt.t") - prev_last["t"]).alias("cross_dt"),
        F.when(prev_last.isNotNull(),
               _dist(prev_last["lon"], prev_last["lat"],
                     F.col("first_pt.lon"), F.col("first_pt.lat")))
         .alias("cross_leg"),
    )

    out = local.join(F.broadcast(edges), ["entity", "b"])
    dt = F.when(F.col("is_bucket_first"), F.col("cross_dt")) \
          .otherwise(F.col("local_dt"))
    leg = F.when(F.col("is_bucket_first"), F.col("cross_leg")) \
           .otherwise(F.col("local_leg"))
    speed = F.when(dt > 0, F.round(leg / dt.cast("double"), 9))
    teleport = F.coalesce(
        ((dt == 0) & (leg > 0)) | (speed > F.lit(float(max_speed))),
        F.lit(False))
    return out.select(
        "entity", "t", "lon", "lat",
        dt.cast("bigint").alias("dt_s"),
        leg.alias("leg"),
        speed.alias("speed"),
        teleport.alias("is_teleport"),
    )
