"""Geofence transition detection: enter / exit / switch events from a
zone-labeled point stream.

The geofencing primitive every movement pipeline ends in (fleet ops,
contact tracing, location-based alerting): given pings already labeled
with the zone they fall in (NULL = outside every fence), emit one row per
*boundary crossing* — the ping where an entity's zone differs from its
time-predecessor's.  Labeling is deliberately NOT part of this operator:
the engine already has three fence shapes that produce the label column
(`spatial.pip_join` for polygon fences, `spatial.raster_assign` for tile
fences, a broadcast containment join for rectangles), and any of them
composes in front.

Reference scope note: tibetty/osm2geojson-lite has no analytics layer;
this extends the engine per the build brief's custom-operator list as
the event-detection face of the trajectory family
(`temporal.trajectory`).

Scale shape: the same two bounded phases as ``clean_track``
(`trajectory.py:279`) — a lag window per (entity, time-bucket) whose
input is bounded by one bucket's pings (never a whole hot entity), plus
the tiny per-(entity, bucket) edge table, where each bucket's *last*
(t, zone) is carried to the next nonempty bucket's first row via a
per-entity window over bucket ids (≤ span/bucket_s rows per entity),
broadcast back.  Output is IDENTICAL at any ``bucket_s``.

Determinism: order within an entity is ``(t, zone)`` — ties between
simultaneous pings in different zones resolve by zone id, the same
total-order trick as ``clean_track``'s ``(t, lon, lat)``.  Every output
column is an exact integer / string, so the whole operator replays in
ANSI SQL with no float recipe at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["zone_transitions"]


def zone_transitions(labeled: DataFrame, *, entity_col: str = "entity",
                     ts_col: str = "t", zone_col: str = "zone",
                     bucket_s: int = 86400) -> DataFrame:
    """-> ``(entity, t, prev_t, prev_zone, zone, kind)`` — one row per
    zone boundary crossing.

    ``labeled``: one row per ping with an integer epoch-seconds ``ts_col``
    and a ``zone_col`` that is NULL outside every fence.  ``kind`` is
    ``enter`` (NULL/none -> zone, including an entity's first-ever ping
    inside a fence), ``exit`` (zone -> NULL), or ``switch`` (zone ->
    different zone).  Pings whose zone equals their predecessor's (both
    NULL included) emit nothing; ``prev_t`` is NULL only on first-ever
    pings.
    """
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    e, t, z = F.col(entity_col), F.col(ts_col).cast("long"), F.col(zone_col)
    base = labeled.select(
        e.alias("entity"), t.alias("t"), z.alias("zone"),
        F.floor(t / F.lit(bucket_s)).alias("b"),
    )

    wl = Window.partitionBy("entity", "b").orderBy("t", "zone")
    prev_t = F.lag("t").over(wl)
    local = base.select(
        "*",
        prev_t.isNull().alias("is_bucket_first"),
        prev_t.alias("local_prev_t"),
        F.lag("zone").over(wl).alias("local_prev_zone"),
        # lag() yields NULL both for "no predecessor" and "predecessor's
        # zone is NULL" — a real flag disambiguates for the first row only
        # (within a bucket every non-first row HAS a predecessor).
    )

    # Last (t, zone) per (entity, bucket); max(struct) picks the same row
    # as the window's (t, zone) order.  NULL zones sort before non-NULL in
    # struct comparison, which is fine: the max is taken over (t, zone)
    # with t dominating, and within a t-tie the window order and struct
    # order agree (both put NULL-zone rows first, larger zone last).
    edges = local.groupBy("entity", "b").agg(
        F.max(F.struct("t", "zone")).alias("last_pt"),
    )
    we = Window.partitionBy("entity").orderBy("b")
    prev_last = F.lag("last_pt").over(we)
    edges = edges.select(
        "entity", "b",
        prev_last["t"].alias("cross_prev_t"),
        prev_last["zone"].alias("cross_prev_zone"),
    )

    out = local.join(F.broadcast(edges), ["entity", "b"])
    first = F.col("is_bucket_first")
    prev_zone = F.when(first, F.col("cross_prev_zone")) \
                 .otherwise(F.col("local_prev_zone"))
    prev_ts = F.when(first, F.col("cross_prev_t")) \
               .otherwise(F.col("local_prev_t"))
    kind = (
        F.when(prev_zone.isNull() & F.col("zone").isNotNull(), F.lit("enter"))
        .when(prev_zone.isNotNull() & F.col("zone").isNull(), F.lit("exit"))
        .when(~prev_zone.eqNullSafe(F.col("zone")), F.lit("switch"))
    )
    return out.filter(kind.isNotNull()).select(
        "entity", "t",
        prev_ts.cast("long").alias("prev_t"),
        prev_zone.alias("prev_zone"),
        "zone",
        kind.alias("kind"),
    )
