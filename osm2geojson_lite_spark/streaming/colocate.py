"""Streaming spatio-temporal co-location: the continuous face of
``spatial.colocation_join`` (X30) — "who is near whom RIGHT NOW" over two
live point streams (fleet proximity alerts, contact tracing, rendezvous
detection).

Reference scope note: tibetty/osm2geojson-lite has no streaming or join
surface (`src/index.ts` emits GeoJSON from one finite payload); this
extends the engine per the build brief's streaming surface.

Spark-first: the batch operator buckets the TIME axis by hand (bucket ± 1
covering) because a batch join needs a finite equi-key; a stream-stream
inner join with a time-range condition is the engine-native replacement —
Structured Streaming derives the state horizon FROM the range condition
plus the watermarks, so each side's state is (arrival rate × τ), evicted
automatically, independent of stream lifetime.  The SPACE axis keeps the
exact batch covering: the left stream explodes to its ring-1 3×3 cell disk
at a resolution whose cell extent ≥ ``radius`` and the right stream keeps
its single home cell, so cell equality is a strict superset of the radius
predicate and the exact ``dist2`` refine rides the join output.

Exactly-once by construction, same argument as batch minus the buckets: a
right point lives in ONE cell and the left row's nine disk cells are
distinct, so a qualifying pair meets on exactly one key — no dedup state.

Parity contract: over the same finite input (one ``availableNow``
micro-batch), the emitted pair set equals the batch
``colocation_join(...)`` output — pinned by
``tests/test_streaming_colocate.py``.  In continuous operation rows later
than ``watermark`` may be dropped by the state store: the standard
streaming correctness/liveness trade, same note as
``stream_interval_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..spatial.cells import cell_col, cell_size_deg, neighbor_cells_col
from ..spatial.range_join import radius_res


def stream_colocation_pairs(left: DataFrame, right: DataFrame,
                            radius: float, tau_s: int, *,
                            left_id: str = "left_id",
                            right_id: str = "right_id",
                            l_lon: str = "lon", l_lat: str = "lat",
                            l_ts: str = "ts",
                            r_lon: str = "lon", r_lat: str = "lat",
                            r_ts: str = "ts",
                            res: int | None = None,
                            include_self: bool = True,
                            watermark: str = "1 hour") -> DataFrame:
    """-> streaming (left_id, right_id, dist2, dt_s) for every pair with
    planar distance <= ``radius`` and |ts_l - ts_r| <= ``tau_s``.

    Both inputs are streaming DataFrames with event-time TIMESTAMP columns
    (``l_ts`` / ``r_ts``); ``dt_s`` is exact integer seconds (truncated
    epoch difference, identical to the batch operator's long cast) and
    ``dist2`` replays the batch IEEE product sequence, so the parity test
    compares values, not just pair identity.  ``watermark`` must be >= the
    lateness you want tolerated; state per side is bounded by
    (arrival rate x (tau_s + watermark)).
    """
    if tau_s <= 0:
        raise ValueError(f"tau_s must be > 0: {tau_s}")
    if res is None:
        res = radius_res(radius)
    if not cell_size_deg(res) >= radius:
        raise ValueError(
            f"res={res} cells ({cell_size_deg(res)} deg) are smaller than "
            f"radius={radius}; the 3x3 disk would miss pairs")

    tau = int(tau_s)
    l = left.select(
        F.col(left_id).alias("left_id"),
        F.col(l_lon).cast("double").alias("llon"),
        F.col(l_lat).cast("double").alias("llat"),
        F.col(l_ts).alias("lts"),
    ).withColumn("cell", F.explode(neighbor_cells_col(
        cell_col(F.col("llon"), F.col("llat"), res), res, ring=1)),
    ).withWatermark("lts", watermark)
    r = right.select(
        F.col(right_id).alias("right_id"),
        F.col(r_lon).cast("double").alias("rlon"),
        F.col(r_lat).cast("double").alias("rlat"),
        F.col(r_ts).alias("rts"),
    ).withColumn(
        "cell", cell_col(F.col("rlon"), F.col("rlat"), res),
    ).withWatermark("rts", watermark)

    # band is tau + 1 s: dt_s below is a TRUNCATED-epoch difference (the
    # batch operator's long cast), and floor(a) - floor(b) can exceed the
    # raw a - b by up to 1 s — the widened range keeps the join a strict
    # superset and the exact |dt_s| <= tau refine below decides membership
    band = (
        (r["rts"] >= l["lts"] - F.expr(f"INTERVAL {tau + 1} SECOND"))
        & (r["rts"] <= l["lts"] + F.expr(f"INTERVAL {tau + 1} SECOND"))
    )
    joined = l.join(r, (l["cell"] == r["cell"]) & band, "inner")

    dx = F.col("llon") - F.col("rlon")
    dy = F.col("llat") - F.col("rlat")
    dist2 = dx * dx + dy * dy
    out = (
        joined.select(
            "left_id", "right_id", dist2.alias("dist2"),
            (F.col("lts").cast("long")
             - F.col("rts").cast("long")).alias("dt_s"),
        )
        .filter((F.col("dist2") <= F.lit(float(radius)) * F.lit(float(radius)))
                & (F.abs(F.col("dt_s")) <= F.lit(tau)))
    )
    if not include_self:
        out = out.filter(F.col("left_id") != F.col("right_id"))
    return out
