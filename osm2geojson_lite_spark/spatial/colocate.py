"""Spatio-temporal co-location join (X30): all (left, right) pairs that
were in the SAME PLACE at the SAME TIME — within ``radius`` planar
degrees AND within ``tau_s`` seconds.  The contact-tracing / rendezvous
/ co-movement primitive (Sedona's ST_DWithin + time-band pattern), and
the spatial face of `temporal.interval_join`.

Reference scope note: tibetty/osm2geojson-lite has no join surface at
all; this composes the engine's two proven prefilters.

Shape — ONE equi-join on the composite (cell, time-bucket) key, never a
cross join, and exactly-once by construction:

- left explodes to its ring-1 3x3 cell disk at a resolution whose cell
  extent >= ``radius`` (the `range_join` covering argument), each copy
  tagged with the row's own tau-width time bucket;
- right explodes to THREE bucket labels (its bucket +-1) on its single
  cell, covering every |dt| <= tau partner (the `temporal.interval_join`
  covering argument);
- the (cell, bucket) equi-join + exact refine on both predicates.

Each qualifying pair appears exactly once: a right point lies in ONE
cell and only ONE of its three bucket copies equals the left row's own
bucket, while the left row's nine disk cells are distinct — so there is
no dedup shuffle at any scale.  ``dt_s`` is exact integer seconds;
``dist2`` is the same explicit-product IEEE sequence as `radius_join`,
so the whole output replays in ANSI SQL.  ``salt`` scatters hot
(cell, bucket) keys exactly like `radius_join` (a stadium at full time:
one key holding a city's worth of pings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cells import cell_col, cell_size_deg, neighbor_cells_col
from .range_join import radius_res


def colocation_join(left: DataFrame, right: DataFrame, radius: float,
                    tau_s: int, *,
                    left_id: str = "left_id", right_id: str = "right_id",
                    l_lon: str = "lon", l_lat: str = "lat", l_ts: str = "ts",
                    r_lon: str = "lon", r_lat: str = "lat", r_ts: str = "ts",
                    res: int | None = None, include_self: bool = True,
                    salt: int | None = None) -> DataFrame:
    """-> (left_id, right_id, dist2, dt_s) for every pair with planar
    distance <= ``radius`` and |ts_l - ts_r| <= ``tau_s``.

    Timestamps are integer epoch seconds (cast to bigint — pass
    ``unix_timestamp(...)`` for timestamp columns) so the time predicate
    and ``dt_s = ts_l - ts_r`` are exact at any parallelism.
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
        F.col(l_ts).cast("long").alias("lts"),
    ).withColumns({
        "cell": F.explode(neighbor_cells_col(
            cell_col(F.col("llon"), F.col("llat"), res), res, ring=1)),
        "bkt": F.floor(F.col("lts") / F.lit(tau)),
    })
    r = right.select(
        F.col(right_id).alias("right_id"),
        F.col(r_lon).cast("double").alias("rlon"),
        F.col(r_lat).cast("double").alias("rlat"),
        F.col(r_ts).cast("long").alias("rts"),
    ).withColumns({
        "cell": cell_col(F.col("rlon"), F.col("rlat"), res),
        "bkt": F.explode(F.array(
            F.floor(F.col("rts") / F.lit(tau)) - 1,
            F.floor(F.col("rts") / F.lit(tau)),
            F.floor(F.col("rts") / F.lit(tau)) + 1)),
    })

    if salt and salt > 1:
        r = r.withColumn("_s", F.pmod(F.xxhash64("right_id"), F.lit(salt)))
        l = l.withColumn(
            "_s", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        keys = ["cell", "bkt", "_s"]
    else:
        keys = ["cell", "bkt"]

    dx = F.col("llon") - F.col("rlon")
    dy = F.col("llat") - F.col("rlat")
    dist2 = dx * dx + dy * dy
    out = (
        l.join(r, keys, "inner")
        .select("left_id", "right_id", dist2.alias("dist2"),
                (F.col("lts") - F.col("rts")).alias("dt_s"))
        .filter((F.col("dist2") <= F.lit(float(radius)) * F.lit(float(radius)))
                & (F.abs(F.col("dt_s")) <= F.lit(tau)))
    )
    if not include_self:
        out = out.filter(F.col("left_id") != F.col("right_id"))
    return out
