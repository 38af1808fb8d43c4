"""Knox space-time interaction statistic: do events that are close in
space tend to also be close in time?

The classic epidemiology / crime-analysis test (Knox 1964; Kulldorff &
Hjalmars 1999): over all unordered event pairs, count those within
``eps_s`` in space (n_s), within ``eps_t`` in time (n_t), and within
both (n_st — the Knox count), then compare n_st against the
independence expectation ``n_s * n_t / C(n, 2)``.  A ratio well above 1
means space-time clustering (contagion, serial offenders, aftershocks).

Reference scope note: tibetty/osm2geojson-lite has no analytics layer;
this extends the engine per the build brief's custom-operator list,
composing the proven pair machinery: ``colocation_join`` (one
(cell, time-bucket) equi-join) supplies the space-AND-time pairs,
``radius_join`` (cell-disk equi-join) the space pairs, and the same
3-label bucket covering the time pairs — never a cross join anywhere.

Scale shape: three bucketed self-joins, each collapsed to ONE count by a
partially-aggregated ``agg(count)`` — pair streams live only inside
executors, nothing is materialized or collected.  ``salt`` passes
through to both spatial joins for hot-cell scatter.  Exactly-once pair
counting needs no dedup shuffle: each join emits every ORDERED pair once
(the covering arguments in `colocate.py` / `range_join.py`), and the
strict ``left_id < right_id`` filter keeps exactly one direction.

Determinism: all four counts are exact integers; ``expected`` and
``knox_ratio`` are fixed short IEEE sequences over them (multiply,
divide[, divide], round 9) replayed verbatim by the oracle, so the
single output row hashes identically cross-engine.  Per-pair work uses
the identical dist2 / dt predicates as the underlying joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .colocate import colocation_join
from .range_join import radius_join, radius_res

__all__ = ["knox_statistic"]


def knox_statistic(pts: DataFrame, eps_s: float, eps_t: int, *,
                   id_col: str = "id", lon_col: str = "lon",
                   lat_col: str = "lat", ts_col: str = "t",
                   res: int | None = None,
                   salt: int | None = None) -> DataFrame:
    """-> ONE row ``(n, pairs, n_s, n_t, n_st, expected, knox_ratio)``.

    ``pts``: one row per event with a unique orderable ``id_col`` and
    integer epoch-seconds ``ts_col``.  ``pairs = C(n, 2)`` exact;
    ``expected = (n_s * n_t) / pairs`` and ``knox_ratio = n_st /
    expected`` (NULL when the expectation is 0), both ``round(, 9)``.
    """
    if eps_t <= 0:
        raise ValueError(f"eps_t must be > 0: {eps_t}")
    if res is None:
        res = radius_res(eps_s)
    base = pts.select(
        F.col(id_col).alias("id"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(ts_col).cast("long").alias("t"),
    )

    n_row = base.agg(F.count(F.lit(1)).alias("n"))

    st_row = (
        colocation_join(base, base, eps_s, eps_t,
                        left_id="id", right_id="id", l_ts="t", r_ts="t",
                        res=res, salt=salt)
        .filter(F.col("left_id") < F.col("right_id"))
        .agg(F.count(F.lit(1)).alias("n_st"))
    )

    s_row = (
        radius_join(base, base, eps_s, left_id="id", right_id="id",
                    res=res, salt=salt)
        .filter(F.col("left_id") < F.col("right_id"))
        .agg(F.count(F.lit(1)).alias("n_s"))
    )

    # time pairs: |dt| <= eps_t via the interval_join 3-label covering —
    # each right row sits in ONE bucket, each left row posts 3 distinct
    # labels, so every qualifying ordered pair joins exactly once.
    tau = int(eps_t)
    bkt = F.floor(F.col("t") / F.lit(tau))
    lt = base.select(F.col("id").alias("lid"), F.col("t").alias("lt")) \
        .withColumn("bkt", F.explode(F.array(
            F.floor(F.col("lt") / F.lit(tau)) - 1,
            F.floor(F.col("lt") / F.lit(tau)),
            F.floor(F.col("lt") / F.lit(tau)) + 1)))
    rt = base.select(F.col("id").alias("rid"), F.col("t").alias("rt"),
                     bkt.alias("bkt"))
    t_row = (
        lt.join(rt, "bkt")
        .filter((F.abs(F.col("lt") - F.col("rt")) <= F.lit(tau))
                & (F.col("lid") < F.col("rid")))
        .agg(F.count(F.lit(1)).alias("n_t"))
    )

    g = (n_row.crossJoin(st_row).crossJoin(s_row).crossJoin(t_row))
    n = F.col("n").cast("long")
    pairs = F.shiftright(n * (n - 1), 1)
    exp_raw = (F.col("n_s").cast("double") * F.col("n_t").cast("double")) \
        / pairs.cast("double")
    ratio = F.when(
        (F.col("n_s") > 0) & (F.col("n_t") > 0),
        F.round(F.col("n_st").cast("double") / exp_raw, 9),
    )
    return g.select(
        n.alias("n"),
        pairs.alias("pairs"),
        F.col("n_s").cast("long").alias("n_s"),
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_st").cast("long").alias("n_st"),
        F.when(pairs > 0, F.round(exp_raw, 9)).alias("expected"),
        ratio.alias("knox_ratio"),
    )
