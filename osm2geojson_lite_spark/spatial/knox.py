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

Scale shape: the space-AND-time leg is one bucketed self-join collapsed
to a count; the space-only and time-only legs pre-aggregate to
distinct-location / distinct-timestamp COUNT tables and pair those, so
their join inputs are |distinct (lon,lat)| and |distinct t| rows rather
than n — the exact counts come out of product/choose sums (event ids
are unique, so unordered event pairs = Σ c·c' + Σ C(c,2)).  Pair
streams live only inside executors, nothing is materialized or
collected.  ``salt`` passes through to both spatial joins for hot-cell
scatter.  Exactly-once pair counting needs no dedup shuffle: each join
emits every ORDERED pair once (the covering arguments in `colocate.py`
/ `range_join.py`), and a strict ``<`` on the id / packed location
struct / timestamp keeps exactly one direction.

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

    # space pairs: the SAME exact count, computed over the distinct-
    # location count table instead of one row per event.  Every event id
    # is unique, so the number of unordered event pairs within eps_s is
    #   n_s = Σ c·c' over unordered distinct-location pairs within eps_s
    #       + Σ C(c,2) over locations (same-point pairs, dist 0)
    # and the pair join's input shrinks from n rows to |distinct
    # (lon,lat)| rows — event corpora pile thousands of events onto few
    # snapped coordinates, and at 100x scale the event-level self-join is
    # quadratic per hot cell while the location table saturates.  The
    # location struct packs its count so the strict `<` keeps exactly one
    # direction per pair (lexicographic on (lon, lat); distinct, so the
    # count field never breaks a tie).  The same-location leg guards with
    # the self-distance predicate so NaN/Inf coordinates stay excluded
    # exactly as the event-level dist2 filter excluded them.
    eps2 = F.lit(float(eps_s)) * F.lit(float(eps_s))
    loc = (base.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
           .groupBy("lon", "lat").agg(F.count(F.lit(1)).alias("c")))
    loc_k = loc.select(F.struct("lon", "lat", "c").alias("k"), "lon", "lat")
    s_cross = (
        radius_join(loc_k, loc_k, eps_s, left_id="k", right_id="k",
                    res=res, salt=salt)
        .filter(F.col("left_id") < F.col("right_id"))
        .agg(F.sum(F.col("left_id")["c"] * F.col("right_id")["c"]).alias("sx"))
    )
    self_d2 = ((F.col("lon") - F.col("lon")) * (F.col("lon") - F.col("lon"))
               + (F.col("lat") - F.col("lat")) * (F.col("lat") - F.col("lat")))
    s_diag = (
        loc.filter(self_d2 <= eps2)
        .agg(F.sum(F.shiftright(F.col("c") * (F.col("c") - 1), 1)).alias("sy"))
    )
    s_row = s_cross.crossJoin(s_diag).select(
        (F.coalesce(F.col("sx"), F.lit(0))
         + F.coalesce(F.col("sy"), F.lit(0))).alias("n_s"))

    # time pairs: |dt| <= eps_t via the interval_join 3-label covering,
    # applied to the per-distinct-timestamp COUNT table — n_t = Σ c_t·c_t'
    # over t < t' with t'-t <= tau, plus Σ C(c_t,2) same-timestamp pairs.
    # Identical to the event-level bucket join (event ids are unique, so
    # unordered event pairs = the product/choose sums), but the join input
    # is |distinct t| rows: the event-level form funneled one τ-window's
    # events worldwide through a single bucket key (no spatial component
    # to spread it), a per-bucket quadratic at scale.
    tau = int(eps_t)
    cnt_t = (base.filter(F.col("t").isNotNull())
             .groupBy("t").agg(F.count(F.lit(1)).alias("c")))
    lt = cnt_t.select(F.col("t").alias("lt"), F.col("c").alias("lc")) \
        .withColumn("bkt", F.explode(F.array(
            F.floor(F.col("lt") / F.lit(tau)) - 1,
            F.floor(F.col("lt") / F.lit(tau)),
            F.floor(F.col("lt") / F.lit(tau)) + 1)))
    rt = cnt_t.select(F.col("t").alias("rt"), F.col("c").alias("rc"),
                      F.floor(F.col("t") / F.lit(tau)).alias("bkt"))
    t_cross = (
        lt.join(rt, "bkt")
        .filter((F.col("rt") > F.col("lt"))
                & (F.col("rt") - F.col("lt") <= F.lit(tau)))
        .agg(F.sum(F.col("lc") * F.col("rc")).alias("tx"))
    )
    t_diag = cnt_t.agg(
        F.sum(F.shiftright(F.col("c") * (F.col("c") - 1), 1)).alias("ty"))
    t_row = t_cross.crossJoin(t_diag).select(
        (F.coalesce(F.col("tx"), F.lit(0))
         + F.coalesce(F.col("ty"), F.lit(0))).alias("n_t"))

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
