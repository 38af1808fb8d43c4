"""As-of join and bounded interval join over numeric time columns.

Reference scope note: tibetty/osm2geojson-lite has no temporal operators;
these extend the engine for the time-series shapes a large-scale event /
training-data pipeline needs (sessionized telemetry, feature back-fill,
point-in-time-correct joins), per the build brief's custom-operator list.

Both operators avoid the two naive shapes that break at 100 TB:

* a per-key unbounded window (``row_number`` over every event of one hot
  user funnels that user's entire history through one task), and
* a key-only equi-join followed by a time filter (a hot key joins ALL its
  left rows to ALL its right rows before filtering — quadratic in the hot
  key's row count).

Instead both bucket time into a fixed grid so every shuffle partition key
is ``(join_key, time_bucket)`` and the per-task row count is bounded by
the grid, not by the hottest key.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def _keys(on: str | list[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _span_bounds(left: DataFrame, right: DataFrame,
                 tcol: str = "__t") -> tuple[float | None, float | None]:
    """Global [min, max] of ``tcol`` across both inputs — one tiny
    two-row-in, one-row-out aggregation (the same bounded driver fetch
    ``spatial/range_join.py`` uses for its auto resolution)."""
    row = (
        left.select(F.min(tcol).alias("mn"), F.max(tcol).alias("mx"))
        .unionAll(right.select(F.min(tcol).alias("mn"),
                               F.max(tcol).alias("mx")))
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .collect()[0]
    )
    return row["mn"], row["mx"]


def asof_join(left: DataFrame, right: DataFrame, *, on: str | list[str],
              left_time: str, right_time: str, right_values: list[str],
              direction: str = "backward",
              tolerance: int | float | None = None,
              num_buckets: int = 256, suffix: str = "_r") -> DataFrame:
    """Point-in-time-correct join: for every left row, the single right
    row with the same key and the greatest ``right_time`` at or before
    ``left_time`` (``direction="backward"``; ``"forward"`` mirrors to the
    smallest at-or-after).  Left rows with no match keep null match
    columns (``pandas.merge_asof`` semantics).

    ``left_time`` / ``right_time`` must be numeric (use ``unix_micros()``
    for timestamps — exact integer arithmetic).  ``right_values`` names
    the right columns to carry; ties on ``right_time`` are broken by the
    greatest ``right_values`` tuple (lexicographic), so the first entry
    should be a unique id for fully deterministic output.  ``tolerance``
    (same unit as the time columns) nulls out matches further than that
    from the left row.

    Scale shape (three bounded phases, no per-key funnel):

    1. Per ``(key, bucket)`` best right row — ``groupBy().agg(max(struct))``,
       map-side combinable, so 10^8 copies of one hot key shrink to one
       row per bucket before the shuffle.
    2. Carry-in per bucket — a running ``max`` window over the TINY
       per-key bucket table (at most ``num_buckets`` rows per key).
    3. In-bucket scan — left and right rows of one ``(key, bucket)`` cell
       union-sorted by time with a running ``max(struct)``; partition size
       is bounded by the grid, and at larger scale ``num_buckets`` (or an
       explicit finer grid) bounds it further.  The final match is
       ``coalesce(in-bucket best, carry-in)`` — an in-bucket hit always
       out-times the carry because buckets partition the time axis.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if not right_values:
        raise ValueError("right_values must name at least one column "
                         "(the first is the deterministic tie-breaker)")
    keys = _keys(on)
    sign = 1 if direction == "backward" else -1
    lcols = left.columns

    left2 = left.withColumn("__t", F.col(left_time) * F.lit(sign))
    right2 = right.select(
        *keys,
        (F.col(right_time) * F.lit(sign)).alias("__t"),
        F.struct(
            (F.col(right_time) * F.lit(sign)).alias("t"),
            *[F.col(c).alias(c) for c in right_values],
        ).alias("__rs"),
    )

    mn, mx = _span_bounds(left2, right2)
    if mn is None:  # both sides empty
        width = 1.0
        mn = 0
    else:
        width = max((mx - mn) / float(num_buckets), 1e-9)
    bucket = F.floor((F.col("__t") - F.lit(mn)) / F.lit(width))

    # Phase 1: per-(key, bucket) best right row (partial-aggregable).
    rbest = (
        right2.withColumn("__b", bucket)
        .groupBy(*keys, "__b")
        .agg(F.max("__rs").alias("__best"))
    )

    # Phase 2: carry-in = best right row from any STRICTLY earlier bucket,
    # over the union of buckets either side touches (gaps are fine: the
    # running max skips them).  ≤ num_buckets rows per key.
    lbk = left2.withColumn("__b", bucket).select(*keys, "__b").distinct()
    frame = lbk.join(rbest, keys + ["__b"], "full_outer")
    w_carry = (
        Window.partitionBy(*keys).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = frame.select(
        *keys, "__b", F.max("__best").over(w_carry).alias("__carry"))

    # Phase 3: in-bucket running best.  Right rows sort before left rows
    # at equal time (__isr desc) so an exactly-simultaneous right row is
    # visible to the left row (backward-inclusive).
    rs_type = right2.schema["__rs"].dataType
    lp = F.struct(*[F.col(c) for c in lcols]).alias("__lp")
    lrows = left2.select(
        *keys, "__t", F.lit(0).alias("__isr"),
        F.lit(None).cast(rs_type).alias("__rs"), lp,
    ).withColumn("__b", bucket)
    lp_type = lrows.schema["__lp"].dataType
    rrows = right2.select(
        *keys, "__t", F.lit(1).alias("__isr"), "__rs",
        F.lit(None).cast(lp_type).alias("__lp"),
    ).withColumn("__b", bucket)
    w_in = (
        Window.partitionBy(*keys, "__b")
        .orderBy(F.col("__t").asc(), F.col("__isr").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inb = (
        lrows.unionByName(rrows)
        .withColumn("__in", F.max("__rs").over(w_in))
        .filter(F.col("__isr") == 0)
    )

    res = inb.join(carry, keys + ["__b"], "left")
    best = F.coalesce(F.col("__in"), F.col("__carry"))
    if tolerance is not None:
        # In the (possibly negated) internal axis, left __t minus match t
        # is the non-negative gap for both directions.
        best = F.when(
            (F.col("__t") - best.getField("t")) <= F.lit(tolerance), best)

    sel: list[Column] = [F.col("__lp").getField(c).alias(c) for c in lcols]
    sel.append(
        (best.getField("t") * F.lit(sign)).alias(right_time + suffix))
    sel.extend(best.getField(c).alias(c + suffix) for c in right_values)
    return res.select(*sel)


def interval_join(left: DataFrame, right: DataFrame, *,
                  on: str | list[str], left_time: str, right_time: str,
                  lower: int | float, upper: int | float,
                  right_values: list[str], suffix: str = "_r") -> DataFrame:
    """All (left, right) pairs with equal keys and
    ``left_time + lower <= right_time <= left_time + upper`` (inner join;
    e.g. ``lower=-600e6, upper=0`` in micros = "right events in the 10
    minutes up to each left event").

    Scale shape: time is bucketed at width ``max(upper - lower, 1)`` so
    every candidate right row lives in one of at most TWO buckets per left
    row; the left side explodes to those bucket ids (≤2× inflation), hits
    a plain ``(key, bucket)`` equi-join — partial-aggregation-friendly,
    AQE-skew-splittable — and an exact band filter refines.  This is the
    1-D analog of ``spatial/range_join.py``'s covering-cell join, and
    never builds the key-only join's quadratic hot-key blowup.
    """
    if upper < lower:
        raise ValueError(f"upper < lower: {upper} < {lower}")
    keys = _keys(on)
    width = float(max(upper - lower, 1))

    lt = F.col(left_time)
    b_lo = F.floor((lt + F.lit(lower)) / F.lit(width))
    b_hi = F.floor((lt + F.lit(upper)) / F.lit(width))
    lexp = left.withColumn(
        "__b", F.explode(F.array_distinct(F.array(b_lo, b_hi))))

    rt_out = right_time + suffix
    right2 = right.select(
        *keys,
        F.col(right_time).alias(rt_out),
        *[F.col(c).alias(c + suffix) for c in right_values],
    ).withColumn("__b", F.floor(F.col(rt_out) / F.lit(width)))

    band = F.col(rt_out).between(lt + F.lit(lower), lt + F.lit(upper))
    return (
        lexp.join(right2, keys + ["__b"], "inner")
        .filter(band)
        .drop("__b")
    )
