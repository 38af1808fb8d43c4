"""Streaming temporal join: the continuous face of ``temporal.interval_join``.

Reference scope note: tibetty/osm2geojson-lite has no streaming or temporal
semantics; this extends the engine per the build brief's streaming surface.

Spark-first: a bounded band join between two live streams is EXACTLY what
Structured Streaming's stream-stream inner join with a time-range condition
is for, so this is a thin declarative wrapper, not a custom operator.  The
range condition + watermarks are what let the state store bound itself: a
left row can only ever match right rows within ``[lower, upper]`` seconds
of it, so once the watermark passes that horizon the row's state is
evicted — state size is (arrival rate x band width), independent of stream
lifetime.  That is the same "bucket the time axis so no key's history is
unbounded" design as the batch operator, enforced by the engine instead of
hand-rolled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, *,
                         on: str | list[str], left_ts: str, right_ts: str,
                         lower_seconds: int, upper_seconds: int,
                         right_values: list[str],
                         watermark: str = "1 hour",
                         suffix: str = "_r") -> DataFrame:
    """All (left, right) pairs with equal keys and
    ``left_ts + lower <= right_ts <= left_ts + upper`` (inner join), both
    sides streaming DataFrames with event-time timestamp columns.

    Same inclusive band semantics as ``temporal.interval_join`` (pinned by
    the batch-parity test); ``watermark`` is the lateness bound — rows
    arriving later than it may be dropped by the state store, the standard
    streaming correctness/liveness trade.
    """
    if upper_seconds < lower_seconds:
        raise ValueError(f"upper < lower: {upper_seconds} < {lower_seconds}")
    keys = [on] if isinstance(on, str) else list(on)

    rt_out = right_ts + suffix
    l = left.withWatermark(left_ts, watermark)
    r = right.select(
        *keys,
        F.col(right_ts).alias(rt_out),
        *[F.col(c).alias(c + suffix) for c in right_values],
    ).withWatermark(rt_out, watermark)

    cond = None
    for k in keys:
        c = l[k] == r[k]
        cond = c if cond is None else cond & c
    band = (
        (r[rt_out] >= l[left_ts] + F.expr(f"INTERVAL {lower_seconds} SECOND"))
        & (r[rt_out] <= l[left_ts] + F.expr(f"INTERVAL {upper_seconds} SECOND"))
    )
    joined = l.join(r, cond & band, "inner")
    # project the key once (both sides carry it after the condition join)
    out_cols = [l[c] for c in left.columns] + [F.col(rt_out)] \
        + [F.col(c + suffix) for c in right_values]
    return joined.select(*out_cols)
