"""Temporal join operators: as-of join and bounded interval join.

Spark's built-in join operators cannot express "the latest right row at or
before each left row" without a per-key sort the optimizer can't bound;
these implement the two standard time-series join shapes with explicitly
scale-safe plans (bucketed two-phase scans, no unbounded per-key windows).
"""

from .asof import asof_join, interval_join

__all__ = ["asof_join", "interval_join"]
