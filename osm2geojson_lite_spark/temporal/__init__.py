"""Temporal operators: as-of join, bounded interval join, trajectory
segmentation.

Spark's built-in join operators cannot express "the latest right row at or
before each left row" without a per-key sort the optimizer can't bound;
these implement the standard time-series shapes with explicitly
scale-safe plans (bucketed two-phase scans, no unbounded per-key windows).
"""

from .asof import asof_join, interval_join
from .geofence import zone_transitions
from .trajectory import (clean_track, od_matrix, segment_trips,
                         stay_points, trip_stats)

__all__ = ["asof_join", "clean_track", "interval_join", "od_matrix",
           "segment_trips",
           "stay_points", "trip_stats", "zone_transitions"]
