"""End-to-end file-skipping evidence for zorder_layout / hilbert_layout.

The 100-TB claim for the layout operators is: range-partition + sort by
the space-filling-curve key gives every output file a tight [min, max]
key range, so a bbox-shaped predicate (rewritten to curve-key ranges)
touches only a few files.  These tests write real parquet with each
layout and assert the payoff end to end:

1. the parquet FOOTER stats (pyarrow, independent of Spark) show that a
   bbox key range overlaps a strict subset of the files — the skipping a
   manifest-based reader (Iceberg/Delta) or Spark's own parquet
   row-group pruning performs from exactly these stats;
2. the Spark scan of the same predicate carries the key bounds in
   PushedFilters (so the pruning actually engages at read time) and
   returns exactly the right rows.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.spatial.hilbert import (
    hilbert_key_col,
    hilbert_layout,
)
from osm2geojson_lite_spark.spatial.zorder import (
    zorder_key_col,
    zorder_layout,
)

BITS = 12
N = 4000
NUM_FILES = 8


def _pts(spark, n):
    # deterministic cloud over [-170, 170] x [-80, 80]
    return spark.range(n).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 7919 % 3400) / 10.0 - 170.0).alias("lon"),
        ((F.col("id") * 104729 % 1600) / 10.0 - 80.0).alias("lat"),
    )


def _file_ranges(out_dir, key_name):
    """[(lo, hi)] per parquet file from footer column statistics only."""
    ranges = []
    for name in os.listdir(out_dir):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out_dir, name)).metadata
        idx = md.schema.names.index(key_name)
        lo = min(md.row_group(g).column(idx).statistics.min
                 for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max
                 for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    return ranges


def _bbox_key_bounds(spark, key_col_fn, lon0, lon1, lat0, lat1):
    """Conservative curve-key interval covering the bbox: the [min, max]
    key over a dense grid of bbox points (fine for a test; a production
    rewrite derives exact curve ranges)."""
    n = 40
    grid = spark.range(n * n).select(
        (F.lit(lon0) + (F.col("id") % n) * ((lon1 - lon0) / (n - 1))).alias("lon"),
        (F.lit(lat0) + (F.col("id") / n).cast("int") * ((lat1 - lat0) / (n - 1))).alias("lat"),
    )
    row = grid.select(key_col_fn(F.col("lon"), F.col("lat")).alias("k")) \
        .agg(F.min("k"), F.max("k")).collect()[0]
    return int(row[0]), int(row[1])


@pytest.mark.parametrize("layout_fn,key_fn,key_name", [
    (zorder_layout, lambda lon, lat: zorder_key_col(lon, lat, bits=BITS), "zkey"),
    (hilbert_layout, lambda lon, lat: hilbert_key_col(lon, lat, bits=BITS), "hkey"),
])
def test_bbox_scan_skips_files_via_minmax(spark, tmp_path, layout_fn,
                                          key_fn, key_name):
    out = str(tmp_path / f"layout_{key_name}")
    layout_fn(_pts(spark, N), bits=BITS, num_files=NUM_FILES,
              key_col=key_name).write.parquet(out)

    ranges = _file_ranges(out, key_name)
    assert len(ranges) >= NUM_FILES // 2  # actually split across files

    # a small bbox in one corner of the space
    klo, khi = _bbox_key_bounds(spark, key_fn, -170.0, -150.0, -80.0, -65.0)
    touched = [r for r in ranges if not (r[1] < klo or r[0] > khi)]
    # the skipping payoff: the bbox key range overlaps a strict subset of
    # the files — every file NOT in `touched` is skipped from stats alone
    assert len(touched) < len(ranges), (touched, ranges)

    # the Spark-side scan pushes the key bounds down to parquet...
    scan = (spark.read.parquet(out)
            .filter((F.col(key_name) >= klo) & (F.col(key_name) <= khi)))
    plan = scan._sc._jvm.PythonSQLUtils.explainString(
        scan._jdf.queryExecution(), "formatted")
    assert "PushedFilters" in plan
    assert f"GreaterThanOrEqual({key_name}" in plan
    assert f"LessThanOrEqual({key_name}" in plan

    # ...and the filtered read returns exactly the brute-force row set
    expect = sorted(
        r["pid"] for r in
        _pts(spark, N).select("pid", key_fn(F.col("lon"), F.col("lat"))
                              .alias("k"))
        .filter((F.col("k") >= klo) & (F.col("k") <= khi)).collect()
    )
    got = sorted(r["pid"] for r in scan.select("pid").collect())
    assert got == expect and len(got) > 0
