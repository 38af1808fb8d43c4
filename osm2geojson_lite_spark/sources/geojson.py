"""GeoJSON feature-table source: the consuming half of the engine's
produce/consume loop.

The reference (tibetty/osm2geojson-lite) only *emits* GeoJSON
(``src/index.ts``); a Spark deployment also needs to read
FeatureCollections BACK into a relational feature table so converted
output (or any third-party GeoJSON corpus) can feed the spatial layer —
tiling, PIP joins, kNN, Z-order layout — without a round-trip through the
OSM model.  :func:`geojson_features` does exactly that: one input row per
FeatureCollection document, one output row per feature.

Scale shape — map-side only, no shuffle, no UDF:

- ONE ``from_json`` parse per document captures each feature's raw JSON
  text (``array<string>`` raw capture: Jackson copies the token stream
  verbatim, so compact input substrings survive byte-exactly);
- ``posexplode`` fans features out; per-feature fields come from a single
  ``json_tuple`` pass (feature-sized, not document-sized);
- the bbox is pure column algebra over ``regexp_extract_all`` of the
  coordinate numbers — GeoJSON geometries alternate ``[lon, lat(, alt)]``
  with no other numeric tokens inside ``coordinates``, so even/odd
  positions are the x/y streams (2D geometries, the OSM case).

A 100 TB GeoJSON corpus therefore parses at scan speed with output
partitioning following the input's — chain straight into
``spatial.cells.cell_of`` / ``zorder_layout`` for the write.

Limits (documented, not silent): ``GeometryCollection`` members and a
geometry-level ``bbox`` member are not unpacked — ``n_coords`` counts and
the bbox derive from the ``coordinates`` member only (null geometry or
GeometryCollection ⇒ ``n_coords = 0``, null bbox).  Third dimensions
(altitude) would corrupt the even/odd split; the engine's own output is
always 2D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUM_RE = r"-?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?"


def geojson_features(docs: DataFrame, *, id_col: str = "doc_id",
                     geojson_col: str = "geojson") -> DataFrame:
    """Explode FeatureCollection documents into a feature table:
    ``(doc_id, feature_idx, geom_type, feature_id, properties, geometry,
    n_coords, bbox_w, bbox_s, bbox_e, bbox_n)``.

    ``properties`` and ``geometry`` stay raw JSON text (heterogeneous
    nesting cannot be statically typed); ``feature_idx`` preserves the
    document-order contract of the emitter (reference `index.ts` emits
    features in document order).  Documents with zero features produce
    zero rows — ``convert()``'s empty FeatureCollections drop out.
    """
    feats = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.from_json(
                F.col(geojson_col), "struct<features:array<string>>"
            )["features"].alias("fs"),
        )
        .filter(F.size("fs") > 0)
        .select("doc_id", F.posexplode("fs").alias("feature_idx", "feat"))
    )
    parts = feats.select(
        "doc_id",
        "feature_idx",
        F.json_tuple("feat", "id", "properties", "geometry").alias(
            "feature_id", "properties", "geometry"
        ),
    )
    coord_src = F.get_json_object("geometry", "$.coordinates")
    nums = F.regexp_extract_all(coord_src, F.lit(_NUM_RE), 0)
    xs = F.filter(nums, lambda x, i: i % 2 == 0)
    ys = F.filter(nums, lambda x, i: i % 2 == 1)
    dbl = lambda a: F.transform(a, lambda x: x.cast("double"))  # noqa: E731
    return parts.select(
        "doc_id",
        "feature_idx",
        F.get_json_object("geometry", "$.type").alias("geom_type"),
        "feature_id",
        "properties",
        "geometry",
        (F.coalesce(F.size(nums), F.lit(0)) / 2).cast("bigint")
        .alias("n_coords"),
        F.round(F.array_min(dbl(xs)), 9).alias("bbox_w"),
        F.round(F.array_min(dbl(ys)), 9).alias("bbox_s"),
        F.round(F.array_max(dbl(xs)), 9).alias("bbox_e"),
        F.round(F.array_max(dbl(ys)), 9).alias("bbox_n"),
    )
