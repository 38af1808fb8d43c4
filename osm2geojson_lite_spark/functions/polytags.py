"""Polygon tag classification table.

Semantics of the reference's ``src/polytags.json`` + ``src/way.ts:90-100``:
a way is (re)classified per tag, in tag insertion order — a key present in
the table forces ``is_polygon=True`` unless the key carries a whitelist (the
value must be in it) or a blacklist (the value must not be in it). Later
matching tags overwrite earlier decisions (last-wins).

The table content mirrors the OSM area-tag conventions the reference encodes
in ``polytags.json:1-84``; it is data (a community convention list), restated
here as ``key -> (mode, frozenset)``.
"""

from __future__ import annotations

_W = "whitelist"
_B = "blacklist"
_ANY = "any"

POLYGON_TAGS: dict[str, tuple[str, frozenset]] = {
    "building": (_ANY, frozenset()),
    "highway": (_W, frozenset({"services", "rest_area", "escape", "elevator"})),
    "natural": (_B, frozenset({"coastline", "cliff", "ridge", "arete", "tree_row"})),
    "landuse": (_ANY, frozenset()),
    "waterway": (_W, frozenset({"riverbank", "dock", "boatyard", "dam"})),
    "amenity": (_ANY, frozenset()),
    "leisure": (_ANY, frozenset()),
    "barrier": (_W, frozenset({"city_wall", "ditch", "hedge", "retaining_wall", "wall", "spikes"})),
    "railway": (_W, frozenset({"station", "turntable", "roundhouse", "platform"})),
    "area": (_ANY, frozenset()),
    "boundary": (_ANY, frozenset()),
    "man_made": (_B, frozenset({"cutline", "embankment", "pipeline"})),
    "power": (_W, frozenset({"plant", "substation", "generator", "transformer"})),
    "place": (_ANY, frozenset()),
    "shop": (_ANY, frozenset()),
    "aeroway": (_B, frozenset({"taxiway"})),
    "tourism": (_ANY, frozenset()),
    "historic": (_ANY, frozenset()),
    "public_transport": (_ANY, frozenset()),
    "office": (_ANY, frozenset()),
    "building:part": (_ANY, frozenset()),
    "military": (_ANY, frozenset()),
    "ruins": (_ANY, frozenset()),
    "area:highway": (_ANY, frozenset()),
    "craft": (_ANY, frozenset()),
    "golf": (_ANY, frozenset()),
    "indoor": (_ANY, frozenset()),
}


def classify_is_polygon(tag_items) -> bool:
    """Fold tags in insertion order, last matching key wins
    (reference ``way.ts:41-51,90-100``)."""
    is_polygon = False
    for k, v in tag_items:
        entry = POLYGON_TAGS.get(k)
        if entry is None:
            continue
        mode, values = entry
        if mode == _W:
            is_polygon = v in values
        elif mode == _B:
            is_polygon = v not in values
        else:
            is_polygon = True
    return is_polygon


def polygon_class_col(key_col, value_col):
    """Column-expression twin of :func:`classify_is_polygon` for a single
    (key, value) tag: CASE chain over the polytag table, JVM-side."""
    from pyspark.sql import functions as F

    expr = F.lit(False)
    for k, (mode, values) in POLYGON_TAGS.items():
        if mode == _ANY:
            res = F.lit(True)
        elif mode == _W:
            res = value_col.isin(*sorted(values)) if values else F.lit(False)
        else:
            res = ~value_col.isin(*sorted(values)) if values else F.lit(True)
        expr = F.when(key_col == F.lit(k), res).otherwise(expr)
    return expr
