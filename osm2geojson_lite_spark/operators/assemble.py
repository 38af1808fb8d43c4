"""Assembly stage: resolved graph -> GeoJSON feature rows.

Three Arrow-batched kernels (SURVEY.md §2.4 A5-A9, §2.3 J5/J7):
- node features (``node.ts:19-32``) — Point emission with props∪tags merge
  (tags win, ``osm-object.ts:50-52``).
- way features (``way.ts:57-100``) — LineString, upgraded to CCW Polygon when
  the polytag fold says polygon and the float ring closes.
- relation features (``relation.ts:108-243``) — per-(doc, root-relation)
  ``applyInPandas`` group: memoized super-relation flatten, greedy endpoint
  stitching, winding normalization, inner→outer containment, and the
  polygons→strings→points emission order.

All kernels return feature rows ``(doc_id, out_pos, sub_seq, feature_id,
geom_type, feature_json, geometry_json)``; ordering columns replay the
reference's Map-insertion output order after Spark shuffles.
"""

from __future__ import annotations

import json
from typing import Iterator

from ..functions.geometry import is_ring, point_inside_polygon, ring_direction
from ..functions.jsnumber import canonical_json, parse_float_js
from ..functions.polytags import classify_is_polygon
from .stitch import WayCollection

FEATURE_SCHEMA = (
    "doc_id string, out_pos long, sub_seq int, feature_id string, "
    "geom_type string, feature_json string, geometry_json string"
)

_FEATURE_COLS = [
    "doc_id", "out_pos", "sub_seq", "feature_id", "geom_type",
    "feature_json", "geometry_json",
]


def merge_props(props_json: str, tags_json: str) -> dict:
    """getProps(): tags overwrite props, insertion order preserved."""
    props = json.loads(props_json) if isinstance(props_json, str) else {}
    tags = json.loads(tags_json) if isinstance(tags_json, str) else {}
    props.update(tags)
    return props


def merged_props_json(props_json: str, tags_json: str) -> str:
    """Canonical JSON of getProps().  Fast path: parse emits canonical
    strings, so a tag-less element's properties pass through without a
    JSON round-trip (the overwhelmingly common case)."""
    if not isinstance(tags_json, str) or tags_json == "{}":
        return props_json if isinstance(props_json, str) else "{}"
    return canonical_json(merge_props(props_json, tags_json))


def _fmt_float(f: float) -> str:
    """JSON.stringify of a JS number: integral -> int form, NaN/inf -> null."""
    if f != f or f in (_INF, _NINF):
        return "null"
    if f == int(f) and -1e15 < f < 1e15:
        return str(int(f))
    return repr(f)


_INF = float("inf")
_NINF = float("-inf")


def _json_str(s) -> str:
    """Quoted JSON string for a feature id.  Composite ids are ``type/num``
    in practice, but ids flow in from untrusted payloads — escape whenever a
    character would break the hand-assembled JSON envelope."""
    if isinstance(s, str) and '"' not in s and "\\" not in s and not any(
        ord(c) < 0x20 for c in s
    ):
        return f'"{s}"'
    return json.dumps(s, ensure_ascii=False)


def _feature_row(doc_id, out_pos, sub_seq, feature: dict) -> dict:
    geom = feature.get("geometry")
    return {
        "doc_id": doc_id,
        "out_pos": out_pos,
        "sub_seq": sub_seq,
        "feature_id": feature.get("id"),
        "geom_type": geom["type"] if geom else None,
        "feature_json": canonical_json(feature),
        "geometry_json": canonical_json(geom),
    }


# ---------------------------------------------------------------------------
# Node features (A9)
# ---------------------------------------------------------------------------


def build_node_feature(composite, props_json, tags_json, lon, lat) -> dict:
    return {
        "type": "Feature",
        "id": composite,
        "properties": merge_props(props_json, tags_json),
        "geometry": {
            "type": "Point",
            "coordinates": [parse_float_js(lon), parse_float_js(lat)],
        },
    }


def node_features_kernel(batches) -> Iterator:
    """Point emission by direct string assembly — byte-identical to
    ``canonical_json(build_node_feature(...))`` (pinned by a unit test) but
    without the per-row JSON round-trip."""
    import pandas as pd

    for pdf in batches:
        out = {k: [] for k in _FEATURE_COLS}
        for doc_id, out_pos, comp, pj, tj, lon, lat in zip(
            pdf["doc_id"], pdf["out_pos"], pdf["composite"], pdf["props_json"],
            pdf["tags_json"], pdf["lon"], pdf["lat"],
        ):
            props = merged_props_json(pj, tj)
            geom = (f'{{"type":"Point","coordinates":['
                    f"{_fmt_float(parse_float_js(lon))},"
                    f"{_fmt_float(parse_float_js(lat))}]}}")
            out["doc_id"].append(doc_id)
            out["out_pos"].append(out_pos)
            out["sub_seq"].append(0)
            out["feature_id"].append(comp)
            out["geom_type"].append("Point")
            out["feature_json"].append(
                f'{{"type":"Feature","id":{_json_str(comp)},"properties":{props},'
                f'"geometry":{geom}}}'
            )
            out["geometry_json"].append(geom)
        yield pd.DataFrame(out, columns=_FEATURE_COLS)


# ---------------------------------------------------------------------------
# Way features (A8 + P5)
# ---------------------------------------------------------------------------


def build_way_feature(composite, props_json, tags_json, tag_events_json, coords_json):
    coords_tokens = json.loads(coords_json) if coords_json else []
    if len(coords_tokens) <= 1:
        return None
    coords = [[parse_float_js(c[0]), parse_float_js(c[1])] for c in coords_tokens]
    feature = {
        "type": "Feature",
        "id": composite,
        "properties": merge_props(props_json, tags_json),
        "geometry": {"type": "LineString", "coordinates": coords},
    }
    tag_events = json.loads(tag_events_json) if tag_events_json else []
    if classify_is_polygon(tag_events) and is_ring(coords):
        if ring_direction(coords) != "counterclockwise":
            coords.reverse()
        feature["geometry"] = {"type": "Polygon", "coordinates": [coords]}
    return feature


def way_features_kernel(batches) -> Iterator:
    """LineString/Polygon emission by direct string assembly (same output as
    ``canonical_json(build_way_feature(...))``, no JSON round-trip for the
    feature envelope)."""
    import pandas as pd

    for pdf in batches:
        out = {k: [] for k in _FEATURE_COLS}
        for doc_id, out_pos, comp, pj, tj, tev, cj in zip(
            pdf["doc_id"], pdf["out_pos"], pdf["composite"], pdf["props_json"],
            pdf["tags_json"], pdf["tag_events_json"], pdf["coords_json"],
        ):
            coords_tokens = json.loads(cj) if isinstance(cj, str) else []
            if len(coords_tokens) <= 1:
                continue
            coords = [[parse_float_js(c[0]), parse_float_js(c[1])] for c in coords_tokens]
            tag_events = json.loads(tev) if isinstance(tev, str) else []
            geom_type = "LineString"
            if classify_is_polygon(tag_events) and is_ring(coords):
                geom_type = "Polygon"
                if ring_direction(coords) != "counterclockwise":
                    coords.reverse()
            pts = ",".join(
                f"[{_fmt_float(x)},{_fmt_float(y)}]" for x, y in coords
            )
            if geom_type == "Polygon":
                geom = f'{{"type":"Polygon","coordinates":[[{pts}]]}}'
            else:
                geom = f'{{"type":"LineString","coordinates":[{pts}]}}'
            props = merged_props_json(pj, tj)
            out["doc_id"].append(doc_id)
            out["out_pos"].append(out_pos)
            out["sub_seq"].append(0)
            out["feature_id"].append(comp)
            out["geom_type"].append(geom_type)
            out["feature_json"].append(
                f'{{"type":"Feature","id":{_json_str(comp)},"properties":{props},'
                f'"geometry":{geom}}}'
            )
            out["geometry_json"].append(geom)
        yield pd.DataFrame(out, columns=_FEATURE_COLS)


# ---------------------------------------------------------------------------
# Relation features (A2-A7, J5, J7)
# ---------------------------------------------------------------------------


def _construct_string_geometry(wc: WayCollection):
    strings = wc.merge_ways()
    if not strings:
        return None
    return {"type": "MultiLineString", "coordinates": strings}


def _construct_polygon_geometry(outer: WayCollection, inner: WayCollection):
    outer_rings = outer.to_rings("counterclockwise")
    inner_rings = inner.to_rings("clockwise")
    if not outer_rings:
        return None
    composites = [[ring] for ring in outer_rings]
    for ring in inner_rings:  # FIFO; unclaimed inner rings silently dropped
        for idx, oring in enumerate(outer_rings):
            if point_inside_polygon(ring[0], oring):
                composites[idx].append(ring)
                break
    if len(composites) == 1:
        return {"type": "Polygon", "coordinates": composites[0]}
    return {"type": "MultiPolygon", "coordinates": composites}


def _collect_ways(rels: dict, root: int, max_depth: int = 64):
    """Memoized DFS flatten (relation.ts:161-184): own ways first, then each
    sub-relation's flattened list in member order. Depth/cycle capped."""
    memo: dict[int, tuple] = {}
    visiting: set[int] = set()

    def rec(ri: int, depth: int):
        e = rels[ri]
        ways = list(e["ways"])
        roles = list(e["roles"])
        if not e["subs"]:
            memo[ri] = (ways, roles)
            return
        for child in e["subs"]:
            if child is None or child not in rels or child in visiting or depth >= max_depth:
                continue
            if child not in memo:
                visiting.add(ri)
                rec(child, depth + 1)
                visiting.discard(ri)
            ew, er = memo.get(child, ([], []))
            for i in range(len(ew)):
                ways.append(ew[i])
                roles.append(er[i] if i < len(er) else None)
        memo[ri] = (ways, roles)

    rec(root, 0)
    return memo[root]


def assemble_relation(rels: dict, root: int) -> list[dict]:
    """Replay Relation.toFeatureArray for one root; returns feature dicts."""
    e = rels.get(root)
    if e is None:
        return []
    ways, roles = _collect_ways(rels, root)

    template = {"type": "Feature", "id": e["composite"]}
    if e["bounds"] is not None:
        template["bbox"] = e["bounds"]
    template["properties"] = merge_props(e["props_json"], e["tags_json"])
    template["geometry"] = None

    polygon_features: list[dict] = []
    string_features: list[dict] = []
    point_features: list[dict] = []

    # polygon mode keyed on the relation's DIRECT roles only (relation.ts:207)
    if any(r == "outer" for r in e["roles"]):
        outer, inner = WayCollection(), WayCollection()
        for i, w in enumerate(ways):
            role = roles[i] if i < len(roles) else None
            if role == "outer":
                outer.add_way(w)
            elif role == "inner":
                inner.add_way(w)
            # other roles dropped in polygon mode (relation.ts:210-218)
        geometry = _construct_polygon_geometry(outer, inner)
        if geometry is not None:
            feature = dict(template)
            feature["geometry"] = geometry
            polygon_features.append(feature)
    else:
        wc = WayCollection()
        for w in ways:
            wc.add_way(w)
        geometry = _construct_string_geometry(wc)
        if geometry is not None:
            feature = dict(template)
            feature["geometry"] = geometry
            string_features.append(feature)

    for comp, props_json, tags_json, lon, lat in e["nodes"]:
        point_features.append(build_node_feature(comp, props_json, tags_json, lon, lat))

    return polygon_features + string_features + point_features


def relation_kernel(pdf):
    """applyInPandas body: one (doc_id, root_inst) group -> feature rows."""
    import pandas as pd

    rows: list[dict] = []
    for (doc_id, root_inst), g in pdf.groupby(["doc_id", "root_inst"], sort=False):
        out_pos = int(g["out_pos"].iloc[0])
        rels: dict[int, dict] = {}
        for rel_inst, rg in g.groupby("rel_inst", sort=False):
            r0 = rg.iloc[0]
            entry = {
                "composite": r0["composite"],
                "props_json": r0["props_json"],
                "tags_json": r0["tags_json"],
                "roles": json.loads(r0["roles_json"]) if r0["roles_json"] else [],
                "bounds": json.loads(r0["bounds_json"]) if r0["bounds_json"] else None,
                "ways": [],
                "subs": [],
                "nodes": [],
            }
            for row in rg.sort_values("m_p").itertuples():
                if row.m_mtype == "way":
                    entry["ways"].append(
                        json.loads(row.coords_json) if isinstance(row.coords_json, str) else []
                    )
                elif row.m_mtype == "relation":
                    entry["subs"].append(
                        int(row.child_inst) if row.child_inst == row.child_inst else None
                    )
                elif row.m_mtype == "node":
                    entry["nodes"].append(
                        (row.node_comp, row.node_props_json, row.node_tags_json,
                         row.node_lon, row.node_lat)
                    )
            rels[int(rel_inst)] = entry

        for sub_seq, feature in enumerate(assemble_relation(rels, int(root_inst))):
            rows.append(_feature_row(doc_id, out_pos, sub_seq, feature))

    return pd.DataFrame(rows, columns=_FEATURE_COLS)
