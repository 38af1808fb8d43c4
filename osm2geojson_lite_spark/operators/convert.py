"""End-to-end conversion pipeline (SURVEY.md §3.4 lifecycle).

``documents(doc_id, spans)`` -> parse -> resolve (joins) -> assemble
(kernels) -> emit. The logical plan is declared with the DataFrame API
throughout; Catalyst/AQE pick physical join strategies (broadcast vs
shuffled-hash) per batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .assemble import (
    FEATURE_SCHEMA,
    node_features_kernel,
    relation_kernel,
    way_features_kernel,
)
from .emit import feature_collections, first_relation_geometry
from .parse import parse_documents
from .resolve import relation_closure, resolve_graph, visibility_filter


# cached parse outputs of in-flight conversions (one per convert() call);
# the next call unpersists them.  NOTE: run concurrent convert() pipelines
# in separate sessions, or collect one before starting the next.
_LIVE_CACHES: list = []


@dataclass(frozen=True)
class Options:
    """Reference option surface (index.ts:30-38) + engine knobs."""

    complete_feature: bool = False
    render_tagged: bool = False
    exclude_way: bool = True
    salt: int | None = None  # explicit skew salting for the node-ref join
    # Materialize each multi-consumer subtree (live+refcounts, way coords,
    # resolved members) exactly once instead of recomputing it per feature
    # branch.  At scale recomputing a TB-sized join 2-3x is strictly worse
    # than one materialization; False restores the recompute-from-parse plan.
    materialize_intermediates: bool = True


def assemble_payload(docs: DataFrame) -> DataFrame:
    """S1 span assembly: concatenate kind='text' span texts in offset order.

    Pure column expressions (higher-order functions run JVM-side); media
    spans pass through untouched — span-sequence equality is checked by
    tests/test_span_invariant.py.
    """
    text_spans = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text"))
    ordered = F.array_sort(
        F.transform(text_spans, lambda s: F.struct(s["offset"].alias("o"), s["text"].alias("t")))
    )
    payload = F.array_join(F.transform(ordered, lambda s: s["t"]), "")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), payload.alias("payload")
    )


def build_features(docs: DataFrame, opts: Options = Options()) -> dict:
    """Run parse+resolve+assemble; returns dict with feature DataFrames."""
    payloads = assemble_payload(docs)
    # Persist AND eagerly materialize the parse output.  AQE runs the many
    # independent downstream query stages concurrently; against a lazily
    # populated cache they all race on the cold cache and each re-executes
    # the Python parse kernel (measured: ~10x parse core-time).  One count()
    # populates the cache once; every branch then scans columnar blocks.
    # The previous conversion's cache is dropped first — without this,
    # repeated convert() calls in one session accumulate cached plans until
    # eviction storms set in (measured 83s -> 200s across three runs).
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:
            pass
    instances = parse_documents(payloads).persist()
    _LIVE_CACHES.append(instances)
    instances.count()

    graph = resolve_graph(instances, salt=opts.salt)
    live = graph["live"]
    way_coords = graph["way_coords"]
    members = graph["members"]
    if opts.materialize_intermediates:
        # Persist every subtree with >1 consumer so its shuffle executes
        # exactly once: `live` (probe-count agg + join; read by all three
        # feature branches), `way_coords` (the J1 explode+join+collect — the
        # heaviest shuffle; read by way features AND the relation kernel) and
        # `members` (member-resolution join; read by the relation kernel AND
        # the closure edges).  Eager counts populate each cache before the
        # concurrent downstream stages race on it (a lazily-populated persist
        # makes every first-wave stage re-run the Python parse, measured
        # ~10x parse core-time).  Counts run over the already-cached
        # `instances`, so each is one cheap columnar pass.
        live = live.persist()
        way_coords = way_coords.persist()
        members = members.persist()
        _LIVE_CACHES.extend([live, way_coords, members])
        # The three subtrees are mutually independent (each derives only from
        # the cached `instances`), so their materializing counts run as
        # concurrent jobs — one barrier instead of three, and the scheduler
        # fills each job's tail with the next job's tasks.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(3) as pool:
            list(pool.map(lambda d: d.count(), [live, way_coords, members]))
    visible = visibility_filter(
        live, render_tagged=opts.render_tagged, exclude_way=opts.exclude_way
    )

    # --- node features -----------------------------------------------------
    node_feats = (
        visible.filter((F.col("etype") == "node") & F.col("latlng_set"))
        .select("doc_id", "out_pos", "composite", "props_json", "tags_json", "lon", "lat")
        .mapInPandas(node_features_kernel, schema=FEATURE_SCHEMA)
    )

    # --- way features ------------------------------------------------------
    way_feats = (
        visible.filter(F.col("etype") == "way")
        .select("doc_id", F.col("inst").alias("owner"), "out_pos", "composite",
                "props_json", "tags_json", "tag_events_json")
        .join(way_coords, ["doc_id", "owner"], "left")
        .mapInPandas(way_features_kernel, schema=FEATURE_SCHEMA)
    )

    # --- relation features -------------------------------------------------
    rel_meta = instances.filter(F.col("etype") == "relation").select(
        "doc_id",
        F.col("inst").alias("rel_inst"),
        "composite", "props_json", "tags_json", "roles_json", "bounds_json",
    )
    nodes_by_inst = instances.filter(F.col("etype") == "node").select(
        "doc_id",
        F.col("inst").alias("target_inst"),
        F.col("composite").alias("node_comp"),
        F.col("props_json").alias("node_props_json"),
        F.col("tags_json").alias("node_tags_json"),
        F.col("lon").alias("node_lon"),
        F.col("lat").alias("node_lat"),
    )

    roots = visible.filter(F.col("etype") == "relation").select(
        "doc_id", F.col("inst").alias("root_inst"), "out_pos"
    )
    closure = relation_closure(roots, graph["edges"])

    kernel_in = (
        closure.join(members, ["doc_id", "rel_inst"])
        .withColumnRenamed("p", "m_p")
        .withColumnRenamed("mtype", "m_mtype")
        .join(
            way_coords.withColumnRenamed("owner", "target_inst"),
            ["doc_id", "target_inst"],
            "left",
        )
        .join(nodes_by_inst, ["doc_id", "target_inst"], "left")
        .withColumn("child_inst", F.col("target_inst"))
        .join(rel_meta, ["doc_id", "rel_inst"])
        .join(roots.select("doc_id", "root_inst", "out_pos"), ["doc_id", "root_inst"])
    )
    rel_feats = kernel_in.groupBy("doc_id", "root_inst").applyInPandas(
        relation_kernel, schema=FEATURE_SCHEMA
    )

    return {
        "instances": instances,
        "node_features": node_feats,
        "way_features": way_feats,
        "relation_features": rel_feats,
        "features": node_feats.unionByName(way_feats).unionByName(rel_feats),
    }


def convert(docs: DataFrame, opts: Options = Options()) -> DataFrame:
    """documents -> (doc_id, geojson).

    With ``complete_feature=True`` every doc yields a FeatureCollection;
    otherwise docs whose first qualifying relation produced features yield
    that bare geometry (reference default mode, ``index.ts:220-222``).
    """
    parts = build_features(docs, opts)
    collections = feature_collections(docs, parts["features"])
    if opts.complete_feature:
        return collections
    bare = first_relation_geometry(parts["relation_features"])
    return (
        collections.withColumnRenamed("geojson", "collection_json")
        .join(bare, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("geojson"), F.col("collection_json")).alias("geojson"),
        )
    )
