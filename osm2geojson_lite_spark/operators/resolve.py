"""Resolve stage: deferred-FK execution as Spark joins (SURVEY.md §2.3).

The reference defers every foreign-key probe in a ``LateBinder`` list and
executes them against its in-memory catalog (``ref-elements.ts:20-22``,
``late-binder.ts:14-25``) — a classic build-then-probe hash join. Here the
build side is the *live* instance table (last registration per
``(doc_id, composite)``) and the probe side is the exploded ref-slot table;
Catalyst/AQE picks broadcast vs shuffled-hash per batch, and dangling refs
drop out through plain inner joins.

Operators implemented here:
- J1 way→node ref resolution (``way.ts:28-39``)  — explode + equi-join +
  ordered re-collection.
- J2/J3/J4 relation member resolution (``relation.ts:30-105``) — one exploded
  member join against the live catalog.
- J6 reference counting (``way.ts:32``, ``relation.ts:37,52,60,66,91,97``) —
  pre-aggregated probe counts joined back to live instances, plus the
  member-creation self-increment.
- A3 super-relation closure (``relation.ts:161-184``) — iterative self-join,
  depth-capped (the reference would recurse forever on membership cycles).

Scale notes: every join is an equi-join keyed ``(doc_id, …)``; documents never
cross-contaminate, so salting a hot document (mega-relation) is safe — see
``salt`` in :func:`resolve_graph`. Probe counts are aggregated *before* the
join back (map-side partial agg), so the shuffle carries one row per distinct
target, not one per probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WAY_SLOTS_T = "array<struct<p:int,ref:string,lon:string,lat:string>>"
MEMBERS_T = "array<struct<p:int,mtype:string,kind:string,ref:string,inst:bigint,role:string>>"

MAX_RELATION_DEPTH = 16


def resolve_graph(instances: DataFrame, *, salt: int | None = None) -> dict:
    """Run J1-J4 + J6 over the parsed instance table.

    Returns a dict of DataFrames: ``live`` (with ``ref_count``),
    ``way_coords`` (per way instance, ordered token coords as JSON),
    ``members`` (resolved member slots), ``edges`` (relation->relation).

    ``salt`` (optional int) salts the node-lookup join key to spread a skewed
    build side (one mega-document holding most nodes) over ``salt`` reducers:
    the probe side gets a random-free deterministic salt from the ref hash and
    the build side is replicated ``salt`` ways. With AQE skew-join enabled
    this is rarely needed; it exists for explicit-skew-handling parity with
    the north rule.
    """
    inst = instances

    # Project the live table to the columns its consumers actually read
    # BEFORE it crosses the ref-count join's exchange (guide: project
    # before the exchange).  The parse table also carries way_slots_json /
    # members_json / roles_json / bounds_json / eid — fat strings consumed
    # only via their own explode paths below, never through `live` — and
    # shuffling them with every live row roughly doubled the join's bytes.
    live = inst.filter(F.col("is_live")).select(
        "doc_id", "composite", "inst", "etype", "out_pos",
        "member_created", "has_tag", "latlng_set", "lat", "lon",
        "props_json", "tags_json", "tag_events_json",
    )
    live_keyed = live.select(
        "doc_id", "composite",
        F.col("inst").alias("target_inst"),
        F.col("etype").alias("target_etype"),
    )

    # --- explode deferred refs --------------------------------------------
    way_slots = (
        inst.filter(F.col("way_slots_json").isNotNull())
        .select(
            "doc_id",
            F.col("inst").alias("owner"),
            F.explode(F.from_json("way_slots_json", WAY_SLOTS_T)).alias("s"),
        )
        .select("doc_id", "owner", "s.p", "s.ref", "s.lon", "s.lat")
    )
    slot_refs = way_slots.filter(F.col("ref").isNotNull()).select(
        "doc_id", "owner", "p",
        F.concat(F.lit("node/"), F.col("ref")).alias("composite"),
    )

    members = (
        inst.filter(F.col("members_json").isNotNull())
        .select(
            "doc_id",
            F.col("inst").alias("rel_inst"),
            F.explode(F.from_json("members_json", MEMBERS_T)).alias("m"),
        )
        # m.role is NOT carried: the relation kernel reads member roles from
        # rel_meta.roles_json (the parse-side projection), so resolved
        # members would shuffle and cache the string for no consumer.
        .select("doc_id", "rel_inst", "m.p", "m.mtype", "m.kind", "m.ref", "m.inst")
    )
    mem_refs = members.filter(F.col("kind") == "ref").select(
        "doc_id", "rel_inst", "p", "mtype",
        F.concat(F.col("mtype"), F.lit("/"), F.col("ref")).alias("composite"),
    )

    # --- J6: reference counting (aggregation, not mutation) ----------------
    probes = slot_refs.select("doc_id", "composite").unionByName(
        mem_refs.select("doc_id", "composite")
    )
    probe_counts = probes.groupBy("doc_id", "composite").agg(
        F.count(F.lit(1)).alias("probe_hits")
    )
    live_rc = (
        live.join(probe_counts, ["doc_id", "composite"], "left")
        .withColumn(
            "ref_count",
            F.coalesce(F.col("probe_hits"), F.lit(0))
            + F.col("member_created").cast("long"),
        )
        .drop("probe_hits")
    )

    # --- J1: way-slot -> node resolution ----------------------------------
    live_nodes = live.filter(F.col("etype") == "node").select(
        "doc_id", "composite",
        F.col("lon").alias("n_lon"), F.col("lat").alias("n_lat"),
    )
    if salt and salt > 1:
        # Deterministic skew salting: replicate the build side `salt` ways and
        # scatter probes by hash — same rows, `salt`× finer reduce keys.
        salt_col = F.pmod(F.xxhash64("owner", "p"), F.lit(salt)).cast("int")
        probe_side = slot_refs.withColumn("skew_salt", salt_col)
        build_side = live_nodes.withColumn(
            "skew_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        ref_coords = probe_side.join(
            build_side, ["doc_id", "composite", "skew_salt"], "inner"
        ).select("doc_id", "owner", "p", F.col("n_lon").alias("lon"), F.col("n_lat").alias("lat"))
    else:
        ref_coords = slot_refs.join(live_nodes, ["doc_id", "composite"], "inner").select(
            "doc_id", "owner", "p", F.col("n_lon").alias("lon"), F.col("n_lat").alias("lat")
        )

    inline_coords = way_slots.filter(F.col("ref").isNull()).select(
        "doc_id", "owner", "p", "lon", "lat"
    )
    # A1: order restored by the explicit position column, never shuffle order.
    way_coords = (
        inline_coords.unionByName(ref_coords)
        .groupBy("doc_id", "owner")
        .agg(F.array_sort(F.collect_list(F.struct("p", "lon", "lat"))).alias("slots"))
        .select(
            "doc_id", "owner",
            F.to_json(
                F.transform("slots", lambda s: F.array(s["lon"], s["lat"]))
            ).alias("coords_json"),
        )
    )

    # --- J2/J3/J4: member resolution --------------------------------------
    resolved_ref_members = mem_refs.join(
        live_keyed, ["doc_id", "composite"], "inner"
    ).select("doc_id", "rel_inst", "p", "mtype", "target_inst")
    inline_members = members.filter(F.col("kind") == "inline").select(
        "doc_id", "rel_inst", "p", "mtype",
        F.col("inst").alias("target_inst"),
    )
    resolved_members = resolved_ref_members.unionByName(inline_members)

    edges = resolved_members.filter(F.col("mtype") == "relation").select(
        "doc_id",
        F.col("rel_inst").alias("parent_inst"),
        F.col("target_inst").alias("child_inst"),
    )

    return {
        "live": live_rc,
        "way_coords": way_coords,
        "members": resolved_members,
        "edges": edges,
    }


def visibility_filter(live_rc: DataFrame, *, render_tagged: bool, exclude_way: bool) -> DataFrame:
    """P3 (reference ``index.ts:215-217``): an element is skipped iff
    ``refCount>0 AND (¬hasTag OR ¬renderTagged OR (isWay AND excludeWay))``."""
    skip = (F.col("ref_count") > 0) & (
        (~F.col("has_tag"))
        | F.lit(not render_tagged)
        | ((F.col("etype") == "way") & F.lit(exclude_way))
    )
    return live_rc.filter(~skip)


def relation_closure(roots: DataFrame, edges: DataFrame, *, max_depth: int = MAX_RELATION_DEPTH) -> DataFrame:
    """A3: transitive closure root -> reachable relation.

    One cogrouped Arrow kernel over HASH BUCKETS of documents (documents
    are independent universes, so the closure never crosses ``doc_id`` —
    the per-bucket adjacency is keyed by (doc_id, parent) so buckets can
    hold many documents without cross-talk): BFS from each root over its
    own doc's relation->relation edge list, visited-set cycle-safe (the
    reference would blow its stack on cycles, ``relation.ts:172-174``).
    A single shuffle on the bucket key; no driver-side iteration.  The
    edge groups are relation metadata only — tiny even for mega-documents.
    Bucketing by ``pmod(xxhash64(doc_id), ~16x shuffle partitions)``
    instead of by raw ``doc_id`` cuts the Python call + pandas-frame
    overhead from one-per-document to one-per-bucket (a corpus of tiny
    documents paid ~1 call per doc), while the 16x key multiple keeps the
    bucket hash spreading evenly over reducers.

    Output order is irrelevant (a set): the relation kernel re-derives the
    reference's member ordering from its own memoized DFS.
    """
    import pandas as pd

    def closure_fn(key, roots_pdf, edges_pdf):
        adj: dict[tuple, list[int]] = {}
        for d, p, c in zip(edges_pdf["edge_doc_id"], edges_pdf["parent_inst"],
                           edges_pdf["child_inst"]):
            adj.setdefault((d, int(p)), []).append(int(c))
        out_doc, out_root, out_rel = [], [], []
        for doc_id, root in zip(roots_pdf["doc_id"], roots_pdf["root_inst"]):
            root = int(root)
            seen = {root}
            stack = [root]
            while stack:
                cur = stack.pop()
                out_doc.append(doc_id)
                out_root.append(root)
                out_rel.append(cur)
                for nxt in adj.get((doc_id, cur), ()):
                    if nxt not in seen:
                        seen.add(nxt)
                        stack.append(nxt)
        return pd.DataFrame(
            {"doc_id": out_doc, "root_inst": out_root, "rel_inst": out_rel}
        )

    # rename the edge-side key: both frames descend from the same instances
    # lineage and Spark's ambiguous-self-join check rejects shared attributes
    edges_r = edges.select(
        F.col("doc_id").alias("edge_doc_id"), "parent_inst", "child_inst"
    )
    spark = roots.sparkSession
    n_buckets = max(64, 16 * int(spark.conf.get("spark.sql.shuffle.partitions")))
    bucket = lambda c: F.pmod(F.xxhash64(c), F.lit(n_buckets))  # noqa: E731
    return (
        roots.select("doc_id", "root_inst")
        .withColumn("_b", bucket(F.col("doc_id")))
        .groupBy("_b")
        .cogroup(edges_r.withColumn("_b", bucket(F.col("edge_doc_id")))
                 .groupBy("_b"))
        .applyInPandas(closure_fn, schema="doc_id string, root_inst long, rel_inst long")
    )
