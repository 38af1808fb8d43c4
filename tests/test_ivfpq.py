"""IVF-PQ (IVFADC, Jegou et al. TPAMI 2011): golden residual codebooks,
encode invariance, probe-bounded ADC + refine recall, and the coverage
ceiling relationship against plain IVF."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.pq import (
    ivfpq_codebooks, ivfpq_encode, ivfpq_topk,
)
from osm2geojson_lite_spark.pipeline.similarity import (
    brute_force_topk, ivf_topk, recall_at_k,
)

EMB = "/root/testdata/sf0.01/embeddings.parquet"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def coarse():
    with open(os.path.join(GOLDEN_DIR, "ivf_centroids.json"),
              encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def cbs(emb, coarse):
    return ivfpq_codebooks(emb, coarse, m=16, k=16, n_iters=20,
                           sample_size=512, seed=0)


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 25 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding")


@pytest.fixture(scope="module")
def exact(queries, emb):
    return brute_force_topk(queries, emb, 10).cache()


def test_ivfpq_codebooks_match_golden(cbs):
    """Engine training == the committed golden from the INDEPENDENT
    DuckDB + pure-Python trainer (tools/gen_ivfpq_codebooks.py) — pins
    sampling, coarse assignment, residuals, and the subspace k-means."""
    with open(os.path.join(GOLDEN_DIR, "ivfpq_codebooks.json"),
              encoding="utf-8") as f:
        golden = json.load(f)
    assert len(cbs) == len(golden) == 16
    for mi in range(16):
        assert cbs[mi] == golden[mi], f"subspace {mi} diverged"


def test_ivfpq_encode_shape_and_partitioning_invariance(emb, coarse, cbs):
    a = {r["vec_id"]: (r["cid"], r["codes"])
         for r in ivfpq_encode(emb.repartition(1), coarse, cbs).collect()}
    b = {r["vec_id"]: (r["cid"], r["codes"])
         for r in ivfpq_encode(emb.repartition(13), coarse, cbs).collect()}
    assert a == b
    assert len(a) == emb.count()
    n_cents = len(coarse)
    for cid, codes in a.values():
        assert 0 <= cid < n_cents
        assert len(codes) == 16
        assert all(0 <= c < 16 for c in codes)


def test_ivfpq_refine_tracks_ivf_coverage_ceiling(emb, coarse, cbs, queries,
                                                  exact):
    """With a generous shortlist, refined IVF-PQ recall must approach the
    exact-within-probed-lists IVF recall (the coverage ceiling): the PQ
    shortlist only has to find the true neighbors INSIDE the probed lists.
    Measured at sf0.01: ceiling 0.78, refined 0.755-0.77 at n_probe=8."""
    enc = ivfpq_encode(emb, coarse, cbs)
    refined = ivfpq_topk(queries, enc, k=10, coarse_centroids=coarse,
                         codebooks=cbs, n_probe=8, rerank_with=emb,
                         shortlist=80)
    ceiling = ivf_topk(queries, emb, 10, centroids=coarse, n_probe=8)
    r_ref = recall_at_k(refined, exact).agg(
        F.avg("recall_at_k")).collect()[0][0]
    r_ceil = recall_at_k(ceiling, exact).agg(
        F.avg("recall_at_k")).collect()[0][0]
    assert r_ref >= r_ceil - 0.05, (r_ref, r_ceil)
    assert r_ref >= 0.70


def test_ivfpq_full_probe_refine_is_near_exact(emb, coarse, cbs, queries,
                                               exact):
    """Probing every list removes the coverage cap, so refine quality is
    purely the residual codes' shortlisting power (0.96 at shortlist=80)."""
    enc = ivfpq_encode(emb, coarse, cbs)
    approx = ivfpq_topk(queries, enc, k=10, coarse_centroids=coarse,
                        codebooks=cbs, n_probe=len(coarse),
                        rerank_with=emb, shortlist=80)
    r = recall_at_k(approx, exact).agg(F.avg("recall_at_k")).collect()[0][0]
    assert r >= 0.90


def test_ivfpq_raw_self_hit(emb, coarse, cbs, queries):
    """A query vector reconstructs to its own cell's centroid+codeword, so
    under raw ADC its own id must appear in its shortlist when its list is
    probed (rank may not be 1 — other vectors can share the exact cell)."""
    enc = ivfpq_encode(emb, coarse, cbs)
    raw = ivfpq_topk(queries, enc, k=10, coarse_centroids=coarse,
                     codebooks=cbs, n_probe=4)
    hits = (raw.filter(F.col("query_id") == F.col("neighbor_id"))
            .select("query_id").distinct().count())
    n_q = queries.count()
    assert hits >= int(0.9 * n_q), (hits, n_q)
