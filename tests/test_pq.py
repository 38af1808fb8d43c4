"""Product quantization: golden codebooks, encode invariance, ADC + refine
recall, and determinism edges."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.pq import (
    pq_codebooks, pq_encode, pq_topk,
)
from osm2geojson_lite_spark.pipeline.similarity import brute_force_topk

EMB = "/root/testdata/sf0.01/embeddings.parquet"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "pq_codebooks.json")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def cbs(emb):
    return pq_codebooks(emb, m=16, k=16, n_iters=20, sample_size=512, seed=0)


def test_pq_codebooks_match_golden(cbs):
    """Engine training == the committed golden from the INDEPENDENT
    DuckDB + pure-Python trainer (tools/gen_pq_codebooks.py) — pins the
    whole deterministic procedure, not just its Spark expression."""
    with open(GOLDEN, encoding="utf-8") as f:
        golden = json.load(f)
    assert len(cbs) == len(golden) == 16
    for mi in range(16):
        assert cbs[mi] == golden[mi], f"subspace {mi} diverged"


def test_pq_encode_shape_and_partitioning_invariance(emb, cbs):
    a = {r["vec_id"]: r["codes"]
         for r in pq_encode(emb.repartition(1), cbs).collect()}
    b = {r["vec_id"]: r["codes"]
         for r in pq_encode(emb.repartition(13), cbs).collect()}
    assert a == b
    assert len(a) == emb.count()
    for codes in a.values():
        assert len(codes) == 16
        assert all(0 <= c < 16 for c in codes)


def test_pq_raw_topk_self_hit(emb, cbs):
    """Every query vector is in the corpus, so its own code cell must win
    rank 1 under ADC (its reconstruction maximizes the approx cosine)."""
    queries = emb.filter(F.col("vec_id") % 25 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    codes = pq_encode(emb, cbs)
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in pq_topk(queries, codes, 1, codebooks=cbs).collect()}
    assert all(q == n for q, n in top1.items())
    assert len(top1) == queries.count()


def test_pq_refine_recall_beats_raw(emb, cbs):
    """Measured on the sf0.01 panel: raw ADC recall@10 = 0.40; the 8x-k
    shortlist + exact re-rank = 0.96.  Gate at >= 0.9 / raw + 0.2."""
    queries = emb.filter(F.col("vec_id") % 25 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    codes = pq_encode(emb, cbs)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(queries, emb, 10).collect()}
    raw = {(r["query_id"], r["neighbor_id"])
           for r in pq_topk(queries, codes, 10, codebooks=cbs).collect()}
    ref = {(r["query_id"], r["neighbor_id"])
           for r in pq_topk(queries, codes, 10, codebooks=cbs,
                            rerank_with=emb).collect()}
    raw_recall = len(raw & exact) / len(exact)
    ref_recall = len(ref & exact) / len(exact)
    assert ref_recall >= 0.9, (raw_recall, ref_recall)
    assert ref_recall >= raw_recall + 0.2, (raw_recall, ref_recall)


def test_pq_zero_query_is_deterministic(spark, emb, cbs):
    """A zero-norm query scores cosine 0 everywhere (clamped denominator,
    no NaN) and ranks by lowest neighbor id."""
    zq = spark.createDataFrame(
        [(999, [0.0] * 64)], "query_id bigint, embedding array<float>")
    codes = pq_encode(emb, cbs)
    got = pq_topk(zq, codes, 3, codebooks=cbs).collect()
    assert [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])] \
        == [0, 1, 2]


def test_pq_dim_mismatch_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(emb, m=7, k=4, n_iters=1, sample_size=16)


def test_pq_flat_scan_guard_refuses_large_corpus(spark, emb, cbs):
    """The flat ADC scan refuses corpora above max_corpus_rows (steering
    callers to ivfpq_topk) and runs unchanged with the opt-in."""
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    codes = pq_encode(emb, cbs)
    with pytest.raises(ValueError, match="ivfpq_topk"):
        pq_topk(queries, codes, 3, codebooks=cbs, max_corpus_rows=10)
    guarded = pq_topk(queries, codes, 3, codebooks=cbs).collect()
    opted = pq_topk(queries, codes, 3, codebooks=cbs, max_corpus_rows=10,
                    allow_flat_scan=True).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, opted))
