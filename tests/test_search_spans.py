"""Tests for the round-4 extension operators: BM25 keyword search, corpus
n-gram statistics, shared-token-run detection (exact substring dedup), and
k-means embedding cluster assignment — each against a pure-Python oracle
(real sf0.001 testdata where it is cheap, planted synthetics where the
signal must be controlled)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline import (
    bm25_topk,
    bm25_topk_indexed,
    cluster_sizes,
    corpus_globals,
    corpus_term_stats,
    kmeans_assign,
    kmeans_centroids,
    ngram_topk,
    shared_token_runs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def docs_py(documents):
    return [(int(r["doc_id"]), r["text"]) for r in documents.collect()]


def _tokens(text):
    return [t for t in text.lower().split(" ") if t]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _bm25_py(queries, docs_py, k, k1=1.2, b=0.75):
    """Pure-Python BM25 with the operator's exact determinism contract:
    9dp-rounded idf and contributions, ascending-sorted fold, 6dp score."""
    toks = {d: _tokens(t) for d, t in docs_py}
    n_docs = len(docs_py)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = Counter()
    for v in toks.values():
        df.update(set(v))
    out = {}
    for qid, qtext in queries:
        qterms = sorted(set(_tokens(qtext)))
        scores = {}
        for d, v in toks.items():
            contribs = []
            tf_all = Counter(v)
            for t in qterms:
                tf = tf_all.get(t, 0)
                if not tf:
                    continue
                idf = round(math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)), 9)
                contribs.append(round(
                    idf * tf * (k1 + 1)
                    / (tf + k1 * (1 - b + b * len(v) / avgdl)), 9))
            if contribs:
                acc = 0.0
                for c in sorted(contribs):
                    acc += c
                scores[d] = round(acc, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, s, r + 1) for r, (d, s) in enumerate(ranked)]
    return out


def test_bm25_matches_python_oracle(spark, documents, docs_py):
    queries = [(0, " ".join(_tokens(docs_py[3][1])[:6])),
               (1, " ".join(_tokens(docs_py[17][1])[:6])),
               (2, "the of and completely-absent-token")]
    qdf = spark.createDataFrame(queries, "query_id int, query_text string")
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(qdf, documents, k=5).collect()
    }
    want = _bm25_py(queries, docs_py, k=5)
    want_flat = {
        (qid, d): (s, r) for qid, rows in want.items() for d, s, r in rows
    }
    assert set(got) == set(want_flat)
    for key, (score, rank) in want_flat.items():
        gs, gr = got[key]
        assert math.isclose(gs, score, rel_tol=0, abs_tol=2e-6), (key, gs, score)
        assert gr == rank, key


def test_bm25_partitioning_invariant(spark, documents):
    """The sorted-fold contract: byte-identical scores at 1 and 8 partitions."""
    qdf = spark.createDataFrame(
        [(0, "the quick data of"), (1, "project river")],
        "query_id int, query_text string")
    a = sorted(map(tuple, bm25_topk(qdf, documents.repartition(1), k=10).collect()))
    bq = sorted(map(tuple, bm25_topk(qdf, documents.repartition(8), k=10).collect()))
    assert a == bq  # exact — including every score bit


def test_bm25_handcrafted():
    """3-doc corpus checked by hand: matching doc outranks partial match."""
    from osm2geojson_lite_spark.session import get_spark

    spark = get_spark("tests", cpus=8, shuffle_partitions=8)
    docs = spark.createDataFrame(
        [(1, "apple banana cherry"), (2, "apple apple apple"),
         (3, "dog cat mouse")],
        "doc_id int, text string")
    q = spark.createDataFrame([(0, "apple banana")], "query_id int, query_text string")
    rows = {r["doc_id"]: r["rank"] for r in bm25_topk(q, docs, k=3).collect()}
    assert set(rows) == {1, 2}  # doc 3 never matches
    assert rows[1] == 1  # matches both terms -> outranks tf-heavy single-term doc 2


def test_bm25_indexed_equals_scan(spark, documents):
    """The inverted-index path (pre-built postings + globals) is BYTE-identical
    to the scan path on the same corpus: per-term global df == matched-set df,
    and every rounding/fold step is shared.  This is the pin that lets the
    tail-seated `bm25_indexed` gate query stand on `bm25_search`'s green row."""
    qdf = spark.createDataFrame(
        [(0, "the quick data of"), (1, "project river"), (2, "zzz-nomatch")],
        "query_id int, query_text string")
    scan = sorted(map(tuple, bm25_topk(qdf, documents, k=10).collect()))
    postings = corpus_term_stats(documents)
    gl = corpus_globals(documents)
    idx = sorted(map(tuple,
                     bm25_topk_indexed(qdf, postings, gl, k=10).collect()))
    assert scan == idx  # exact — every score bit


def test_bm25_indexed_partitioning_invariant(spark, documents):
    """Postings partitioning must not leak into scores (sorted-fold contract),
    and a materialized (written/re-read) index gives the same answer as a
    freshly derived one — the standing-workload contract."""
    qdf = spark.createDataFrame(
        [(0, "the quick data of")], "query_id int, query_text string")
    gl = corpus_globals(documents)
    p1 = corpus_term_stats(documents).repartition(1)
    p8 = corpus_term_stats(documents).repartition(8, "term")
    a = sorted(map(tuple, bm25_topk_indexed(qdf, p1, gl, k=10).collect()))
    b = sorted(map(tuple, bm25_topk_indexed(qdf, p8, gl, k=10).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# corpus n-gram top-k
# ---------------------------------------------------------------------------


def test_ngram_topk_matches_python_oracle(documents, docs_py):
    occurrences = Counter()
    docfreq = Counter()
    for _, t in docs_py:
        toks = _tokens(t)
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        occurrences.update(grams)
        docfreq.update(set(grams))
    want = sorted(
        ((g, c, docfreq[g]) for g, c in occurrences.items()),
        key=lambda x: (-x[1], x[0]),
    )[:15]
    got = [(r["gram"], r["n_occurrences"], r["n_docs"])
           for r in ngram_topk(documents, n=2, top=15).collect()]
    assert got == want  # ordered compare: boundary ties are id-deterministic


# ---------------------------------------------------------------------------
# shared token runs (exact substring dedup)
# ---------------------------------------------------------------------------


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_shared_runs_planted(spark):
    """Planted spans: (1,2) share 20 consecutive tokens, (1,3) share 8,
    4 shares nothing."""
    span20 = " ".join(f"s{i}" for i in range(20))
    span8 = " ".join(f"u{i}" for i in range(8))
    docs = _mk_docs(spark, [
        (1, f"alpha beta {span20} gamma {span8}"),
        (2, f"{span20} end filler words here"),
        (3, f"intro {span8} outro unrelated tail"),
        (4, "completely different text with no overlap at all"),
    ])
    got = {(r["id_a"], r["id_b"]): (r["n_shared_grams"], r["max_run_tokens"])
           for r in shared_token_runs(docs, gram=8, min_tokens=8).collect()}
    # 20-token run -> 13 consecutive 8-gram matches -> 13+7 = 20 tokens
    assert got[(1, 2)] == (13, 20)
    # 8-token run -> exactly one 8-gram match -> 8 tokens
    assert got[(1, 3)] == (1, 8)
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got
    # (2,3) share nothing
    assert (2, 3) not in got


def test_shared_runs_two_islands(spark):
    """Two disjoint shared spans on different diagonals are separate runs:
    max is the longer one, n_shared_grams counts both."""
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(14))
    docs = _mk_docs(spark, [
        (1, f"{a} xx yy zz {b}"),
        (2, f"{b} pp qq {a}"),  # reversed order -> two diagonals
    ])
    got = {(r["id_a"], r["id_b"]): (r["n_shared_grams"], r["max_run_tokens"])
           for r in shared_token_runs(docs, gram=5, min_tokens=5).collect()}
    # runs: 10-token (6 grams of 5) and 14-token (10 grams)
    assert got[(1, 2)] == (16, 14)


def test_shared_runs_repeated_gram_within_doc(spark):
    """A gram repeated inside one doc matches both occurrences in the other
    doc (two diagonals), without inflating the max run."""
    s = "r0 r1 r2 r3 r4"
    docs = _mk_docs(spark, [(1, f"{s} mid {s}"), (2, f"left {s} right pad pad")])
    got = {(r["id_a"], r["id_b"]): (r["n_shared_grams"], r["max_run_tokens"])
           for r in shared_token_runs(docs, gram=5, min_tokens=5).collect()}
    assert got[(1, 2)] == (2, 5)


def test_shared_runs_max_gram_count_drops_boilerplate(spark):
    """A gram present in every doc is dropped by the frequency cap."""
    boiler = " ".join(f"c{i}" for i in range(6))
    docs = _mk_docs(spark, [
        (i, f"doc{i} unique{i} {boiler} tail{i}") for i in range(1, 6)
    ])
    full = shared_token_runs(docs, gram=6, min_tokens=6).count()
    capped = shared_token_runs(docs, gram=6, min_tokens=6,
                               max_gram_count=4).count()
    assert full == 10  # all 5-choose-2 pairs share the boilerplate
    assert capped == 0


def test_shared_runs_vs_dp_oracle(spark, docs_py):
    """Real-corpus slice vs an independent dynamic-programming oracle:
    max_run_tokens equals the longest common token substring."""
    sample = [(d, t) for d, t in docs_py[:12]]
    docs = _mk_docs(spark, sample)
    gram, min_tokens = 3, 3
    got = {(r["id_a"], r["id_b"]): r["max_run_tokens"]
           for r in shared_token_runs(docs, gram=gram,
                                      min_tokens=min_tokens).collect()}

    def lcs_tokens(x, y):
        la, lb = len(x), len(y)
        best = 0
        prev = [0] * (lb + 1)
        for i in range(1, la + 1):
            cur = [0] * (lb + 1)
            for j in range(1, lb + 1):
                if x[i - 1] == y[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    toks = {d: _tokens(t) for d, t in sample}
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            want = lcs_tokens(toks[a], toks[b])
            if want >= min_tokens:
                assert got[(a, b)] == want, (a, b)
            else:
                assert (a, b) not in got, (a, b)


# ---------------------------------------------------------------------------
# k-means assignment / clustering
# ---------------------------------------------------------------------------


def test_kmeans_assign_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_centroids(emb, n_centroids=8, n_iters=5, sample_size=64)
    got = {r["vec_id"]: (r["cid"], r["cos"])
           for r in kmeans_assign(emb, cents).collect()}

    C = np.array(cents)
    cn = np.maximum(np.linalg.norm(C, axis=1), 1e-12)
    rows = emb.collect()
    assert len(got) == len(rows)
    for r in rows:
        v = np.array([float(x) for x in r["embedding"]])
        vn = max(float(np.linalg.norm(v)), 1e-12)
        cos = np.round(C @ v / (cn * vn), 9)
        cid = int(np.argmax(cos))  # first max -> lowest cid, same tiebreak
        assert got[r["vec_id"]][0] == cid, r["vec_id"]
        assert math.isclose(got[r["vec_id"]][1], float(cos[cid]),
                            rel_tol=0, abs_tol=1e-9)

    sizes = {r["cid"]: r["n_vecs"]
             for r in cluster_sizes(kmeans_assign(emb, cents)).collect()}
    assert sum(sizes.values()) == len(rows)
