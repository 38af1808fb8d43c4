"""Round-4 additions: sequence packing, int8 embedding quantization, and
corpus-wide passage dedup — invariants plus pure-Python oracles on real
testdata (sf0.001), and partitioning-invariance for the distributed
prefix-sum (the claim that makes packing safe at cluster scale)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.dedup import passage_dedup
from osm2geojson_lite_spark.pipeline.packing import pack_sequences
from osm2geojson_lite_spark.pipeline.quantize import (
    quantize_embeddings,
    quantized_topk,
)
from osm2geojson_lite_spark.pipeline.similarity import brute_force_topk

SF_DIR = "/root/testdata/sf0.001"
CAP = 64


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def _tokens(text):
    return [t for t in text.lower().split(" ") if t]


# ---------------------------------------------------------------- packing

def _pack_oracle(docs_py, capacity, seed=0):
    """Flat single-scan replay of pack_sequences' contract."""
    keyed = []
    for doc_id, text in docs_py:
        n = len(_tokens(text))
        if n == 0:
            continue
        k = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
        keyed.append((k, doc_id, n))
    keyed.sort()
    rows, off = set(), 0
    for _, doc_id, n in keyed:
        first = off // capacity
        last = (off + n - 1) // capacity
        for s in range(first, last + 1):
            lo, hi = s * capacity, (s + 1) * capacity
            rows.add((s, doc_id, s - first, max(lo - off, 0),
                      min(hi, off + n) - max(lo, off)))
        off += n
    return rows


@pytest.fixture(scope="module")
def packed(documents):
    return pack_sequences(documents, capacity=CAP).persist()


def test_pack_matches_flat_scan_oracle(documents, packed):
    docs_py = [(str(r["doc_id"]), r["text"]) for r in documents.collect()]
    got = {(r["seq_id"], str(r["doc_id"]), r["part_idx"], r["tok_start"],
            r["n_toks"]) for r in packed.collect()}
    assert got == _pack_oracle(docs_py, CAP)


def test_pack_sequences_exactly_full(packed):
    """Every sequence except the global last carries exactly `capacity`
    tokens; fragments never overlap and cover each doc end-to-end."""
    per_seq = {r["seq_id"]: r["tot"] for r in packed.groupBy("seq_id")
               .agg(F.sum("n_toks").alias("tot")).collect()}
    last = max(per_seq)
    for s, tot in per_seq.items():
        assert tot == CAP or (s == last and 0 < tot <= CAP), (s, tot)
    # sequence ids are contiguous from 0
    assert sorted(per_seq) == list(range(last + 1))


def test_pack_fragments_tile_each_doc(packed, documents):
    frags = {}
    for r in packed.collect():
        frags.setdefault(str(r["doc_id"]), []).append(
            (r["part_idx"], r["tok_start"], r["n_toks"]))
    n_by_doc = {str(r["doc_id"]): len(_tokens(r["text"]))
                for r in documents.collect()}
    for doc_id, fs in frags.items():
        fs.sort()
        pos = 0
        for i, (part, start, n) in enumerate(fs):
            assert part == i and start == pos and n > 0
            pos += n
        assert pos == n_by_doc[doc_id]


def test_pack_invariant_under_partitioning(documents, packed):
    """The two-phase prefix sum gives identical placement regardless of
    input partitioning — the distributed-scan correctness claim."""
    base = {tuple(r) for r in packed.collect()}
    for reshaped in (documents.repartition(17, "source"),
                     documents.coalesce(1)):
        got = {tuple(r) for r in
               pack_sequences(reshaped, capacity=CAP).collect()}
        assert got == base


def test_pack_bucket_width_irrelevant(documents, packed):
    """256 vs 4096 scan buckets place every fragment identically (the
    knob only trades window size for offset-table size)."""
    base = {tuple(r) for r in packed.collect()}
    got = {tuple(r) for r in
           pack_sequences(documents, capacity=CAP,
                          n_char_bucket=3).collect()}
    assert got == base


def test_pack_rejects_bad_capacity(documents):
    with pytest.raises(ValueError):
        pack_sequences(documents, capacity=0)


# --------------------------------------------------------------- quantize

def test_quantize_bounds_and_fidelity(embeddings):
    rows = quantize_embeddings(embeddings).collect()
    assert len(rows) == embeddings.count()
    for r in rows:
        assert all(-127 <= q <= 127 for q in r["qvec"])
        # reconstruction error bounded by scale/2 away from the clamp
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9
        assert r["cos_fid"] is None or r["cos_fid"] > 0.99


def test_quantize_python_oracle(embeddings):
    sample = embeddings.limit(20).collect()
    got = {r["vec_id"]: r for r in
           quantize_embeddings(embeddings.limit(20)).collect()}
    for r in sample:
        v = r["embedding"]
        sc = round(max(abs(float(x)) for x in v) / 127.0, 9)
        if sc > 0:
            exp = [int(max(-127, min(127, math.floor(float(x) / sc + 0.5))))
                   for x in v]
        else:
            exp = [0] * len(v)
        assert got[r["vec_id"]]["qvec"] == exp
        assert got[r["vec_id"]]["scale"] == pytest.approx(sc)


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])],
                               "vec_id: long, embedding: array<double>")
    r = quantize_embeddings(df).collect()[0]
    assert r["qvec"] == [0, 0, 0] and r["scale"] == 0.0
    assert r["cos_fid"] is None


def test_quantized_topk_close_to_exact(embeddings):
    """Asymmetric int8 search recovers nearly all of the exact top-k —
    cosine is scale-invariant so only rounding noise differs."""
    queries = embeddings.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(queries, embeddings, k=10)
    quant = quantized_topk(queries, embeddings, k=10)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    qt = {}
    for r in quant.collect():
        qt.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & qt[q]) / 10 for q in ex]
    assert sum(recalls) / len(recalls) >= 0.9


# ----------------------------------------------------------- passage dedup

def _passage_oracle(docs_py, window):
    wins_by_doc = {}
    for doc_id, text in docs_py:
        toks = _tokens(text)
        wins_by_doc[doc_id] = [
            " ".join(toks[i:i + window]) for i in range(0, len(toks), window)]
    seen = {}
    for doc_id in sorted(wins_by_doc, key=int):
        for w, wtext in enumerate(wins_by_doc[doc_id]):
            seen.setdefault(wtext, (int(doc_id), w))
    out = {}
    for doc_id, wins in wins_by_doc.items():
        kept = [wt for w, wt in enumerate(wins)
                if seen[wt] == (int(doc_id), w)]
        out[doc_id] = (" ".join(kept), len(wins), len(kept))
    return out


def test_passage_dedup_matches_oracle(documents):
    docs_py = [(str(r["doc_id"]), r["text"]) for r in documents.collect()]
    exp = _passage_oracle(docs_py, window=8)
    got = {str(r["doc_id"]): (r["clean_text"], r["n_windows"], r["n_kept"])
           for r in passage_dedup(documents, window=8).collect()}
    assert got == exp


def test_passage_dedup_removes_cross_doc_repeats(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c x y z"), (3, "x y z"), (4, "")],
        "doc_id: long, text: string")
    got = {r["doc_id"]: (r["clean_text"], r["n_windows"], r["n_kept"])
           for r in passage_dedup(docs, window=3).collect()}
    assert got == {
        1: ("a b c d e f", 2, 2),   # first occurrence of both windows
        2: ("x y z", 2, 1),         # "a b c" deleted, "x y z" first here
        3: ("", 1, 0),              # fully deduplicated, row preserved
        4: ("", 0, 0),              # empty doc preserved
    }


def test_passage_dedup_invariant_under_partitioning(documents):
    base = {tuple(r) for r in passage_dedup(documents, window=8).collect()}
    got = {tuple(r) for r in
           passage_dedup(documents.repartition(13), window=8).collect()}
    assert got == base


# -------------------------------------------------------- repetition stats

def _rep_oracle(docs_py, n=2):
    out = {}
    for doc_id, text in docs_py:
        lines = text.split("\n")
        from collections import Counter
        lc = Counter(lines)
        tot_chars = sum(len(l) for l in lines)
        dup_chars = sum(len(l) for l in lines if lc[l] > 1)
        toks = _tokens(text)
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        gc = Counter(grams)
        n_ngrams = len(grams)
        out[doc_id] = (
            len(lines),
            round(dup_chars / tot_chars, 9) if tot_chars else None,
            n_ngrams,
            round(max(gc.values()) / n_ngrams, 9) if n_ngrams else None,
            round(sum(c for c in gc.values() if c > 1) / n_ngrams, 9)
            if n_ngrams else None,
        )
    return out


def test_repetition_stats_matches_oracle(documents):
    from osm2geojson_lite_spark.pipeline.text import repetition_stats
    docs_py = [(str(r["doc_id"]), r["text"]) for r in documents.collect()]
    exp = _rep_oracle(docs_py)
    got = {str(r["doc_id"]): (r["n_lines"], r["dup_line_frac"], r["n_ngrams"],
                              r["top_ngram_frac"], r["dup_ngram_frac"])
           for r in repetition_stats(documents, n=2).collect()}
    assert set(got) == set(exp)
    for k in exp:
        for g, e in zip(got[k], exp[k]):
            if isinstance(e, float):
                assert g == pytest.approx(e, abs=1e-9), (k, got[k], exp[k])
            else:
                assert g == e, (k, got[k], exp[k])


def test_repetition_stats_planted(spark):
    from osm2geojson_lite_spark.pipeline.text import repetition_stats
    docs = spark.createDataFrame(
        [(1, "aa bb\ncc\naa bb\ndd"),   # "aa bb" line duplicated
         (2, "x y x y x y"),            # "x y" 3 of 5 grams, "y x" 2 of 5
         (3, "all words differ here"),
         (4, ""),                       # one empty line, no grams
         (5, "solo")],                  # 1 token -> no 2-grams
        "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    r1 = got[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == pytest.approx(10 / 14, abs=1e-9)
    r2 = got[2]
    assert r2["n_ngrams"] == 5
    assert r2["top_ngram_frac"] == pytest.approx(3 / 5)
    assert r2["dup_ngram_frac"] == pytest.approx(1.0)
    assert got[3]["dup_ngram_frac"] == pytest.approx(0.0)
    assert got[3]["dup_line_frac"] == pytest.approx(0.0)
    r4 = got[4]
    assert (r4["n_lines"], r4["n_ngrams"]) == (1, 0)
    assert r4["dup_line_frac"] is None and r4["top_ngram_frac"] is None
    r5 = got[5]
    assert r5["n_ngrams"] == 0 and r5["dup_ngram_frac"] is None


def test_repetition_stats_invariant_under_partitioning(documents):
    from osm2geojson_lite_spark.pipeline.text import repetition_stats
    base = {tuple(r) for r in repetition_stats(documents).collect()}
    got = {tuple(r) for r in
           repetition_stats(documents.repartition(11)).collect()}
    assert got == base
