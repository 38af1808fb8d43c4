"""Tests for the round-5 tokenizer-prep / quality-signal additions:
token-window document chunking and the corpus-unigram log-probability
(perplexity proxy) score — each against a pure-Python oracle plus the
repo-standard partitioning-invariance pin."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from osm2geojson_lite_spark.pipeline import chunk_documents, unigram_logprob

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def docs_py(documents):
    return [(int(r["doc_id"]), r["text"]) for r in documents.collect()]


def _tokens(text):
    return [t for t in text.lower().split(" ") if t]


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def _chunks_py(docs_py, chunk_tokens, stride):
    out = []
    for d, t in docs_py:
        toks = _tokens(t)
        cid = 0
        for start in range(0, len(toks), stride):
            piece = toks[start:start + chunk_tokens]
            out.append((d, cid, len(piece), " ".join(piece)))
            cid += 1
    return sorted(out)


@pytest.mark.parametrize("chunk_tokens,stride", [(16, 16), (16, 8), (7, 7)])
def test_chunks_match_python_oracle(documents, docs_py, chunk_tokens, stride):
    got = sorted(map(tuple, chunk_documents(
        documents, chunk_tokens=chunk_tokens, stride=stride).collect()))
    assert got == _chunks_py(docs_py, chunk_tokens, stride)


def test_chunks_handcrafted(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "")], "doc_id int, text string")
    got = sorted(map(tuple, chunk_documents(docs, chunk_tokens=2).collect()))
    assert got == [(1, 0, 2, "a b"), (1, 1, 2, "c d"), (1, 2, 1, "e"),
                   (2, 0, 1, "x")]  # empty doc -> zero chunks
    # overlapping windows (retrieval stride < chunk)
    ov = sorted(map(tuple, chunk_documents(
        docs.filter("doc_id = 1"), chunk_tokens=3, stride=2).collect()))
    assert ov == [(1, 0, 3, "a b c"), (1, 1, 3, "c d e"), (1, 2, 1, "e")]


def test_chunks_reassemble_to_document(documents, docs_py):
    """Disjoint chunks concatenated in chunk_id order reproduce the token
    stream of every document — nothing lost, nothing duplicated."""
    got = {}
    for d, cid, _n, text in map(tuple, chunk_documents(
            documents, chunk_tokens=11).collect()):
        got.setdefault(d, []).append((cid, text))
    for d, t in docs_py:
        toks = _tokens(t)
        pieces = [x for _, x in sorted(got.get(d, []))]
        assert _tokens(" ".join(pieces)) == toks, d


def test_chunks_partitioning_invariant(documents):
    a = sorted(map(tuple, chunk_documents(
        documents.repartition(1), chunk_tokens=9).collect()))
    b = sorted(map(tuple, chunk_documents(
        documents.repartition(8), chunk_tokens=9).collect()))
    assert a == b


def test_chunks_rejects_bad_params(documents):
    with pytest.raises(ValueError):
        chunk_documents(documents, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(documents, chunk_tokens=4, stride=0)


# ---------------------------------------------------------------------------
# unigram_logprob
# ---------------------------------------------------------------------------


def _logprob_py(docs_py):
    toks = {d: _tokens(t) for d, t in docs_py}
    c = Counter(t for v in toks.values() for t in v)
    total = sum(c.values())
    out = {}
    for d, tl in toks.items():
        if not tl:
            out[d] = (0, None)
            continue
        tf = Counter(tl)
        lps = sorted(round(n * math.log(c[t] / total), 9)
                     for t, n in tf.items())
        acc = 0.0
        for x in lps:
            acc += x
        out[d] = (len(tl), round(acc / len(tl), 6))
    return out


def test_logprob_matches_python_oracle(documents, docs_py):
    got = {int(r["doc_id"]): (r["n_tokens"], r["avg_logprob"])
           for r in unigram_logprob(documents).collect()}
    want = _logprob_py(docs_py)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        if want[d][1] is None:
            assert got[d][1] is None, d
        else:
            assert math.isclose(got[d][1], want[d][1], rel_tol=0,
                                abs_tol=2e-6), (d, got[d], want[d])


def test_logprob_orders_quality(spark):
    """A doc of corpus-common tokens must outscore a doc of one-off tokens
    under the same model — the signal the operator exists to provide."""
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "zqx jkw vbn plm qwe rty"))
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["avg_logprob"]
           for r in unigram_logprob(docs).collect()}
    assert got[0] > got[100]


def test_logprob_partitioning_invariant(documents):
    a = sorted(map(tuple, unigram_logprob(documents.repartition(1)).collect()))
    b = sorted(map(tuple, unigram_logprob(documents.repartition(8)).collect()))
    assert a == b  # exact — every score bit (sorted-fold contract)
