"""Corpus-hygiene operator tests: PII redaction and benchmark
decontamination against pure-Python oracles (``re`` module / set algebra —
the patterns use only constructs whose semantics agree across Python
``re``, Java regex, and RE2, which is the portability claim under test)."""

from __future__ import annotations

import re

from osm2geojson_lite_spark.pipeline.scrub import (
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    decontaminate,
    pii_scrub,
)

PII_ROWS = [
    ("a", "plain text with no pii at all"),
    ("b", "mail me at jane.doe+spam@sub.example.co.uk today"),
    ("c", "server 192.168.0.1 and backup 10.0.255.17 are up"),
    ("d", "call +1 (555) 0123-44 or 020 7946 0958 now"),
    ("e", "bob@x.io pinged 8.8.8.8 then dialed +44 7911 123456"),
    ("f", ""),
    ("g", "two mails a@b.com c@d.org and dots 1.2.3.4.5.6"),
]


def _py_scrub(text):
    n_e = len(re.findall(EMAIL_RE, text))
    n_i = len(re.findall(IP_RE, text))
    n_p = len(re.findall(PHONE_RE, text))
    clean = re.sub(EMAIL_RE, "<EMAIL>", text)
    clean = re.sub(IP_RE, "<IP>", clean)
    clean = re.sub(PHONE_RE, "<PHONE>", clean)
    return clean, n_e, n_i, n_p


def test_pii_scrub_matches_python_re(spark):
    df = spark.createDataFrame(PII_ROWS, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert len(got) == len(PII_ROWS)
    for doc_id, text in PII_ROWS:
        clean, n_e, n_i, n_p = _py_scrub(text)
        r = got[doc_id]
        assert r["clean_text"] == clean, doc_id
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (n_e, n_i, n_p)


def test_pii_scrub_leaves_no_residual_matches(spark):
    df = spark.createDataFrame(PII_ROWS, ["doc_id", "text"])
    for r in pii_scrub(df).collect():
        assert not re.search(EMAIL_RE, r["clean_text"])
        assert not re.search(IP_RE, r["clean_text"])


DOCS = [
    ("1", "the quick brown fox jumps over the lazy dog tonight"),
    ("2", "a totally unrelated document about spark shuffles and joins"),
    # shares the benchmark's first 4-gram mid-document:
    ("3", "well the quick brown fox ran away from everything else"),
    ("4", "short doc"),
    ("5", ""),
]
BENCH = [("b1", "the quick brown fox jumps over the lazy dog")]


def _grams(text, n):
    toks = [t for t in text.lower().split(" ") if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_decontaminate_matches_python_sets(spark):
    n = 4
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["bid", "text"])
    got = {r["doc_id"]: r for r in
           decontaminate(docs, bench, n=n).collect()}
    bench_grams = set().union(*(_grams(t, n) for _, t in BENCH))
    assert len(got) == len(DOCS)  # every input doc appears exactly once
    for doc_id, text in DOCS:
        g = _grams(text, n)
        r = got[doc_id]
        assert r["n_doc_grams"] == len(g), doc_id
        assert r["n_overlap_grams"] == len(g & bench_grams), doc_id
        assert r["contaminated"] == bool(g & bench_grams), doc_id
    assert got["1"]["contaminated"] and got["3"]["contaminated"]
    assert not got["2"]["contaminated"] and not got["4"]["contaminated"]


def test_decontaminate_short_docs_are_clean(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["bid", "text"])
    out = {r["doc_id"]: r for r in
           decontaminate(docs, bench, n=40).collect()}
    for doc_id, _ in DOCS:
        assert out[doc_id]["n_doc_grams"] == 0
        assert not out[doc_id]["contaminated"]
