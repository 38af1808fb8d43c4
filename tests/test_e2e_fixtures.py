"""Golden-fixture parity: full pipeline vs the reference's expected GeoJSON.

Mirrors the reference e2e harness (``test/e2e.test.ts``): every fixture in
``test/data`` converted with ``completeFeature=True`` must equal the parsed
golden in ``test/expected`` (geometry type, coordinate order, properties).
"""

from __future__ import annotations

import json
import os

import pytest

from osm2geojson_lite_spark import Options, convert
from osm2geojson_lite_spark.sources.synth import fixture_documents

from .conftest import normalize

DATA_DIR = "/root/reference/test/data"
EXPECTED_DIR = "/root/reference/test/expected"

FIXTURES = sorted(
    n for n in os.listdir(DATA_DIR)
    if os.path.isfile(os.path.join(DATA_DIR, n))
    and os.path.exists(os.path.join(EXPECTED_DIR, n + ".geojson"))
)


@pytest.fixture(scope="module")
def converted(spark):
    docs = fixture_documents(spark, DATA_DIR)
    out = convert(docs, Options(complete_feature=True)).collect()
    return {r["doc_id"]: r["geojson"] for r in out}


@pytest.mark.parametrize("name", FIXTURES)
def test_fixture_parity(converted, name):
    with open(os.path.join(EXPECTED_DIR, name + ".geojson"), encoding="utf-8") as f:
        expected = json.load(f)
    got = json.loads(converted[name])
    assert normalize(got) == normalize(expected)


@pytest.mark.parametrize("name", FIXTURES)
def test_fixture_byte_exact(converted, name):
    """F11 end-to-end (VERDICT r3 #7): the emitted string equals the parsed
    golden re-serialized by the engine's canonical JS-number serializer —
    NO normalization.  Pins compact separators, key insertion order,
    integral-float rendering, and every coordinate's textual form for all
    27 fixtures, not just ``relation.json``."""
    from osm2geojson_lite_spark.functions.jsnumber import canonical_json

    with open(os.path.join(EXPECTED_DIR, name + ".geojson"), encoding="utf-8") as f:
        golden = canonical_json(json.load(f))
    assert converted[name] == golden


def test_first_relation_bare_geometry(spark):
    """P4 default mode: bare geometry of the first qualifying relation."""
    docs = fixture_documents(spark, DATA_DIR)
    sub = docs.filter("doc_id = 'relation.json'")
    out = convert(sub, Options(complete_feature=False)).collect()
    got = json.loads(out[0]["geojson"])
    with open(os.path.join(EXPECTED_DIR, "relation.json.geojson"), encoding="utf-8") as f:
        expected = json.load(f)
    assert normalize(got) == normalize(expected["features"][0]["geometry"])
