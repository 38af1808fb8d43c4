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


def test_first_relation_bare_geometry(spark):
    """P4 default mode: bare geometry of the first qualifying relation."""
    docs = fixture_documents(spark, DATA_DIR)
    sub = docs.filter("doc_id = 'relation.json'")
    out = convert(sub, Options(complete_feature=False)).collect()
    got = json.loads(out[0]["geojson"])
    with open(os.path.join(EXPECTED_DIR, "relation.json.geojson"), encoding="utf-8") as f:
        expected = json.load(f)
    assert normalize(got) == normalize(expected["features"][0]["geometry"])
