"""SemDeDup (semantic_dedup) — keep rule, invariance, and guard."""

from __future__ import annotations

import pytest

from osm2geojson_lite_spark.pipeline import semantic_dedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


# Two well-separated unit centroids so assignments are unambiguous.
CENTS = [[1.0, 0.0], [0.0, 1.0]]


def test_exact_copy_dropped_original_kept(spark):
    df = _vecs(spark, [
        (1, [1.0, 0.0]),        # cluster 0
        (2, [1.0, 0.0]),        # exact copy of 1 -> same cent_cos, tie -> id 1 kept
        (3, [0.0, 1.0]),        # cluster 1, unique
    ])
    out = {r["vec_id"]: r for r in semantic_dedup(df, CENTS, threshold=0.999).collect()}
    assert out[1]["kept"] is True
    assert out[2]["kept"] is False
    assert out[3]["kept"] is True
    assert out[1]["cid"] == 0 and out[3]["cid"] == 1


def test_keep_rule_prefers_low_centroid_similarity(spark):
    # Both in cluster 0; cos(a,b) high; b is farther from the centroid
    # (lower cent_cos) so the SemDeDup rule keeps b and drops a.
    df = _vecs(spark, [
        (10, [1.0, 0.05]),
        (11, [1.0, 0.25]),
    ])
    out = {r["vec_id"]: r for r in semantic_dedup(df, CENTS, threshold=0.95).collect()}
    assert out[11]["cent_cos"] < out[10]["cent_cos"]
    assert out[11]["kept"] is True
    assert out[10]["kept"] is False


def test_cross_cluster_pairs_never_compared(spark):
    # Identical vectors would be duplicates, but they sit in different
    # clusters (here: same vector can't be in two clusters, so use two
    # near-diagonal vectors that split across the decision boundary).
    df = _vecs(spark, [
        (20, [1.0, 0.9]),   # cluster 0 (cos to [1,0] wins)
        (21, [0.9, 1.0]),   # cluster 1
    ])
    out = {r["vec_id"]: r for r in semantic_dedup(df, CENTS, threshold=0.9).collect()}
    assert out[20]["cid"] != out[21]["cid"]
    assert out[20]["kept"] and out[21]["kept"]


def test_partitioning_invariance(spark):
    rows = [(i, [1.0 + 0.001 * (i % 7), 0.01 * i]) for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # planted copies
    df = _vecs(spark, rows)
    a = sorted(map(tuple, semantic_dedup(df.repartition(1), CENTS).collect()))
    b = sorted(map(tuple, semantic_dedup(df.repartition(7), CENTS).collect()))
    assert a == b
    assert any(not r[3] for r in a)  # something was actually dropped


def test_large_cluster_guard(spark):
    df = _vecs(spark, [(i, [1.0, 0.0]) for i in range(30)])
    with pytest.raises(ValueError, match="largest cluster"):
        semantic_dedup(df, CENTS, max_cluster_rows=10)
    # opting in works
    out = semantic_dedup(df, CENTS, max_cluster_rows=10,
                         allow_large_clusters=True).collect()
    assert sum(1 for r in out if r["kept"]) == 1  # all identical -> one kept
