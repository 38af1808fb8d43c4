"""Streaming dedup operators: exact first-wins via native streaming
dropDuplicates (state survives micro-batches), near-dup suppression via
applyInPandasWithState, and batch/stream SimHash identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2geojson_lite_spark.streaming.dedup import (
    simhash_py,
    stream_exact_dedup,
    stream_near_dedup,
)


def _write_docs(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(rows, "doc_id string, text string").coalesce(1).write.mode(
        mode
    ).parquet(path)


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_docs(spark, inp, [
        ("a", "the quick brown fox"),
        ("b", "совершенно unrelated text body"),
        ("c", "THE  Quick   Brown Fox"),  # same normalized fingerprint as a
    ])
    q = stream_exact_dedup(spark, inp, outp, ckpt)
    q.awaitTermination(120)
    first = {r["doc_id"] for r in spark.read.parquet(outp).collect()}
    assert len(first) == 2 and "b" in first and len(first & {"a", "c"}) == 1

    # second micro-batch: an inter-batch duplicate of 'a' must be dropped
    # by the persisted state store, a fresh doc must pass
    _write_docs(spark, inp, [
        ("d", "the quick brown fox"),
        ("e", "a genuinely new document"),
    ], mode="append")
    q2 = stream_exact_dedup(spark, inp, outp, ckpt)
    q2.awaitTermination(120)
    final = {r["doc_id"] for r in spark.read.parquet(outp).collect()}
    assert "e" in final and "d" not in final
    assert len(final) == 3


def test_stream_near_dedup_buckets_and_state(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("nin", "nout", "nckpt"))
    base = "the quick brown fox jumps over the lazy dog again and again"
    # suffixes chosen to stay in a1's prefix bucket (verified: ' qq' ham=5,
    # ' pp' ham=2 from base); ' zz' flips a prefix bit and demonstrates the
    # documented single-pass blocking miss
    _write_docs(spark, inp, [
        ("a1", base),
        ("a2", base + " qq"),  # near-dup of a1, same bucket
        ("b1", "completely different content about spark catalyst optimizer internals"),
        ("z1", base + " zz"),  # near-dup content but different prefix bucket
    ])
    q = stream_near_dedup(spark, inp, outp, ckpt, max_hamming=6)
    q.awaitTermination(120)
    rows = {r["doc_id"]: r["is_duplicate_of"]
            for r in spark.read.parquet(outp).collect()}
    assert rows["a1"] is None  # first wins (doc_id order within batch)
    assert rows["a2"] == "a1"
    assert rows["b1"] is None
    assert rows["z1"] is None  # single-pass blocking miss (different bucket)

    # across micro-batches: state remembers a1
    _write_docs(spark, inp, [("a3", base + " pp")], mode="append")
    q2 = stream_near_dedup(spark, inp, outp, ckpt, max_hamming=6)
    q2.awaitTermination(120)
    rows2 = {r["doc_id"]: r["is_duplicate_of"]
             for r in spark.read.parquet(outp).collect()}
    assert rows2["a3"] == "a1"


def test_simhash_py_matches_batch_operator(spark):
    from osm2geojson_lite_spark.pipeline import simhash

    rows = [
        ("x", "the quick brown fox"),
        ("y", "numbers 123 and punct !?"),
        ("z", ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    batch = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=48).collect()}
    for doc_id, text in rows:
        assert batch[doc_id] == simhash_py(text, 48), doc_id


def test_stream_near_dedup_rotations_catch_prefix_miss(spark, tmp_path):
    """A planted near-dup pair differing ONLY inside the top prefix window:
    missed at rotations=1 (documented blocking miss), caught at rotations=2
    because the second pass blocks on the low bit window."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def planted_fp(text):
        return text.map(int)  # doc text IS the fingerprint

    fp_a = 0x0000F0F0F0F0
    fp_b = fp_a ^ (1 << 45)  # 1 bit apart, inside the top-8 window (40..47)

    for rotations, expect_dup in ((1, None), (2, "fa")):
        d = f"rot{rotations}"
        inp, outp, ckpt = (str(tmp_path / (d + s)) for s in ("in", "out", "ck"))
        _write_docs(spark, inp, [("fa", str(fp_a)), ("fb", str(fp_b))])
        q = stream_near_dedup(spark, inp, outp, ckpt, max_hamming=3,
                              rotations=rotations, fingerprint_udf=planted_fp)
        q.awaitTermination(120)
        rows = {r["doc_id"]: r["is_duplicate_of"]
                for r in spark.read.parquet(outp).collect()}
        assert rows["fa"] is None, rotations
        assert rows["fb"] == expect_dup, rotations


def test_pass_shifts_layout():
    from osm2geojson_lite_spark.streaming.dedup import pass_shifts

    assert pass_shifts(48, 8, 1) == [40]
    assert pass_shifts(48, 8, 2) == [40, 0]
    assert pass_shifts(48, 8, 3) == [40, 20, 0]
    assert all(0 <= s <= 40 for s in pass_shifts(48, 8, 5))
