"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container ships no codec libraries (PIL/cv2/librosa absent), so the
*decode* step is stubbed: ``decode_media`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder derives
(width, height, n_frames) from the payload bytes.  Everything around the
decode — schema, Arrow batch shape, ``mapInPandas`` signature, partitioning
— is real and tested, so swapping in a real codec is a one-function change.

Operators:
- :func:`media_table` — normalize (media_ref, payload, kind) rows.
- :func:`media_byte_stats` — REAL numpy feature extraction on the binary
  column (length, byte entropy proxy, mean byte) — the vectorized-UDF hot
  path pattern for any per-blob feature.
- :func:`decode_media` — stub/fake decode -> typed metadata struct.
- :func:`frame_sample_plan` — deterministic frame-sampling plan for video
  blobs (indices only; extraction is part of the stubbed decode).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "media_ref string, kind string, payload binary"

DECODED_SCHEMA = (
    "media_ref string, kind string, width int, height int, n_frames int, "
    "sample_rate int"
)

BYTE_STATS_SCHEMA = (
    "media_ref string, n_bytes long, mean_byte double, distinct_bytes int"
)


def media_table(df: DataFrame, *, ref_col: str = "media_ref",
                kind_col: str = "kind", payload_col: str = "payload") -> DataFrame:
    return df.select(
        F.col(ref_col).cast("string").alias("media_ref"),
        F.col(kind_col).cast("string").alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
    )


def synthetic_media(spark, n: int, *, partitions: int | None = None) -> DataFrame:
    """Deterministic fake blobs (seeded by index): binary payloads whose
    bytes derive from md5 chains — no external data, stable at any scale."""
    import hashlib
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            refs, kinds, payloads = [], [], []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                seed = hashlib.md5(f"media:{i}".encode()).digest()
                size = 256 + (seed[0] << 4)
                reps = -(-size // 16)
                buf = (seed * reps)[:size]
                refs.append(f"{kind}://blob/{i}")
                kinds.append(kind)
                payloads.append(bytes(buf))
            yield pd.DataFrame({"media_ref": refs, "kind": kinds, "payload": payloads})

    return spark.range(n, numPartitions=partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def media_byte_stats(media: DataFrame) -> DataFrame:
    """Vectorized per-blob byte statistics (Arrow in, numpy compute)."""

    def stats(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            n_bytes, mean_byte, distinct = [], [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                n_bytes.append(len(arr))
                mean_byte.append(float(arr.mean()) if len(arr) else 0.0)
                distinct.append(int(np.unique(arr).size) if len(arr) else 0)
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "n_bytes": n_bytes,
                "mean_byte": mean_byte,
                "distinct_bytes": distinct,
            })

    return media.select("media_ref", "payload").mapInPandas(stats, schema=BYTE_STATS_SCHEMA)


def decode_media(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode blobs to typed metadata.  STUB: real codecs are unavailable in
    this container; ``fake=True`` runs a deterministic fake decoder (metadata
    derived from payload bytes) exercising the identical plumbing."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires a codec library (PIL/cv2/librosa); "
                    "install one and replace this branch — the Spark plumbing "
                    "(schema, batching, partitioning) is already in place"
                )
            rows = {k: [] for k in ("media_ref", "kind", "width", "height",
                                    "n_frames", "sample_rate")}
            for ref, kind, payload in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
                arr = np.frombuffer(payload or b"\0\0\0\0", dtype=np.uint8)
                rows["media_ref"].append(ref)
                rows["kind"].append(kind)
                rows["width"].append(16 + int(arr[0]) if kind == "image" else 0)
                rows["height"].append(16 + int(arr[1]) if kind == "image" else 0)
                rows["n_frames"].append(1 + int(arr[2]) if kind == "video" else
                                        (1 if kind == "image" else 0))
                rows["sample_rate"].append(8000 * (1 + int(arr[3]) % 6)
                                           if kind == "audio" else 0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame-sampling plan: one row per sampled frame index.
    Pure column math (sequence + explode); the actual pixel extraction
    belongs to the stubbed decode step."""
    return (
        decoded.filter(F.col("kind") == "video")
        .select(
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
