"""CLI front door — engine equivalent of the reference's
``npx osm2geojson INPUT_FILE OUTPUT_FILE`` (``/root/reference/src/cli.ts:19-39``).

Usage::

    python -m osm2geojson_lite_spark INPUT OUTPUT
    python -m osm2geojson_lite_spark < INPUT > OUTPUT
    python -m osm2geojson_lite_spark IN_DIR OUT_DIR     # one .geojson per file

Matches the reference CLI's forced options ``{completeFeature: true,
renderTagged: true}`` (``cli.ts:27``) and its trailing-newline output
(``cli.ts:29``).  A directory input converts every regular file inside as one
document each — the batch mode the single-document reference cannot offer;
the conversion itself still runs as one distributed Spark job.
"""

from __future__ import annotations

import os
import sys


def print_help() -> None:
    sys.stdout.write(
        "\n".join(
            [
                "Convert OpenStreetMap XML or JSON data to GeoJSON (Spark engine).",
                "",
                "Usage:",
                "  python -m osm2geojson_lite_spark INPUT_FILE OUTPUT_FILE",
                "  python -m osm2geojson_lite_spark < INPUT_FILE > OUTPUT_FILE",
                "  python -m osm2geojson_lite_spark INPUT_DIR OUTPUT_DIR",
                "",
            ]
        )
    )


def _span_row(doc_id: str, payload: str):
    return (doc_id, [{"kind": "text", "text": payload, "media_ref": None, "offset": 0}])


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if "-h" in argv or "--help" in argv:
        print_help()
        return 0

    input_path = argv[0] if len(argv) > 0 else "/dev/stdin"
    output_path = argv[1] if len(argv) > 1 else "/dev/stdout"

    from .operators.convert import Options, convert
    from .session import get_spark
    from .sources.synth import SPAN_SCHEMA

    dir_mode = os.path.isdir(input_path)
    if dir_mode:
        names = sorted(
            n for n in os.listdir(input_path)
            if os.path.isfile(os.path.join(input_path, n))
        )
        rows = [
            _span_row(n, open(os.path.join(input_path, n), encoding="utf-8").read())
            for n in names
        ]
    else:
        with open(input_path, encoding="utf-8") as f:
            rows = [_span_row(os.path.basename(input_path), f.read())]

    from pyspark.sql import SparkSession

    pre_existing = SparkSession.getActiveSession()
    spark = pre_existing or get_spark("osm2geojson-cli")
    docs = spark.createDataFrame(rows, schema=SPAN_SCHEMA)
    opts = Options(complete_feature=True, render_tagged=True)
    out = {r["doc_id"]: r["geojson"] for r in convert(docs, opts).collect()}

    if dir_mode:
        os.makedirs(output_path, exist_ok=True)
        for name, geojson in out.items():
            base = name.rsplit(".", 1)[0] if "." in name else name
            with open(os.path.join(output_path, base + ".geojson"), "w",
                      encoding="utf-8") as f:
                f.write(geojson + "\n")
    else:
        (doc_id,) = out
        with open(output_path, "w", encoding="utf-8") as f:
            f.write(out[doc_id] + "\n")
    if pre_existing is None:  # don't tear down a session we merely borrowed
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
