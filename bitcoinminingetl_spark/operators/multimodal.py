"""Multimodal columns (BASELINE.json north star): media as opaque binary
columns + typed metadata structs, processed by Arrow-batched Python.

The container has no image/audio codecs, so the decode kernel is a
deterministic fake behind a clearly marked stub (`_decode_image`); the
Spark-side plumbing — BinaryType column, metadata struct schema,
mapInPandas batch shape, partition sizing — is real and oracle/unit
tested. Swapping the fake for PIL/ffmpeg changes one function body,
no plan changes.

Scale notes: binary payloads ride the same parquet scans as everything
else; never collect them. Partition sizing matters more than usual —
spark.sql.files.maxPartitionBytes bounds bytes-per-task so a partition of
10 MB images fits executor memory; decode parallelism == partition count.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.registry import query

_HAVE_CODECS = False  # no PIL/ffmpeg in this environment


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction, fully JVM-side: payload size and
    content digest over a BinaryType column (documents.text encoded as the
    stand-in payload). This is the dedup/integrity layer for media lakes —
    no Python, no decode."""
    blob = F.encode(F.col("text"), "UTF-8")
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("digest"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _decode_image(payload: bytes) -> tuple[int, int, str]:
    """Decode an image payload to (width, height, format).

    STUB: real decoding needs an image codec (PIL/libvips), absent from
    this container. The deterministic fake derives dimensions from the
    payload digest so tests are stable; the real implementation replaces
    only this body.
    """
    if _HAVE_CODECS:
        raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192, "fake"


@query("q_multimodal_pipeline")  # rows-only: fake-decode output is engine-side
def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media feature-extraction pipeline shape: binary column ->
    mapInPandas decode/feature kernel -> typed metadata struct columns.
    Arrow moves the bytes to Python per-batch; output schema is declared
    up front (width/height/format/aspect). The decode kernel is the
    stubbed `_decode_image` (see module docstring)."""

    def decode(batches):
        for pdf in batches:
            dims = [_decode_image(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "format": [d[2] for d in dims],
                    "aspect": pd.Series(
                        [round(d[0] / d[1], 4) for d in dims], dtype="float64"
                    ),
                }
            )

    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(
        decode, "doc_id long, width int, height int, format string, aspect double"
    )
