"""Multimodal columns (BASELINE.json north star): media as opaque binary
columns + typed metadata structs, processed by Arrow-batched Python.

The decode kernel is a REAL, dependency-free container parser: PNG /
JPEG / GIF / BMP dimensions are read straight from the header bytes in
pure Python (no PIL/libvips needed — container metadata lives in the
first few hundred bytes). Payloads that are not a recognized image
container decode to (null, null, 'unknown') — the honest answer for a
media lake with mixed or corrupt payloads. Full pixel decode (resize,
feature extraction) would swap in a codec library inside the same
mapInPandas kernel; the Spark-side plumbing — BinaryType column,
metadata struct schema, Arrow batch shape, partition sizing — is
identical either way and is what this module tests.

Scale notes: binary payloads ride the same parquet scans as everything
else; never collect them. Partition sizing matters more than usual —
spark.sql.files.maxPartitionBytes bounds bytes-per-task so a partition of
10 MB images fits executor memory; decode parallelism == partition count.
Header-only parsing reads <1 KB per payload regardless of image size, so
the kernel is IO-bound on the parquet scan, not CPU-bound.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.registry import query


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


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG marker segments to the first SOFn frame header
    (C0-CF minus C4/C8/CC, which are not frames) and read the 16-bit
    big-endian height/width stored at offsets +5/+7 of the segment."""
    i, n = 2, len(b)
    while i + 9 <= n:
        if b[i] != 0xFF:
            return None  # desynced: not a marker stream
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:  # standalone markers
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return (w, h) if w and h else None
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        i += 2 + seg_len
    return None


def _decode_image(payload: bytes) -> tuple[int | None, int | None, str]:
    """Decode an image payload's (width, height, format) from its
    container header — pure Python, no codec dependency. Unrecognized
    payloads return (None, None, 'unknown') rather than raising: a
    corrupt blob must not kill a 100 TB decode pass."""
    if payload is None:
        return None, None, "unknown"
    b = payload
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            return (
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
                "png",
            )
        if b[:2] == b"\xff\xd8":
            dims = _jpeg_dims(b)
            if dims:
                return dims[0], dims[1], "jpeg"
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return (
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
                "gif",
            )
        if b[:2] == b"BM" and len(b) >= 26:
            return (
                int.from_bytes(b[18:22], "little", signed=True),
                abs(int.from_bytes(b[22:26], "little", signed=True)),
                "bmp",
            )
    except (IndexError, ValueError):
        pass
    return None, None, "unknown"


_DECODE_SCHEMA = "doc_id long, width int, height int, format string, aspect double"


def _decode_batches(batches):
    """The mapInPandas decode kernel: one Arrow batch of (doc_id,
    payload: binary) in, one typed metadata frame out. Module-level so
    the planted-fixture test can drive it with real image bytes."""
    for pdf in batches:
        dims = [_decode_image(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pd.Series([d[0] for d in dims], dtype="Int32"),
                "height": pd.Series([d[1] for d in dims], dtype="Int32"),
                "format": [d[2] for d in dims],
                "aspect": pd.Series(
                    [
                        round(d[0] / d[1], 4) if d[0] and d[1] else None
                        for d in dims
                    ],
                    dtype="float64",
                ),
            }
        )


@query("q_multimodal_pipeline")  # rows-only: binary payloads aren't SQL-expressible
def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media feature-extraction pipeline shape: binary column ->
    mapInPandas decode/feature kernel -> typed metadata struct columns.
    Arrow moves the bytes to Python per-batch; output schema is declared
    up front (width/height/format/aspect, dimensions nullable for
    non-image payloads). The decode kernel is the real header parser
    `_decode_image`; over the documents stand-in payloads every row
    honestly reports 'unknown' — the planted-fixture test feeds the same
    kernel real PNG/JPEG/GIF/BMP bytes and asserts exact dimensions."""
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_decode_batches, _DECODE_SCHEMA)


_FS_K = 8  # frames sampled per clip
_FS_FPS = 24


@query(
    "q_multimodal_framesample",
    oracle=f"""
    WITH v AS (
        SELECT doc_id,
               octet_length(encode(text)) % 240 + 1 AS n_frames
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_frames,
               unnest(range(LEAST({_FS_K}, n_frames))) AS i
        FROM v
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST((i * n_frames) // LEAST({_FS_K}, n_frames) AS BIGINT)
               AS frame_idx,
           CAST(((i * n_frames) // LEAST({_FS_K}, n_frames)) * 1000
                // {_FS_FPS} AS BIGINT) AS t_ms
    FROM s
    """,
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling — the fan-out plan that turns one clip row
    into K frame-extraction tasks: uniform sample of K frame indices from
    the clip's frame count (metadata-derived; payload byte length stands
    in for a real container's duration field, same doctrine as
    q_multimodal_meta), exploded so downstream decode parallelism is
    per-FRAME, not per-clip — at 100 TB one 2-hour video must not pin one
    task. All JVM-side: sequence() + explode, integer `div` arithmetic
    (floor(i * n_frames / K) spacing, t_ms at {_FS_FPS} fps). The actual
    pixel decode of a sampled frame would be the same mapInPandas kernel
    shape as q_multimodal_pipeline with an ffmpeg-backed parser swapped
    in; the sampling plan here is what Spark owns either way."""
    nf = (F.length(F.encode(F.col("text"), "UTF-8")) % 240 + 1).cast("long")
    k = F.least(F.lit(_FS_K).cast("long"), F.col("n_frames"))
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", nf.alias("n_frames"))
        .select("doc_id", "n_frames", F.explode(F.sequence(F.lit(0), k - 1)).alias("i"))
        .select(
            "doc_id",
            "n_frames",
            F.expr(
                f"(i * n_frames) div least({_FS_K}, n_frames)"
            ).alias("frame_idx"),
            F.expr(
                f"((i * n_frames) div least({_FS_K}, n_frames)) * 1000"
                f" div {_FS_FPS}"
            ).alias("t_ms"),
        )
    )


_EMBED_DIM = 16


def _feature_batches(batches):
    """The mapInPandas feature-extraction kernel: (doc_id, payload:
    binary) batches in, (doc_id, n_bytes, feature: array<float>) out.

    STUB MATH, REAL PLUMBING: the container ships no image/audio libs,
    so the "model" is a deterministic 16-bin byte histogram (L1
    normalized) — the Spark-side contract (Arrow batch boundary, binary
    input column, fixed-dim float vector output schema, per-batch numpy
    vectorization) is exactly what a real CLIP/ResNet kernel needs;
    swapping the histogram for torch inference changes only this
    function's body. Deterministic by construction, so tests can assert
    byte-for-byte stable features across runs and partitionings."""
    import numpy as np

    for pdf in batches:
        feats = []
        nb = []
        for b in pdf["payload"]:
            # NULL payload (e.g. encode(NULL text)) = empty asset: 0 bytes,
            # all-zero histogram — never a worker crash.
            arr = np.frombuffer(b"" if b is None else bytes(b), dtype=np.uint8)
            nb.append(len(arr))
            hist = np.bincount(arr >> 4, minlength=_EMBED_DIM).astype(
                np.float64
            )
            total = hist.sum()
            feats.append(
                (hist / total if total else hist).astype(np.float32).tolist()
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "n_bytes": nb, "feature": feats}
        )


@query("q_multimodal_embed")  # rows-only: binary payloads aren't SQL-expressible
def q_multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction (embedding) over binary payloads — the
    decode→featurize step between q_multimodal_pipeline's header parse
    and the ANN/dedup family's vector operators: every payload maps to a
    fixed 16-dim float vector ready for q_dedup_embed_cosine_lsh /
    q_knn_join_lsh downstream.

    Scale shape: map-only — no shuffle anywhere; Arrow batches bound
    Python-boundary cost; output vectors are ~64 B/row regardless of
    payload size, so the stage SHRINKS the data (the reason feature
    extraction runs before any shuffle-heavy op in a media pipeline).
    Partitioning is inherited from the scan, so downstream bucketing
    sees the same layout."""
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(
        _feature_batches, "doc_id long, n_bytes long, feature array<float>"
    )


_RESIZE_W = 32
_RESIZE_H = 32


def _resize_batches(batches):
    """The mapInPandas resize kernel: (doc_id, payload: binary) in,
    (doc_id, in_bytes, width, height, thumb: binary) out — binary column
    BOTH directions, the shape a real thumbnailer needs.

    STUB MATH, REAL PLUMBING: with no codec libs, "resize" is a
    deterministic byte-domain downsample — the payload is nearest-
    neighbor index-sampled into a fixed W*H "pixel" buffer (empty
    payloads produce a zero buffer). A real implementation swaps the
    index sampling for PIL/ffmpeg decode→resize→encode; the Arrow
    round trip of variable-size binary in / fixed-size binary out, the
    per-batch numpy vectorization, and the declared output schema are
    exactly what that kernel would use."""
    import numpy as np

    size = _RESIZE_W * _RESIZE_H
    for pdf in batches:
        thumbs = []
        in_bytes = []
        for b in pdf["payload"]:
            # NULL payload (e.g. encode(NULL text)) = empty asset: 0 bytes,
            # all-zero histogram — never a worker crash.
            arr = np.frombuffer(b"" if b is None else bytes(b), dtype=np.uint8)
            in_bytes.append(len(arr))
            if len(arr):
                idx = (np.arange(size) * len(arr)) // size
                thumbs.append(arr[idx].tobytes())
            else:
                thumbs.append(bytes(size))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "in_bytes": in_bytes,
                "width": _RESIZE_W,
                "height": _RESIZE_H,
                "thumb": thumbs,
            }
        )


@query("q_multimodal_resize")  # rows-only: binary payloads aren't SQL-expressible
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize/thumbnail — completing the decode / feature-extract /
    resize / frame-sample multimodal quartet: every payload maps to a
    fixed 32x32 byte buffer plus size metadata.

    Scale shape: map-only, no shuffle; output rows are FIXED-size
    (1 KiB + metadata) however large the input payload, so the stage
    bounds downstream memory per row — the property that lets thumbnail
    tables join and shuffle freely where raw media never could. Input
    partitioning is inherited; at 100 TB the only knob is
    maxPartitionBytes on the scan side."""
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(
        _resize_batches,
        "doc_id long, in_bytes long, width int, height int, thumb binary",
    )
