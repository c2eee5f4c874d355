"""Landed-JSON ingestion (R1: reference utils/extract.py:6-20).

Spark has no HTTP source, and polling an API inside an executor would tie
cluster health to an external endpoint. The idiomatic split: a thin
fetcher process (the reference's aiohttp loop, unchanged in spirit) lands
each payload as a JSON file; the engine reads the landing directory —
batch (`read_landed_json`) or tailing it as a stream
(streaming.pipeline.read_event_stream). Error-swallowing parity: the
reference returns None on any HTTP/parse failure (extract.py:13-20); here
malformed files land in a _corrupt_record column instead of killing the
job (PERMISSIVE mode), and the caller filters them out.
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fetch_payload(url: str, timeout: int = 5) -> dict | None:
    """The reference's fetch_data_from_api, minus asyncio (one call per
    landing tick needs no event loop): GET -> dict, None on ANY failure
    (extract.py:13-20 swallows errors the same way). Runs in the fetcher
    process, never on executors."""
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
            return json.loads(resp.read())
    except Exception:  # noqa: BLE001 — parity: reference swallows everything
        return None


def land_payload(payload: dict, landing_dir: str, prefix: str = "payload") -> str:
    """Append one payload as a single-line JSON file; the filename's
    nanosecond timestamp keeps landings unique and ordered."""
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, f"{prefix}-{time.time_ns()}.json")
    with open(path, "w") as f:
        json.dump(payload, f)
        f.write("\n")
    return path


def read_landed_json(
    spark: SparkSession, path: str, schema: str, keep_corrupt: bool = False
) -> DataFrame:
    """Batch-read a landing directory with a declared schema (inference
    over 100 TB of JSON means reading everything twice). PERMISSIVE mode
    routes malformed lines to _corrupt_record; by default they're dropped,
    mirroring the reference's None-swallowing."""
    if keep_corrupt:
        # Diagnostics path: PERMISSIVE + materialize (Spark disallows
        # lazily querying only the corrupt column over raw files).
        df = (
            spark.read.schema(schema + ", _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
        return df.cache()
    # Hot path: malformed lines dropped inside the scan — no extra column,
    # no filter stage, same None-swallowing as the reference.
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
