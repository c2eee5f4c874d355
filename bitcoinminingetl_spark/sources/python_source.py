"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API)
for the landed-tick directory — R1 as a first-class pluggable source.

json_source.read_landed_json covers the common case (Spark's native JSON
reader over a landing dir). This module is the answer when the feed is
something Spark has NO native reader for — a bespoke wire format, a
paginated API snapshot, a proprietary archive: implement
``DataSource``/``DataSourceReader`` in pure Python, register it once,
and the format name becomes available to every `spark.read` in the
session, with partition-level parallelism the engine schedules like any
other scan. Reading the same landed JSON ticks here is deliberate: the
test differential-checks this source against the native reader, which
verifies the partitioning/iteration contract rather than any parsing
novelty.

Scale notes: ``partitions()`` returns one ``InputPartition`` per landed
file, so a 10k-file landing dir fans out as 10k independently scheduled
Python read tasks (Arrow-batched back to the JVM). The planner cannot
push filters into an opaque Python reader — project/filter AFTER load
stay Catalyst-side — so keep custom sources at the edge and convert to
parquet early (sink.py) rather than re-scanning them.

The same class also exposes the landing dir as an unbounded STREAM
(``simpleStreamReader``): offsets are consumed-file counts (landings are
append-only and filename-ordered), and ``readBetweenOffsets`` replays a
committed range so checkpoint recovery keeps exactly-once.

Reference parity: extract.py:6-20 (fetch + swallow-on-error);
malformed/unreadable files yield zero rows instead of failing the scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Flat projection of etl.PAYLOAD_SCHEMA (a custom reader returns rows,
# not nested JSON to re-parse; the flattening IS its parse step).
TICK_SCHEMA = (
    "spider_ts long, usd long, price_time long, "
    "hashrate double, difficulty double"
)


def _parse_tick_file(path: str):
    """Parse one landed tick file into flat typed rows. Error swallowing
    mirrors the reference: a corrupt file contributes nothing, it never
    kills the scan."""
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                price = d.get("price_data") or {}
                hr = d.get("hash_rate_data") or {}
                yield (
                    d.get("spider_ts"),
                    price.get("USD"),
                    price.get("time"),
                    hr.get("currentHashrate"),
                    hr.get("currentDifficulty"),
                )
    except OSError:
        return


def _landed_files(landing_dir: str) -> list[str]:
    """Landed files in landing order — filenames carry a nanosecond
    timestamp (json_source.land_payload), so lexicographic sort IS
    arrival order, which makes a plain file count a valid stream
    offset."""
    return [
        os.path.join(landing_dir, f)
        for f in sorted(os.listdir(landing_dir))
        if f.endswith(".json")
    ]


class TickFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class LandedTickReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.dir = options["path"]

    def partitions(self) -> list[TickFilePartition]:
        """One partition per landed file — the unit the scheduler
        distributes; files are independent, so no global state."""
        return [TickFilePartition(p) for p in _landed_files(self.dir)]

    def read(self, partition: TickFilePartition):
        yield from _parse_tick_file(partition.path)


class LandedTickStreamReader(SimpleDataSourceStreamReader):
    """The same landing dir as an UNBOUNDED source: the stream offset is
    the count of files already consumed (valid because landings are
    append-only and filename-ordered). Each microbatch reads the files
    between two counts; ``readBetweenOffsets`` replays a committed range
    deterministically after restart — the exactly-once contract the
    engine's checkpoint needs from a custom source."""

    def __init__(self, options: dict) -> None:
        self.dir = options["path"]

    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict):
        files = _landed_files(self.dir)
        rows = [
            r for p in files[start["n"] :] for r in _parse_tick_file(p)
        ]
        return iter(rows), {"n": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _landed_files(self.dir)[start["n"] : end["n"]]
        return iter(r for p in files for r in _parse_tick_file(p))


class LandedTickDataSource(DataSource):
    """``spark.read.format("landed_ticks").option("path", dir).load()``
    after ``spark.dataSource.register(LandedTickDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "landed_ticks"

    def schema(self) -> str:
        return TICK_SCHEMA

    def reader(self, schema) -> LandedTickReader:
        return LandedTickReader(self.options)

    def simpleStreamReader(self, schema) -> LandedTickStreamReader:
        return LandedTickStreamReader(self.options)
