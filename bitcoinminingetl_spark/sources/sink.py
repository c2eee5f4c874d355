"""Append sinks (R6: the reference's per-row INSERT at transform.py:34-46,
replaced by partition-level parquet writes).

Layout policy for 100 TB: partition by a low-cardinality time-derived
column (date) so (a) writers append new partitions without touching old
ones, (b) readers get partition pruning on time predicates — the
reference's every-query-filters-on-time pattern (data_model.py:29-30)
becomes directory pruning before any IO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_parquet(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """Idempotent-append parquet sink. Each task writes its own files —
    no coordination, no per-row round trips (contrast reference
    transform.py:43-45: one cursor.execute per row)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_events_by_day(df: DataFrame, path: str) -> None:
    """The engine's avg_info-style sink: derive a date partition column
    from event time and append. Readers filtering on ts get partition
    pruning for free."""
    append_parquet(
        df.withColumn("ds", F.date_format("ts", "yyyy-MM-dd")), path, ("ds",)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compaction: rewrite a parquet directory into ~target-sized files.

    Streaming appends (run_to_parquet) and frequent micro-batch sinks
    accumulate small files; at cluster scale a million 100 KB files turns
    every scan into a metadata storm. Sizing by the directory's actual
    bytes (not file count) keeps output files near the scan split target
    so one file ≈ one task. Returns the new file count.

    Rewrite lands in `<path>._compact` then swaps in — the swap is the
    non-transactional stand-in for a table format's atomic commit."""
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + "._compact"
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def compact_by_plan(
    spark: SparkSession, layout_path: str, bins: "DataFrame"
) -> dict:
    """Execute a compaction plan (r10 VERDICT item 6): for every
    (ds, bin) merge group in the shared binning relation
    (operators/scans.compaction_file_bins — the SAME relation
    q_compaction_plan aggregates, so planner and executor cannot
    disagree on inventory) with more than one file, read EXACTLY that
    group's files, rewrite them as ONE parquet file back into the
    partition directory, and delete the originals. Single-file bins and
    at-target files are untouched — the plan's skip decisions are
    honored, not re-derived. Returns {(ds, bin): merged_file_path}.

    The driver-side loop is deliberate and bounded: it iterates the
    |files|-row plan relation (orders of magnitude below the data, the
    same argument as the plan query); each group's rewrite is a
    DISTRIBUTED read of just that group's files. Byte sizes after the
    rewrite differ from the plan's total_bytes (parquet re-encoding
    changes compression framing); ROW totals are preserved exactly,
    and that is what the differential test pins.

    Crash safety (r11 ADVICE): the old sequence moved the merged file
    in BEFORE deleting the originals, so a crash between the two left
    the bin's rows DUPLICATED for every reader — and unhealable,
    because re-planning binned against the corrupted listing. Per
    group the sequence is now (1) write the merged file to a hidden
    scratch dir, (2) rename the originals to dot-prefixed tombstones —
    invisible to Spark readers, bytes intact, each suffix naming the
    merged file that supersedes it, (3) move the merged file in (one
    rename), (4) delete the tombstones. No crash point ever shows a
    reader a duplicated row; a crash inside (2)-(4) hides rows until
    `recover_compaction` replays the groups' outcomes from the
    tombstone names themselves.

    CONCURRENCY CONTRACT (r12 ADVICE): compaction requires EXCLUSIVE
    access to the layout. Even on the healthy path there is a transient
    window — between step (2) tombstoning the originals and step (3)
    moving the merged file in — where a concurrent Spark reader sees
    the bin's rows MISSING (never duplicated, but absent). That window
    exists on every successful run, not only after a crash. True
    reader isolation would need a manifest/commit-marker protocol
    (atomically swap a manifest the readers resolve file lists
    through — the Delta/Iceberg design); this layout is plain
    directory-listed parquet, so the contract is scheduling, not
    protocol: run compaction when no readers are active."""
    import os
    import shutil

    groups: dict[tuple, list] = {}
    for r in bins.collect():
        groups.setdefault((r.ds, int(r.bin)), []).append(r.file)
    merged: dict = {}
    for (ds, b), files in sorted(groups.items()):
        if len(files) < 2:
            continue  # the plan's rewrite_worthwhile=False case
        tmp = f"{layout_path}/._compact_{ds}_{b}"
        # explicit leaf-file read: no basePath, so the partition column
        # is NOT inferred and the rewritten file keeps the inner schema
        # the layout's other files carry
        spark.read.parquet(*files).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        assert len(part) == 1, part
        dest_base = f"compact-bin{b}-{part[0]}"
        tombstones = []
        for f in files:
            p = _local_path(f)
            t = os.path.join(
                os.path.dirname(p),
                "." + os.path.basename(p) + _TOMB_SEP + dest_base,
            )
            os.rename(p, t)
            tombstones.append(t)
        dest = f"{layout_path}/ds={ds}/{dest_base}"
        shutil.move(os.path.join(tmp, part[0]), dest)
        shutil.rmtree(tmp)
        for t in tombstones:
            os.remove(t)
        merged[(ds, b)] = dest
    return merged


# Tombstone suffix: ".{original}{_TOMB_SEP}{merged file name}". The
# suffix makes every tombstone self-describing for recovery — the
# merged file name carries a per-run uuid, so an old run's compacted
# file can never be mistaken for a crashed new run's commit marker.
_TOMB_SEP = ".pending-"


def _local_path(file_ref: str) -> str:
    """Local filesystem path for a file reference from the bins
    relation. binaryFile's `path` column is an UNENCODED file: URI
    (measured: a space reads back as ' ', not %20 — it is
    `_metadata.file_path` that percent-encodes), so the raw URI path is
    normally already the on-disk name; fall back to percent-decoding
    only when the raw form does not exist, so a literal '%25' in a
    file name is never corrupted by an unconditional unquote."""
    from urllib.parse import unquote, urlparse

    import os

    p = urlparse(file_ref).path
    return p if os.path.exists(p) else unquote(p)


def recover_compaction(layout_path: str) -> dict:
    """Heal a layout after a compact_by_plan crash. For every tombstone
    left behind: if the merged file its suffix names EXISTS in the same
    directory, that group committed — drop the tombstone; otherwise the
    group never committed — restore the original by stripping the
    tombstone decoration. Leftover hidden scratch dirs are removed.
    Idempotent; returns {"restored": [...], "dropped": [...]} so the
    operator can audit what a crash interrupted. Run it before
    re-planning: tombstoned files are invisible to the binaryFile
    listing, so a plan computed over an unhealed layout would silently
    exclude them."""
    import os
    import shutil

    restored: list[str] = []
    dropped: list[str] = []
    for entry in sorted(os.listdir(layout_path)):
        if entry.startswith("._compact_"):
            shutil.rmtree(os.path.join(layout_path, entry))
    for dp, _dirs, fs in os.walk(layout_path):
        for name in sorted(fs):
            if not (name.startswith(".") and _TOMB_SEP in name):
                continue
            orig, dest_base = name[1:].rsplit(_TOMB_SEP, 1)
            t = os.path.join(dp, name)
            if os.path.exists(os.path.join(dp, dest_base)):
                os.remove(t)
                dropped.append(t)
            else:
                back = os.path.join(dp, orig)
                os.rename(t, back)
                restored.append(back)
    return {"restored": restored, "dropped": dropped}


def retention_sweep(path: str, keep_days: int, today: str) -> list[str]:
    """Partition-level retention: drop `ds=YYYY-MM-DD` partitions older
    than `keep_days` before `today` from a date-partitioned sink — the
    TTL every append-forever table needs (the reference's MySQL table
    grows unbounded; init.sql declares no retention either).

    Deliberately METADATA-ONLY: deletion is directory removal by
    partition name — no file is opened, no data is scanned, cost is
    O(partitions dropped) regardless of table size. That only works
    because append_events_by_day encodes event time in the PARTITION
    PATH; sweeping by file mtime would conflate processing time with
    event time and break backfills (a re-landed old day would suddenly
    look fresh). `today` is an explicit argument, not wall clock:
    retention must be deterministic and replayable in tests and in
    incident reconstruction. Returns the dropped partition names."""
    import datetime
    import os
    import shutil

    cutoff = datetime.date.fromisoformat(today) - datetime.timedelta(
        days=keep_days
    )
    dropped = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("ds="):
            continue
        try:
            ds = datetime.date.fromisoformat(entry[3:])
        except ValueError:
            continue  # never guess at unparseable partitions — leave them
        if ds < cutoff:
            shutil.rmtree(os.path.join(path, entry))
            dropped.append(entry)
    return dropped
