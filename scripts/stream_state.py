"""Streaming state-size receipt (r10 VERDICT item 5).

The five lifecycle queries carry wall-time bands, but wall time cannot
show the 100 TB streaming killer: UNBOUNDED STATE — a watermark that
never expires rows makes every batch a little slower and the store a
little bigger until the job dies days later. This script drives the two
stateful-join shapes (stream-stream interval join, per-user session
windows) through a multi-batch AvailableNow drain at sf0.1, records
`StreamingQueryProgress.stateOperators` (numRowsTotal / numRowsRemoved /
memoryUsedBytes) per batch, and writes STREAMSTATE.json with a
per-lifecycle bounded-state verdict: rows removed by expiry > 0 AND
final state rows < peak state rows. Exit 1 if either lifecycle's state
is NOT provably bounded — a vacuous receipt must fail the run, not wait
for the committed-artifact hygiene test.

The timeline helpers are imported from tests/test_streaming.py so the
per-pytest assertions and this committed receipt read the exact same
telemetry.

Usage: python scripts/stream_state.py  [SPARK_GRAFT_SF_DIR to override]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tree_stamp() -> dict:
    """Delegates to snapshot_round.tree_stamp — the ONE stamp
    implementation shared with bench.py and window_drill.py (r11 review
    finding: hand-rolled copies drift)."""
    from scripts.snapshot_round import tree_stamp

    return tree_stamp(REPO)


def _land(spark, work: str) -> str:
    """One week of events as 8 time-range JSON files -> 8 single-file
    micro-batches with a monotone watermark, so expiry is visible batch
    by batch (coalesce cannot INCREASE partition count — a low-partition
    source would collapse the whole week into 2 batches and hide the
    per-batch expiry the receipt exists to show)."""
    from bitcoinminingetl_spark.catalog import events_in_range

    landing = f"{work}/landing"
    (
        events_in_range(
            spark, SF_DIR, "2024-01-05 00:00:00", "2024-01-12 00:00:00"
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartitionByRange(8, "ts")
        .write.json(landing)
    )
    return landing


def run_interval_join(spark, work: str) -> list[dict]:
    from pyspark.sql import functions as F

    from bitcoinminingetl_spark.streaming.pipeline import (
        read_event_stream,
        stream_stream_interval_join,
    )
    from tests.test_streaming import state_timeline

    landing = _land(spark, work)
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    clicks = stream.filter(F.col("event_type") == "click")
    views = stream.filter(F.col("event_type") == "view")
    q = (
        stream_stream_interval_join(clicks, views)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _drained(q)
    return state_timeline(q)


def _drained(q) -> None:
    """Require the AvailableNow drain to actually FINISH: a timed-out
    drain's recentProgress is a partial timeline whose last reading is
    not final — exactly the false-receipt shape the verdict must never
    stamp bounded=True from (r11 review finding: the return value of
    awaitTermination was ignored)."""
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError(
            "drain did not finish within 300s — refusing to read a "
            "partial state timeline"
        )


def run_sessionize(spark, work: str) -> list[dict]:
    from bitcoinminingetl_spark.streaming.pipeline import (
        read_event_stream,
        run_to_parquet,
        session_windows,
    )
    from tests.test_streaming import state_timeline

    landing = _land(spark, work)
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    q = run_to_parquet(
        session_windows(stream),
        f"{work}/out",
        f"{work}/ckpt",
        output_mode="append",
    )
    _drained(q)
    return state_timeline(q)


def run_incremental_dedup_cost(spark) -> dict:
    """Cost attribution for the bench's single most expensive lifecycle
    entry (r11 VERDICT item 5): drive the REGISTERED
    q_streaming_incremental_dedup — the same function the bench times,
    not a parallel reconstruction — with its stage_times hook and split
    the wall total into bootstrap index build / landing write / drain /
    read-back, with the drain further split into per-batch foreachBatch
    work (batch prep, dedup-compute-plus-accept write, index
    increments) vs pure trigger/scheduling overhead. The attribution
    decides whether the ~11 s reading is avoidable recompute (a fix) or
    the lifecycle's fixed drain floor (documented cost)."""
    import time

    from bitcoinminingetl_spark.registry import load_all

    reg = load_all()
    stages: dict = {}
    t0 = time.perf_counter()
    accepted = reg["q_streaming_incremental_dedup"].fn(
        spark, SF_DIR, stage_times=stages
    )
    n_accepted = accepted.count()
    total = round(time.perf_counter() - t0, 3)
    batches = stages.get("batches", [])
    foreach_total = round(sum(b["total_s"] for b in batches), 3)
    drain = stages.get("drain_s", 0.0)
    return {
        "sf_dir": SF_DIR,
        "total_s": total,
        "accepted_rows": n_accepted,
        "stages": stages,
        "attribution": {
            "bootstrap_index_s": stages.get("bootstrap_index_s"),
            "landing_write_s": stages.get("landing_write_s"),
            "drain_s": drain,
            "foreach_batch_total_s": foreach_total,
            "drain_overhead_s": round(drain - foreach_total, 3),
            "dedup_and_accept_write_s": round(
                sum(
                    b.get("dedup_and_accept_write_s", 0.0) for b in batches
                ),
                3,
            ),
            "index_increment_s": round(
                sum(b.get("index_increment_s", 0.0) for b in batches), 3
            ),
            "readback_and_session_s": round(
                total
                - drain
                - (stages.get("bootstrap_index_s") or 0.0)
                - (stages.get("landing_write_s") or 0.0),
                3,
            ),
        },
    }


def run_incremental_dedup_decade(spark) -> dict:
    """Streaming decade receipt (r12 VERDICT item 5): the ingest gate
    carries bounded-state and cost-attribution receipts but no SCALING
    receipt. Drive the registered lifecycle on the sf1-equivalent 10x
    corpus (scripts/make_sf1 — same replica-disjoint construction the
    batch decade audit uses): the bootstrap corpus grows ~10x and the
    streamed increment (top-5%-of-id-range slice) grows with it, both
    measured directly. The verdict pins the DRAIN exponent — log of the
    drain-time ratio over log of the measured landed-volume ratio — to
    the linear band: a super-linear drain means per-batch work that
    re-touches history (index rescan, state blow-up), exactly the
    100 TB streaming killer this file exists to catch. The fixed
    trigger floor deflates the exponent at these scales (the
    q_streaming_* band doctrine in bench.py), so the in-band assertion
    is one-sided by design."""
    import time

    import scripts.make_sf1 as make_sf1

    from pyspark.sql import functions as F

    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.registry import load_all

    reg = load_all()
    legs: dict = {}
    for leg, d in (("lo", SF_DIR), ("hi", str(make_sf1.ensure()))):
        docs = table(spark, d, "documents")
        cut = docs.agg(
            F.floor(F.max("doc_id") * 0.8).cast("long").alias("cut"),
            F.floor(F.max("doc_id") * 0.95).cast("long").alias("hi"),
        ).collect()[0]
        landed = docs.filter(F.col("doc_id") > cut.hi).count()
        corpus = docs.filter(F.col("doc_id") <= cut.cut).count()
        stages: dict = {}
        t0 = time.perf_counter()
        accepted = reg["q_streaming_incremental_dedup"].fn(
            spark, d, stage_times=stages
        )
        n_accepted = accepted.count()
        legs[leg] = {
            "sf_dir": d,
            "total_s": round(time.perf_counter() - t0, 3),
            "drain_s": stages.get("drain_s"),
            "bootstrap_index_s": stages.get("bootstrap_index_s"),
            "landed_rows": landed,
            "corpus_rows": corpus,
            "accepted_rows": n_accepted,
        }
        print(f"incremental_dedup decade {leg}: {legs[leg]}")
    import math

    vol_ratio = legs["hi"]["landed_rows"] / max(legs["lo"]["landed_rows"], 1)
    drain_ratio = legs["hi"]["drain_s"] / max(legs["lo"]["drain_s"], 1e-3)
    alpha = math.log(drain_ratio) / math.log(max(vol_ratio, 1.01))
    bound = 1.35
    return {
        "legs": legs,
        "volume_ratio": round(vol_ratio, 3),
        "drain_ratio": round(drain_ratio, 3),
        "alpha_drain": round(alpha, 3),
        "bound": bound,
        "ok": alpha <= bound,
    }


def main() -> int:
    from bitcoinminingetl_spark.functions.state import workdir
    from bitcoinminingetl_spark.session import get_spark
    from tests.test_streaming import state_expiry_verdict

    spark = get_spark(
        app_name="stream-state", cpus=16, shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    lifecycles = {
        "interval_join": run_interval_join,
        "sessionize": run_sessionize,
    }
    out: dict = {
        "metric": "stream_state",
        "sf_dir": SF_DIR,
        "lifecycles": {},
    }
    all_bounded = True
    for name, fn in lifecycles.items():
        timeline = fn(spark, workdir(f"bmetl_state_{name}_"))
        verdict = state_expiry_verdict(timeline)
        out["lifecycles"][name] = {
            "timeline": timeline,
            "verdict": verdict,
        }
        print(f"{name}: {verdict}")
        all_bounded = all_bounded and verdict["bounded"]
    # r11 VERDICT item 5: the committed receipt also carries the cost
    # attribution of the most expensive lifecycle entry (kept OUTSIDE
    # `lifecycles`, whose entries are bounded-STATE verdicts — the
    # incremental-dedup drain's dropDuplicates state legitimately never
    # expires within one constant-ts landing, so it has no expiry story
    # to certify, only a cost one).
    out["incremental_dedup_cost"] = run_incremental_dedup_cost(spark)
    print(
        "incremental_dedup attribution:",
        out["incremental_dedup_cost"]["attribution"],
    )
    # r12 VERDICT item 5: the streaming decade row — drain time must
    # grow in-band with landed volume on the 10x corpus
    out["incremental_dedup_decade"] = run_incremental_dedup_decade(spark)
    decade_ok = out["incremental_dedup_decade"]["ok"]
    print("incremental_dedup decade:", {
        k: v
        for k, v in out["incremental_dedup_decade"].items()
        if k != "legs"
    })
    spark.stop()
    out.update(_tree_stamp())
    (REPO / "STREAMSTATE.json").write_text(json.dumps(out, indent=1))
    print(f"wrote {REPO / 'STREAMSTATE.json'}")
    ok = all_bounded and decade_ok
    print(
        "RESULT:",
        "OK" if ok else (
            "STATE NOT PROVABLY BOUNDED" if not all_bounded
            else "DECADE EXPONENT OUT OF BAND"
        ),
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
