"""Controlled attribution of driver-bench outlier queries (r6 VERDICT
item 2).

The r6 driver bench read q_funnel_stages at 2.73 s (0.58 s in the
committed bench at the SAME commit) and q_fingerprint_winnow at 3.35 s
(1.22 s committed) — a 2.6-3.6x divergence between two runs of identical
code, the exact confound scripts/bench_ab_guards.py was built to
exclude for the guard doctrine. This script applies the same design to
a target query list: N repetitions, each a FRESH subprocess/JVM (so JIT
or block-manager state from one rep cannot leak into the next),
bench.py's own warmup discipline (page-cache table reads + flagship
JIT warm), per-query statistic min-of-reps (plan cost is a lower bound;
noise only adds). Two stable control queries from the driver's wobble
list ride along so a globally slow host reveals itself in the controls
rather than masquerading as a per-query regression.

Output: OUTLIERS_AB.json at the repo root with per-query
{reps, min, median} plus the r6 driver/committed readings for the
side-by-side. SCOPE OF THE VERDICT: this harness adjudicates exactly one
claim — does the DRIVER reading reproduce under controlled conditions?
A min-of-reps well below it (<= 0.75x) even in this harness's HARSHER
minimal context (no 200-query warm ramp, so its floor sits structurally
above the full-bench numbers) means the driver reading was never plan
cost. It does NOT certify the absence of a regression against the
committed full-bench baseline — the two contexts are not comparable
query-for-query; regression-vs-committed is tracked by the snapshot
bench and the interleaved full-bench GUARDS_AB design, whose minima are
embedded here as guards_ab_min_r6 for the side-by-side.

Usage (one-shot):   python scripts/bench_ab_outliers.py [reps=4]
Usage (stepwise):   python scripts/bench_ab_outliers.py run <rep>
                    python scripts/bench_ab_outliers.py combine
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCRATCH = REPO / "scratch_ab"

# The two r6 driver-run outliers, then the controls (driver-window
# queries whose committed/driver readings agreed within jitter).
TARGETS = [
    "q_funnel_stages",
    "q_fingerprint_winnow",
    "q_avg_grouped",   # control
    "q_window_join",   # control (flagship)
]

# Controls ride along as stability references (a globally slow host
# shows up here first); the adjudication logic applies to outliers only.
CONTROLS = {"q_avg_grouped", "q_window_join"}

# r6 readings being adjudicated: driver BENCH_r06 vs the committed
# HEAD bench at the same code (f99af6b), plus the interleaved
# full-bench min-of-reps from GUARDS_AB.json at the same code — the
# strongest controlled full-context number available. This harness's
# own reps run a MINIMAL context (fresh JVM, table+flagship warm only),
# so its minima sit structurally ABOVE full-bench-context numbers:
# bench.py amortizes JIT/codegen/Arrow-worker spin-up across 200+
# queries before these two ever run. The claim under test is the
# DRIVER reading; a controlled minimum well below it in the harsher
# (minimal) context proves the driver number was not plan cost.
R6_CONTEXT = {
    "q_funnel_stages": {
        "driver_r6": 2.73, "committed_r6": 0.58, "guards_ab_min_r6": 0.639,
    },
    "q_fingerprint_winnow": {
        "driver_r6": 3.35, "committed_r6": 1.22, "guards_ab_min_r6": 1.019,
    },
    "q_avg_grouped": {
        "driver_r6": 1.76, "committed_r6": 1.14, "guards_ab_min_r6": 1.26,
    },
    "q_window_join": {
        "driver_r6": 0.604, "committed_r6": 0.487, "guards_ab_min_r6": 0.494,
    },
}


def run_rep(rep: str) -> None:
    """One measurement rep: fresh session, bench.py warmups, one timed
    noop-sink materialization per target."""
    from bitcoinminingetl_spark.catalog import table
    from bitcoinminingetl_spark.registry import load_all
    from bitcoinminingetl_spark.session import default_parallelism, get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark(app_name="bench-ab-outliers")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's warmup discipline: page-cache every fixture table, then
    # one untimed flagship run for JVM JIT/codegen/shuffle spin-up
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    registry["q_window_join"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in TARGETS:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "rep": rep,
        "sf_dir": sf_dir,
        "cpus": default_parallelism(),
        "queries": timings,
    }
    SCRATCH.mkdir(exist_ok=True)
    (SCRATCH / f"outliers_{rep}.json").write_text(json.dumps(out))
    print(f"rep {rep}: " + " ".join(f"{k}={v}" for k, v in timings.items()))


def combine() -> int:
    reps = [
        json.loads(p.read_text()) for p in sorted(SCRATCH.glob("outliers_*.json"))
    ]
    if len(reps) < 2:
        print("need >= 2 completed reps (scratch_ab/outliers_*.json)")
        return 1
    queries = {}
    for name in TARGETS:
        ts = [r["queries"][name] for r in reps if name in r["queries"]]
        queries[name] = {
            "reps": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            **R6_CONTEXT.get(name, {}),
        }
        ctx = R6_CONTEXT.get(name, {})
        if name in CONTROLS:
            queries[name]["attribution"] = "control (stability reference)"
        elif ctx:
            # The driver reading is the claim under test. This harness's
            # minimal context is structurally SLOWER than the driver's
            # full-bench context (no 200-query warm ramp), so a minimum
            # well under the driver reading even here means the reading
            # was never plan cost; tracking or exceeding it would be a
            # real regression.
            queries[name]["attribution"] = (
                "driver reading not reproducible -> environment noise for "
                "the adjudicated reading (regression-vs-committed is the "
                "snapshot bench's job; full-bench floor: guards_ab_min_r6)"
                if min(ts) <= 0.75 * ctx["driver_r6"]
                else "driver reading REPRODUCES — real plan cost, trim it"
            )
    out = {
        "metric": "outliers_ab",
        "reps": len(reps),
        "statistic": "min_of_reps",
        "design": "fresh subprocess/JVM per rep, bench.py warmup discipline",
        "cpus": reps[0]["cpus"],
        "sf_dir": reps[0]["sf_dir"],
        "queries": queries,
    }
    (REPO / "OUTLIERS_AB.json").write_text(json.dumps(out, indent=1))
    for name, row in queries.items():
        print(
            f"{name}: min={row['min']} median={row['median']} reps={row['reps']}"
            + (f" -> {row['attribution']}" if "attribution" in row else "")
        )
    print(f"wrote {REPO / 'OUTLIERS_AB.json'}")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run_rep(sys.argv[2])
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "combine":
        return combine()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for p in SCRATCH.glob("outliers_*.json"):
        p.unlink()
    for rep in range(n):
        proc = subprocess.run(
            [sys.executable, __file__, "run", str(rep)], cwd=REPO, check=False
        )
        if proc.returncode != 0:
            print(f"rep {rep} failed")
            return 1
    return combine()


if __name__ == "__main__":
    raise SystemExit(main())
