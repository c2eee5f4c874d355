"""Guards-on vs guards-off bench A/B (r5 VERDICT item 1).

The r5 bench regressed 17% round-over-round with zero queries added; the
prime suspect was the numeric-guard doctrine shipped the same round
(functions/numeric.py: twin max(abs) aggregate in dsum, double-eval
coalesce in round2/roundn) — but the committed HEAD bench and the driver
bench were taken under different machine conditions, so guard cost and
machine noise were confounded. This script separates them: it runs the
FULL bench N times per configuration, interleaved (on, off, on, off, ...)
so slow machine drift hits both arms equally, under identical env
(same SF dir, same local[N], oracle mirror skipped), each run a fresh
subprocess/JVM. Per-query statistic is min-of-reps (plan cost is a lower
bound; noise only adds). Output: GUARDS_AB.json at the repo root —
per-query {on, off, delta_s, delta_pct} plus arm totals.

Usage (one-shot):   python scripts/bench_ab_guards.py [reps_per_arm=2]
Usage (stepwise):   python scripts/bench_ab_guards.py run {on|off} <rep>
                    python scripts/bench_ab_guards.py combine
Stepwise mode stashes each run under scratch_ab/ so the ~5-min runs can be
driven one at a time by an external orchestrator with per-step timeouts.

Note: bench.py overwrites BENCH_FULL.json every run; the final state here
is whatever the last rep wrote. scripts/snapshot_round.py regenerates the
canonical BENCH_FULL.json + ORACLE_LOCAL.json at end of round.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(guards: bool) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SKIP_ORACLE"] = "1"
    env["SPARK_GRAFT_NUMERIC_GUARDS"] = "1" if guards else "0"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"bench run (guards={guards}) failed")
    return json.loads((REPO / "BENCH_FULL.json").read_text())


SCRATCH = REPO / "scratch_ab"


def combine(arms: dict[str, list[dict]]) -> None:
    # Plan-cost queries only: the q_streaming_* lifecycle queries time
    # fixed ProcessingTime triggers + drain + restart (accepted band for
    # incremental dedup is 8-16 s), so one extra micro-batch in one arm
    # would inject seconds of pure scheduling noise into a ~1-2 s guard
    # signal. Guards are compile-time column expressions; trigger cadence
    # cannot depend on them. This also keeps plan_cost_total_on/off on
    # the same definition as bench.py's plan_cost_total.
    def per_query_min(runs: list[dict]) -> dict[str, float]:
        out: dict[str, float] = {}
        for r in runs:
            for name, t in r.get("queries", {}).items():
                if t < 0:
                    continue
                out[name] = min(out.get(name, float("inf")), t)
        return out

    for label in ("on", "off"):
        if not arms.get(label):
            raise SystemExit(
                f"no completed '{label}' runs found — expected scratch_ab/"
                f"bench_{label}_<rep>.json (run `bench_ab_guards.py run "
                f"{label} <rep>` first)"
            )
    on_t = per_query_min(arms["on"])
    off_t = per_query_min(arms["off"])
    queries = {}
    for name in sorted(set(on_t) | set(off_t)):
        a, b = on_t.get(name), off_t.get(name)
        row = {"on": a, "off": b}
        if a is not None and b is not None:
            row["delta_s"] = round(a - b, 3)
            row["delta_pct"] = round(100.0 * (a - b) / b, 1) if b > 0 else None
        queries[name] = row
    guard_cost = round(
        sum(r["delta_s"] for r in queries.values() if "delta_s" in r), 3
    )
    out = {
        "metric": "guards_ab",
        "reps_per_arm": min(len(arms["on"]), len(arms["off"])),
        "statistic": "min_of_reps",
        "sf": arms["on"][0]["sf"],
        "plan_cost_total_on": round(
            sum(t for t in on_t.values() if t >= 0), 3
        ),
        "plan_cost_total_off": round(
            sum(t for t in off_t.values() if t >= 0), 3
        ),
        "guard_cost_total_s": guard_cost,
        "per_arm_totals": {
            label: [r["plan_cost_total"] for r in runs]
            for label, runs in arms.items()
        },
        "queries": queries,
    }
    (REPO / "GUARDS_AB.json").write_text(json.dumps(out, indent=1))
    top = sorted(
        (r for r in queries.items() if "delta_s" in r[1]),
        key=lambda kv: -kv[1]["delta_s"],
    )[:15]
    print(f"\nguard cost total: {guard_cost}s "
          f"(on {out['plan_cost_total_on']} vs off {out['plan_cost_total_off']})")
    for name, row in top:
        print(f"  {name}: +{row['delta_s']}s ({row['delta_pct']}%)")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        label, rep = sys.argv[2], sys.argv[3]
        full = run_bench(guards=(label == "on"))
        SCRATCH.mkdir(exist_ok=True)
        (SCRATCH / f"bench_{label}_{rep}.json").write_text(json.dumps(full))
        print(
            f"guards={label} rep={rep}: plan_cost_total="
            f"{full['plan_cost_total']}s n_failed={full['n_failed']}"
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "combine":
        arms: dict[str, list[dict]] = {"on": [], "off": []}
        for label in arms:
            for p in sorted(SCRATCH.glob(f"bench_{label}_*.json")):
                arms[label].append(json.loads(p.read_text()))
        combine(arms)
        return
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    arms = {"on": [], "off": []}
    for rep in range(reps):
        for label, guards in (("on", True), ("off", False)):
            print(f"rep {rep + 1}/{reps} guards={label} ...", flush=True)
            full = run_bench(guards)
            arms[label].append(full)
            print(
                f"  plan_cost_total={full['plan_cost_total']}s "
                f"n_failed={full['n_failed']}",
                flush=True,
            )
    combine(arms)


if __name__ == "__main__":
    main()
