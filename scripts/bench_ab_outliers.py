"""Controlled attribution of driver-bench outlier queries (r6 VERDICT
item 2; de-hardcoded per r7 VERDICT item 2).

The r6 driver bench read q_funnel_stages at 2.73 s (0.58 s in the
committed bench at the SAME commit) and q_fingerprint_winnow at 3.35 s
(1.22 s committed) — a 2.6-3.6x divergence between two runs of identical
code, the exact confound scripts/bench_ab_guards.py was built to
exclude for the guard doctrine. This script applies the same design to
any round's outliers: N repetitions, each a FRESH subprocess/JVM (so JIT
or block-manager state from one rep cannot leak into the next),
bench.py's own warmup discipline (page-cache table reads + flagship
JIT warm), per-query statistic min-of-reps (plan cost is a lower bound;
noise only adds). Two stable control queries ride along so a globally
slow host reveals itself in the controls rather than masquerading as a
per-query regression.

ROUND-PROOF INPUTS (r7 VERDICT item 2 — no hardcoded reading table):
the driver readings come from `BENCH_r{N}.json` (`parsed.queries`, the
round's headline set; N defaults to the highest round file present),
the committed readings from `BENCH_FULL.json` (the canonical snapshot
bench), and the interleaved full-bench floors from `GUARDS_AB.json`
(min-of-reps, production `on` arm). Outliers are SELECTED from those
artifacts: any driver headline reading >= OUTLIER_RATIO x its committed
reading (and past an absolute floor so sub-100 ms jitter can't flag).
Controls are the flagship plus the headline query whose driver/committed
ratio is closest to 1 among non-trivial timings.

Output: OUTLIERS_AB.json at the repo root with per-query
{reps, min, median} plus the round's driver/committed/guards readings
for the side-by-side. SCOPE OF THE VERDICT: this harness adjudicates
exactly one claim — does the DRIVER reading reproduce under controlled
conditions? A min-of-reps well below it (<= 0.75x) even in this
harness's HARSHER minimal context (no 200-query warm ramp, so its floor
sits structurally above the full-bench numbers) means the driver
reading was never plan cost. It does NOT certify the absence of a
regression against the committed full-bench baseline — the two contexts
are not comparable query-for-query; regression-vs-committed is tracked
by the snapshot bench and the interleaved full-bench GUARDS_AB design,
whose minima are embedded as guards_ab_min for the side-by-side.

Usage (one-shot):   python scripts/bench_ab_outliers.py [reps=4] [--round N]
                    [--targets q_a,q_b]   (override auto-selection)
Usage (stepwise):   python scripts/bench_ab_outliers.py run <rep> [--round N ...]
                    python scripts/bench_ab_outliers.py combine [--round N ...]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCRATCH = REPO / "scratch_ab"

FLAGSHIP = "q_window_join"
# Selection thresholds: a driver headline reading flags as an outlier
# when it is >= OUTLIER_RATIO x the committed reading AND the absolute
# excess clears ABS_FLOOR_S (sub-100 ms deltas are pure timer jitter).
OUTLIER_RATIO = 2.0
ABS_FLOOR_S = 0.5
# A control must itself be non-trivial or its ratio is timer noise.
CONTROL_MIN_COMMITTED_S = 0.3


def latest_round(root: Path = REPO) -> int:
    rounds = [
        int(m.group(1))
        for p in root.glob("BENCH_r*.json")
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", p.name))
    ]
    if not rounds:
        raise FileNotFoundError(f"no BENCH_r*.json under {root}")
    return max(rounds)


def load_context(
    round_n: int | None = None,
    root: Path = REPO,
    prior_rev: str | None = None,
) -> dict:
    """Round context from the committed artifacts — driver headline
    readings, committed canonical bench, and GUARDS_AB full-bench
    floors (production `on` arm, min-of-reps). Returns
    {round, driver: {q: s}, committed: {q: s}, guards_min: {q: s}}.

    ``prior_rev`` (r8 VERDICT item 1) additionally loads the PRIOR
    round's committed canonical bench from git history
    (``git show <rev>:BENCH_FULL.json``) so a round-over-round
    committed-to-committed shift — not just an inflated driver reading
    — can be adjudicated against the fresh-JVM floor."""
    n = latest_round(root) if round_n is None else round_n
    bench_r = json.loads((root / f"BENCH_r{n:02d}.json").read_text())
    driver = dict(bench_r.get("parsed", {}).get("queries", {}))
    # "committed" means COMMITTED (r9 ADVICE): --full-bench reps
    # overwrite the working-tree BENCH_FULL.json with each rep's own
    # output, so a standalone `combine` invocation after the reps would
    # silently adjudicate the floor against a rep's reading rather than
    # the canonical snapshot. Read HEAD's copy via git (the same path
    # --prior already uses); fall back to the working tree only when
    # the artifact has never been committed (fresh checkout / tests).
    from scripts.snapshot_round import committed_bench_full

    committed: dict[str, float] = {}
    committed_full = committed_bench_full(root)
    if committed_full is not None:
        committed = dict(committed_full.get("queries", {}))
    else:
        full_p = root / "BENCH_FULL.json"
        if full_p.exists():
            committed = dict(
                json.loads(full_p.read_text()).get("queries", {})
            )
    guards_min: dict[str, float] = {}
    guards_p = root / "GUARDS_AB.json"
    if guards_p.exists():
        guards_min = {
            q: row["on"]
            for q, row in json.loads(guards_p.read_text())
            .get("queries", {})
            .items()
            if isinstance(row, dict) and "on" in row
        }
    prior: dict[str, float] = {}
    prior_total: float | None = None
    if prior_rev is not None:
        shown = subprocess.run(
            ["git", "show", f"{prior_rev}:BENCH_FULL.json"],
            cwd=root,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        prior_full = json.loads(shown)
        prior = dict(prior_full.get("queries", {}))
        prior_total = prior_full.get("plan_cost_total")
    return {
        "round": n,
        "driver": driver,
        "committed": committed,
        "guards_min": guards_min,
        "prior": prior,
        "prior_rev": prior_rev,
        "prior_plan_cost_total": prior_total,
    }


def select_targets(ctx: dict) -> tuple[list[str], set[str]]:
    """(targets, controls) from the round context. Outliers: driver
    reading >= OUTLIER_RATIO x committed AND excess >= ABS_FLOOR_S.
    Controls: the flagship + the closest-to-1-ratio non-trivial
    headline query (ratios need both readings to exist)."""
    ratios = {
        q: (d / ctx["committed"][q], d, ctx["committed"][q])
        for q, d in ctx["driver"].items()
        if ctx["committed"].get(q)
    }
    outliers = sorted(
        q
        for q, (r, d, c) in ratios.items()
        if r >= OUTLIER_RATIO and (d - c) >= ABS_FLOOR_S
    )
    controls = {FLAGSHIP} if FLAGSHIP in ctx["driver"] else set()
    stable = [
        q
        for q, (r, d, c) in sorted(
            ratios.items(), key=lambda kv: abs(kv[1][0] - 1.0)
        )
        if c >= CONTROL_MIN_COMMITTED_S and q not in outliers
    ]
    for q in stable:
        if len(controls) >= 2:
            break
        controls.add(q)
    targets = outliers + sorted(controls - set(outliers))
    return targets, controls - set(outliers)


def _context_row(ctx: dict, name: str) -> dict:
    row = {}
    if name in ctx["driver"]:
        row[f"driver_r{ctx['round']}"] = ctx["driver"][name]
    if name in ctx["committed"]:
        row["committed"] = ctx["committed"][name]
    if name in ctx.get("prior", {}):
        row["committed_prior"] = ctx["prior"][name]
    if name in ctx["guards_min"]:
        row["guards_ab_min"] = ctx["guards_min"][name]
    return row


def run_full_bench_rep(rep: str) -> None:
    """One FULL-BENCH rep (r8 VERDICT item 1): a fresh `python bench.py`
    subprocess under SPARK_GRAFT_SKIP_ORACLE=1, per-query timings read
    from the BENCH_FULL.json it writes. This is the SAME context the
    committed canonical numbers come from (200-query warm ramp), so its
    per-query minima ARE comparable to committed readings query-for-
    query — unlike the minimal harness, whose floor sits structurally
    2-3x above full-bench numbers for exchange-bound plans. Use this
    mode to adjudicate a committed-to-committed round shift; use the
    minimal mode to adjudicate a single inflated driver reading.

    Note: bench.py overwrites the working-tree BENCH_FULL.json every
    run; scripts/snapshot_round.py regenerates the canonical artifact
    at end of round (same note as bench_ab_guards.py)."""
    env = dict(os.environ)
    env["SPARK_GRAFT_SKIP_ORACLE"] = "1"
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
        raise RuntimeError(f"full-bench rep {rep} failed")
    full = json.loads((REPO / "BENCH_FULL.json").read_text())
    out = {
        "rep": rep,
        "context": "full_bench",
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "cpus": full.get("cpus"),
        "plan_cost_total": full.get("plan_cost_total"),
        "queries": {
            n: t
            for n, t in full.get("queries", {}).items()
            if t >= 0 and n not in full.get("lifecycle_queries", {})
        },
    }
    SCRATCH.mkdir(exist_ok=True)
    (SCRATCH / f"outliers_{rep}.json").write_text(json.dumps(out))
    print(f"full-bench rep {rep}: plan_cost_total={out['plan_cost_total']}")


def run_rep(rep: str, targets: list[str]) -> None:
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
    registry[FLAGSHIP].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in targets:
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


def combine(
    ctx: dict,
    targets: list[str],
    controls: set[str],
    root: Path = REPO,
    scratch: Path | None = None,
    selected_outliers: set[str] | None = None,
) -> int:
    scratch = SCRATCH if scratch is None else scratch
    reps = [
        json.loads(p.read_text())
        for p in sorted(scratch.glob("outliers_*.json"))
    ]
    if len(reps) < 2:
        print(f"need >= 2 completed reps ({scratch}/outliers_*.json)")
        return 1
    driver_key = f"driver_r{ctx['round']}"
    queries = {}
    unmeasured: list[str] = []
    for name in targets:
        ts = [r["queries"][name] for r in reps if name in r["queries"]]
        if not ts:
            # full-bench reps exclude lifecycle queries (their drains are
            # band-checked, not plan-cost-compared) and drop errored
            # (t < 0) readings; a requested target with no reading must
            # surface in the artifact, not silently vanish — an artifact
            # that reads "adjudicated, nothing flagged" for a target that
            # was never measured is the silent-truncation class the
            # receipts doctrine forbids (r9 self-review finding).
            unmeasured.append(name)
            queries[name] = {
                "attribution": (
                    "NOT MEASURED in this context (lifecycle target or "
                    "errored in every rep) — no verdict; use the "
                    "lifecycle bands / minimal-harness mode instead"
                ),
                **_context_row(ctx, name),
            }
            continue
        queries[name] = {
            "reps": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            **_context_row(ctx, name),
        }
        full_bench = all(r.get("context") == "full_bench" for r in reps)
        if selected_outliers is None:
            selected_outliers = set(targets) - controls
        if name in controls:
            queries[name]["attribution"] = "control (stability reference)"
        elif full_bench and "committed_prior" in queries[name]:
            # Round-over-round committed shift adjudication (r8 VERDICT
            # item 1): reps here are full bench.py runs — the SAME
            # context both committed readings came from — so the floor
            # is comparable query-for-query. Three verdicts:
            #   floor tracks the PRIOR committed reading  -> the current
            #     round's committed reading was environment drift;
            #   floor tracks the CURRENT committed reading AND sits
            #     >= 1.5x prior -> the regression is real: weak flag;
            #   in between -> partial drift, residual recorded.
            floor = min(ts)
            prior = queries[name]["committed_prior"]
            cur = queries[name].get("committed")
            if floor <= max(1.25 * prior, prior + 0.1):
                queries[name]["attribution"] = (
                    "prior-round cost reproduced at the fresh-JVM "
                    "full-bench floor -> the committed round shift was "
                    "environment drift, not plan cost"
                )
            elif cur is not None and floor >= 0.9 * cur and floor >= 1.5 * prior:
                queries[name]["attribution"] = (
                    "committed reading REPRODUCES at the fresh-JVM "
                    "full-bench floor — real plan cost growth, weak flag"
                )
            else:
                queries[name]["attribution"] = (
                    f"partial: floor {floor:.2f}s sits between prior "
                    f"{prior:.2f}s and current committed — residual "
                    f"{100.0 * (floor / prior - 1):.0f}% above prior, "
                    "below the 1.5x weak threshold"
                )
        elif name not in selected_outliers:
            # explicitly-passed target that the round's readings never
            # flagged: there is no inflated driver claim to adjudicate,
            # so the min is just this harness's (structurally slower)
            # minimal-context floor — compare guards_ab_min, not driver
            queries[name]["attribution"] = (
                "explicit target, not a selected outlier — minimal-context "
                "floor only (no inflated driver reading to adjudicate)"
            )
        elif driver_key in queries[name]:
            # The driver reading is the claim under test. This harness's
            # minimal context is structurally SLOWER than the driver's
            # full-bench context (no 200-query warm ramp), so a minimum
            # well under the driver reading even here means the reading
            # was never plan cost; tracking or exceeding it would be a
            # real regression.
            queries[name]["attribution"] = (
                "driver reading not reproducible -> environment noise for "
                "the adjudicated reading (regression-vs-committed is the "
                "snapshot bench's job; full-bench floor: guards_ab_min)"
                if min(ts) <= 0.75 * queries[name][driver_key]
                else "driver reading REPRODUCES — real plan cost, trim it"
            )
    full_bench = all(r.get("context") == "full_bench" for r in reps)
    out = {
        "metric": "outliers_ab",
        "round": ctx["round"],
        "reps": len(reps),
        "statistic": "min_of_reps",
        "context": "full_bench" if full_bench else "minimal_harness",
        "design": (
            "fresh `python bench.py` subprocess per rep (full warm ramp, "
            "oracle mirror skipped) — per-query floors comparable to "
            "committed readings"
            if full_bench
            else "fresh subprocess/JVM per rep, bench.py warmup discipline"
        ),
        "inputs": [
            f"BENCH_r{ctx['round']:02d}.json",
            "BENCH_FULL.json",
            "GUARDS_AB.json",
        ],
        "cpus": reps[0]["cpus"],
        "sf_dir": reps[0]["sf_dir"],
        "queries": queries,
    }
    if unmeasured:
        out["unmeasured_targets"] = unmeasured
        print(f"WARNING: targets never measured in any rep: {unmeasured}")
    if ctx.get("prior_rev"):
        out["prior_rev"] = ctx["prior_rev"]
        out["prior_plan_cost_total"] = ctx.get("prior_plan_cost_total")
    if full_bench:
        out["per_rep_plan_cost_totals"] = [
            r.get("plan_cost_total") for r in reps
        ]
    (root / "OUTLIERS_AB.json").write_text(json.dumps(out, indent=1))
    for name, row in queries.items():
        stats = (
            f"min={row['min']} median={row['median']} reps={row['reps']}"
            if "min" in row
            else "(no readings)"
        )
        print(
            f"{name}: {stats}"
            + (f" -> {row['attribution']}" if "attribution" in row else "")
        )
    print(f"wrote {root / 'OUTLIERS_AB.json'}")
    return 0


def _parse_args(
    argv: list[str],
) -> tuple[list[str], int | None, list[str] | None, str | None, bool]:
    """(positional, round_n, explicit_targets, prior_rev, full_bench)."""
    pos: list[str] = []
    round_n: int | None = None
    targets: list[str] | None = None
    prior_rev: str | None = None
    full_bench = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--round":
            round_n = int(argv[i + 1])
            i += 2
        elif a == "--targets":
            targets = [t for t in argv[i + 1].split(",") if t]
            i += 2
        elif a == "--prior":
            prior_rev = argv[i + 1]
            i += 2
        elif a == "--full-bench":
            full_bench = True
            i += 1
        else:
            pos.append(a)
            i += 1
    return pos, round_n, targets, prior_rev, full_bench


def main() -> int:
    pos, round_n, explicit, prior_rev, full_bench = _parse_args(sys.argv[1:])
    ctx = load_context(round_n, prior_rev=prior_rev)
    if explicit is not None:
        # FLAGSHIP is ALWAYS the stability control, even when the caller
        # lists it as a target — otherwise controls stays empty and the
        # artifact mislabels the stability reference as an explicit
        # target (r8 ADVICE low #3).
        targets = explicit + ([FLAGSHIP] if FLAGSHIP not in explicit else [])
        controls = {FLAGSHIP}
        # explicit targets carry no inflated driver claim to adjudicate
        selected_outliers: set[str] = set()
    else:
        targets, controls = select_targets(ctx)
        selected_outliers = set(targets) - controls
    if set(targets) <= controls:
        # nothing but stability controls selected — there is no outlier
        # claim to adjudicate, so spending fresh-JVM reps would only
        # produce an artifact that looks like receipts for nothing
        print(
            f"round {ctx['round']}: no outliers past "
            f"{OUTLIER_RATIO}x/{ABS_FLOOR_S}s — nothing to adjudicate"
        )
        return 0
    if pos and pos[0] == "run":
        if full_bench:
            run_full_bench_rep(pos[1])
        else:
            run_rep(pos[1], targets)
        return 0
    if pos and pos[0] == "combine":
        return combine(ctx, targets, controls, selected_outliers=selected_outliers)
    n = int(pos[0]) if pos else 4
    print(
        f"round {ctx['round']}: targets={targets} controls={sorted(controls)}"
        + (" context=full_bench" if full_bench else "")
    )
    for p in SCRATCH.glob("outliers_*.json"):
        p.unlink()
    extra = []
    if round_n is not None:
        extra += ["--round", str(round_n)]
    if explicit is not None:
        extra += ["--targets", ",".join(explicit)]
    if prior_rev is not None:
        extra += ["--prior", prior_rev]
    if full_bench:
        extra += ["--full-bench"]
    for rep in range(n):
        proc = subprocess.run(
            [sys.executable, __file__, "run", str(rep), *extra],
            cwd=REPO,
            check=False,
        )
        if proc.returncode != 0:
            print(f"rep {rep} failed")
            return 1
    return combine(ctx, targets, controls, selected_outliers=selected_outliers)


if __name__ == "__main__":
    raise SystemExit(main())
