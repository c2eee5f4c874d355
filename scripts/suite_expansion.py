"""Produce a SUITE_EXPANSION.json adjudication receipt (r10 VERDICT
item 3's third acceptance channel).

When a round's plan-cost total legitimately exceeds the 1.5x budget
because the SUITE GREW (new queries, not regressed plans), the
acceptance stamp must cite a committed receipt naming the added queries
and their individual costs. This script derives exactly that: it diffs
the CURRENT working-tree BENCH_FULL.json (the run that breached) against
the COMMITTED canonical artifact at HEAD, and records every query
present now but absent then, with its measured cost and the share of the
breach it explains. bench.py's _acceptance_receipt validates acceptance
reasons against the committed copy of this file — so the workflow is:
run bench (breach) -> run this script -> commit the receipt -> re-run
bench with SPARK_GRAFT_BUDGET_ACCEPT naming SUITE_EXPANSION.json and an
added query -> snapshot.

Refuses to write a receipt when nothing was added (an empty receipt
could only be used to launder a pure regression).

Usage: python scripts/suite_expansion.py
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    from scripts.snapshot_round import committed_bench_full

    committed = committed_bench_full(REPO)
    if committed is None:
        print("no committed BENCH_FULL.json to diff against")
        return 1
    current = json.loads((REPO / "BENCH_FULL.json").read_text())
    base = committed.get("plan_cost_total") or 0.0
    cur = current.get("plan_cost_total") or 0.0
    # The breach is a PRECONDITION, not a skippable branch (r11 ADVICE):
    # run after the bench was re-run on a quieter host (cur <= base),
    # there is no delta to explain, and a null-breach receipt minted now
    # — bound only to baseline_total — could later wave through an
    # unrelated breach at the same baseline, gutting the 50%-explained
    # rule this receipt exists to enforce.
    if cur <= base:
        print(
            f"refusing: current plan_cost_total {cur}s does not exceed "
            f"the committed baseline {base}s — no breach to explain; "
            "rerun this script only against the breaching bench run"
        )
        return 1
    added = {
        name: sec
        for name, sec in current.get("queries", {}).items()
        if name not in committed.get("queries", {})
    }
    if not added:
        print(
            "refusing: no queries added vs the committed baseline — "
            "a breach with no suite growth is a regression, not an "
            "expansion; adjudicate with scripts/bench_ab_outliers.py"
        )
        return 1
    added_total = round(sum(s for s in added.values() if s and s > 0), 3)
    # The additions must EXPLAIN the breach, not merely coexist with it
    # (r11 review finding): one trivial new query alongside an unrelated
    # 2x regression must not mint a launderable receipt. Threshold: the
    # added queries account for at least half of the total delta;
    # anything less is dominated by regression and belongs to
    # bench_ab_outliers adjudication instead.
    if added_total / (cur - base) < 0.5:
        print(
            f"refusing: added queries explain only "
            f"{added_total / (cur - base):.1%} of the "
            f"{round(cur - base, 3)}s delta — the breach is dominated "
            "by regression, not suite growth; adjudicate with "
            "scripts/bench_ab_outliers.py"
        )
        return 1
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "metric": "suite_expansion",
        "baseline_commit": head,
        "baseline_total": base,
        "current_total": cur,
        "added_total": added_total,
        "breach_explained": round(added_total / (cur - base), 3),
        "queries": {k: added[k] for k in sorted(added)},
    }
    (REPO / "SUITE_EXPANSION.json").write_text(json.dumps(out, indent=1))
    print(
        f"wrote SUITE_EXPANSION.json: {len(added)} added queries, "
        f"{added_total}s of the {round(cur - base, 3)}s delta"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
