"""Mechanical end-of-round artifact snapshot (r5 VERDICT item 2).

Round artifacts (BENCH_FULL.json, ORACLE_LOCAL.json, driver-written
BENCH_r*/CORRECTNESS_r*) sat uncommitted at judge-snapshot time four
rounds running, and ORACLE_LOCAL.json was last regenerated commits
before the code it claimed to describe. This script is the fix the r5
verdict asked for: run it as the LAST step of every round. It

1. re-runs the full bench at the current working tree — bench.py
   regenerates BENCH_FULL.json AND the full-registry DuckDB oracle
   mirror ORACLE_LOCAL.json, so both artifacts are stamped at the
   exact code they describe;
2. git-adds every round artifact present (BENCH_r*.json,
   CORRECTNESS_r*.json, BENCH_FULL.json, ORACLE_LOCAL.json,
   GUARDS_AB.json, SCALING.md, PLANS.md);
3. commits, so `git status` is clean at snapshot and
   `git log -1 -- ORACLE_LOCAL.json` equals the round's final commit;
4. verifies STAMP EXACTNESS (r6 VERDICT item 3): the committed
   artifact's `tree_commit` must name a clean tree whose CODE equals
   the snapshot commit's — its diff to HEAD contains only artifact
   files. The stamp cannot equal the snapshot commit's own hash: the
   stamp is inside the committed tree, so the commit hash depends on
   the stamp and the only satisfying value is a SHA fixed point.
   In the regenerate path the stamp is simply the snapshot's parent —
   check with `git show HEAD:ORACLE_LOCAL.json | jq -r .tree_commit`
   == `git rev-parse --short HEAD~1` (and tree_dirty == false); the
   --skip-bench path additionally tolerates artifact-only commits
   (e.g. driver-written BENCH_r*/CORRECTNESS_r*) between the stamp
   and the snapshot, the same admission its fitness gate applies.

Refuses to run on a dirty tree with non-artifact changes (commit your
code first — the artifact commit must describe exactly one tree).

Usage: python scripts/snapshot_round.py [--skip-bench]
  --skip-bench: only stage+commit existing artifacts (when the bench
  was already run at this exact tree). Refuses if BENCH_FULL.json's own
  stamp shows it is NOT a canonical full run — guards disabled, oracle
  mirror skipped (both true for every scripts/bench_ab_guards.py rep),
  dirty tree, or code commits made since it was generated.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# The single source of truth for "what counts as a round artifact" —
# bench.py imports these for its tree_dirty stamp, so the two lists
# cannot drift (a name added here is automatically exempt there).
ARTIFACTS = (
    "BENCH_FULL.json",
    "ORACLE_LOCAL.json",
    "GUARDS_AB.json",
    "OUTLIERS_AB.json",
    "SCALING.md",
    "PLANS.md",
    "MEMGUARD.json",
    "WINDOW_DRILL.json",
    "STREAMSTATE.json",
    "SUITE_EXPANSION.json",
)
ARTIFACT_PREFIXES = ("BENCH_r", "CORRECTNESS_r")
ARTIFACT_GLOBS = tuple(p + "*.json" for p in ARTIFACT_PREFIXES)

# Round documents the DRIVER/JUDGE write between rounds (verdict,
# advice). They ride in the driver's round-close commit alongside the
# artifacts it regenerates, and they alter nothing the bench measured —
# so the stamp-exactness diff treats them as non-code. They are NOT in
# ARTIFACTS: snapshot_round must never stage or commit them itself.
JUDGE_DOCS = ("VERDICT.md", "ADVICE.md")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def committed_bench_full(repo: Path = REPO, rev: str = "HEAD") -> dict | None:
    """Parsed BENCH_FULL.json as COMMITTED at `rev`, or None when there
    is no such committed artifact (fresh checkout, non-repo dir,
    unparseable blob). The one shared reader (r10 code-review finding):
    bench.py's budget verdict and bench_ab_outliers' committed baseline
    previously each hand-rolled this subprocess+parse, and the copies
    had already drifted in their exception handling."""
    try:
        shown = subprocess.run(
            ["git", "show", f"{rev}:BENCH_FULL.json"],
            cwd=repo,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(shown)
    except (subprocess.CalledProcessError, ValueError, OSError):
        return None


def _is_artifact(path: str) -> bool:
    """True iff a repo-relative path names a round artifact. Full-glob
    matching, not a bare prefix test: BENCH_refactor.py must NOT count
    as an artifact just because it starts with BENCH_r — only
    BENCH_r*.json / CORRECTNESS_r*.json and the fixed names do.
    Artifacts are repo-root-only, and fnmatch's * matches path
    separators, so any nested path ('BENCH_r_dir/evil.json',
    'docs/PLANS.md') is rejected outright before glob matching — the
    same class of hole the glob rewrite closed for BENCH_refactor.py
    (r7 ADVICE)."""
    import fnmatch

    if "/" in path or "\\" in path:
        return False
    return path in ARTIFACTS or any(
        fnmatch.fnmatch(path, g) for g in ARTIFACT_GLOBS
    )


def tree_stamp(repo: Path = REPO) -> dict:
    """tree_commit + tree_dirty with the artifact/judge-doc exemptions —
    THE one implementation (bench.py, window_drill.py and
    stream_state.py all stamp through it; three hand-rolled porcelain
    parsers had already drifted in exception handling, r11 review
    finding). dirty = any non-artifact, non-judge-doc path in
    `git status --porcelain` (for renames, the post-rename path).
    Returns {} when not a git checkout."""
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout.strip()
        paths = [
            line[3:].split(" -> ")[-1]
            for line in subprocess.run(
                ["git", "status", "--porcelain"],
                cwd=repo, capture_output=True, text=True, check=True,
            ).stdout.splitlines()
        ]
        dirty = any(
            not _is_artifact(p) and p not in JUDGE_DOCS for p in paths
        )
        return {"tree_commit": head, "tree_dirty": dirty}
    except Exception:  # noqa: BLE001 — not a git checkout
        return {}


def _code_changed_since(commit: str, at: str = "HEAD") -> list[str] | None:
    """Non-artifact paths in diff(commit..at), or None if the commit
    is not in this repo's history. Shared by the --skip-bench fitness
    gate and the stamp verifiers so the gates cannot drift.
    Full repo-relative paths on purpose: basename matching would let a
    nested file sharing an artifact's name (docs/PLANS.md) slip past."""
    if not re.fullmatch(r"[0-9a-f]{7,40}", commit or ""):
        return None  # symbolic refs (HEAD, branch names) name no fixed tree
    try:
        changed = _git("diff", "--name-only", f"{commit}..{at}").splitlines()
    except subprocess.CalledProcessError:
        return None
    return [
        f for f in changed if not _is_artifact(f) and f not in JUDGE_DOCS
    ]


def _skip_bench_objection() -> str | None:
    """Reason BENCH_FULL.json is unfit to commit as the canonical round
    artifact, or None if it is fit. Catches the A/B trap: every
    bench_ab_guards.py rep overwrites BENCH_FULL.json with
    SPARK_GRAFT_SKIP_ORACLE=1 (and half the reps with guards off), so
    "straight after an A/B" is exactly when --skip-bench must refuse."""
    path = REPO / "BENCH_FULL.json"
    if not path.exists():
        return "BENCH_FULL.json missing"
    try:
        stamp = json.loads(path.read_text())
    except ValueError:
        return "BENCH_FULL.json unparseable"
    if stamp.get("numeric_guards") is False:
        return "stamped with numeric guards DISABLED (an A/B arm, not a canonical run)"
    if stamp.get("oracle_skipped"):
        return "stamped with the oracle mirror skipped, so ORACLE_LOCAL.json is stale"
    # oracle_mirror_ok starts False in the artifact and is rewritten to
    # True only after the mirror completes — a swallowed mirror failure
    # (bench.py prints a warning and exits 0) or a kill mid-mirror
    # leaves it False, and ORACLE_LOCAL.json stale from a previous tree
    if "oracle_mirror_ok" in stamp and stamp["oracle_mirror_ok"] is not True:
        return "oracle mirror did not complete, so ORACLE_LOCAL.json is stale"
    # r10 code-review finding: bench.py exits 1 on a canonical budget
    # breach, but an operator ignoring that exit could still commit the
    # regressed artifact via --skip-bench — and every later budget
    # check would ratchet against the regressed total. The stamp itself
    # must disqualify the artifact.
    budget = stamp.get("budget", {})
    if budget.get("exceeded") and not (
        budget.get("accepted_reason") and budget.get("accepted_receipt")
    ):
        return (
            "stamped with the per-round budget EXCEEDED "
            f"(ratio {budget.get('ratio')}x) — adjudicate with "
            "scripts/bench_ab_outliers.py, then either fix the plan or "
            "accept via SPARK_GRAFT_BUDGET_ACCEPT='<reason naming the "
            "committed receipt file and a query it covers>' (validated "
            "against git HEAD and stamped into the artifact) before "
            "snapshotting"
        )
    if stamp.get("tree_dirty"):
        return "stamped at a dirty tree"
    commit = stamp.get("tree_commit")
    if not commit:
        return "carries no tree_commit stamp"
    code_changed = _code_changed_since(commit)
    if code_changed is None:
        return f"tree_commit {commit} is not a concrete commit in this repo"
    if code_changed:
        return (f"code changed since it was generated at {commit}: "
                + ", ".join(code_changed[:5]))
    return None


def _window_drill_objection() -> str | None:
    """Reason WINDOW_DRILL.json is unfit to commit as the round's
    driver-shaped receipt, or None. r10 VERDICT item 2: the drill sat
    nine commits stale while a covered query's plan changed under it —
    the committed receipt described code that no longer existed. The
    snapshot now refuses a drill whose stamp is dirty or separated from
    the tree being snapshotted by code changes (the regenerate path
    re-runs the drill, so this only bites --skip-bench)."""
    path = REPO / "WINDOW_DRILL.json"
    if not path.exists():
        return "WINDOW_DRILL.json missing — run scripts/window_drill.py --all"
    try:
        stamp = json.loads(path.read_text())
    except ValueError:
        return "WINDOW_DRILL.json unparseable"
    if stamp.get("mode") != "all_windows":
        return "WINDOW_DRILL.json is an ad-hoc single-window run, not the --all receipt"
    if stamp.get("tree_dirty"):
        return "WINDOW_DRILL.json stamped at a dirty tree"
    commit = stamp.get("tree_commit")
    if not commit:
        return "WINDOW_DRILL.json carries no tree_commit stamp"
    code_changed = _code_changed_since(commit)
    if code_changed is None:
        return f"WINDOW_DRILL.json tree_commit {commit} is not a concrete commit"
    if code_changed:
        return (
            f"code changed since the drill ran at {commit}: "
            + ", ".join(code_changed[:5])
            + " — rerun scripts/window_drill.py --all"
        )
    return None


def _stream_state_objection() -> str | None:
    """Reason STREAMSTATE.json is unfit to commit as the round's
    bounded-state receipt, or None — the same stale-receipt class the
    drill gate closed (r11 review finding: a later change to the
    watermark/time-bound condition would leave the committed receipt
    certifying code that no longer exists)."""
    path = REPO / "STREAMSTATE.json"
    if not path.exists():
        return "STREAMSTATE.json missing — run scripts/stream_state.py"
    try:
        stamp = json.loads(path.read_text())
    except ValueError:
        return "STREAMSTATE.json unparseable"
    if stamp.get("tree_dirty"):
        return "STREAMSTATE.json stamped at a dirty tree"
    commit = stamp.get("tree_commit")
    if not commit:
        return "STREAMSTATE.json carries no tree_commit stamp"
    code_changed = _code_changed_since(commit)
    if code_changed is None:
        return f"STREAMSTATE.json tree_commit {commit} is not a concrete commit"
    if code_changed:
        return (
            f"code changed since the state receipt ran at {commit}: "
            + ", ".join(code_changed[:5])
            + " — rerun scripts/stream_state.py"
        )
    return None


def _artifact_hygiene_objection() -> str | None:
    """Re-run the artifact-consistency hygiene gates against the
    WORKING-TREE artifacts before the snapshot commit exists (r9
    VERDICT item 1). Round 9 went red at HEAD because snapshot_round
    regenerates BENCH_FULL.json AFTER the round's last full pytest run:
    q_tpch_waiting_suppliers crossed the 1.0 s scaling-audit threshold
    in the final bench and no test ever saw that number. Running the
    gate here — on the artifact just regenerated, refusing to commit on
    red — closes the ordering hole structurally: a post-snapshot tree
    can no longer fail a hygiene test about its own committed
    artifacts. Returns pytest's tail on failure, None when green."""
    # the WHOLE hygiene file, not a hand-picked subset (r10 code-review
    # finding): this round alone added five more committed-artifact
    # gates (MEMGUARD, WINDOW_DRILL, decade audit, rows-only
    # adjudication, budget verdict) and a curated list re-opens the r9
    # ordering hole for every gate it omits. The file runs in ~2 s.
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "-q",
            "tests/test_round_hygiene.py",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        return (proc.stdout + proc.stderr)[-3000:]
    return None


def main() -> int:
    skip_bench = "--skip-bench" in sys.argv

    dirty = [
        line[3:]
        for line in _git("status", "--porcelain").splitlines()
        if not _is_artifact(line[3:])
    ]
    if dirty:
        print("refusing: non-artifact changes uncommitted:", *dirty, sep="\n  ")
        return 1

    if skip_bench:
        err = _skip_bench_objection()
        if err:
            print(f"refusing --skip-bench: {err}\n"
                  "run without --skip-bench to regenerate canonical artifacts")
            return 1
    if not skip_bench:
        print("running full bench + oracle mirror (several minutes)...")
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], cwd=REPO
        )
        if proc.returncode != 0:
            print("bench failed; not committing")
            return 1
        # same fitness gate as --skip-bench: catches a mirror failure
        # inside the run just made (bench exits 0 with a warning), or a
        # guards-off/skip-oracle env contaminating the snapshot shell
        err = _skip_bench_objection()
        if err:
            print(f"refusing to commit the run just made: {err}")
            return 1
        # r10 VERDICT item 2: the driver-shaped window drill is part of
        # the snapshot contract — regenerate it at this exact tree so
        # the committed receipt can never describe a stale plan.
        print("running full window drill (driver-shaped oracle replay)...")
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "window_drill.py"), "--all"],
            cwd=REPO,
        )
        if proc.returncode != 0:
            print("window drill failed; not committing")
            return 1
        print("running streaming state receipt...")
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "stream_state.py")],
            cwd=REPO,
        )
        if proc.returncode != 0:
            print("stream-state receipt failed; not committing")
            return 1

    # both paths: the drill and state receipts must be stamped at this
    # code tree (the regenerate path just ran them; --skip-bench must
    # refuse stale)
    for objection in (_window_drill_objection, _stream_state_objection):
        err = objection()
        if err:
            print(f"refusing to commit: {err}")
            return 1

    # r9 VERDICT item 1: the hygiene gates that judge the artifacts must
    # run AFTER the artifacts are (re)generated — on both paths — so the
    # committed tree can never be red against its own BENCH_FULL.
    hygiene_err = _artifact_hygiene_objection()
    if hygiene_err:
        print(
            "refusing to commit: artifact-consistency hygiene tests are "
            "red against the regenerated artifacts (e.g. a new query "
            "crossed the 1.0 s scaling-audit threshold — add it to "
            "scripts/scaling_check.py AUDIT and rerun "
            "scripts/scaling_check.py, then re-snapshot):\n" + hygiene_err
        )
        return 1
    print("artifact hygiene gates: OK")

    artifact_names = set(ARTIFACTS)
    for g in ARTIFACT_GLOBS:
        artifact_names |= {p.name for p in REPO.glob(g)}
    to_add = [n for n in sorted(artifact_names) if (REPO / n).exists()]
    # PRE-commit gate (r7 ADVICE): verify the stamps on the working-tree
    # contents BEFORE creating the snapshot commit — a failed post-hoc
    # check would exit 1 but leave an invalid commit in history for any
    # unattended caller that ignores the exit code
    if verify_stamp_staged() != 0:
        print("refusing to commit: staged artifacts fail the stamp check")
        return 1
    _git("add", "-f", *to_add)
    if not _git("status", "--porcelain").strip():
        # still verify: a rerun after a failed stamp check must not
        # flip to success with the same stale artifact committed
        print("nothing to commit; artifacts already current")
        return verify_stamp_exactness()
    _git("commit", "-m", "Snapshot round artifacts: bench + oracle mirror at HEAD")
    print(_git("log", "-1", "--oneline").strip())
    return verify_stamp_exactness()


def _stamp_problems(name: str, raw: str | None, at: str) -> list[str]:
    """Objections to one artifact's stamp, with the code-diff taken
    against `at`. Shared by the pre-commit (working tree vs current
    HEAD = the snapshot's parent-to-be) and post-commit (HEAD contents
    vs HEAD) verifiers so the two cannot drift."""
    if raw is None:
        return [f"{name} missing/unparseable at {at}"]
    try:
        stamp = json.loads(raw)
    except ValueError:
        return [f"{name} missing/unparseable at {at}"]
    problems = []
    commit, dirty = stamp.get("tree_commit"), stamp.get("tree_dirty")
    if dirty:
        problems.append(f"{name} stamped at a DIRTY tree")
    if not commit:
        problems.append(f"{name} carries no tree_commit")
        return problems
    code_changed = _code_changed_since(commit, at)
    if code_changed is None:
        problems.append(
            f"{name} tree_commit={commit} is not a concrete commit in this repo"
        )
    elif code_changed:
        problems.append(
            f"{name} tree_commit={commit} is separated from the snapshot "
            f"by CODE changes: {code_changed[:5]} — artifacts describe a "
            "stale tree"
        )
    return problems


def verify_stamp_staged() -> int:
    """PRE-commit stamp check (r7 ADVICE): run against the working-tree
    artifact contents BEFORE the snapshot commit exists, diffing the
    stamp against the current HEAD (the snapshot's parent-to-be). A
    failure here leaves NO commit behind — the post-commit verifier
    alone exited 1 but left the stale-artifact snapshot in history,
    which an unattended caller ignoring the exit code would publish."""
    problems = []
    # WINDOW_DRILL is enforced by _window_drill_objection + the
    # real-history hygiene test, not here: the generic verifier also
    # runs against PRE-contract snapshot commits (whose committed drill
    # is legitimately stale), and failing those would deadlock the
    # snapshot's own hygiene gate.
    for name in ("BENCH_FULL.json", "ORACLE_LOCAL.json"):
        p = REPO / name
        raw = p.read_text() if p.exists() else None
        problems += _stamp_problems(name, raw, "HEAD")
    for msg in problems:
        print(f"stamp check (staged): {msg}")
    if not problems:
        print("stamp check (staged): OK")
    return 0 if not problems else 1


def verify_stamp_exactness(at: str = "HEAD") -> int:
    """Stamp check at a committed snapshot (r6 VERDICT item 3; contract
    formalized r8): the committed artifacts must be stamped at a clean
    tree whose CODE is identical to the snapshot commit's — i.e.
    tree_commit is the snapshot's parent (the regenerate path), or an
    ancestor separated from the snapshot only by artifact commits (the
    --skip-bench path, same admission criterion as
    _skip_bench_objection: e.g. a driver-written BENCH_r*/CORRECTNESS_r*
    commit landing between bench and snapshot). Self-equality is
    unattainable — the stamp lives inside the committed tree, so the
    commit hash depends on it (a SHA fixed point); artifact-only
    separation is the exact invariant that matters: the code tree the
    stamp names and the code tree the snapshot carries are the same.

    `at` defaults to HEAD (the post-commit check snapshot_round runs on
    itself); tests pass the actual last snapshot commit (git log -1 --
    ORACLE_LOCAL.json) so the contract is asserted end-to-end on real
    history at any point mid-round, not on a fixture."""
    problems = []
    for name in ("BENCH_FULL.json", "ORACLE_LOCAL.json"):
        try:
            raw = _git("show", f"{at}:{name}")
        except subprocess.CalledProcessError:
            raw = None
        problems += _stamp_problems(name, raw, at)
    for msg in problems:
        print(f"stamp check: {msg}")
    if not problems:
        print("stamp check: OK (artifact stamps and snapshot share one code tree)")
    return 0 if not problems else 1


if __name__ == "__main__":
    raise SystemExit(main())
