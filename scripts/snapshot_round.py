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
)
ARTIFACT_PREFIXES = ("BENCH_r", "CORRECTNESS_r")
ARTIFACT_GLOBS = tuple(p + "*.json" for p in ARTIFACT_PREFIXES)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def _is_artifact(path: str) -> bool:
    """True iff a repo-relative path names a round artifact. Full-glob
    matching, not a bare prefix test: BENCH_refactor.py must NOT count
    as an artifact just because it starts with BENCH_r — only
    BENCH_r*.json / CORRECTNESS_r*.json and the fixed names do."""
    import fnmatch

    return path in ARTIFACTS or any(
        fnmatch.fnmatch(path, g) for g in ARTIFACT_GLOBS
    )


def _code_changed_since(commit: str) -> list[str] | None:
    """Non-artifact paths in diff(commit..HEAD), or None if the commit
    is not in this repo's history. Shared by the --skip-bench fitness
    gate and the post-commit stamp verifier so the two cannot drift.
    Full repo-relative paths on purpose: basename matching would let a
    nested file sharing an artifact's name (docs/PLANS.md) slip past."""
    if not re.fullmatch(r"[0-9a-f]{7,40}", commit or ""):
        return None  # symbolic refs (HEAD, branch names) name no fixed tree
    try:
        changed = _git("diff", "--name-only", f"{commit}..HEAD").splitlines()
    except subprocess.CalledProcessError:
        return None
    return [f for f in changed if not _is_artifact(f)]


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

    artifact_names = set(ARTIFACTS)
    for g in ARTIFACT_GLOBS:
        artifact_names |= {p.name for p in REPO.glob(g)}
    to_add = [n for n in sorted(artifact_names) if (REPO / n).exists()]
    _git("add", "-f", *to_add)
    if not _git("status", "--porcelain").strip():
        # still verify: a rerun after a failed stamp check must not
        # flip to success with the same stale artifact committed
        print("nothing to commit; artifacts already current")
        return verify_stamp_exactness()
    _git("commit", "-m", "Snapshot round artifacts: bench + oracle mirror at HEAD")
    print(_git("log", "-1", "--oneline").strip())
    return verify_stamp_exactness()


def verify_stamp_exactness() -> int:
    """Post-commit stamp check (r6 VERDICT item 3): the artifacts just
    committed must be stamped at a clean tree whose CODE is identical to
    the snapshot commit's — i.e. tree_commit is the snapshot's parent
    (the regenerate path), or an ancestor separated from HEAD only by
    artifact commits (the --skip-bench path, same admission criterion as
    _skip_bench_objection: e.g. a driver-written BENCH_r*/CORRECTNESS_r*
    commit landing between bench and snapshot). Self-equality is
    unattainable — the stamp lives inside the committed tree, so the
    commit hash depends on it (a SHA fixed point); artifact-only
    separation is the exact invariant that matters: the code tree the
    stamp names and the code tree the snapshot carries are the same."""
    ok = True
    for name in ("BENCH_FULL.json", "ORACLE_LOCAL.json"):
        try:
            stamp = json.loads(_git("show", f"HEAD:{name}"))
        except (subprocess.CalledProcessError, ValueError):
            print(f"stamp check: {name} missing/unparseable at HEAD")
            ok = False
            continue
        commit, dirty = stamp.get("tree_commit"), stamp.get("tree_dirty")
        if dirty:
            print(f"stamp check: {name} stamped at a DIRTY tree")
            ok = False
        if not commit:
            print(f"stamp check: {name} carries no tree_commit")
            ok = False
            continue
        code_changed = _code_changed_since(commit)
        if code_changed is None:
            print(
                f"stamp check: {name} tree_commit={commit} is not a "
                "concrete commit in this repo"
            )
            ok = False
            continue
        if code_changed:
            print(
                f"stamp check: {name} tree_commit={commit} is separated "
                f"from the snapshot by CODE changes: {code_changed[:5]} — "
                "artifacts describe a stale tree"
            )
            ok = False
    if ok:
        print("stamp check: OK (artifact stamps and snapshot share one code tree)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
