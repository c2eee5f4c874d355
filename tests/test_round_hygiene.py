"""Guards on the round-artifact machinery itself (bench stamp, snapshot
gate, guards-A/B attribution) — the processes the r5 verdict flagged as
repeat offenders. These are plain-unit tests: no Spark session.

The trap being pinned: every scripts/bench_ab_guards.py rep overwrites
BENCH_FULL.json under SPARK_GRAFT_SKIP_ORACLE=1 (half of them with
numeric guards disabled), and the timings alone cannot reveal that. So
bench.py must stamp the run configuration into the artifact, and
snapshot_round --skip-bench must refuse any non-canonical stamp.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from scripts.bench_ab_guards import combine  # noqa: E402
from scripts.snapshot_round import ARTIFACT_PREFIXES, ARTIFACTS  # noqa: E402


def _stamp(**over):
    base = {
        "numeric_guards": True,
        "oracle_skipped": False,
        "oracle_mirror_ok": True,
        "reps": 3,
        "statistic": "min",
        "tree_dirty": False,
        "tree_commit": "abc1234",
    }
    base.update(over)
    return base


def _objection(tmp_path, monkeypatch, stamp) -> str | None:
    import scripts.snapshot_round as sr

    monkeypatch.setattr(sr, "REPO", tmp_path)
    # hex stamp + empty diff: the diff-since-generation check sees zero
    # code changes (symbolic stamps like "HEAD" are rejected by design)
    monkeypatch.setattr(sr, "_git", lambda *a: "")
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(stamp))
    return sr._skip_bench_objection()


def test_skip_bench_accepts_canonical_stamp(tmp_path, monkeypatch):
    assert _objection(tmp_path, monkeypatch, _stamp()) is None


def test_skip_bench_refuses_non_canonical_stamps(tmp_path, monkeypatch):
    for over, needle in [
        ({"numeric_guards": False}, "guards DISABLED"),
        ({"oracle_skipped": True}, "oracle mirror skipped"),
        ({"oracle_mirror_ok": False}, "mirror did not complete"),
        # r11 VERDICT item 1: a single-rep (or any sub-3-rep) canonical
        # commit is exactly the noise-dominated baseline the min-of-N
        # statistic exists to retire
        ({"reps": 1, "statistic": "single"}, "min-of->=3"),
        ({"reps": 2}, "min-of->=3"),
        ({"statistic": "single"}, "min-of->=3"),
        ({"tree_dirty": True}, "dirty tree"),
        ({"tree_commit": None}, "no tree_commit"),
    ]:
        obj = _objection(tmp_path, monkeypatch, _stamp(**over))
        assert obj is not None and needle in obj, (over, obj)


def test_skip_bench_refuses_missing_or_bad_artifact(tmp_path, monkeypatch):
    import scripts.snapshot_round as sr

    monkeypatch.setattr(sr, "REPO", tmp_path)
    assert "missing" in sr._skip_bench_objection()
    (tmp_path / "BENCH_FULL.json").write_text("{not json")
    assert "unparseable" in sr._skip_bench_objection()


def test_skip_bench_refuses_when_code_changed_since_stamp(tmp_path, monkeypatch):
    import scripts.snapshot_round as sr

    monkeypatch.setattr(sr, "REPO", tmp_path)
    monkeypatch.setattr(
        sr, "_git", lambda *a: "bitcoinminingetl_spark/operators/joins.py\nBENCH_r06.json\n"
    )
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(_stamp(tree_commit="abc1234")))
    obj = sr._skip_bench_objection()
    assert obj is not None and "joins.py" in obj
    # artifact-only history since the stamp is fine (that's the normal
    # flow: bench runs, snapshot commits the artifacts, stamp now lags
    # HEAD by exactly that artifact commit)
    monkeypatch.setattr(sr, "_git", lambda *a: "BENCH_r06.json\nORACLE_LOCAL.json\n")
    assert sr._skip_bench_objection() is None


def _bench_full_at(rev: str) -> dict | None:
    import subprocess

    proc = subprocess.run(
        ["git", "show", f"{rev}:BENCH_FULL.json"],
        cwd=REPO, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        return None
    try:
        return json.loads(proc.stdout)
    except ValueError:
        return None


def _is_canonical_bench_stamp(d: dict | None) -> bool:
    """A clean-tree, guards-on, mirror-complete, min-of->=3-rep stamp —
    the _skip_bench_objection fitness shape."""
    return bool(
        d
        and d.get("reps", 1) >= 3
        and d.get("statistic") == "min"
        and d.get("tree_dirty") is False
        and d.get("oracle_mirror_ok") is True
        and d.get("numeric_guards") is True
        and not d.get("oracle_skipped")
    )


def _driver_overwrote_bench_full() -> str | None:
    """If the last commit touching BENCH_FULL.json is the external
    driver's round-close (it commits its own single-rep bench.py output
    alongside VERDICT/ADVICE/BENCH_r*/CORRECTNESS_r*), return that
    commit's hash; else None. A driver overwrite is a harness artifact,
    not a repo regression — the judged canonical is the copy UNDER it."""
    import fnmatch
    import subprocess

    last = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", "BENCH_FULL.json"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    if not last:
        return None
    files = subprocess.run(
        ["git", "show", "--name-only", "--format=", last],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.split()
    driver_markers = ("VERDICT.md", "ADVICE.md")
    if any(f in driver_markers for f in files) or any(
        fnmatch.fnmatch(f, g)
        for f in files
        for g in ("BENCH_r*.json", "CORRECTNESS_r*.json")
    ):
        return last
    return None


def test_bench_stamps_run_configuration():
    """The COMMITTED BENCH_FULL.json must carry the knobs that alter
    what it measured, and must be a canonical guards-on/oracle-on run.
    Gates the artifact UNDER JUDGMENT, resolved in order (r13 — the r12
    round-close exposed a deadlock: the external driver commits its own
    single-rep bench.py output over BENCH_FULL.json alongside
    VERDICT/ADVICE, so gating HEAD unconditionally left every later
    commit red until a snapshot, while the snapshot's own pre-commit
    hygiene run read the same driver copy and refused to commit):
    1. the working-tree copy, when it differs from HEAD's and is itself
       a clean-stamped canonical run — that is snapshot_round's
       regenerated copy about to be committed (mid-round verify/A/B
       overwrites are non-canonical and fall through to HEAD);
    2. HEAD's copy — unless it is a sub-3-rep stamp introduced by a
       driver round-close commit, in which case
    3. the copy at that commit's parent (the round's actual snapshot)."""
    head_copy = _bench_full_at("HEAD")
    try:
        wt_copy = json.loads((REPO / "BENCH_FULL.json").read_text())
    except (OSError, ValueError):
        wt_copy = None
    if wt_copy is not None and wt_copy != head_copy and \
            _is_canonical_bench_stamp(wt_copy):
        full = wt_copy
    elif head_copy is not None:
        full = head_copy
        if head_copy.get("reps", 1) < 3:
            driver_commit = _driver_overwrote_bench_full()
            parent = (
                _bench_full_at(f"{driver_commit}^")
                if driver_commit
                else None
            )
            if parent is not None:
                full = parent
    else:
        full = wt_copy
    assert full is not None, "no BENCH_FULL.json anywhere"
    # the canonical committed artifact must be a guards-on, oracle-on run
    # (older artifacts predate the stamp; once regenerated these are hard)
    if "numeric_guards" in full:
        assert full["numeric_guards"] is True
        assert full["oracle_skipped"] is False
    if "oracle_mirror_ok" in full:
        assert full["oracle_mirror_ok"] is True
    assert "lifecycle_bands_calibration" in full or "numeric_guards" not in full
    # r11 VERDICT item 1: once an artifact carries the statistic stamp
    # it must be a min-of->=3-rep run with every rep's raw total on
    # record. Pre-reps legacy artifacts (no such keys) are tolerated —
    # they can no longer be produced (bench.py always stamps reps) and
    # any new commit goes through _skip_bench_objection's refusal.
    if "reps" in full or "statistic" in full:
        assert full["reps"] >= 3
        assert full["statistic"] == "min"
        assert len(full["rep_plan_cost_totals"]) == full["reps"]


def test_artifact_name_set_is_shared():
    """bench.py's tree_dirty exemptions come from snapshot_round's
    constants — a drift would resurrect the false-dirty stamp."""
    import inspect

    import bench

    src = inspect.getsource(bench._tree_stamp)
    assert "from scripts.snapshot_round import" in src
    assert "BENCH_FULL.json" in ARTIFACTS
    # PERF_r/VERIFY_r joined in r14: the r13 driver round-close began
    # committing PERF_r*.json/VERIFY_r*.json, which must classify as
    # round artifacts (not code) for every artifact-only gate
    assert ARTIFACT_PREFIXES == (
        "BENCH_r", "CORRECTNESS_r", "PERF_r", "VERIFY_r"
    )


def test_stamp_exactness_verifier(monkeypatch):
    """r6 VERDICT item 3: the committed artifact's tree_commit must name
    a clean tree separated from the snapshot commit by ARTIFACT-ONLY
    changes (self-equality is a SHA fixed point — the stamp lives inside
    the committed tree; the regenerate path makes it the snapshot's
    parent, the --skip-bench path tolerates interleaved artifact
    commits). The verifier must pass those cases and fail dirty stamps
    or stamps separated by code changes."""
    import scripts.snapshot_round as sr

    def fake_git(stamp, diff_lines):
        def _git(*args):
            if args[0] == "diff":
                return "\n".join(diff_lines) + ("\n" if diff_lines else "")
            if args[0] == "show":
                return json.dumps(stamp)
            raise AssertionError(args)
        return _git

    clean = {"tree_commit": "abc1234", "tree_dirty": False}
    # regenerate path: stamp == parent, diff is the snapshot's artifacts
    monkeypatch.setattr(
        sr, "_git", fake_git(clean, ["BENCH_FULL.json", "ORACLE_LOCAL.json"])
    )
    assert sr.verify_stamp_exactness() == 0
    # skip-bench path: a driver artifact commit sits between stamp and HEAD
    monkeypatch.setattr(
        sr, "_git", fake_git(clean, ["BENCH_r07.json", "ORACLE_LOCAL.json"])
    )
    assert sr.verify_stamp_exactness() == 0

    # dirty stamp
    monkeypatch.setattr(
        sr, "_git",
        fake_git({"tree_commit": "abc1234", "tree_dirty": True}, []),
    )
    assert sr.verify_stamp_exactness() == 1
    # code separates the stamp from the snapshot
    monkeypatch.setattr(
        sr, "_git",
        fake_git(clean, ["bitcoinminingetl_spark/operators/joins.py"]),
    )
    assert sr.verify_stamp_exactness() == 1
    # no stamp at all
    monkeypatch.setattr(sr, "_git", fake_git({"tree_dirty": False}, []))
    assert sr.verify_stamp_exactness() == 1
    # symbolic-ref stamp: "HEAD" resolves to whatever is current, so it
    # names no fixed tree — must be rejected, not vacuously diffed
    monkeypatch.setattr(
        sr, "_git", fake_git({"tree_commit": "HEAD", "tree_dirty": False}, [])
    )
    assert sr.verify_stamp_exactness() == 1


def test_artifact_classifier_is_glob_not_prefix():
    """BENCH_refactor.py must NOT count as an artifact just because it
    starts with BENCH_r — only BENCH_r*.json / CORRECTNESS_r*.json and
    the fixed artifact names do (a prefix test would let a code file
    slip through every artifact-only gate)."""
    import scripts.snapshot_round as sr

    assert sr._is_artifact("BENCH_r07.json")
    assert sr._is_artifact("CORRECTNESS_r07.json")
    assert sr._is_artifact("ORACLE_LOCAL.json")
    assert not sr._is_artifact("BENCH_refactor.py")
    assert not sr._is_artifact("CORRECTNESS_report.md")
    assert not sr._is_artifact("docs/PLANS.md")  # full-path semantics
    assert not sr._is_artifact("bitcoinminingetl_spark/operators/joins.py")


def test_driver_window_is_frozen_to_the_r12_set():
    """r13 VERDICT item 1 (gate fix): the external driver hash-checks
    the FIRST 50 entries of __spark_entry__.queries(). The r13 partial
    build added two alphabetically-early md5 twins that displaced
    q_dedup_exact / q_dedup_incremental out of the verified window.
    queries() now leads with the frozen r12 window set; this test pins
    (a) the first 50 == exactly that set, (b) q_dedup_exact and
    q_dedup_incremental are inside it, and (c) every window name still
    resolves in the registry — so no future addition, rename, or
    reorder can silently displace a verified query again."""
    import __spark_entry__ as entry

    first50 = list(entry.queries())[:50]
    assert first50 == list(entry.DRIVER_WINDOW), (
        "driver window drifted from the frozen r12 set"
    )
    assert len(set(entry.DRIVER_WINDOW)) == 50
    assert "q_dedup_exact" in first50 and "q_dedup_incremental" in first50

    r12 = json.loads((REPO / "CORRECTNESS_r12.json").read_text())
    assert set(first50) == set(r12), (
        "window no longer equals the r12 verified set: "
        f"missing={sorted(set(r12) - set(first50))} "
        f"extra={sorted(set(first50) - set(r12))}"
    )

    from bitcoinminingetl_spark.registry import load_all

    registry = load_all()
    missing = [n for n in entry.DRIVER_WINDOW if n not in registry]
    assert not missing, f"window names gone from the registry: {missing}"
    # the full declared surface is a superset: nothing disappears
    assert set(entry.queries()) == set(registry)


def test_every_query_has_oracle_or_planted_test():
    """Driver-window rotation insurance (r6 VERDICT stretch 8): the
    driver hash-checks only the ~50 alphabetically-first queries, so a
    window shift moves queries in and out of the strong gate. This
    asserts the invariant that makes any shift safe — EVERY registered
    query either carries a DuckDB oracle (hash-checked by test_oracle.py
    and the driver) or is named in a test file (planted/property test).
    Applied to the full registry, not just today's window, so next
    round's rotation cannot surface an unchecked query."""
    from bitcoinminingetl_spark.registry import load_all

    # lifecycle queries whose correctness tests exercise the underlying
    # streaming building block (differential-vs-batch) rather than the
    # registry wrapper; the alias is the tested function's name
    aliases = {
        "q_streaming_window_avg": "windowed_metric_averages",
        "q_streaming_incremental_dedup": "run_incremental_dedup",
    }
    import re

    # exclude THIS file: the aliases dict above would otherwise
    # self-match and certify its own entries with zero actual coverage
    test_src = "\n".join(
        p.read_text()
        for p in (REPO / "tests").glob("test_*.py")
        if p.name != "test_round_hygiene.py"
    )

    def named(token: str) -> bool:
        # word-boundary match: a bare substring test would let a query
        # whose name is a PREFIX of another tested query's name (e.g.
        # q_foo vs q_foo_approx) pass with zero actual coverage
        return re.search(rf"\b{re.escape(token)}\b", test_src) is not None

    registry = load_all()
    unchecked = [
        n
        for n, s in sorted(registry.items())
        if s.oracle is None
        and not named(n)
        and not (n in aliases and named(aliases[n]))
    ]
    assert not unchecked, (
        f"rows-only queries with neither oracle nor planted test: {unchecked}"
    )


def test_ab_combine_excludes_lifecycle_and_validates_arms(tmp_path, monkeypatch):
    import scripts.bench_ab_guards as ab

    monkeypatch.setattr(ab, "REPO", tmp_path)
    run_on = {
        "sf": 0.1,
        "plan_cost_total": 3.0,
        "queries": {"q_a": 2.0, "q_b": 1.0},
        "lifecycle_queries": {"q_streaming_x": 12.0},
    }
    run_off = {
        "sf": 0.1,
        "plan_cost_total": 2.5,
        "queries": {"q_a": 1.6, "q_b": 0.9},
        "lifecycle_queries": {"q_streaming_x": 9.0},  # 3 s of trigger jitter
    }
    combine({"on": [run_on], "off": [run_off]})
    out = json.loads((tmp_path / "GUARDS_AB.json").read_text())
    # jitter-dominated lifecycle delta (3 s) must NOT pollute the ~0.5 s
    # guard attribution
    assert "q_streaming_x" not in out["queries"]
    assert abs(out["guard_cost_total_s"] - 0.5) < 1e-9
    assert out["plan_cost_total_on"] == 3.0 and out["plan_cost_total_off"] == 2.5

    import pytest

    with pytest.raises(SystemExit, match="no completed 'off' runs"):
        combine({"on": [run_on], "off": []})


def _write_round_artifacts(root: Path, n: int = 8) -> None:
    (root / f"BENCH_r{n:02d}.json").write_text(json.dumps({
        "parsed": {"queries": {
            "q_slow_outlier": 3.0,     # 3x committed, +2.0 s -> outlier
            "q_small_ratio": 0.35,     # 3.5x but only +0.25 s -> jitter
            "q_window_join": 0.6,      # flagship control
            "q_steady": 1.05,          # ratio 1.05 -> closest-to-1 control
            "q_not_in_full": 2.0,      # no committed reading -> no ratio
        }}
    }))
    (root / "BENCH_FULL.json").write_text(json.dumps({
        "queries": {
            "q_slow_outlier": 1.0,
            "q_small_ratio": 0.1,
            "q_window_join": 0.5,
            "q_steady": 1.0,
        }
    }))
    (root / "GUARDS_AB.json").write_text(json.dumps({
        "queries": {"q_slow_outlier": {"on": 0.9, "off": 0.8}}
    }))


def test_outliers_ab_loads_round_artifacts_not_source(tmp_path):
    """r7 VERDICT item 2: the outlier A/B harness must adjudicate any
    round's readings from the committed artifacts (BENCH_r{N}.json /
    BENCH_FULL.json / GUARDS_AB.json), with no hardcoded reading table
    in source — a round-8 outlier must be runnable without a code edit."""
    import scripts.bench_ab_outliers as ob

    _write_round_artifacts(tmp_path, 8)
    assert ob.latest_round(tmp_path) == 8

    ctx = ob.load_context(root=tmp_path)
    assert ctx["round"] == 8
    assert ctx["driver"]["q_slow_outlier"] == 3.0
    assert ctx["committed"]["q_slow_outlier"] == 1.0
    assert ctx["guards_min"]["q_slow_outlier"] == 0.9

    targets, controls = ob.select_targets(ctx)
    # the real outlier flags; the +0.25 s jitter ratio does not; the
    # flagship and the closest-to-1 query ride as controls
    assert "q_slow_outlier" in targets
    assert "q_small_ratio" not in targets
    assert controls == {"q_window_join", "q_steady"}

    # the harness source carries no frozen reading table
    src = (REPO / "scripts" / "bench_ab_outliers.py").read_text()
    assert "R6_CONTEXT" not in src


def test_outliers_ab_combine_attributes_from_artifacts(tmp_path):
    import scripts.bench_ab_outliers as ob

    _write_round_artifacts(tmp_path, 8)
    ctx = ob.load_context(root=tmp_path)
    targets, controls = ob.select_targets(ctx)

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    for rep, t in enumerate([1.1, 1.0]):  # min 1.0 <= 0.75 * 3.0 -> noise
        scratch.joinpath(f"outliers_{rep}.json").write_text(json.dumps({
            "rep": rep, "sf_dir": "x", "cpus": 16,
            "queries": {"q_slow_outlier": t, "q_window_join": 0.55,
                        "q_steady": 1.0},
        }))
    assert ob.combine(ctx, targets, controls, root=tmp_path, scratch=scratch) == 0
    out = json.loads((tmp_path / "OUTLIERS_AB.json").read_text())
    assert out["round"] == 8
    row = out["queries"]["q_slow_outlier"]
    assert row["driver_r8"] == 3.0 and row["committed"] == 1.0
    assert row["guards_ab_min"] == 0.9
    assert "environment noise" in row["attribution"]
    assert out["queries"]["q_window_join"]["attribution"].startswith("control")

    # the REPRODUCES branch: minima tracking the driver reading
    for rep in range(2):
        scratch.joinpath(f"outliers_{rep}.json").write_text(json.dumps({
            "rep": rep, "sf_dir": "x", "cpus": 16,
            "queries": {"q_slow_outlier": 2.9, "q_window_join": 0.55,
                        "q_steady": 1.0},
        }))
    ob.combine(ctx, targets, controls, root=tmp_path, scratch=scratch)
    out = json.loads((tmp_path / "OUTLIERS_AB.json").read_text())
    assert "REPRODUCES" in out["queries"]["q_slow_outlier"]["attribution"]


def test_outliers_ab_committed_readings_come_from_git(tmp_path):
    """r9 ADVICE low #2: `combine` run standalone after --full-bench
    reps must adjudicate against the COMMITTED canonical BENCH_FULL,
    not the working-tree file the last rep just overwrote. load_context
    reads HEAD's copy via `git show` and falls back to the working tree
    only when the artifact was never committed."""
    import subprocess

    import scripts.bench_ab_outliers as ob

    # the repo and the no-history dir must be SIBLINGS: a dir nested
    # inside the test repo would resolve `git show` against the parent
    # repo and the fallback branch would never run (r10 code-review
    # finding — the vacuous version passed even with the fallback
    # deleted)
    repo = tmp_path / "repo"
    repo.mkdir()
    _write_round_artifacts(repo, 8)

    def git(*a):
        subprocess.run(["git", *a], cwd=repo, capture_output=True,
                       check=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    git("add", "-A")
    git("commit", "-qm", "canonical snapshot")
    # a --full-bench rep overwrites the working-tree artifact with its
    # own (faster) reading — the committed baseline must not move
    (repo / "BENCH_FULL.json").write_text(json.dumps({
        "queries": {"q_slow_outlier": 0.4}, "plan_cost_total": 0.4,
    }))
    ctx = ob.load_context(root=repo)
    assert ctx["committed"]["q_slow_outlier"] == 1.0, (
        "combine picked up a rep's overwritten working-tree reading "
        "instead of the committed canonical artifact"
    )

    # no git history (fresh checkout / plain tmp dir) -> working tree;
    # guard the premise first: if tmp_path ever sits inside some repo,
    # this leg would silently test the wrong branch again
    bare = tmp_path / "bare"
    bare.mkdir()
    probe = subprocess.run(
        ["git", "show", "HEAD:BENCH_FULL.json"],
        cwd=bare, capture_output=True, text=True,
    )
    assert probe.returncode != 0, (
        "test premise broken: `bare` resolves a parent git repo"
    )
    _write_round_artifacts(bare, 8)
    assert ob.load_context(root=bare)["committed"]["q_slow_outlier"] == 1.0


def test_artifact_classifier_rejects_nested_paths():
    """r7 ADVICE: fnmatch's * matches path separators, so a nested path
    like BENCH_r_dir/evil.json used to classify as a round artifact and
    slip the dirty-tree, --skip-bench, and stamp-exactness gates.
    Artifacts are repo-root-only by contract."""
    import scripts.snapshot_round as sr

    assert not sr._is_artifact("BENCH_r_dir/evil.json")
    assert not sr._is_artifact("sub/BENCH_r08.json")
    assert not sr._is_artifact("sub\\BENCH_r08.json")
    assert not sr._is_artifact("a/ORACLE_LOCAL.json")
    # root-level artifacts still classify
    assert sr._is_artifact("BENCH_r08.json")
    assert sr._is_artifact("OUTLIERS_AB.json")


def test_staged_stamp_check_blocks_before_commit(tmp_path, monkeypatch):
    """r7 ADVICE: the stamp verifier used to run only AFTER the snapshot
    commit existed — a failure exited 1 but left the stale-artifact
    commit in history. verify_stamp_staged reads the WORKING-TREE
    artifact contents and diffs against the current HEAD, so main() can
    refuse before any commit is created."""
    import scripts.snapshot_round as sr

    monkeypatch.setattr(sr, "REPO", tmp_path)

    def fake_git(*args):
        if args[0] == "diff":
            return "bitcoinminingetl_spark/operators/joins.py\n"
        raise AssertionError(args)

    monkeypatch.setattr(sr, "_git", fake_git)
    good = {"tree_commit": "abc1234", "tree_dirty": False}
    for n in ("BENCH_FULL.json", "ORACLE_LOCAL.json"):
        (tmp_path / n).write_text(json.dumps(good))
    # stale: code separates the stamp from the parent-to-be
    assert sr.verify_stamp_staged() == 1

    monkeypatch.setattr(
        sr, "_git",
        lambda *a: "BENCH_FULL.json\n" if a[0] == "diff" else "",
    )
    assert sr.verify_stamp_staged() == 0
    # missing artifact also refuses
    (tmp_path / "ORACLE_LOCAL.json").unlink()
    assert sr.verify_stamp_staged() == 1


def test_stamp_contract_holds_on_actual_history():
    """r7 VERDICT item 4, the formalized contract asserted END-TO-END on
    the repo's real history (not a fixture): at the last commit that
    touched ORACLE_LOCAL.json, the committed artifact stamps must name a
    clean tree separated from that commit only by artifact files and
    judge-written round docs (VERDICT.md/ADVICE.md — the driver's
    round-close commit carries those beside the artifacts it
    regenerates). Self-equality is a SHA fixed point, so parent-stamp +
    verified non-code-free diff IS the contract."""
    import subprocess

    import scripts.snapshot_round as sr

    at = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", "ORACLE_LOCAL.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert at, "ORACLE_LOCAL.json has no history"
    assert sr.verify_stamp_exactness(at=at) == 0


def test_every_expensive_query_is_scaling_audited():
    """Self-enforcing >1 s scaling-audit rule (r8 VERDICT item 2): the
    r7 widening rule — every query whose committed BENCH_FULL plan cost
    exceeds 1.0 s gets a SCALING.md growth exponent — was enforced by
    hand, so q_dedup_representatives (1.49 s) landed in r8 with no row.
    This test makes the rule structural: every non-lifecycle query over
    the threshold in the committed BENCH_FULL.json must be in
    scripts/scaling_check.py's AUDIT list, and SCALING.md must carry a
    row (verdict `ok`) for every audited query so the committed artifact
    can't go stale against the list."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scaling_check", REPO / "scripts" / "scaling_check.py"
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)
    audited = {name for name, _bound, _why in sc.AUDIT}

    from scripts.snapshot_round import committed_bench_full, previous_bench_full

    bench = json.loads((REPO / "BENCH_FULL.json").read_text())
    # The gate judges CANONICAL artifacts. Mid-round the working tree
    # legitimately holds a driver/verify single-rep or A/B overwrite
    # (oracle skipped, sometimes guards off, reps=1); judging that copy
    # would flag host-noise singles against the min-of-N baseline —
    # fall back to HEAD's committed (already-gated) copy instead.
    if (
        bench.get("oracle_skipped")
        or bench.get("numeric_guards") is False
        or bench.get("reps", 3) < 3
    ):
        bench = committed_bench_full(REPO) or bench
    lifecycle = set(bench.get("lifecycle_queries", {}))
    # HYSTERESIS (r11 review finding): on this host a single bench run
    # can swing 40%+, so "expensive" needs two independent runs to
    # agree — over 1.0 s NOW and over the prev-band in the PREVIOUS
    # committed canonical run. One noisy spike can no longer deadlock
    # successive snapshots on a different borderline query each time,
    # while genuine growth (which persists across rounds) and genuinely
    # new expensive queries (absent from the previous run) are still
    # flagged on arrival. `previous_bench_full` (r11 ADVICE medium)
    # resolves "previous" identically pre- and post-commit: HEAD's copy
    # while the judged copy is newer, else the copy at the parent of
    # the last commit touching the artifact — so a snapshot that passed
    # this gate pre-commit cannot fail it on its own committed tree.
    # Prev-band: 0.75 while canonical artifacts were single runs
    # (±45% swing); tightened to 0.9 once both sides became min-of->=3
    # (r11 VERDICT item 1's anticipated follow-through — the r12 rep
    # scatter was ±6% of total, so a real >1.0 s plan reads >0.9 in the
    # previous min too, while legacy single-run prevs keep the loose
    # band so the transition round can't deadlock).
    prev_artifact = previous_bench_full(REPO, current=bench) or {}
    prev = prev_artifact.get("queries", {})
    both_min = (
        bench.get("reps", 0) >= 3 and prev_artifact.get("reps", 0) >= 3
    )
    prev_band = 0.9 if both_min else 0.75
    expensive = {
        n
        for n, t in bench["queries"].items()
        if n not in lifecycle and t > 1.0 and prev.get(n, 99.0) > prev_band
    }
    unaudited = sorted(expensive - audited)
    assert not unaudited, (
        f"plan cost > 1.0 s (and > {prev_band} s in the previous "
        f"committed run) in BENCH_FULL but not in scaling_check.AUDIT: "
        f"{unaudited}"
    )

    import re

    scaling_rows = {
        m.group(1)
        for m in re.finditer(
            r"^\| (q_\w+) \|.*\| ok \|", (REPO / "SCALING.md").read_text(), re.M
        )
    }
    stale = sorted(audited - scaling_rows)
    assert not stale, (
        f"in scaling_check.AUDIT but no `ok` row in SCALING.md "
        f"(regenerate with scripts/scaling_check.py): {stale}"
    )


def test_previous_bench_full_pre_and_post_commit_agree(tmp_path):
    """r11 ADVICE medium: the hysteresis gate's "previous committed
    run" must resolve to the SAME artifact before and after the
    snapshot commit. Pre-commit the working tree holds the new run and
    HEAD holds the previous one; post-commit HEAD equals the working
    tree and "previous" must move to the parent of the commit that
    touched the artifact — otherwise a query jumping 0.7→1.2 s is
    exempted pre-commit (prev 0.7 ≤ 0.75) but flagged post-commit
    (prev == current 1.2 > 0.75), and the just-committed tree fails
    its own hygiene suite."""
    import subprocess

    import scripts.snapshot_round as sr

    repo = tmp_path / "repo"
    repo.mkdir()

    def git(*a):
        subprocess.run(["git", *a], cwd=repo, capture_output=True, check=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    v1 = {"plan_cost_total": 0.7, "queries": {"q_x": 0.7}}
    (repo / "BENCH_FULL.json").write_text(json.dumps(v1))
    git("add", "-A")
    git("commit", "-qm", "round N-1 snapshot")

    # first-ever snapshot, judged post-commit: no parent artifact ->
    # None (no previous run), not a crash
    assert sr.previous_bench_full(repo) is None

    # pre-commit: working tree holds the new run, HEAD the previous
    v2 = {"plan_cost_total": 1.2, "queries": {"q_x": 1.2}}
    (repo / "BENCH_FULL.json").write_text(json.dumps(v2))
    assert sr.previous_bench_full(repo) == v1

    # post-commit: HEAD == working tree; previous must STILL be v1
    git("add", "-A")
    git("commit", "-qm", "round N snapshot")
    assert sr.previous_bench_full(repo) == v1

    # explicit `current` differing from HEAD (judging a regenerated
    # copy mid-round): previous is HEAD's committed copy
    v3 = {"plan_cost_total": 1.3, "queries": {"q_x": 1.3}}
    assert sr.previous_bench_full(repo, current=v3) == v2


def test_memguard_receipt_is_green_and_non_vacuous():
    """r9 VERDICT item 4: the committed memory receipt must say what it
    exists to say — the guarded family COMPLETED under the constrained
    heap AND found the planted signal (guards drop the skew, not the
    data), while the unguarded twin died on the same corpus. A MEMGUARD
    regenerated into a red or vacuous state fails here instead of
    riding into the snapshot."""
    m = json.loads((REPO / "MEMGUARD.json").read_text())
    assert m["verdict"]["guarded_completed_under_heap"] is True
    assert m["verdict"]["unguarded_contrast_died"] is True
    rows = {r["query"]: r["rows"] for r in m["arms"]["guarded"]["queries"]}
    assert rows.get("q_dedup_ngram_pruned", 0) >= m["corpus"]["planted_pairs"]
    # the hot key really was hostile: unguarded pair bound >= 10^8
    assert m["corpus"]["unguarded_pair_bound"] >= 10**8


def test_window_drill_receipt_spans_registry_and_is_green():
    """r9 VERDICT item 3: the committed drill artifact must be the
    all-windows receipt with zero failures. Coverage is pinned loosely
    (>= 230 queries) rather than against the live registry: the drill
    is stamped at its own tree_commit, so queries added later in a
    round legitimately miss it until the next --all run."""
    d = json.loads((REPO / "WINDOW_DRILL.json").read_text())
    assert d["mode"] == "all_windows"
    assert d["n"] >= 230
    bad = (
        d["counts"].get("mismatch", 0)
        + d["counts"].get("spark_error", 0)
        + d["counts"].get("oracle_error", 0)
    )
    assert bad == 0, d["counts"]


def test_oracle_sf01_receipt_is_green_and_non_vacuous():
    """r12 VERDICT item 2: the committed second-scale-factor sweep must
    cover the registry at sf0.1 with zero mismatches/errors AND no
    query whose oracle-hashed result newly EMPTIES at 10x the data (a
    threshold degenerating at scale is exactly what this receipt
    exists to catch — an empty match is a vacuous match)."""
    d = json.loads((REPO / "ORACLE_SF01.json").read_text())
    assert d["sf_dir"].rstrip("/").endswith("sf0.1"), d["sf_dir"]
    assert d["n_queries"] >= 230
    bad = d["n_mismatch"] + d["n_spark_error"] + d["n_oracle_error"]
    assert bad == 0, {
        k: v for k, v in d["queries"].items()
        if v.get("status") not in ("match", "rows_only")
    }
    assert d["newly_empty_vs_sf001"] == [], d["newly_empty_vs_sf001"]
    assert d["ok"] is True


def test_fuzz_receipt_is_green_and_non_vacuous():
    """r12 VERDICT item 3: the committed grammar-fuzz receipt must be a
    full-size seeded run with zero divergences and a mostly non-empty
    result population (an all-empty fuzz corpus compares nothing)."""
    d = json.loads((REPO / "FUZZ.json").read_text())
    assert d["n"] >= 100, d["n"]
    assert d["n_mismatch"] == 0 and d["n_error"] == 0, d["divergences"][:3]
    assert d["n_nonempty"] >= d["n"] // 2
    assert d["ok"] is True


def test_window_drill_statuses_agree_with_oracle_local():
    """r12 VERDICT stretch 7: WINDOW_DRILL is load-bearing — it is the
    compensation for the driver's never-rotating first-50 hash window,
    so its per-query verdicts must be THE SAME verdicts ORACLE_LOCAL
    records (judge-verified true in r12 but unasserted until now). The
    comparison is per-query status over the intersection of the two
    receipts' query sets; when both receipts are stamped at the same
    tree (every snapshot), the sets must also be identical."""
    drill = json.loads((REPO / "WINDOW_DRILL.json").read_text())
    local = json.loads((REPO / "ORACLE_LOCAL.json").read_text())
    dq, lq = drill["queries"], local["queries"]
    diverged = {
        name: (dq[name].get("status"), lq[name].get("status"))
        for name in set(dq) & set(lq)
        if dq[name].get("status") != lq[name].get("status")
    }
    assert not diverged, (
        "WINDOW_DRILL and ORACLE_LOCAL disagree on per-query status: "
        f"{diverged}"
    )
    if drill.get("tree_commit") == local.get("tree_commit"):
        assert set(dq) == set(lq), (
            "same-tree receipts cover different query sets: "
            f"drill-only={sorted(set(dq) - set(lq))[:5]} "
            f"local-only={sorted(set(lq) - set(dq))[:5]}"
        )


def test_architecture_receipt_map_is_current():
    """r10 VERDICT stretch 7: ARCHITECTURE.md is the generated receipt
    graph (query -> file:line -> receipts -> tests -> gates). It must
    match a fresh in-memory build exactly — a query added, moved, or
    re-gated without regenerating goes red here."""
    import scripts.gen_architecture as ga

    committed = (REPO / "ARCHITECTURE.md").read_text()
    fresh = ga.render(ga.build_rows())
    assert committed == fresh, (
        "ARCHITECTURE.md is stale — run scripts/gen_architecture.py"
    )


def test_streamstate_receipt_is_green_and_non_vacuous():
    """r10 VERDICT item 5: the committed streaming state receipt must
    prove BOUNDED state for both stateful-join lifecycles — multi-batch
    timelines where watermark expiry removed rows and final state sits
    below the peak. A receipt with removed=0 or final>=peak certifies
    nothing (that shape IS the unbounded-state failure) and must fail
    here."""
    d = json.loads((REPO / "STREAMSTATE.json").read_text())
    assert d["metric"] == "stream_state"
    assert d.get("tree_dirty") is False
    assert set(d["lifecycles"]) >= {"interval_join", "sessionize"}
    for name, rec in d["lifecycles"].items():
        v = rec["verdict"]
        assert v["bounded"] is True, (name, v)
        assert v["batches"] >= 2, (name, v)
        assert v["rows_removed"] > 0, (name, v)
        assert v["final_state_rows"] < v["peak_state_rows"], (name, v)
        # the timeline itself must back the verdict (not be re-stated)
        totals = [
            sum(op.get("numRowsTotal") or 0 for op in t["state"])
            for t in rec["timeline"]
        ]
        assert max(totals) == v["peak_state_rows"]
        assert totals[-1] == v["final_state_rows"]
    # r12 VERDICT item 5: the streaming decade row — the ingest gate's
    # drain must grow in-band with landed volume on the 10x corpus,
    # with both legs' volumes measured (not assumed) in the receipt
    dec = d["incremental_dedup_decade"]
    assert dec["ok"] is True, dec
    assert dec["alpha_drain"] <= dec["bound"], dec
    assert dec["legs"]["hi"]["landed_rows"] > 5 * dec["legs"]["lo"][
        "landed_rows"
    ], dec["legs"]


def test_memguard_receipt_is_stamp_fresh():
    """r11 VERDICT item 6: MEMGUARD.json was the one receipt exempt
    from the stamp-exactness contract (its r11 stamp lagged the
    snapshot by sanctioned-but-unchecked commits). The pinned lag rule:
    the receipt may trail HEAD only by commits that touch NONE of the
    guarded modules it certifies. The module list is recorded in the
    receipt itself and cross-checked against the live harness, so
    neither side can silently go stale."""
    import subprocess

    import scripts.mem_smoke as ms

    m = json.loads((REPO / "MEMGUARD.json").read_text())
    assert m.get("tree_dirty") is False, (
        "MEMGUARD.json stamped at a dirty tree — rerun scripts/mem_smoke.py"
    )
    tc = m.get("tree_commit")
    assert tc, "MEMGUARD.json carries no tree_commit — rerun scripts/mem_smoke.py"
    live = sorted(ms.guarded_module_paths())
    assert m.get("guarded_modules") == live, (
        "receipt's guarded-module list differs from the live harness "
        f"({m.get('guarded_modules')} vs {live}) — rerun scripts/mem_smoke.py"
    )
    changed = subprocess.run(
        ["git", "diff", "--name-only", f"{tc}..HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    touched = sorted(set(changed) & set(live))
    assert not touched, (
        f"guarded modules changed since the MEMGUARD stamp {tc}: "
        f"{touched} — the committed receipt certifies code that no "
        "longer exists; rerun scripts/mem_smoke.py"
    )


def test_streamstate_cost_attribution_is_non_vacuous():
    """r11 VERDICT item 5: the committed streaming receipt must carry
    the incremental-dedup lifecycle's per-stage cost breakdown, and the
    breakdown must actually decompose the drain (foreachBatch work +
    overhead == drain) with at least one non-empty batch — an
    attribution that doesn't add up certifies nothing."""
    d = json.loads((REPO / "STREAMSTATE.json").read_text())
    c = d["incremental_dedup_cost"]
    a = c["attribution"]
    batches = c["stages"]["batches"]
    assert any(not b.get("empty") for b in batches), batches
    assert a["drain_s"] > 0 and a["foreach_batch_total_s"] > 0
    assert (
        abs(a["drain_overhead_s"] + a["foreach_batch_total_s"] - a["drain_s"])
        < 0.05
    )
    # per-batch stage rows must themselves decompose their totals
    for b in batches:
        if b.get("empty"):
            continue
        parts = (
            b["batch_prep_s"]
            + b["dedup_and_accept_write_s"]
            + b["index_increment_s"]
        )
        assert abs(parts - b["total_s"]) < 0.05, b
    # the named stages cover the lifecycle (readback residual is small)
    covered = a["bootstrap_index_s"] + a["landing_write_s"] + a["drain_s"]
    assert 0 < covered <= c["total_s"] + 0.05


def test_window_drill_receipt_is_snapshot_fresh():
    """r10 VERDICT item 2: the drill is part of the snapshot contract.
    The commit that last touched WINDOW_DRILL.json must be separated
    from the drill's own tree_commit stamp by artifact-only changes —
    i.e. the committed receipt describes exactly the code tree it rode
    in with, never a plan nine commits stale (the r10 finding). Runs on
    real history, so a future round that commits a stale drill goes red
    here on its own tree."""
    import subprocess

    import scripts.snapshot_round as sr

    last = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", "WINDOW_DRILL.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert last, "WINDOW_DRILL.json has never been committed"
    stamp = json.loads(
        subprocess.run(
            ["git", "show", f"{last}:WINDOW_DRILL.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    )
    assert stamp.get("tree_dirty") is not True
    tc = stamp.get("tree_commit")
    # guard before use (r11 ADVICE low): a drill whose stamp lost the
    # key (tree_stamp returns {} when git is unavailable) must fail
    # with the staleness message, not a KeyError — the working-tree
    # twin _window_drill_objection already handles that case gracefully
    assert tc, (
        "committed WINDOW_DRILL.json carries no tree_commit stamp — "
        "regenerate with scripts/window_drill.py --all at a clean tree"
    )
    changed = sr._code_changed_since(tc, at=last)
    assert changed == [], (
        f"committed drill stamped at {stamp['tree_commit']} but its "
        f"snapshot commit {last[:7]} carries code changes: {changed[:5]}"
    )


def test_bench_budget_verdict_reads_committed_canonical():
    """r9 VERDICT stretch 7: the bench carries a declared per-round
    budget — plan_cost_total vs the COMMITTED canonical total, breach
    = exit 1 on canonical runs. The verdict must come from git HEAD
    (A/B reps overwrite the working-tree artifact) and flag correctly
    on both sides of the limit."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", REPO / "bench.py"
    )
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)

    v = b._budget_verdict(1e9, current_reps=9)
    assert v["applied"] and v["exceeded"] and v["limit"] == b.BUDGET_FACTOR
    assert "accepted_reason" not in v
    v = b._budget_verdict(0.001, current_reps=9)
    assert v["applied"] and not v["exceeded"]
    assert v["committed_total"] > 0

    # sanctioned acceptance path (r10 VERDICT item 3): the reason must
    # NAME a committed adjudication receipt plus a query it covers — a
    # fabricated one-word acceptance is recorded as rejected and the
    # breach stands; a receipt-backed one is stamped with the receipt.
    import os

    os.environ["SPARK_GRAFT_BUDGET_ACCEPT"] = "because"
    try:
        v = b._budget_verdict(1e9, current_reps=9)
        assert v["exceeded"] and "accepted_reason" not in v
        assert "acceptance_rejected" in v
    finally:
        del os.environ["SPARK_GRAFT_BUDGET_ACCEPT"]

    # r12: an OUTLIERS_AB acceptance must be minted against the CURRENT
    # committed baseline — the repo's committed receipt adjudicated a
    # round-8 breach, its recorded committed readings no longer match
    # the canonical artifact, so citing it is REJECTED (a fresh breach
    # needs a fresh bench_ab_outliers run; the accept branch is proven
    # on a matching receipt in
    # test_outliers_acceptance_binds_to_current_baseline)
    os.environ["SPARK_GRAFT_BUDGET_ACCEPT"] = (
        "q_bitext_mine drift adjudicated in OUTLIERS_AB.json round 8"
    )
    try:
        v = b._budget_verdict(1e9, current_reps=9)
        assert v["exceeded"]
        assert "accepted_reason" not in v and "acceptance_rejected" in v
    finally:
        del os.environ["SPARK_GRAFT_BUDGET_ACCEPT"]

    # a receipt-backed reason citing a query the receipt does NOT cover
    # is also rejected
    os.environ["SPARK_GRAFT_BUDGET_ACCEPT"] = (
        "q_nonexistent_query per OUTLIERS_AB.json"
    )
    try:
        v = b._budget_verdict(1e9, current_reps=9)
        assert "accepted_reason" not in v and "acceptance_rejected" in v
    finally:
        del os.environ["SPARK_GRAFT_BUDGET_ACCEPT"]

    # word-boundary matching (r11 review finding): citing a query whose
    # name merely EXTENDS a covered query's name must not validate via
    # the prefix — OUTLIERS_AB covers q_dedup_embed_cosine, not its
    # _lsh twin
    os.environ["SPARK_GRAFT_BUDGET_ACCEPT"] = (
        "q_dedup_embed_cosine_lsh regressed per OUTLIERS_AB.json"
    )
    try:
        v = b._budget_verdict(1e9, current_reps=9)
        assert "accepted_reason" not in v and "acceptance_rejected" in v
    finally:
        del os.environ["SPARK_GRAFT_BUDGET_ACCEPT"]

    # SUITE_EXPANSION citations require a committed receipt bound to the
    # current baseline; none is committed, so this must be rejected
    os.environ["SPARK_GRAFT_BUDGET_ACCEPT"] = (
        "q_window_join added per SUITE_EXPANSION.json"
    )
    try:
        v = b._budget_verdict(1e9, current_reps=9)
        assert "accepted_reason" not in v and "acceptance_rejected" in v
    finally:
        del os.environ["SPARK_GRAFT_BUDGET_ACCEPT"]


def test_snapshot_bench_env_enforces_min_reps():
    """The regenerate path must hand bench.py a >=3-rep environment no
    matter what the caller shell carries — a 1-rep canonical would only
    be caught by _skip_bench_objection AFTER the 20-minute run."""
    import scripts.snapshot_round as sr

    assert sr._bench_env({})["SPARK_GRAFT_BENCH_REPS"] == "3"
    assert sr._bench_env({"SPARK_GRAFT_BENCH_REPS": "1"})[
        "SPARK_GRAFT_BENCH_REPS"
    ] == "3"
    assert sr._bench_env({"SPARK_GRAFT_BENCH_REPS": "junk"})[
        "SPARK_GRAFT_BENCH_REPS"
    ] == "3"
    # more reps than the floor is the caller's call
    assert sr._bench_env({"SPARK_GRAFT_BENCH_REPS": "5"})[
        "SPARK_GRAFT_BENCH_REPS"
    ] == "5"
    # unrelated env rides through
    assert sr._bench_env({"OTHER": "x"})["OTHER"] == "x"


def test_bench_budget_compares_like_statistic_to_like(monkeypatch):
    """r11 VERDICT item 1: once the committed baseline is a min-of-N,
    a lesser-rep run's total sits up to ~45% above it on pure host
    noise — the gate must refuse to apply rather than flag a phantom
    regression; an equal-or-more-rep run applies normally (min-of-N vs
    a single baseline is conservative: min <= any single)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod_stat", REPO / "bench.py"
    )
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)

    import scripts.snapshot_round as sr

    committed = {"plan_cost_total": 100.0, "reps": 3, "statistic": "min"}
    monkeypatch.setattr(sr, "committed_bench_full", lambda repo: committed)

    v = b._budget_verdict(140.0, current_reps=1)
    assert v["applied"] is False
    assert "statistic mismatch" in v["reason"]
    assert v["committed_reps"] == 3 and v["reps"] == 1
    assert "exceeded" not in v  # no phantom breach from a noisy single

    v = b._budget_verdict(160.0, current_reps=3)
    assert v["applied"] and v["exceeded"]
    v = b._budget_verdict(120.0, current_reps=4)
    assert v["applied"] and not v["exceeded"]

    # legacy single-run baseline: any rep count applies (conservative)
    monkeypatch.setattr(
        sr, "committed_bench_full", lambda repo: {"plan_cost_total": 100.0}
    )
    v = b._budget_verdict(120.0, current_reps=3)
    assert v["applied"] and not v["exceeded"] and v["committed_reps"] == 1


def test_outliers_acceptance_binds_to_current_baseline(tmp_path):
    """r11 verdict residual, closed r12: an OUTLIERS_AB acceptance
    validates ONLY while the receipt's recorded committed readings
    equal the current canonical baseline's — the moment the baseline
    moves, the same receipt stops validating and a new breach requires
    a fresh adjudication, never a wave-through from an old one."""
    import importlib.util
    import os
    import subprocess

    spec = importlib.util.spec_from_file_location(
        "bench_mod_bind", REPO / "bench.py"
    )
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)

    repo = tmp_path / "repo"
    repo.mkdir()

    def git(*a):
        subprocess.run(["git", *a], cwd=repo, capture_output=True, check=True)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    (repo / "BENCH_FULL.json").write_text(json.dumps({
        "plan_cost_total": 100.0, "reps": 3, "statistic": "min",
        "queries": {"q_x": 1.25},
    }))
    (repo / "OUTLIERS_AB.json").write_text(json.dumps({
        "queries": {"q_x": {"committed": 1.25,
                            "attribution": "environment noise"}},
    }))
    git("add", "-A")
    git("commit", "-qm", "snapshot + adjudication")

    b._REPO = str(repo)
    os.environ["SPARK_GRAFT_BUDGET_ACCEPT"] = (
        "q_x adjudicated in OUTLIERS_AB.json"
    )
    try:
        # receipt matches the live baseline -> acceptance validates
        v = b._budget_verdict(1e9, current_reps=3)
        assert v["exceeded"] and v["accepted_receipt"]["file"] == (
            "OUTLIERS_AB.json"
        )
        assert v["accepted_receipt"]["queries"] == ["q_x"]

        # the baseline moves; the SAME receipt must stop validating
        (repo / "BENCH_FULL.json").write_text(json.dumps({
            "plan_cost_total": 120.0, "reps": 3, "statistic": "min",
            "queries": {"q_x": 1.4},
        }))
        git("add", "-A")
        git("commit", "-qm", "next snapshot")
        v = b._budget_verdict(1e9, current_reps=3)
        assert "accepted_reason" not in v and "acceptance_rejected" in v
    finally:
        del os.environ["SPARK_GRAFT_BUDGET_ACCEPT"]


def test_suite_expansion_receipt_refuses_pure_regression(
    monkeypatch, tmp_path
):
    """The third acceptance channel (SUITE_EXPANSION.json) must refuse
    to mint a receipt when NO query was added vs the committed baseline
    — an empty receipt could only launder a pure regression — and must
    record exactly the added queries with their costs when the suite
    did grow."""
    import scripts.snapshot_round as sr
    import scripts.suite_expansion as se

    committed = {
        "plan_cost_total": 100.0,
        "queries": {"q_a": 1.0, "q_b": 2.0},
    }
    monkeypatch.setattr(sr, "committed_bench_full", lambda repo: committed)
    monkeypatch.setattr(se, "REPO", tmp_path)

    # no breach at all (r11 ADVICE low): cur <= base must refuse even
    # when queries WERE added — a null-breach receipt bound only to
    # baseline_total could later wave through an unrelated breach at
    # the same baseline
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps(
            {
                "plan_cost_total": 90.0,
                "queries": {"q_a": 1.0, "q_b": 2.0, "q_new": 0.5},
            }
        )
    )
    assert se.main() == 1
    assert not (tmp_path / "SUITE_EXPANSION.json").exists()

    # pure regression: same query set, bigger total -> refused
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps(
            {"plan_cost_total": 160.0, "queries": {"q_a": 80.0, "q_b": 80.0}}
        )
    )
    assert se.main() == 1
    assert not (tmp_path / "SUITE_EXPANSION.json").exists()

    # laundering attempt (r11 review finding): one trivial added query
    # coexisting with a dominant unrelated regression must be refused —
    # the additions explain almost none of the delta
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps(
            {
                "plan_cost_total": 200.0,
                "queries": {"q_a": 95.0, "q_b": 95.0, "q_new": 0.2},
            }
        )
    )
    assert se.main() == 1
    assert not (tmp_path / "SUITE_EXPANSION.json").exists()

    # genuine expansion: new queries recorded with their costs
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps(
            {
                "plan_cost_total": 160.0,
                "queries": {"q_a": 1.0, "q_b": 2.0, "q_new": 57.0},
            }
        )
    )
    assert se.main() == 0
    receipt = json.loads((tmp_path / "SUITE_EXPANSION.json").read_text())
    assert receipt["queries"] == {"q_new": 57.0}
    assert receipt["added_total"] == 57.0
    assert receipt["breach_explained"] == round(57.0 / 60.0, 3)


def test_every_rows_only_query_is_adjudicated():
    """r9 VERDICT item 6: every rows-only registry query carries a
    one-line convertibility verdict in SURVEY.md's adjudication table
    (rule: convertible iff the result is a deterministic function of
    the oracle's views, expressible in DuckDB SQL) — so no convertible
    query can hide behind a rows-only check, and a query that GAINS an
    oracle must leave the table (stale rows fail too)."""
    import re

    from bitcoinminingetl_spark.registry import load_all

    reg = load_all()
    rows_only = {
        n for n, q in reg.items() if not getattr(q, "oracle", None)
    }
    assert rows_only, "registry loaded empty?"

    text = (REPO / "SURVEY.md").read_text()
    marker = "#### Rows-only convertibility adjudication"
    assert marker in text, "SURVEY.md lacks the adjudication section"
    section = text.split(marker, 1)[1].split("| query id |", 1)[0]
    adjudicated = set(re.findall(r"^\| `(q_\w+)` \|", section, re.M))

    missing = sorted(rows_only - adjudicated)
    assert not missing, (
        f"rows-only queries with no convertibility verdict in "
        f"SURVEY.md: {missing}"
    )
    stale = sorted(adjudicated - rows_only)
    assert not stale, (
        f"adjudicated as rows-only but now oracle-backed or gone "
        f"(remove the row): {stale}"
    )


def test_decade_audit_is_recorded():
    """r9 VERDICT item 2: the noisy-alpha families and every
    declared-quadratic ground-truth twin carry a measured sf0.1->sf1eq
    upper-decade exponent, and SCALING.md's decade section has an `ok`
    row for each — so the committed artifact can't go stale against
    scripts/scaling_check.py's DECADE_AUDIT list."""
    import importlib.util
    import re

    spec = importlib.util.spec_from_file_location(
        "scaling_check", REPO / "scripts" / "scaling_check.py"
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)
    decade = {name for name, _bound, _why in sc.DECADE_AUDIT}

    # every twin the main audit declares super-linear joins the decade
    quadratic_twins = {
        name for name, bound, _why in sc.AUDIT if bound > 1.35
    }
    assert quadratic_twins <= decade, sorted(quadratic_twins - decade)
    # the r9-flagged noisy-alpha families
    for name in (
        "q_zorder_layout",
        "q_dup_span_stats",
        "q_dedup_span_removal",
        "q_bitext_mine",
    ):
        assert name in decade, name

    text = (REPO / "SCALING.md").read_text()
    assert "## Upper decade" in text, "SCALING.md lacks the decade section"
    section = text.split("## Upper decade", 1)[1]
    ok_rows = {
        m.group(1)
        for m in re.finditer(r"^\| (q_\w+) \|.*\| ok \|", section, re.M)
    }
    stale = sorted(decade - ok_rows)
    assert not stale, (
        f"in DECADE_AUDIT but no `ok` decade row in SCALING.md "
        f"(regenerate with scripts/scaling_check.py): {stale}"
    )


def test_outliers_ab_full_bench_prior_attribution(tmp_path):
    """r8 VERDICT item 1: the full-bench rep mode adjudicates a
    committed-to-committed round shift against the PRIOR round's
    canonical readings. Three branches: floor tracks prior -> the shift
    was environment drift; floor tracks current AND >= 1.5x prior ->
    real regression (weak flag); in between -> partial with residual."""
    import scripts.bench_ab_outliers as ob

    _write_round_artifacts(tmp_path, 8)
    ctx = ob.load_context(root=tmp_path)
    # simulate --prior: prior committed readings + total injected as
    # load_context would from `git show <rev>:BENCH_FULL.json`
    ctx["prior"] = {"q_drift": 1.0, "q_real": 1.0, "q_partial": 1.0}
    ctx["prior_rev"] = "r7rev"
    ctx["prior_plan_cost_total"] = 121.1
    ctx["committed"].update(
        {"q_drift": 1.3, "q_real": 1.6, "q_partial": 1.6}
    )

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    for rep, (d, r, p) in enumerate([(1.1, 1.55, 1.35), (1.05, 1.6, 1.4)]):
        scratch.joinpath(f"outliers_{rep}.json").write_text(json.dumps({
            "rep": rep, "context": "full_bench", "sf_dir": "x", "cpus": 16,
            "plan_cost_total": 140.0 + rep,
            "queries": {"q_drift": d, "q_real": r, "q_partial": p,
                        "q_window_join": 0.55},
        }))
    targets = ["q_drift", "q_real", "q_partial", "q_window_join"]
    assert ob.combine(
        ctx, targets, {"q_window_join"}, root=tmp_path, scratch=scratch,
        selected_outliers=set(),
    ) == 0
    out = json.loads((tmp_path / "OUTLIERS_AB.json").read_text())
    assert out["context"] == "full_bench"
    assert out["prior_rev"] == "r7rev"
    assert out["prior_plan_cost_total"] == 121.1
    assert out["per_rep_plan_cost_totals"] == [140.0, 141.0]
    q = out["queries"]
    assert q["q_drift"]["committed_prior"] == 1.0
    assert "environment drift" in q["q_drift"]["attribution"]
    assert "REPRODUCES" in q["q_real"]["attribution"]
    assert "partial" in q["q_partial"]["attribution"]
    assert q["q_window_join"]["attribution"].startswith("control")
