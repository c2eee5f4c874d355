"""Generate ARCHITECTURE.md — the receipt graph (r10 VERDICT stretch 7).

One table, one row per registered query, built MECHANICALLY from the
sources of truth so it cannot drift from them:

- file:line        from the registered callable's code object
- correctness      oracle (full value hash) vs rows-only, from the
                   registry's oracle field
- planted tests    every test function in tests/ whose source references
                   the query by name (REGISTRY["q_x"] or "q_x" literal)
- mutation gates   every test_mutation_gates gate whose own source (or
                   the planted test it imports) references the query
- scaling          membership in scripts/scaling_check.py AUDIT (lower
                   decade) and DECADE_AUDIT (sf0.1->sf1eq)
- memguard         membership in the committed MEMGUARD.json guarded arm
- stream state     membership in the committed STREAMSTATE.json receipt

A hygiene test regenerates the table in-memory and diffs it against the
committed file, so a query added without regenerating goes red.

Usage: python scripts/gen_architecture.py      # rewrites ARCHITECTURE.md
"""

from __future__ import annotations

import ast
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# every test module except the gates themselves (handled separately)
# and the artifact-hygiene file (it tests receipts, not queries)
TEST_FILES = tuple(
    f"tests/{p.name}"
    for p in sorted((REPO / "tests").glob("test_*.py"))
    if p.name not in ("test_mutation_gates.py", "test_round_hygiene.py")
)


# Streaming lifecycle wrappers whose correctness tests exercise the
# underlying building block rather than the registry name — the SAME
# alias doctrine tests/test_round_hygiene.py's coverage invariant uses:
# a test referencing the function covers the lifecycle query.
LIFECYCLE_ALIASES = {
    "q_streaming_window_avg": "windowed_metric_averages",
    "q_streaming_sessionize": "session_windows",
    "q_streaming_interval_join": "stream_stream_interval_join",
    "q_streaming_interval_join_outer": "stream_stream_interval_join",
    "q_streaming_incremental_dedup": "run_incremental_dedup",
}


def _function_query_refs(path: Path) -> dict[str, set[str]]:
    """{test_function_name: {query names its source references}} for one
    test file — by q_* literals (or aliased lifecycle building-block
    names) in the function's source segment."""
    if not path.exists():
        return {}
    src = path.read_text()
    tree = ast.parse(src)
    out: dict[str, set[str]] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            seg = ast.get_source_segment(src, node) or ""
            refs = set(re.findall(r"\b(q_[a-z0-9_]+)\b", seg))
            for q, fn_name in LIFECYCLE_ALIASES.items():
                if re.search(rf"\b{fn_name}\b", seg):
                    refs.add(q)
            if refs:
                out[node.name] = refs
    return out


def build_rows() -> list[dict]:
    from bitcoinminingetl_spark.registry import load_all

    import scripts.scaling_check as sc

    registry = load_all()
    known = set(registry)

    # planted/property tests per query
    tests_by_query: dict[str, set[str]] = {n: set() for n in registry}
    fn_refs_by_file: dict[str, dict[str, set[str]]] = {}
    for tf in TEST_FILES:
        refs = _function_query_refs(REPO / tf)
        fn_refs_by_file[tf] = refs
        for fn_name, refs_set in refs.items():
            if fn_name.startswith("test_"):
                for q in refs_set & known:
                    tests_by_query[q].add(fn_name)

    # mutation gates: a gate covers a query if the gate's own source
    # names it, or the gate imports a planted test whose source does
    gate_file = REPO / "tests/test_mutation_gates.py"
    gate_src = gate_file.read_text()
    gate_tree = ast.parse(gate_src)
    imported_tests: dict[str, set[str]] = {}
    for tf, refs in fn_refs_by_file.items():
        for fn_name, refs_set in refs.items():
            imported_tests.setdefault(fn_name, set()).update(refs_set & known)
    # module-level aliased imports in the gates file (`from ... import
    # test_x as _gate_y`): the gate bodies reference the ALIAS, so map
    # alias -> the original test's query set or the chain breaks
    for node in ast.walk(gate_tree):
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.asname and a.name in imported_tests:
                    imported_tests[a.asname] = imported_tests[a.name]
    gates_by_query: dict[str, set[str]] = {n: set() for n in registry}
    for node in ast.walk(gate_tree):
        if isinstance(node, ast.FunctionDef) and node.name.startswith("test_"):
            seg = ast.get_source_segment(gate_src, node) or ""
            covered = set(re.findall(r"\b(q_[a-z0-9_]+)\b", seg)) & known
            for q, fn_name in LIFECYCLE_ALIASES.items():
                if re.search(rf"\b{fn_name}\b", seg):
                    covered.add(q)
            for imported in re.findall(
                r"\b((?:test|_gate)_[a-z0-9_]+)\b", seg
            ):
                covered |= imported_tests.get(imported, set())
            for q in covered:
                gates_by_query[q].add(node.name)

    lower = {name for name, _b, _w in sc.AUDIT}
    decade = {name for name, _b, _w in sc.DECADE_AUDIT}

    memguard: set[str] = set()
    mg_path = REPO / "MEMGUARD.json"
    if mg_path.exists():
        mg = json.loads(mg_path.read_text())
        for arm in (mg.get("arms") or {}).values():
            for qrec in arm.get("queries") or []:
                if qrec.get("query") in known:
                    memguard.add(qrec["query"])

    stream_state: set[str] = set()
    ss_path = REPO / "STREAMSTATE.json"
    if ss_path.exists():
        ss = json.loads(ss_path.read_text())
        if "interval_join" in ss.get("lifecycles", {}):
            stream_state |= {
                "q_streaming_interval_join",
                "q_streaming_interval_join_outer",
            }
        if "sessionize" in ss.get("lifecycles", {}):
            stream_state.add("q_streaming_sessionize")

    rows = []
    for name in sorted(registry):
        q = registry[name]
        code = q.fn.__code__
        rel = str(Path(code.co_filename).resolve().relative_to(REPO))
        receipts = []
        if q.oracle:
            receipts.append("oracle")
        else:
            receipts.append("rows-only (SURVEY §2.3 adjudicated)")
        if lower and name in lower:
            receipts.append("scaling")
        if name in decade:
            receipts.append("decade")
        if name in memguard:
            receipts.append("memguard")
        if name in stream_state:
            receipts.append("stream-state")
        rows.append(
            {
                "name": name,
                "loc": f"{rel}:{code.co_firstlineno}",
                "receipts": receipts,
                "tests": sorted(tests_by_query[name]),
                "gates": sorted(gates_by_query[name]),
            }
        )
    return rows


def render(rows: list[dict]) -> str:
    n_oracle = sum(1 for r in rows if "oracle" in r["receipts"])
    lines = [
        "# ARCHITECTURE — query surface -> modules -> receipts",
        "",
        "Generated by `scripts/gen_architecture.py` from the registry, the",
        "test sources, the scaling audit lists and the committed receipt",
        "artifacts — regenerate after adding a query (a hygiene test diffs",
        "this file against a fresh in-memory build). One row per registered",
        f"query ({len(rows)} total: {n_oracle} oracle-hashed,",
        f"{len(rows) - n_oracle} rows-only by design).",
        "",
        "Receipt legend: **oracle** = full value-hash differential vs DuckDB",
        "(driver window + ORACLE_LOCAL.json + WINDOW_DRILL.json replay);",
        "**rows-only** = non-hashable by design, adjudicated in SURVEY §2.3,",
        "guarded by the named planted tests and mutation gates;",
        "**scaling** / **decade** = measured growth exponents in SCALING.md",
        "(lower decade / sf0.1->sf1eq); **memguard** = completes under the",
        "2 GiB constrained-heap hostile corpus (MEMGUARD.json);",
        "**stream-state** = bounded-state timeline in STREAMSTATE.json.",
        "Mutation gates (tests/test_mutation_gates.py) are red/green-proven:",
        "each flips a constant/kernel the query reads at call time and",
        "asserts the named planted test fails, then passes restored.",
        "",
        "| query | file:line | receipts | planted/property tests | mutation gates |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        tests = "<br>".join(r["tests"]) or "—"
        gates = "<br>".join(r["gates"]) or "—"
        lines.append(
            f"| `{r['name']}` | {r['loc']} | {', '.join(r['receipts'])} "
            f"| {tests} | {gates} |"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    rows = build_rows()
    (REPO / "ARCHITECTURE.md").write_text(render(rows))
    n_gated = sum(1 for r in rows if r["gates"])
    n_tested = sum(1 for r in rows if r["tests"])
    print(
        f"wrote ARCHITECTURE.md: {len(rows)} queries, "
        f"{n_tested} with named tests, {n_gated} mutation-gated"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
