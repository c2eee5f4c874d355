"""The README quickstart's worked example must actually run (r11
VERDICT stretch 7): the python blocks are extracted from README.md and
executed verbatim against the real fixtures and the DuckDB oracle —
documentation that a hygiene test executes cannot rot."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _quickstart_blocks() -> tuple[list[str], str]:
    text = (REPO / "README.md").read_text()
    assert "## Quickstart" in text, "README lost its quickstart section"
    section = text.split("## Quickstart", 1)[1].split("\n## ", 1)[0]
    return re.findall(r"```python\n(.*?)```", section, re.S), section


def test_readme_quickstart_oracle_example_runs(spark, sf_dir):
    """Execute the quickstart's registration + check blocks exactly as
    a new user would; the embedded assert fires on any mismatch. The
    example registration is removed from the registry afterwards so no
    other test sees a README-owned query."""
    from bitcoinminingetl_spark import registry as reg_mod

    blocks, _ = _quickstart_blocks()
    assert len(blocks) >= 2, "quickstart lost its python blocks"
    ns: dict = {"spark": spark, "sf": sf_dir}
    try:
        for block in blocks[:2]:
            exec(compile(block, "<README quickstart>", "exec"), ns)
        assert ns["result"]["status"] == "match", ns["result"]
    finally:
        reg_mod.REGISTRY.pop("q_example_lang_counts", None)
    assert "q_example_lang_counts" not in reg_mod.REGISTRY


def test_readme_quickstart_references_are_real():
    """Every file, script and query name the quickstart cites must
    exist — a renamed gate or module fails here instead of leaving the
    doc pointing at nothing."""
    from bitcoinminingetl_spark.registry import load_all

    _, section = _quickstart_blocks()
    for rel in re.findall(r"`(scripts/\w+\.py|tests/test_\w+\.py)`", section):
        assert (REPO / rel).exists(), rel
    reg = load_all()
    for qname in set(re.findall(r"`(q_\w+)`", section)):
        assert qname in reg, f"quickstart cites unregistered query {qname}"
    # the cited test must exist inside its file, not just the file
    m = re.search(r"`tests/(test_\w+)\.py::(test_\w+)`", section)
    assert m, "quickstart lost its planted-test citation"
    assert m.group(2) in (REPO / "tests" / f"{m.group(1)}.py").read_text()
