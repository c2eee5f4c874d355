"""Smoke tests for the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_runs(spark):
    mod = _entry_mod()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["window_start", "avg_click", "avg_view"]


def test_queries_and_oracles_consistent():
    mod = _entry_mod()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) > 0
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name
