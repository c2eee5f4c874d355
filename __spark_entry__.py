"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over bitcoinminingetl_spark's query registry: every operator from
SURVEY.md §2 registers a named (spark, sf_dir) -> DataFrame callable plus —
when SQL-expressible — a DuckDB oracle string. The driver smoke-runs
``entry``, then diffs each ``queries()`` entry against ``oracle_sql()`` at
sf=0.01 (row-count + schema + order-insensitive value hash).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bitcoinminingetl_spark.registry import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §2.1 R11): two metric streams -> 5-minute
    tumbling averages -> full-outer window join -> wide avg_info row."""
    registry = load_all()
    return registry["q_window_join"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; ops without an
    entry here (streaming/state, LSH variants) get the rows-only check."""
    return {
        name: spec.oracle
        for name, spec in sorted(load_all().items())
        if spec.oracle is not None
    }
