"""Query registry — the declared operator surface of the engine.

Each operator from SURVEY.md §2 registers itself here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB oracle SQL string used by the driver's differential-correctness
check. ``__spark_entry__.py`` simply exposes this registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}

_OPERATOR_MODULES = (
    "reference_pipeline",
    "scans",
    "joins",
    "aggregates",
    "windows",
    "sortset",
    "scalar_funcs",
    "dedup",
    "similarity",
    "mllib_ops",
    "corpus_ops",
    "text",
    "udfs",
    "multimodal",
    "streaming_ops",
    "tpch",
    "sql_surface",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    description: str


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return
    the populated registry."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(f"bitcoinminingetl_spark.operators.{mod}")
    return REGISTRY
