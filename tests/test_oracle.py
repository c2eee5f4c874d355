"""In-repo mirror of the driver's differential correctness gate: run every
registered query on Spark and its DuckDB oracle on the same parquet, then
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from bitcoinminingetl_spark.registry import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)

# Parity twins share one oracle string (e.g. the recursive-CTE transitive
# closure behind both CC queries); run each SHARED oracle once per session
# instead of once per twin (r5 VERDICT stretch 8). Same policy as
# oracle_check.shared_oracle_memo — only duplicated strings are retained.
from bitcoinminingetl_spark.oracle_check import fetch_oracle, shared_oracle_memo

_ORACLE_MEMO = shared_oracle_memo(REGISTRY)


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    o_cols, o_rows = fetch_oracle(duck, spec.oracle, _ORACLE_MEMO)

    assert sorted(s_cols) == sorted(o_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} != {len(o_rows)}"
    assert _canon_rows(s_cols, s_rows) == _canon_rows(o_cols, o_rows), (
        f"{name}: value mismatch"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_comparator_catches_induced_wrongness(spark, sf_dir):
    """Meta-test of the differential gate itself: a deliberately wrong
    query must come back `mismatch`, never `match` — guarding against a
    vacuous comparator (e.g. a canonicalization bug that collapses all
    rows equal, or column sorting that hides a value swap). Three
    perturbation classes: a value off by one cent, a dropped row, and a
    renamed column."""
    from dataclasses import replace

    from bitcoinminingetl_spark.oracle_check import check_one, duck_connect

    spec = REGISTRY["q_avg_grouped"]
    con = duck_connect(sf_dir)
    assert check_one(spark, con, spec, sf_dir)["status"] == "match"

    def perturbed(fn):
        return replace(spec, fn=fn)

    from pyspark.sql import functions as SF

    off_by_cent = perturbed(
        lambda s, d: spec.fn(s, d).withColumn(
            "avg_qty", SF.col("avg_qty") + 0.01
        )
    )
    assert check_one(spark, con, off_by_cent, sf_dir)["status"] == "mismatch"

    dropped_row = perturbed(lambda s, d: spec.fn(s, d).limit(3))
    assert check_one(spark, con, dropped_row, sf_dir)["status"] == "mismatch"

    renamed = perturbed(
        lambda s, d: spec.fn(s, d).withColumnRenamed("avg_qty", "avg_q2")
    )
    assert check_one(spark, con, renamed, sf_dir)["status"] == "mismatch"
