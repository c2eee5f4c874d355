"""Ports of the reference's unit tests (tests/test_transform.py in the
reference repo — same fixture values: USD=50000, ts=1609459200,
hashrate=100000000, difficulty=15000000) plus tests for the semantics the
reference never tested (SURVEY.md §5.2): empty-window NULL, the falsy
fallback window, :.2f parity, price precedence when both payloads arrive."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from bitcoinminingetl_spark.etl import load_avg_info, parse_payloads

TS = 1609459200

PRICE_PAYLOAD = {"spider_ts": TS, "price_data": {"USD": 50000, "time": TS}}
HASH_PAYLOAD = {
    "spider_ts": TS,
    "hash_rate_data": {"currentHashrate": 100000000, "currentDifficulty": 15000000},
}


def _parse(spark, *payloads: dict):
    raw = spark.createDataFrame(
        [(json.dumps(p),) for p in payloads], "payload string"
    )
    return parse_payloads(raw).collect()


def test_price_payload_parses(spark):
    # reference test_transform.py:7-26
    rows = _parse(spark, PRICE_PAYLOAD)
    assert len(rows) == 1
    r = rows[0]
    assert r.kind == "price" and r.usd == 50000
    assert int(r.server_ts.timestamp()) == TS
    assert int(r.spider_ts.timestamp()) == TS


def test_hashrate_payload_parses(spark):
    # reference test_transform.py:29-49 — note str coercion and
    # server_ts == spider_ts (transform.py:23-25)
    rows = _parse(spark, HASH_PAYLOAD)
    assert len(rows) == 1
    r = rows[0]
    assert r.kind == "hashrate"
    assert int(r.hashrate) == 100000000 and int(r.difficulty) == 15000000
    assert r.server_ts == r.spider_ts


def test_no_data_emits_nothing(spark):
    # reference test_transform.py:52-55
    assert _parse(spark, {"spider_ts": TS}) == []


def test_price_wins_when_both_present(spark):
    # untested in the reference: the elif at transform.py:12-30 means one
    # combined payload yields ONLY a price row
    both = {**PRICE_PAYLOAD, **HASH_PAYLOAD}
    rows = _parse(spark, both)
    assert len(rows) == 1 and rows[0].kind == "price"


def test_hashrate_beyond_int64(spark):
    # SURVEY §1.4: real network hashrate ~7e20 exceeds int64; the
    # DECIMAL(38,0) path must hold it exactly
    big = {
        "spider_ts": TS,
        "hash_rate_data": {"currentHashrate": 7e20, "currentDifficulty": 1.5e14},
    }
    r = _parse(spark, big)[0]
    assert int(r.hashrate) == 700000000000000000000


@pytest.fixture()
def parsed_window(spark):
    """5 price rows in [t-300, t], 2 in [t-600, t-300]; hashrate rows in
    the current window."""
    now = TS + 300
    payloads = [
        {"spider_ts": TS + dt, "price_data": {"USD": 50000 + dt, "time": TS + dt}}
        for dt in (0, 60, 120, 180, 240)
    ]
    payloads += [
        {"spider_ts": TS - dt, "price_data": {"USD": 40000, "time": TS - dt}}
        for dt in (60, 120)
    ]
    payloads += [
        {
            "spider_ts": TS + dt,
            "hash_rate_data": {"currentHashrate": 1e8 + dt, "currentDifficulty": 2e7},
        }
        for dt in (30, 90)
    ]
    raw = spark.createDataFrame([(json.dumps(p),) for p in payloads], "payload string")
    return parse_payloads(raw), now


def test_load_avg_info_current_window(spark, parsed_window):
    parsed, now = parsed_window
    row = load_avg_info(parsed, now).collect()[0]
    # avg(50000,50060,50120,50180,50240) = 50120 — rendered exactly as the
    # reference's f"{avg:.2f}" (load.py:52-53): no grouping separators
    assert row.usd == f"{50120:.2f}"
    assert row.hashrate == f"{100000060:.2f}"
    assert row.difficulty == f"{20000000:.2f}"


def test_load_avg_info_hashrate_scale_format(spark):
    """f'{avg:.2f}' parity at real network scale (~7e20 hashrate,
    ~1.5e14 difficulty): values >= 1000 must NOT pick up grouping
    separators (reference load.py:52-53 emits '7.00e+20'-free plain
    decimal strings via Python's %.2f)."""
    now = TS + 300
    payloads = [
        {"spider_ts": TS + dt, "price_data": {"USD": 50001, "time": TS + dt}}
        for dt in (0, 60)
    ] + [
        {
            "spider_ts": TS + 30,
            "hash_rate_data": {"currentHashrate": 7e20, "currentDifficulty": 1.5e14},
        }
    ]
    raw = spark.createDataFrame([(json.dumps(p),) for p in payloads], "payload string")
    row = load_avg_info(parse_payloads(raw), now).collect()[0]
    assert row.usd == f"{50001:.2f}"
    assert row.hashrate == f"{7e20:.2f}"
    assert row.difficulty == f"{1.5e14:.2f}"
    assert "," not in row.hashrate


def test_load_falls_back_to_previous_window(spark, parsed_window):
    parsed, now = parsed_window
    # a tick one window later: current [t, t+300] has no price rows ->
    # falls back to [t-300, t] (reference load.py:16-25)
    row = load_avg_info(parsed, now + 300).collect()[0]
    assert row.usd == f"{50120:.2f}"


def test_load_empty_windows_yield_null(spark, parsed_window):
    parsed, now = parsed_window
    # two windows later: both price windows empty -> NULL (the reference
    # raises here; hashrate empty-window crash normalized to NULL too)
    row = load_avg_info(parsed, now + 900).collect()[0]
    assert row.usd is None and row.hashrate is None and row.difficulty is None


def test_window_fallback_treats_exact_zero_as_empty(spark, tmp_path):
    """R10's falsy-zero quirk (reference load.py:17 `if not data[0]`): a
    window whose TRUE average is 0.0 must be treated as empty and fall
    back to the previous window's average — pinned on a planted fixture
    (values +5/-5 in hour 2) and cross-checked against the registered
    DuckDB oracle run on the same fixture, so the Spark plan and the
    declared oracle agree on the divergence, not just on never-zero
    data."""
    import duckdb

    from bitcoinminingetl_spark.registry import load_all

    rows = [
        # hour 1: avg 10.0
        (1, "2024-01-01 00:10:00", 1, "purchase", 10.0),
        # hour 2: avg exactly 0.0 -> falsy, falls back to hour 1
        (2, "2024-01-01 01:10:00", 1, "purchase", 5.0),
        (3, "2024-01-01 01:20:00", 1, "purchase", -5.0),
        # hour 3: avg 7.5
        (4, "2024-01-01 02:10:00", 1, "purchase", 7.5),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    spec = load_all()["q_window_fallback"]
    got = {
        r.hour_ts.isoformat(): (r.avg_cur, r.avg_filled)
        for r in spec.fn(spark, str(tmp_path)).collect()
    }
    assert got["2024-01-01T00:00:00"] == (10.0, 10.0)
    # the zero-average window: avg_cur is 0.0 but avg_filled fell back
    assert got["2024-01-01T01:00:00"] == (0.0, 10.0)
    assert got["2024-01-01T02:00:00"] == (7.5, 7.5)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    want = {
        r[0].isoformat(): (r[1], r[2])
        for r in con.execute(spec.oracle).fetchall()
    }
    assert got == want
