"""The reference ETL pipeline (extract -> transform -> load), Spark-native.

Reference semantics preserved exactly (each cited):
- api_trans routing: price payload wins over hashrate when both arrive in
  one tick (`if price... elif hashrate` — reference
  src/mining/utils/transform.py:12-30); neither -> no row.
- hashrate/difficulty arrive as stringified big integers
  (transform.py:23-24) and are stored wide: DecimalType(38,0) — current
  network hashrate (~7e20 H/s) exceeds int64 (SURVEY §1.4).
- the hashrate row's server_ts is set to spider_ts, conflating event time
  with processing time (transform.py:25) — reproduced, documented.
- load windows: closed interval [t-300, t] (data_model.py:29-30,
  load.py:9-14); price average falls back to [t-600, t-300] when the
  current window is empty OR zero (falsy check, load.py:16-25); output is
  2-dp formatted (load.py:52-53).
- divergence (normalized): the reference CRASHES (ZeroDivisionError) on an
  empty hashrate window (load.py:30-35); here that is NULL, matching the
  price column's behavior (SURVEY §2.1 R9).

Everything is a DataFrame expression: parsing via from_json with explicit
schemas (no dict IR between stages — lineage replaces XCom), averages via
hash aggregates (no client-side Python mean)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Nested payload schemas, mirroring the mempool.space JSON shapes the
# reference fetches (extract.py:8-12, FIXTURES.md §A.1).
PAYLOAD_SCHEMA = (
    "spider_ts long, "
    "price_data struct<USD: long, time: long>, "
    "hash_rate_data struct<currentHashrate: double, currentDifficulty: double>"
)

WINDOW_SECONDS = 300  # LOAD_INTERVAL (reference main.py:21)


def parse_payloads(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """R3+R4+R5: nested JSON -> typed rows with price-precedence routing.

    Input: a DataFrame with one JSON string column (the landed HTTP
    payloads). Output columns: kind ('price'|'hashrate'), usd,
    hashrate/difficulty as DECIMAL(38,0) via the string round-trip the
    reference does (str() at transform.py:23-24), server_ts, spider_ts.
    Rows with neither payload are dropped (api_trans returns None)."""
    p = F.from_json(F.col(json_col), PAYLOAD_SCHEMA)
    has_price = p.getField("price_data").isNotNull()
    has_hash = p.getField("hash_rate_data").isNotNull()
    hr = p.getField("hash_rate_data")
    spider_ts = F.timestamp_seconds(p.getField("spider_ts"))
    return (
        raw.select(
            F.when(has_price, F.lit("price"))
            .when(has_hash, F.lit("hashrate"))
            .alias("kind"),
            F.when(has_price, p.getField("price_data").getField("USD"))
            .cast("long")
            .alias("usd"),
            # str() round-trip, then DECIMAL(38,0): faithful beyond int64
            F.when(~has_price & has_hash, hr.getField("currentHashrate"))
            .cast("string")
            .cast("decimal(38,0)")
            .alias("hashrate"),
            F.when(~has_price & has_hash, hr.getField("currentDifficulty"))
            .cast("string")
            .cast("decimal(38,0)")
            .alias("difficulty"),
            F.when(has_price, F.timestamp_seconds(p.getField("price_data").getField("time")))
            .otherwise(spider_ts)  # transform.py:25 — hashrate server_ts := spider_ts
            .alias("server_ts"),
            spider_ts.alias("spider_ts"),
        )
        .filter(F.col("kind").isNotNull())
    )


def _fmt2(col: Column) -> Column:
    """The reference's f"{avg:.2f}" (load.py:52-53): plain 2-dp decimal
    string, NO grouping separators (format_number would insert them for
    every value >= 1000 — i.e. all hashrate/difficulty output). Cast to
    double first (%.2f rejects Spark Decimal; the reference formats
    Python floats), and keep NULL as NULL (Java %.2f renders a null arg
    as the literal string "nu")."""
    return F.when(
        col.isNotNull(), F.format_string("%.2f", col.cast("double"))
    )


def _closed_window(ts: Column, now_epoch: int, lo_off: int, hi_off: int) -> Column:
    """R7: BETWEEN is closed on both ends, anchored at processing time."""
    return ts.between(
        F.timestamp_seconds(F.lit(now_epoch - lo_off)),
        F.timestamp_seconds(F.lit(now_epoch - hi_off)),
    )


def load_avg_info(parsed: DataFrame, now_epoch: int) -> DataFrame:
    """R8-R12: one avg_info row for the tick at ``now_epoch``.

    avg(USD) over [t-300, t]; if NULL-or-zero, retry [t-600, t-300]
    (load.py:16-25). avg(hashrate), avg(difficulty) over [t-300, t],
    NULL on empty (normalized divergence, see module docstring). Output
    formatted to 2 dp like the reference's f"{avg:.2f}" insert."""
    price = parsed.filter(F.col("kind") == "price")
    hashr = parsed.filter(F.col("kind") == "hashrate")

    cur = price.filter(_closed_window(F.col("server_ts"), now_epoch, WINDOW_SECONDS, 0))
    prev = price.filter(
        _closed_window(F.col("server_ts"), now_epoch, 2 * WINDOW_SECONDS, WINDOW_SECONDS)
    )
    cur_avg = cur.agg(F.avg("usd").alias("usd_avg"))
    prev_avg = prev.agg(F.avg("usd").alias("usd_prev_avg"))
    hr_avg = hashr.filter(
        _closed_window(F.col("spider_ts"), now_epoch, WINDOW_SECONDS, 0)
    ).agg(
        F.avg("hashrate").alias("hashrate_avg"),
        F.avg("difficulty").alias("difficulty_avg"),
    )

    # falsy fallback: NULL *or zero* triggers the previous window
    usd = F.when(
        F.col("usd_avg").isNull() | (F.col("usd_avg") == 0), F.col("usd_prev_avg")
    ).otherwise(F.col("usd_avg"))
    return (
        cur_avg.crossJoin(prev_avg)
        .crossJoin(hr_avg)
        .select(
            # format_string('%.2f') matches the reference's f"{avg:.2f}"
            # (load.py:52-53) exactly; format_number() would insert
            # grouping separators ('7,000,...,000.00') that the reference
            # never emits — visible only at hashrate/difficulty scale
            # (>= 1000), which is precisely this module's data range.
            _fmt2(usd).alias("usd"),
            _fmt2(F.col("hashrate_avg")).alias("hashrate"),
            _fmt2(F.col("difficulty_avg")).alias("difficulty"),
            F.timestamp_seconds(F.lit(now_epoch)).alias("spider_ts"),
        )
    )
