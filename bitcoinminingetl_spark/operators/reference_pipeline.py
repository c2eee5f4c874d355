"""The reference ETL's query semantics, re-expressed as Catalyst plans.

The reference (lyfer233/BitcoinMiningETL) computes: project/rename scalar
leaves out of nested JSON (src/mining/utils/transform.py:9-31), cast
str<->numeric<->timestamp (transform.py:23-24, utils/load.py:27,34-35),
null-route two sources with price-precedence (transform.py:12-30), filter a
closed [t-300, t] time interval (data_model.py:29-30,55-56; load.py:9-14),
AVG per window — server-side for price, client-side for hashrate
(load.py:13-15,30-35), fall back to the previous window when the current one
is empty/zero (load.py:16-25), join the per-stream averages into one wide
row (load.py:37-42), format to 2 decimals (load.py:52-53), and dedup by
identity columns (data_model.py:32-33,71-72).

Here each of those is a declarative DataFrame plan over the `events` table
(`ts` ~ server_ts, `value` ~ metric, `event_type` splits the table into
metric streams — see FIXTURES.md §B). No per-row loops, no driver-side
aggregation: every aggregate is a hash-aggregate with map-side partial
aggregation, every join a planner-chosen hash/broadcast join, so the same
plan scales from 1k rows to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bitcoinminingetl_spark.catalog import events_in_range, table
from bitcoinminingetl_spark.functions.numeric import (
    floor_long,
    floor_long_sql,
    round2,
    round2_sql,
)
from bitcoinminingetl_spark.registry import query

# Closed interval bounds for the R7-style range filter (the events table
# spans 2024-01-01..2024-01-30; see FIXTURES.md).
_T0 = "2024-01-05 00:00:00"
_T1 = "2024-01-20 00:00:00"


@query(
    "q_window_join",
    oracle=f"""
    WITH p AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               {round2_sql('avg(value)')} AS avg_click
        FROM events
        WHERE event_type = 'click'
          AND ts BETWEEN TIMESTAMP '{_T0}' AND TIMESTAMP '{_T1}'
        GROUP BY 1
    ), h AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               {round2_sql('avg(value)')} AS avg_view
        FROM events
        WHERE event_type = 'view'
          AND ts BETWEEN TIMESTAMP '{_T0}' AND TIMESTAMP '{_T1}'
        GROUP BY 1
    )
    SELECT coalesce(p.window_start, h.window_start) AS window_start,
           p.avg_click, h.avg_view
    FROM p FULL OUTER JOIN h ON p.window_start = h.window_start
    """,
)
def q_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's avg_info materialization (R11).

    Two metric streams -> 5-minute tumbling AVG each -> full-outer join on
    the window -> one wide row per window, 2-dp rounded (reference
    load.py:8-55). Full-outer because either stream may be absent in a
    window (the reference inserts NULL-completed rows).

    Scale: each side is a partial-agg + final-agg on the window key; the
    join is an equi-join on the same key, so with AQE both sides share the
    shuffle partitioning and skew is handled at runtime. The time range
    filters the raw ns column (events_in_range) so it prunes parquet row
    groups at the scan.
    """
    events = events_in_range(spark, sf_dir, _T0, _T1)

    def stream_avg(event_type: str, out: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == event_type)
            .groupBy(F.window("ts", "5 minutes").alias("win"))
            .agg(round2(F.avg("value")).alias(out))
        )

    p = stream_avg("click", "avg_click")
    h = stream_avg("view", "avg_view")
    return p.join(h, on="win", how="full_outer").select(
        F.col("win.start").alias("window_start"), "avg_click", "avg_view"
    )


@query(
    "q_project_rename",
    oracle="""
    SELECT event_id,
           event_type AS stream,
           value AS metric,
           CAST(1704067200 AS BIGINT) AS spider_ts
    FROM events
    """,
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: projection + rename + literal column (transform.py:9-31 renames
    currentHashrate->hashrate, time->server_ts and attaches spider_ts).
    Pure narrow op: no shuffle, column pruning reaches the parquet scan."""
    return table(spark, sf_dir, "events").select(
        F.col("event_id"),
        F.col("event_type").alias("stream"),
        F.col("value").alias("metric"),
        F.lit(1704067200).cast("long").alias("spider_ts"),
    )


@query(
    "q_casts",
    oracle=f"""
    SELECT CAST(event_id AS VARCHAR) AS id_str,
           CAST(user_id AS VARCHAR) AS uid_str,
           {floor_long_sql('value')} AS value_floor,
           CAST(TRY_CAST((CASE WHEN NOT isnan(value) THEN value END)
               AS DECIMAL(12, 2)) AS DOUBLE) AS value_dec,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           CAST(to_timestamp(event_id * 60 + 1609459200) AS TIMESTAMP) AS synth_ts
    FROM events
    """,
)
def q_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: the reference's cast zoo — str(big_int) storage
    (transform.py:23-24), int()/float() re-parse (load.py:34-35), epoch ->
    TIMESTAMP via FROM_UNIXTIME (data_model.py:27-28). DecimalType(12,2)
    stands in for the Decimal wrapping at load.py:27. All JVM-side casts
    inside whole-stage codegen.

    value_floor masks non-finite AND |x| >= 2**63 input before floor
    (r7 + r8 ADVICE — the privacy trio's _value_band class): Spark's
    floor(double) itself casts to long, coercing NaN to 0 and +/-Inf
    plus finite huge values to Long.MIN/MAX before try_cast can NULL
    them, while the oracle's TRY_CAST(floor(...)) NULLs all of those.
    floor_long/floor_long_sql apply the identical mask on both engines."""
    return table(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("id_str"),
        F.col("user_id").cast("string").alias("uid_str"),
        floor_long(F.col("value")).alias("value_floor"),
        # The DECIMAL(12,2) cast is the R4 parity point; the final cast to
        # double is hash-canonical (Decimal('18.20') vs float 18.2 hash
        # differently in the driver's canonicalizer even when cell-identical).
        # try_cast: a value beyond 10 digits overflows DECIMAL(12,2) and ANSI
        # mode raises instead of NULLing; the oracle TRY_CASTs identically.
        F.col("value").try_cast("decimal(12,2)").cast("double").alias("value_dec"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.timestamp_seconds(F.col("event_id") * 60 + 1609459200).alias("synth_ts"),
    )


@query(
    "q_filter_between",
    oracle=f"""
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{_T0}' AND TIMESTAMP '{_T1}'
    """,
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7: inclusive BETWEEN range predicate (data_model.py:29-30; the
    [t-300, t] closed window at load.py:9-14). Closed interval — unlike
    Spark's window() buckets which are [start, end); we keep BETWEEN
    semantics for parity. The range is applied to the raw ns column via
    events_in_range so it reaches the scan as PushedFilters (a predicate
    on the derived timestamp would not — see catalog.events_in_range)."""
    return events_in_range(spark, sf_dir, _T0, _T1).select(
        "event_id", "ts", "event_type", "value"
    )


@query(
    "q_null_routing",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type IN ('click', 'view') THEN value
                WHEN event_type IN ('purchase', 'signup') THEN value * 2
           END AS routed_value,
           CASE WHEN event_type IN ('click', 'view') THEN 'price'
                WHEN event_type IN ('purchase', 'signup') THEN 'hashrate'
           END AS route
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase', 'signup')
    """,
)
def q_null_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: null-aware conditional routing with price-precedence — the
    reference's if/elif in api_trans (transform.py:12-30): price branch
    wins, hashrate second, neither -> row dropped (emit nothing)."""
    events = table(spark, sf_dir, "events")
    price = F.when(F.col("event_type").isin("click", "view"), F.col("value"))
    hashr = F.when(F.col("event_type").isin("purchase", "signup"), F.col("value") * 2)
    return (
        events.select(
            "event_id",
            F.coalesce(price, hashr).alias("routed_value"),
            F.when(price.isNotNull(), "price")
            .when(hashr.isNotNull(), "hashrate")
            .alias("route"),
        )
        .filter(F.col("routed_value").isNotNull())
    )


@query(
    "q_avg_global",
    oracle=f"""
    SELECT {round2_sql('avg(value)')} AS avg_usd
    FROM events
    WHERE event_type = 'click'
    """,
)
def q_avg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: global aggregate, NULL on empty input (the price AVG the
    reference pushes into MySQL, data_model.py:29-30). One partial agg per
    partition + a single final reduce — no full shuffle."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .agg(round2(F.avg("value")).alias("avg_usd"))
    )


@query(
    "q_window_fallback",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        FROM events
    ), spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour_ts FROM bounds
    ), cur AS (
        SELECT date_trunc('hour', ts) AS hour_ts, {round2_sql('avg(value)')} AS avg_cur
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT s.hour_ts,
           c.avg_cur,
           coalesce(nullif(c.avg_cur, 0),
                    lag(c.avg_cur) OVER (ORDER BY s.hour_ts)) AS avg_filled
    FROM spine s LEFT JOIN cur c USING (hour_ts)
    """,
)
def q_window_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10: previous-window fallback. The reference retries the [t-600,
    t-300] window when the current AVG is NULL *or zero* (falsy check at
    load.py:16-25). Batch form: hourly spine (so empty windows exist as
    NULL rows), then coalesce(nullif(cur, 0), lag(cur)). The spine comes
    from sequence() on the aggregated bounds — a 2-row driver-free plan."""
    events = table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_ts")
    )
    cur = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(round2(F.avg("value")).alias("avg_cur"))
    )
    w = Window.orderBy("hour_ts")
    return (
        spine.join(cur, on="hour_ts", how="left")
        .select(
            "hour_ts",
            "avg_cur",
            F.coalesce(F.nullif("avg_cur", F.lit(0.0)), F.lag("avg_cur").over(w)).alias(
                "avg_filled"
            ),
        )
    )


@query(
    "q_round_format",
    oracle=f"""
    SELECT event_type,
           {round2_sql('avg(value)')} AS avg_rounded,
           CASE WHEN isfinite({round2_sql('avg(value)')})
                THEN printf('%.2f', {round2_sql('avg(value)')}) END AS avg_str
    FROM events
    GROUP BY event_type
    """,
)
def q_round_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12: 2-dp output parity — the reference formats averages with
    f"{avg:.2f}" before insert (load.py:52-53). round() for the numeric
    column, format_string('%.2f') for the string form — NOT
    format_number(), whose grouping separators diverge from the
    reference for every value >= 1000 (hashrate ~7e20). The string is
    formatted from the decimal-rounded value so Spark and the oracle
    never disagree on a half-way digit.

    The string leg formats FINITE values only (NULL otherwise, both
    engines). Found by the r8 adversarial differential sweep: Java's
    Formatter renders a NULL arg as the string "null" WITH the %.2f
    precision applied — the all-NULL stream read the literal 'nu' —
    and non-finite rendering is platform text ('NaN' vs printf's
    'nan'/'-nan'). The reference never formats a missing average either
    (f"{None:.2f}" raises; load.py falls back first), so NULL is the
    faithful output for a group with no representable mean."""
    avg2 = round2(F.avg("value"))
    finite = avg2.isNotNull() & ~F.isnan(avg2) & (F.abs(avg2) != F.lit(float("inf")))
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            avg2.alias("avg_rounded"),
            F.when(finite, F.format_string("%.2f", avg2)).alias("avg_str"),
        )
    )


@query(
    "q_dedup_exact",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13: record identity on a column subset (Price.__eq__ compares only
    (server_ts, USD) — data_model.py:32-33). Project to the identity
    columns, then dropDuplicates — a hash aggregate with map-side partial
    dedup, the cheapest distributed dedup shape."""
    return table(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value FROM (
        SELECT e.*, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events e
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13 extended: keep the earliest full row per identity key. The
    deterministic form of dropDuplicates(subset) — row_number over a total
    per-key order (dropDuplicates keeps an arbitrary row, which can't be
    oracle-checked). One shuffle on the identity key."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


@query(
    "q_surrogate_key",
    oracle="""
    SELECT row_number() OVER (ORDER BY o_orderkey) AS sk, o_orderkey, o_totalprice
    FROM orders
    """,
)
def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15: auto-increment surrogate key (init.sql:9,18,26). PRIMARY =
    the distributed sketch-bucket plan (q_surrogate_key_dist) — identical
    contiguous AUTO_INCREMENT semantics, no single-task global window.
    The serial window form survives as q_surrogate_key_serial, kept only
    as the smallest-possible parity reference against the oracle SQL."""
    return q_surrogate_key_dist(spark, sf_dir)


@query(
    "q_surrogate_key_serial",
    oracle="""
    SELECT row_number() OVER (ORDER BY o_orderkey) AS sk, o_orderkey, o_totalprice
    FROM orders
    """,
)
def q_surrogate_key_serial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15, parity reference ONLY: contiguous ids via row_number over a
    GLOBAL window — a deliberate single-partition exchange that does not
    scale (every row through one task). Use q_surrogate_key (the
    distributed plan) everywhere; this stays registered so the judge and
    the oracle can check the two plans emit identical keys."""
    w = Window.orderBy("o_orderkey")
    return table(spark, sf_dir, "orders").select(
        F.row_number().over(w).alias("sk"), "o_orderkey", "o_totalprice"
    )


_SURROGATE_BUCKETS_CACHE: dict[str, DataFrame] = {}


def surrogate_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed orders relation (o_orderkey, o_totalprice, bkt) —
    step 1 of the distributed AUTO_INCREMENT — persisted once per
    (session, corpus). r13: q_surrogate_key_dist references this
    relation TWICE (rank branch + per-bucket-counts branch) and TWO
    registry entries run that plan (q_surrogate_key delegates to it),
    so the inline build paid the orders scan + percentile sketch +
    broadcast 4x per bench pass; the persist-once build (the
    shingle_index doctrine, functions/cache.py) pays it once and every
    branch reads executor storage. percentile_approx is deterministic
    for identical input, so the persisted relation is exactly what
    every inline branch computed before."""
    from bitcoinminingetl_spark.functions.cache import lru_persisted

    key = f"{spark.sparkContext.applicationId}:{sf_dir}:surrogate_buckets"

    def build() -> DataFrame:
        n_buckets = 8
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        qs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = orders.agg(
            F.percentile_approx("o_orderkey", qs, 10000).alias("bs")
        ).select(
            *[F.element_at("bs", i + 1).alias(f"b{i}") for i in range(len(qs))]
        )
        bucket = F.lit(0)
        for i in range(len(qs)):
            bucket = bucket + (F.col("o_orderkey") > F.col(f"b{i}")).cast("int")
        return orders.join(F.broadcast(bounds)).select(
            "o_orderkey", "o_totalprice", bucket.alias("bkt")
        )

    return lru_persisted(_SURROGATE_BUCKETS_CACHE, key, build)


@query(
    "q_surrogate_key_dist",
    oracle="""
    SELECT row_number() OVER (ORDER BY o_orderkey) AS sk, o_orderkey, o_totalprice
    FROM orders
    """,
)
def q_surrogate_key_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15 at scale: contiguous surrogate keys WITHOUT a global
    single-task window. The zipWithIndex emulation, all DataFrame ops:

    1. Key-range buckets from ONE percentile_approx sketch of
       o_orderkey, broadcast onto the scan — every row gets a
       deterministic bucket id whose ranges are ascending.
    2. row_number within each bucket (Window.partitionBy(bucket) — a
       parallel hash exchange, every bucket ranks concurrently).
    3. Per-bucket row counts (a |buckets|-row aggregate) turn into
       starting offsets via a cumulative window over that tiny relation,
       broadcast back onto the data.

    sk = offset + within-bucket rank reproduces exactly row_number()
    OVER (ORDER BY o_orderkey) — same oracle as the serial variant —
    while the only full-data exchange is hash(bucket), i.e. parallel.
    This is the 100 TB AUTO_INCREMENT.

    (Why explicit sketch buckets instead of repartitionByRange +
    monotonically_increasing_id: range repartitioning re-SAMPLES its
    boundaries per plan branch, so the per-partition counts branch and
    the data branch can see different partitionings — measured: off-by-
    thousands sk values, nondeterministic across runs. percentile_approx
    is deterministic for identical input, so every branch agrees.)

    r13: the bucketed relation comes from the persist-once build
    (surrogate_buckets) — previously the rank branch and the counts
    branch each re-ran the orders scan + sketch + broadcast inline
    (plan audit: the whole sketch subtree appeared twice per query, and
    two registry entries run this plan)."""
    bucketed = surrogate_buckets(spark, sf_dir)
    rn = F.row_number().over(
        Window.partitionBy("bkt").orderBy("o_orderkey")
    )
    counts = bucketed.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    offs = counts.select(
        "bkt",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
    )
    return (
        bucketed.join(F.broadcast(offs), "bkt")
        .select(
            (F.col("offset") + rn).cast("int").alias("sk"),
            "o_orderkey",
            "o_totalprice",
        )
    )


@query(
    "q_bigint_decimal_agg",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST(CAST(user_id AS VARCHAR)
                    || lpad(CAST(event_id AS VARCHAR), 18, '0')
                    AS DECIMAL(38,0)) AS hashes
        FROM events
    )
    SELECT event_type,
           CAST(sum(hashes) AS VARCHAR) AS total_hashes,
           CAST(max(hashes) AS VARCHAR) AS max_hashes,
           CAST(count(*) AS BIGINT) AS n
    FROM h GROUP BY event_type
    """,
)
def q_bigint_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashrate-fidelity promise made concrete (SURVEY §1.4): the
    reference stores ~7x10^20 H/s as strings in MySQL bigint columns
    (transform.py:23-24, init.sql:10-11) and re-parses with float() —
    silently losing precision past 2^53. Here string-carried integers
    WIDER than int64 (a synthetic 19-21 digit value per event) cast to
    DECIMAL(38,0) and aggregate EXACTLY — sums compared digit-for-digit
    as strings against the oracle, so any float round-trip anywhere in
    the pipeline would fail the hash check. Spark's decimal aggregation
    is Tungsten-native (128-bit), so exactness costs no Python and no
    UDF; partial aggregation still applies."""
    big = F.concat(
        F.col("user_id").cast("string"),
        F.lpad(F.col("event_id").cast("string"), 18, "0"),
    ).cast("decimal(38,0)")
    return (
        table(spark, sf_dir, "events")
        .select("event_type", big.alias("hashes"))
        .groupBy("event_type")
        .agg(
            F.sum("hashes").cast("string").alias("total_hashes"),
            F.max("hashes").cast("string").alias("max_hashes"),
            F.count(F.lit(1)).alias("n"),
        )
    )
