"""Window-function operators (SURVEY.md §2.2): ranking, lag/lead, sliding
frames. R10's previous-window fallback lives in reference_pipeline
(q_window_fallback); these are the general analytic surface.

Every window is keyed (partitionBy) so state distributes across executors;
ordering always includes a unique tiebreaker (event_id / custkey) — without
it row_number over ties is nondeterministic and can't be oracle-checked,
and at scale nondeterminism breaks retried-task idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.functions.numeric import (
    _DSUM_BOUND,
    roundn,
    roundn_sql,
)
from bitcoinminingetl_spark.registry import query


@query(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio per nation, richest first. row_number vs rank vs
    dense_rank differ only under ties; c_custkey breaks them."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10's analytic core: previous/next observation per user stream.
    lag/lead move raw column values (no float arithmetic), so values are
    bit-identical across engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2).over(w).alias("prev2_value"),
    )


@query(
    "q_window_frame",
    oracle=f"""
    SELECT event_id, user_id, ts,
           {roundn_sql(
               "avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
               "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", 6)} AS run_avg3,
           CASE WHEN max(abs(value)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) >= {_DSUM_BOUND:g}
           THEN NULL
           ELSE CAST(sum(TRY_CAST((CASE WHEN NOT isnan(value) THEN value END)
               AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           END AS run_sum
    FROM events
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame analytics (R11 spirit): 3-row moving average and a
    running total per user stream. The running sum accumulates in DECIMAL —
    engines may evaluate frames in different orders (segment trees vs
    naive), decimal addition is order-independent. The dsum poison bound
    applies per-frame: once a stream has seen a magnitude past the
    DECIMAL(18,4) quantization range, its running total (and every later
    one in that stream) is NULL rather than an ANSI crash or a silently
    short sum — a running max(abs) over the same growing frame carries
    the bound, still O(n) incremental."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    run_sum = F.when(
        F.max(F.abs("value")).over(run) >= _DSUM_BOUND,
        F.lit(None).cast("double"),
    ).otherwise(
        F.sum(F.col("value").try_cast("decimal(18,4)")).over(run).cast("double")
    )
    # the moving average materializes before roundn so its overflow guard
    # duplicates a column read, not the window aggregate (numeric.py)
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.avg("value").over(w.rowsBetween(-2, 0)).alias("raw_avg3"),
        run_sum.alias("run_sum"),
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        roundn(F.col("raw_avg3"), 6).alias("run_avg3"),
        "run_sum",
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour
    FROM events
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range frame: events in the trailing hour per user — the
    closed [t-Δ, t] interval of R7 as a window frame instead of a join.
    Expressed in Spark SQL (the DataFrame API can't build interval RANGE
    frames; rangeBetween only takes numeric offsets)."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events_rf")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_last_hour
        FROM events_rf
        """
    )


_SESSION_GAP_S = 30 * 60


@query(
    "q_sessionize",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tagged AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM ordered
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM tagged GROUP BY user_id, session_idx
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gap-based session operator every
    clickstream/training-data pipeline needs (the batch twin of
    streaming session_window): per user, a new session starts after >30
    minutes of inactivity; sessions get a per-user ordinal via a running
    sum over the new-session flags.

    Scale: one shuffle on user_id serves the lag, the running sum, AND
    the final per-session aggregate (same partitioning reused across all
    three); ties broken by event_id so ordering is total and the result
    engine-deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional-second gap: unix_timestamp() FLOORS to whole seconds, so
    # a true 1800.5 s gap could read 1800 and merge two sessions the
    # oracle (microsecond-exact epoch()) splits; casting the timestamp to
    # double keeps the microseconds
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    return (
        table(spark, sf_dir, "events")
        .withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > _SESSION_GAP_S), 1).otherwise(0),
        )
        .withColumn(
            "session_idx",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "q_window_ntile",
    oracle=f"""
    SELECT event_id, event_type, value,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           {roundn_sql('percent_rank() OVER w', 6)} AS pct_rank,
           {roundn_sql('cume_dist() OVER w', 6)} AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value NULLS FIRST, event_id)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows per event_type: ntile(4) bucketing,
    percent_rank, cume_dist. ntile's bucket boundaries depend on row
    ORDER (not value) under ties, so the ordering carries the event_id
    tiebreaker — the determinism rule every oracle-checked window here
    follows. NULL placement is pinned EXPLICITLY (NULLS FIRST, both
    engines): Spark's ascending default is nulls-first, DuckDB's is
    nulls-last, so an all-NULL-value stream silently re-bucketed every
    row differently until the r8 adversarial differential sweep caught
    it — the clean fixture carries no NULL values and never fired the
    divergence."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), "event_id"
    )
    # window outputs materialize before roundn (single-eval; numeric.py)
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("raw_pr"),
        F.cume_dist().over(w).alias("raw_cd"),
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        "quartile",
        roundn(F.col("raw_pr"), 6).alias("pct_rank"),
        roundn(F.col("raw_cd"), 6).alias("cume"),
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT event_id, user_id, ts, value,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over each user's full stream. The frame is
    explicitly UNBOUNDED..UNBOUNDED: the SQL-default frame stops at
    CURRENT ROW, which silently turns last_value into "current value" —
    the classic window-frame bug, pinned here on both engines."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


_EWMA_L = 16  # truncation: only the last 16 observations contribute
# Frames containing |value| >= this bound smooth to NULL (exact-or-NULL):
# terms |v * 0.5^d| <= |v|, so staying a decade under DECIMAL(28,12)'s
# 1e16 integer range keeps every quantized term exactly representable.
_EWMA_MAG_BOUND = 1e15


@query(
    "q_ewma_smooth",
    oracle=f"""
    WITH r AS (
        SELECT event_id, event_type, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    SELECT a.event_id, a.event_type,
           {roundn_sql(
               f"CASE WHEN max(abs(b.value)) >= {_EWMA_MAG_BOUND:g} THEN NULL"
               " ELSE CAST(SUM(TRY_CAST((CASE WHEN NOT isnan(b.value)"
               " THEN b.value * power(0.5, a.rn - b.rn) END)"
               " AS DECIMAL(28,12))) AS DOUBLE)"
               " / SUM(CASE WHEN b.value IS NOT NULL"
               "           THEN power(0.5, a.rn - b.rn) END) END",
               6,
           )} AS ewma
    FROM r a
    JOIN r b ON a.event_type = b.event_type
            AND b.rn BETWEEN a.rn - {_EWMA_L - 1} AND a.rn
    GROUP BY a.event_id, a.event_type
    """,
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per event_type — the
    time-series smoothing pass (pandas ``ewm(alpha=.5, adjust=True)``
    semantics, truncated to the last 16 observations so the operator is
    a bounded window, not an unbounded recurrence). alpha is exactly 0.5
    on purpose: the weights 0.5^lag are exact binary doubles, so Spark's
    pow and DuckDB's power agree bit-for-bit and the only cross-engine
    hazard left is summation ORDER — killed by quantizing each term to
    DECIMAL(28,12) and summing exactly (the dsum doctrine,
    functions/numeric.py).

    Plan: 16 lag() columns in ONE keyed window pass (offset frames are
    O(1)/row, parallel per event_type) and a flat whole-stage-codegen
    projection folding the weighted terms — no arrays materialized, no
    Python boundary (see :func:`ewma_smooth` for the formulation and
    NULL-in-frame semantics). The oracle expresses the same truncated
    EWMA as a bounded self-join on row_number, which DuckDB can check
    without window-frame UDAFs."""
    return ewma_smooth(table(spark, sf_dir, "events"))


def ewma_smooth(ev: DataFrame) -> DataFrame:
    """q_ewma_smooth's core over any (event_id, event_type, ts, value)
    frame — separated so the hypothesis property test can drive the
    exact production expressions against a Python reference.

    NULL handling is pandas ``ewm(ignore_na=False)``: weights are by ROW
    distance, so a NULL observation still spaces out its neighbors'
    weights, and the denominator sums the weights of the NON-NULL
    positions only. (Position-among-non-nulls — what a bare
    collect_list gives, since it drops NULLs — diverges from this and
    from the row-distance oracle whenever a frame contains a NULL.)

    Plan: 16 lag() columns in ONE keyed window pass (offset frames are
    O(1)/row) and a flat codegen projection — benched ~3x faster than
    the collect_list(struct)+HOF-fold formulation, with no arrays
    materialized. A lag that is NULL means either "row before the
    stream started" or "NULL observation"; both carry weight zero,
    exactly the oracle's bounded self-join + non-null filter.

    Exactness: each term quantizes to DECIMAL(28,12) (order-independent
    sum; the 16-term decimal chain peaks at ~2e15, far inside range
    when the magnitude gate passes); the denominator is a sum of
    distinct powers of 0.5 — exact in a double in any order. Frames
    containing a magnitude >= _EWMA_MAG_BOUND (or NaN/Inf, which order
    greater) smooth to NULL — the dsum exact-or-NULL doctrine."""
    wrow = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ev = ev.select(
        "event_id",
        "event_type",
        *[F.lag("value", k).over(wrow).alias(f"l{k}") for k in range(_EWMA_L)],
    )
    zero_dec = F.lit(0).cast("decimal(28,12)")
    num = None
    den = None
    mags = []
    for k in range(_EWMA_L):
        c = F.col(f"l{k}")
        w_k = 0.5 ** k  # exact binary double
        t = F.when(c.isNotNull(), (c * F.lit(w_k)).try_cast("decimal(28,12)")).otherwise(
            zero_dec
        )
        # re-truncate the accumulator each step: unbounded decimal
        # addition widens precision until Spark caps at 38 by REDUCING
        # SCALE (allowPrecisionLoss), silently rounding later terms at
        # 11 dp; the cast is exact here (sums peak ~2e15, scale kept)
        num = t if num is None else (num + t).try_cast("decimal(28,12)")
        d = F.when(c.isNotNull(), F.lit(w_k)).otherwise(F.lit(0.0))
        den = d if den is None else den + d
        mags.append(F.abs(c))
    ev = ev.select(
        "event_id",
        "event_type",
        num.alias("num"),
        den.alias("den"),
        # greatest() skips NULLs, so a partially-filled frame still
        # reports the max magnitude of its present values
        F.greatest(*mags).alias("fmax"),
    )
    # den == 0: every value in the frame is NULL (or the frame is only
    # pre-stream lags) -> NULL, not a DIVIDE_BY_ZERO; fmax >= bound or
    # NaN/Inf -> NULL, not an ANSI crash.
    ewma = roundn(
        F.when(
            (F.col("den") > 0) & (F.col("fmax") < _EWMA_MAG_BOUND),
            F.col("num").cast("double") / F.col("den"),
        ),
        6,
    )
    return ev.select("event_id", "event_type", ewma.alias("ewma"))


@query(
    "q_scd2_history",
    oracle="""
    WITH chg AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    v AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to
        FROM chg WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM v
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build — the warehouse-load pass
    the reference's MySQL star schema implies (init.sql upserts overwrite
    in place = SCD1; this is the versioned sibling every dimension table
    eventually needs). Change capture first: a row survives only when its
    event_type differs from the user's previous event (lag), THEN
    validity intervals from lead(ts) over the survivors — the standard
    two-window formulation. Both windows share partitionBy(user_id), so
    Catalyst reuses one hash exchange: filter + second window run inside
    the partitioning the first window established. Output is the
    effective-dated dimension: [valid_from, valid_to) half-open
    intervals, NULL valid_to = current row."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    return chg.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


_CONC_TTL = 300  # each event holds a slot for 5 minutes (R2's cadence)


@query(
    "q_peak_concurrency",
    oracle=f"""
    WITH deltas AS (
        SELECT event_type, ts AS t, 1 AS d FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL {_CONC_TTL} SECOND, -1 FROM events
    ),
    sweep AS (
        SELECT event_type,
               SUM(d) OVER (
                   PARTITION BY event_type ORDER BY t, d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS live
        FROM deltas
    )
    SELECT event_type, CAST(max(live) AS BIGINT) AS peak_concurrent
    FROM sweep GROUP BY event_type
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per stream — the sweep-line pattern for interval
    overlap questions (max sessions alive at once, peak open orders,
    connection-pool high-water marks): each event occupies a slot for
    {_CONC_TTL} s, every interval becomes a +1 at its start and a -1 at
    its end, and the running sum of deltas ordered by time IS the live
    count; its max per key is the answer. One explode (map-side, 2n
    rows), one keyed window, one aggregate — never an interval
    self-join, which is the O(n²) trap at 100 TB. End-before-start
    ordering at equal timestamps (the `, d` tiebreak with -1 < +1) makes
    back-to-back intervals NOT overlap — half-open [start, end)
    semantics, identical in the oracle."""
    ev = table(spark, sf_dir, "events")
    deltas = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("ts") + F.expr(f"INTERVAL {_CONC_TTL} SECOND")).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    live = F.sum("d").over(
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        deltas.select("event_type", live.alias("live"))
        .groupBy("event_type")
        .agg(F.max("live").cast("long").alias("peak_concurrent"))
    )


@query(
    "q_window_locf",
    oracle="""
    SELECT event_id, user_id, value,
           last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
           (value IS NULL) AS was_filled
    FROM events WHERE user_id < 30
    """,
)
def q_window_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward via IGNORE NULLS — the window-
    frame gap-fill idiom (sensor feeds, sparse metrics): each NULL
    reading takes the user's most recent non-NULL value; leading NULLs
    stay NULL (nothing to carry). Complements q_resample_interpolate:
    LOCF fills WITHIN the observed rows, interpolation fills a
    regularized grid.

    Plan: ONE keyed window (partition by user, order by time,
    running frame) — `last_value(..., ignorenulls=true)` evaluates
    inside the frame scan, no self-join, no second pass; the event_id
    tie-break makes same-timestamp fills deterministic. Per-user
    partitioning scales with user count; there is no global window."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.last("value", ignorenulls=True).over(w).alias("value_locf"),
        F.col("value").isNull().alias("was_filled"),
    )
