"""Join operators — every join shape the generalized surface needs
(SURVEY.md §2.2). The reference's only join is the avg_info flattening
(reference load.py:37-42, a 2-stream windowed full-outer, kept as the
flagship q_window_join); these generalize it over the TPC-H-ish tables.

Scale notes baked into each plan:
- dimension tables (region/nation/part/supplier/customer at TPC-H ratios)
  are broadcast — no shuffle of the fact side;
- fact-fact joins shuffle on the join key and rely on AQE for skew splits;
- the range/as-of joins keep an equi component (user_id) so the planner
  picks a hash join with a range residual instead of a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.functions.numeric import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    round2,
    round2_sql,
)
from bitcoinminingetl_spark.registry import query


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer. customer is ~1/10 of orders, well
    under the broadcast threshold at test scale; at 100 TB AQE converts
    the shuffle join back to broadcast when the built side is small."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT p.p_brand, {dsum_sql('l.l_quantity')} AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: part is a dimension (200 rows/sf0.001 vs 6k
    lineitem); the explicit broadcast() hint ships it to every executor so
    the 100 TB fact side never shuffles for this join."""
    lineitem = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers keep a NULL-completed row when they have
    no orders — the same null-completion the reference's avg_info row does
    for an absent stream (R11)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, orders.o_custkey == customer.c_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q_join_full",
    oracle="""
    WITH cn AS (
        SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer GROUP BY 1
    ), sn AS (
        SELECT s_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_suppliers
        FROM supplier GROUP BY 1
    )
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           cn.n_customers, sn.n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates — the relational generalization of
    the flagship's two-stream window join (R11): either side may be missing
    a key, both sides survive NULL-completed."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    cn = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sn = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return cn.join(sn, on="nationkey", how="full_outer").select(
        "nationkey", "n_customers", "n_suppliers"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence check without duplicating the left side —
    the distributed form of EXISTS. Only the key column of orders is
    shuffled (column pruning), not the payload."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: NOT EXISTS — customers with no HIGH-VALUE order
    (total price past 300k). The build side filters BEFORE the anti
    join, the plan every NOT EXISTS with a correlated predicate wants.
    Re-predicated in r8 from plain customers-without-orders, which is
    EMPTY on every fixture (each customer has orders) — a 0-row hash
    match verifies agreed emptiness but exercises no anti-join row flow
    (the r7 vacuity doctrine); this predicate leaves 30 customers at
    sf0.01."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "q_join_range",
    oracle="""
    SELECT p.event_id AS purchase_id,
           CAST(count(c.event_id) AS BIGINT) AS n_clicks_before
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL '1 hour' AND p.ts
    GROUP BY p.event_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (time-band) join: clicks within the hour before each purchase
    by the same user — R7's closed BETWEEN interval as a join condition.
    The equi conjunct (user_id) drives a hash join; the band is a residual
    filter, so this never degenerates into a cartesian product."""
    events = table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (c.c_user == p.p_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts <= p.p_ts)
    )
    return (
        p.join(c, cond, "inner")
        .groupBy("purchase_id")
        .agg(F.count("click_id").alias("n_clicks_before"))
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (R10 spirit: "most recent value at or before t"). Spark
    has no native ASOF; the scalable emulation is equi-join on the key +
    row_number over (purchase, click.ts DESC) keeping rank 1. One shuffle
    on user_id, one on the window key. The DuckDB oracle uses its native
    ASOF LEFT JOIN, checking the emulation's semantics exactly."""
    events = table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c, (p.user_id == c.c_user) & (c.c_ts <= p.purchase_ts), "left"
    )
    w = Window.partitionBy("purchase_id").orderBy(F.col("c_ts").desc_nulls_last())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id", "user_id", "purchase_ts", F.col("c_ts").alias("last_click_ts")
        )
    )


_N_SALTS = 8


@query(
    "q_join_salted",
    oracle=f"""
    SELECT e.event_id, e.event_type, d.type_avg
    FROM events e
    JOIN (
        SELECT event_type, {davg_sql('value')} AS type_avg
        FROM events GROUP BY event_type
    ) d ON e.event_type = d.event_type
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual key salting for a skewed shuffle join. `event_type` has ~5
    distinct values over the whole events table — a worst-case hot-key
    join: unsalted, every row of a key lands on ONE reducer regardless of
    cluster size. The salt fans each key across _N_SALTS reducers: the
    fact side derives salt = pmod(xxhash64(event_id), N) (deterministic,
    not rand(), so the plan is replayable); the dim side is exploded N×
    with every salt value; the join key becomes (event_type, salt).

    AQE's skew-join split handles *storage-skewed* sort-merge joins
    automatically; explicit salting remains the tool when the skew is in
    the KEY DISTRIBUTION itself or the join feeds keyed state (streaming).
    Result is byte-identical to the unsalted join — checked by the oracle,
    which runs the plain join."""
    events = table(spark, sf_dir, "events")
    dim = events.groupBy("event_type").agg(davg(F.col("value")).alias("type_avg"))
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(_N_SALTS)]))
    )
    fact = events.select(
        "event_id",
        "event_type",
        F.pmod(F.xxhash64("event_id"), F.lit(_N_SALTS)).cast("int").alias("salt"),
    )
    return fact.join(dim_salted, on=["event_type", "salt"]).select(
        "event_id", "event_type", "type_avg"
    )


@query(
    "q_upsert_merge",
    oracle=f"""
    WITH updates AS (
        SELECT o_orderkey,
               {round2_sql('o_totalprice * 1.1')} AS o_totalprice,
               'U' AS o_orderstatus
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT b.o_orderkey,
           coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus
    FROM orders b LEFT JOIN updates u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE/upsert: apply an update set over a base snapshot by
    key, updated columns winning via coalesce — the engine-level pattern
    under Delta/Iceberg MERGE INTO (which is this join + a transactional
    file swap). The update side here is derived (every 10th order
    repriced +10%, status 'U') so the query is self-contained and
    oracle-checkable.

    Scale: equi-join on the merge key; when updates are small (the usual
    case) the planner broadcasts them and the base table never shuffles —
    an incremental-maintenance primitive, not a full rewrite."""
    base = table(spark, sf_dir, "orders")
    updates = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            round2(F.col("o_totalprice") * 1.1).alias("u_totalprice"),
            F.lit("U").alias("u_orderstatus"),
        )
    )
    return (
        base.join(updates, on="o_orderkey", how="left")
        .select(
            "o_orderkey",
            F.coalesce("u_totalprice", "o_totalprice").alias("o_totalprice"),
            F.coalesce("u_orderstatus", "o_orderstatus").alias("o_orderstatus"),
        )
    )


@query(
    "q_fuzzy_match",
    oracle="""
    WITH c AS (
        SELECT c_custkey, c_name, right(c_name, 2) AS blk FROM customer
    ), s AS (
        SELECT s_suppkey, s_name, right(s_name, 2) AS blk FROM supplier
    ), scored AS (
        SELECT c_custkey, c_name, s_suppkey, s_name,
               CAST(levenshtein(c_name, s_name) AS INT) AS dist
        FROM c JOIN s USING (blk)
    )
    SELECT c_custkey, c_name, s_suppkey, s_name, dist FROM (
        SELECT *, row_number() OVER (
            PARTITION BY c_custkey ORDER BY dist, s_suppkey) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching (entity resolution in miniature): each
    customer's closest supplier name by Levenshtein edit distance within
    a blocking key, ties broken by key. The blocking key — the last two
    characters of the name — turns the unbounded cross join into an
    EQUI-join: candidates are scored only within their block, the
    standard entity-resolution shape (block -> score -> pick best). Per-
    block work is |c_block| x |s_block|, so total cost is sum of block
    products, not |customer| x |supplier|; skewed blocks are the salting
    problem, not a plan change. Customers whose block holds no supplier
    drop out — the documented recall trade every blocking scheme makes
    (add a second key, e.g. a length band, to union more candidates).
    Catalyst broadcasts the small supplier side, so the base table never
    shuffles; the plan test asserts no cartesian product survives."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.right(F.col("c_name"), F.lit(2)).alias("blk")
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.right(F.col("s_name"), F.lit(2)).alias("blk")
    )
    scored = cust.join(supp, on="blk").select(
        "c_custkey",
        "c_name",
        "s_suppkey",
        "s_name",
        F.levenshtein("c_name", "s_name").alias("dist"),
    )
    w = Window.partitionBy("c_custkey").orderBy("dist", "s_suppkey")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_BLOOM_CONFS = {
    # let the injection rule see our ~MB-scale local scans as "large"
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # force the shuffle-join shape the rule targets (a broadcast join
    # ships the whole dim anyway, so there is nothing for a bloom to save)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@query(
    "q_join_bloom",
    oracle=f"""
    SELECT l.l_returnflag,
           {dsum_sql('l.l_extendedprice')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY l.l_returnflag
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction — the 100 TB shuffle-join
    saver: a selective filter on orders means most lineitem rows will
    never find a match, so Catalyst's InjectRuntimeFilter builds a bloom
    filter over the filtered orders keys (bloom_filter_agg subquery) and
    applies might_contain() to the lineitem SIDE BEFORE the shuffle —
    rows that cannot join are dropped at the scan instead of being
    hashed, serialized, and shuffled. At cluster scale the two gating
    thresholds are met naturally (application-side scan >> 10 GB,
    creation side < 10 MB); local test data is below both, so this query
    sets them for the session just long enough to PLAN (QueryExecution
    memoizes the physical plan eagerly here; the confs are restored
    before returning, so no other query's plan is affected — AQE may
    still re-shape the join at runtime, but the injected might_contain
    filter is already a plan node and survives). Semantics are untouched
    by the bloom (false positives only pass extra rows to the real
    join), so the oracle is the plain join."""
    old = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        l = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
        out = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                dsum(F.col("l_extendedprice")).alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
        )
        out._jdf.queryExecution().executedPlan()  # memoize under our confs
        return out
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'
    ),
    agg AS (
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               max(CASE WHEN c.c_ts <= p.purchase_ts THEN c.c_ts END) AS bwd,
               min(CASE WHEN c.c_ts >  p.purchase_ts THEN c.c_ts END) AS fwd
        FROM p LEFT JOIN c ON p.user_id = c.user_id
        GROUP BY 1, 2, 3
    )
    SELECT purchase_id, user_id, purchase_ts,
           CASE
               WHEN bwd IS NULL THEN fwd
               WHEN fwd IS NULL THEN bwd
               WHEN epoch_us(purchase_ts) - epoch_us(bwd)
                    <= epoch_us(fwd) - epoch_us(purchase_ts) THEN bwd
               ELSE fwd
           END AS nearest_click_ts
    FROM agg
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join — the sensor/feature-alignment variant
    of q_join_asof: each purchase pairs with the click CLOSEST in time,
    either direction, earlier side winning exact ties (deterministic).
    One equi-join on the key and one conditional aggregate per left row
    (max of times at-or-before, min of times after) replace the rank
    window the backward-only emulation uses — same single shuffle on
    user_id, no second window exchange, and the pattern extends to any
    'nearest candidate under a scalar distance' join. DuckDB has no
    nearest ASOF, so the oracle spells out the same backward/forward
    reduction."""
    events = table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    agg = (
        p.join(c, p["user_id"] == c["c_user"], "left")
        .groupBy("purchase_id", "user_id", "purchase_ts")
        .agg(
            F.max(
                F.when(F.col("c_ts") <= F.col("purchase_ts"), F.col("c_ts"))
            ).alias("bwd"),
            F.min(
                F.when(F.col("c_ts") > F.col("purchase_ts"), F.col("c_ts"))
            ).alias("fwd"),
        )
    )
    up, ub, uf = (
        F.unix_micros("purchase_ts"),
        F.unix_micros("bwd"),
        F.unix_micros("fwd"),
    )
    nearest = (
        F.when(F.col("bwd").isNull(), F.col("fwd"))
        .when(F.col("fwd").isNull(), F.col("bwd"))
        .when(up - ub <= uf - up, F.col("bwd"))
        .otherwise(F.col("fwd"))
    )
    return agg.select(
        "purchase_id", "user_id", "purchase_ts", nearest.alias("nearest_click_ts")
    )




@query(
    "q_snapshot_diff",
    oracle="""
    WITH a AS (
        SELECT event_id, user_id, event_type, value FROM events
        WHERE event_id < 9000
    ), b AS (
        SELECT event_id, user_id, event_type,
               CASE WHEN event_id % 7 = 0 THEN value + 1.0 ELSE value END
                   AS value
        FROM events WHERE event_id >= 1000
    )
    SELECT COALESCE(a.event_id, b.event_id) AS event_id,
           CASE WHEN a.event_id IS NULL THEN 'added'
                WHEN b.event_id IS NULL THEN 'removed'
                WHEN a.value IS DISTINCT FROM b.value THEN 'changed'
                ELSE 'unchanged' END AS change,
           a.value AS old_value, b.value AS new_value
    FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
    WHERE NOT (a.event_id IS NOT NULL AND b.event_id IS NOT NULL
               AND NOT (a.value IS DISTINCT FROM b.value))
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the CDC/audit primitive for table formats without
    change feeds: classify every key across two table versions as
    added / removed / changed (unchanged rows are FILTERED OUT before
    the result materializes — at 100 TB the diff output is the small
    relation, the join input is not). The two "versions" derive from
    the events fixture (overlapping id windows; version B perturbs
    every 7th value) so all three classes are non-vacuous.

    Plan: one full-outer join on the key — both sides shuffle once on
    event_id, AQE sizes the partitions; the change classification and
    the unchanged-filter are codegen'd expressions ON the join output,
    so unchanged rows die before any further exchange. Null-safe
    comparison (IS DISTINCT FROM / eqNullSafe) is the correctness core:
    a NULL→value transition must classify as changed, not vanish."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    a = e.filter(F.col("event_id") < 9000).alias("a")
    b = (
        e.filter(F.col("event_id") >= 1000)
        .withColumn(
            "value",
            F.when(F.col("event_id") % 7 == 0, F.col("value") + 1.0).otherwise(
                F.col("value")
            ),
        )
        .alias("b")
    )
    joined = a.join(b, F.col("a.event_id") == F.col("b.event_id"), "full_outer")
    change = (
        F.when(F.col("a.event_id").isNull(), F.lit("added"))
        .when(F.col("b.event_id").isNull(), F.lit("removed"))
        .when(~F.col("a.value").eqNullSafe(F.col("b.value")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("a.event_id"), F.col("b.event_id")).alias(
                "event_id"
            ),
            change.alias("change"),
            F.col("a.value").alias("old_value"),
            F.col("b.value").alias("new_value"),
        )
        .filter(F.col("change") != "unchanged")
    )
