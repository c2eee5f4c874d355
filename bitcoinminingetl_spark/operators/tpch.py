"""Classic warehouse analytics in their TPC-H shapes — the multi-join
plans a user migrating an OLAP workload onto this engine runs first,
plus a referential-integrity audit. Covered here: Q3/Q5/Q18 (below),
the round-4 widening (Q4/Q7/Q10/Q14/Q15/Q17/Q19), the round-6 classics
Q6/Q8/Q13/Q22, the round-9 Q21, and the round-10 completion
Q2/Q9/Q11/Q12/Q16/Q20 — ALL 22 TPC-H query shapes (Q1 lives in
q_sql_pricing_summary). The fixture schema has no partsupp table and no
l_shipmode/l_commitdate/l_receiptdate/o_comment/c_phone columns, so
Q2/Q9/Q11/Q12/Q16/Q20/Q21/Q22 are ADAPTED — each names its adaptation
in its docstring (the shape — correlation pattern, join tree,
aggregate form — is the original's; a missing column's role is played
by a fixture column with the same semantics).

Why the first three shapes (beyond q_sql_pricing_summary's Q1 and
q_star_join's 4-table star):
- Q3  = selective dim filter + 3-table join + top-k: tests that Catalyst
  pushes both date predicates into the scans and that the top-k is a
  TakeOrdered, not a global sort.
- Q5  = 6-table snowflake with a cycle (customer and supplier must share
  a nation): the join-ordering stress test; all four dims broadcast, the
  two fact joins are the only shuffles.
- Q18 = aggregate-then-semijoin (HAVING subquery): tests that the group
  filter happens BEFORE the fact join, so the join input is 10^2 orders
  not 10^4.

Scale notes are per-query; none of these plans change shape at 100 TB —
dims stay broadcast-able (region/nation are KBs at any SF; customer/
supplier grow linearly but stay 1-2 orders below lineitem), and every
fact-side shuffle is on the join key AQE already handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.functions.cache import lru_persisted
from bitcoinminingetl_spark.functions.numeric import (
    dsum,
    dsum_sql,
    roundn,
    roundn_sql,
)
from bitcoinminingetl_spark.registry import query

# Persist-once store for the two TPC-H multi-consumer aggregates (Q2's
# region-filtered supply catalog, Q11's per-part value relation) —
# bounded-LRU keyed by (applicationId, sf_dir, query), same doctrine as
# the shingle/embedding caches: a bare per-invocation .persist() leaks
# one never-freed relation into the block manager per bench rep /
# oracle sweep. Immutable-input assumption documented in functions/cache.
_TPCH_PERSIST_CACHE: dict[str, DataFrame] = {}

_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1997-06-01 00:00:00"


@query(
    "q_tpch_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS o_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders not yet shipped at a
    cutoff date, for one market segment. (The fixture has no
    o_shippriority column; o_orderpriority stands in.)

    Plan intent: both date predicates and the segment equality reach
    their parquet scans (PushedFilters); customer, filtered to one
    segment, broadcasts onto orders; the limit compiles to
    TakeOrderedAndProject — no global sort of the aggregate. Ties broken
    by o_orderkey so the top-10 is deterministic for the oracle hash."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"),
            "o_orderdate",
            "o_orderpriority",
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


_Q5_REGION = "ASIA"
_Q5_LO = "1996-01-01 00:00:00"
_Q5_HI = "1998-01-01 00:00:00"


@query(
    "q_tpch_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_LO}'
      AND o.o_orderdate < TIMESTAMP '{_Q5_HI}'
    GROUP BY n.n_name
    """,
)
def q_tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the customer and the
    supplier sit in the SAME nation of one region — the 6-table
    snowflake with a join cycle.

    Plan intent: region→nation prunes to one region's nations before
    anything touches a fact table; supplier/nation/region and the pruned
    customer side broadcast; the only shuffles are lineitem ⋈ orders
    (orderkey) and the date filter prunes orders at the scan. The
    c_nationkey = s_nationkey cycle closes as a broadcast-side equality,
    not an extra shuffle."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


_Q18_MIN_QTY = 250


@query(
    "q_tpch_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > {_Q18_MIN_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose lineitems sum past a quantity
    threshold, with their customer — the HAVING-subquery-then-join
    pattern.

    Plan intent: the quantity aggregate + HAVING collapses lineitem to
    ~10^2 surviving orderkeys BEFORE any join; that tiny relation then
    broadcasts onto orders, and the order/customer join is again
    broadcast — so a 6M-row (or 6B-row) lineitem contributes exactly one
    partial-aggregated shuffle to the whole query."""
    big = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "q_ri_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'orders->customer', CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', CAST(count(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
)
def q_ri_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign key in
    the warehouse schema (the check a pipeline runs after each load; the
    reference's MySQL schema declares no FK constraints at all —
    init.sql:8-32 — so integrity is the loader's problem, as it is in
    every lakehouse).

    Scale shape: each check is a LEFT ANTI join of fact against the
    parent's key column only. Parent key relations are 1-2 orders of
    magnitude smaller than facts, so every anti join broadcasts (or
    bloom-filters at extreme SF) — no fact-sized shuffle anywhere; the
    five counts run as independent plan branches under one union."""

    def orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
                label: str) -> DataFrame:
        return (
            child.select(ckey)
            .join(
                F.broadcast(parent.select(pkey)),
                child[ckey] == parent[pkey],
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        orphans(l, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionAll(
            orphans(
                l, "l_partkey", table(spark, sf_dir, "part"), "p_partkey",
                "lineitem->part",
            )
        )
        .unionAll(
            orphans(
                l, "l_suppkey", table(spark, sf_dir, "supplier"), "s_suppkey",
                "lineitem->supplier",
            )
        )
        .unionAll(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
        .unionAll(
            orphans(
                c, "c_nationkey", table(spark, sf_dir, "nation"), "n_nationkey",
                "customer->nation",
            )
        )
    )


# ---------------------------------------------------------------------------
# Round-4 widening: the remaining classic TPC-H shapes the fixture schema can
# express (no partsupp table, no l_shipmode/l_commitdate/l_receiptdate
# columns, so Q7/Q10/Q14/Q19 run verbatim while Q4/Q15/Q17 are adapted —
# each docstring names the adaptation).
# ---------------------------------------------------------------------------

_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"
_Q7_LO = "1996-01-01 00:00:00"
_Q7_HI = "1998-01-01 00:00:00"


@query(
    "q_tpch_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = '{_Q7_NATION_A}' AND n2.n_name = '{_Q7_NATION_B}')
        OR (n1.n_name = '{_Q7_NATION_B}' AND n2.n_name = '{_Q7_NATION_A}'))
      AND l.l_shipdate >= TIMESTAMP '{_Q7_LO}'
      AND l.l_shipdate < TIMESTAMP '{_Q7_HI}'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS BIGINT)
    """,
)
def q_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations, both directions, by
    ship year.

    Plan intent: nation is filtered to the TWO named nations BEFORE it
    touches anything else, and that 2-row relation broadcasts onto
    supplier and customer respectively — so the supplier/customer sides
    shrink to the two nations' rows before the fact joins. The only
    fact-sized shuffle is lineitem⋈orders on the orderkey; the asymmetric
    pair predicate (A→B or B→A, never A→A) is applied after both nation
    names are attached, exactly once. At 100 TB nothing changes: nation
    is 25 rows at any SF, and the surviving supplier/customer subsets
    stay broadcast-able."""
    pair = [_Q7_NATION_A, _Q7_NATION_B]
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q7_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q7_HI).cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


_Q10_LO = "1997-01-01 00:00:00"
_Q10_HI = "1997-04-01 00:00:00"


@query(
    "q_tpch_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
      AND o.o_orderdate < TIMESTAMP '{_Q10_HI}'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returned items in
    one quarter.

    Plan intent: both selective predicates (quarter on orders, 'R' flag
    on lineitem) land in PushedFilters on their own scans; the filtered
    orders broadcast onto lineitem (one quarter of orders is small at any
    SF relative to lineitem); customer+nation attach by broadcast after
    the aggregate has collapsed the fact to per-customer rows, so the
    wide c_name/c_acctbal columns never travel through the fact shuffle.
    Top-20 compiles to TakeOrderedAndProject; c_custkey tie-break keeps
    the hash deterministic."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    per_cust = (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal",
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q14_LO = "1997-03-01 00:00:00"
_Q14_HI = "1997-04-01 00:00:00"


@query(
    "q_tpch_promo_effect",
    oracle=f"""
    SELECT {roundn_sql(
        "100.0 * "
        + dsum_sql(
            "CASE WHEN p.p_type = 'PROMO' "
            "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END"
        )
        + " / " + dsum_sql('l.l_extendedprice * (1 - l.l_discount)'),
        6,
    )} AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO}'
      AND l.l_shipdate < TIMESTAMP '{_Q14_HI}'
    """,
)
def q_tpch_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's gross revenue that came from
    PROMO-type parts. (Fixture p_type is a single word, so the predicate
    is equality, not LIKE 'PROMO%'.)

    Plan intent: the month predicate prunes lineitem at the scan; part —
    projected to (p_partkey, p_type) — broadcasts; the conditional and
    total sums run in ONE aggregate pass (no second scan, no self-join).
    Both sums are decimal-quantized so the ratio is partition-order
    independent; the 6-dp round makes Spark and DuckDB agree exactly."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_HI).cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            roundn(
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / dsum(vol),
                6,
            ).alias("promo_revenue_pct")
        )
    )


_Q19_CASES = (
    ("Brand#4", 1, 10, 1.0, 15.0),
    ("Brand#2", 1, 20, 10.0, 25.0),
    ("Brand#19", 1, 30, 20.0, 35.0),
)


@query(
    "q_tpch_discounted_revenue",
    oracle=f"""
    SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {' OR '.join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
        f"AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in _Q19_CASES
    )}
    """,
)
def q_tpch_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three disjunctive brand/size/quantity
    baskets — the OR-of-ANDs predicate that defeats naive pushdown.

    Plan intent: the part-side half of each disjunct (brand + size)
    filters part BEFORE the join — the union of the three brand/size
    windows is still a tiny broadcast relation — while the quantity
    ranges evaluate post-join. Catalyst keeps the whole disjunction in
    one codegen stage; no plan branch per disjunct, no union of three
    scans. One row out; decimal-quantized sum for the oracle hash."""
    p_pred = None
    full_pred = None
    for b, slo, shi, qlo, qhi in _Q19_CASES:
        pp = (F.col("p_brand") == b) & F.col("p_size").between(slo, shi)
        fp = pp & F.col("l_quantity").between(qlo, qhi)
        p_pred = pp if p_pred is None else (p_pred | pp)
        full_pred = fp if full_pred is None else (full_pred | fp)
    p = (
        table(spark, sf_dir, "part")
        .filter(p_pred)
        .select("p_partkey", "p_brand", "p_size")
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(full_pred)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


_Q4_LO = "1997-01-01 00:00:00"
_Q4_HI = "1997-07-01 00:00:00"
_Q4_LATE_DAYS = 60


@query(
    "q_tpch_order_priority",
    oracle=f"""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
      AND o.o_orderdate < TIMESTAMP '{_Q4_HI}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count of orders per priority that had at least one
    late line. (The fixture has no l_commitdate/l_receiptdate, so "late"
    is adapted to: shipped more than 60 days after the order date.)

    Plan intent: the correlated EXISTS compiles to a LEFT SEMI join on
    the orderkey with the lateness comparison as an extra join predicate
    — semi-join semantics give the at-least-one / no-duplicates behavior
    for free (no DISTINCT, no pre-aggregation of lineitem). The order
    date window prunes the orders scan; the semi join shuffles both
    sides on orderkey once and AQE owns the rest at any SF."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (
                l.l_shipdate
                > o.o_orderdate + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q15_LO = "1997-01-01 00:00:00"
_Q15_HI = "1997-04-01 00:00:00"


@query(
    "q_tpch_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
          AND l_shipdate < TIMESTAMP '{_Q15_HI}'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.supplier_no
    WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose quarter revenue equals the global
    maximum — the scalar-subquery-against-an-aggregate pattern.

    Plan intent: revenue-per-supplier aggregates once (shuffle on
    suppkey); the scalar max is computed from that SAME relation as a
    1-row aggregate and attached by broadcast cross join — NOT by a
    global window over all suppliers (a Window.partitionBy() would
    funnel every supplier row through one task at scale). The rev
    relation is deliberately NOT persisted: it is supplier-cardinality,
    cheap to recompute, and persisting would pin memory at 100 TB."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q17_BRAND = "Brand#4"


@query(
    "q_tpch_small_qty_revenue",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {roundn_sql(dsum_sql('l.l_extendedprice') + ' / 7.0', 6)}
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = '{_Q17_BRAND}'
      AND l.l_quantity < pa.qty_cut
    """,
)
def q_tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below half the part's mean order quantity) for one brand went
    unfilled. (Classic Q17 uses 0.2×avg and a container filter; the
    fixture's quantity distribution makes 0.5×avg the non-vacuous cut
    and it has no p_container.)

    Plan intent: the correlated AVG subquery decorrelates into one
    per-partkey aggregate; because only one brand's parts survive, the
    brand filter broadcasts onto BOTH the fact scan and the aggregate
    input, so the per-part averages are computed only for the ~1/25 of
    parts that matter... except the oracle's CTE averages over ALL parts
    — and so does this plan, deliberately: semi-filtering the aggregate
    by brand first would be the optimization, but the avg must match the
    oracle bit-for-bit, and avg over a part's lineitems is identical
    either way (the filter selects partkeys, it does not change any
    part's rows). The aggregate is partkey-partitioned, fact-sized
    shuffle #1; the fact⋈avg join reuses that partitioning (shuffle #2
    on the same key, AQE-coalesced); brand parts broadcast."""
    l = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    pa = l.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cut")
    ).withColumnRenamed("l_partkey", "pa_partkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(pa, F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            roundn(dsum(F.col("l_extendedprice")) / F.lit(7.0), 6).alias(
                "avg_yearly"
            )
        )
    )


_Q6_LO = "1997-01-01 00:00:00"
_Q6_HI = "1998-01-01 00:00:00"


@query(
    "q_tpch_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
      AND l_shipdate < TIMESTAMP '{_Q6_HI}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase from hypothetically eliminating small
    discounts — the canonical scan-bound query: zero joins, one global
    aggregate, every predicate sargable.

    Plan intent: all three predicates land in PushedFilters (the
    discount BETWEEN as two comparisons), ReadSchema carries exactly 4
    columns, and the sum partial-aggregates map-side to one row per
    partition — at 100 TB this query IS the scan, and row groups
    outside the ship-year are never decoded. The one subtlety is
    float-literal equality: 0.05/0.07 are not exact doubles, so BETWEEN
    on the stored double is the portable predicate (both engines
    compare the same stored double to the same literal double — exact
    agreement without decimal quantization)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


_Q8_REGION = "EUROPE"
_Q8_NATION = "NATION_3"
_Q8_TYPE = "PROMO"
_Q8_LO = "1996-01-01 00:00:00"
_Q8_HI = "1998-01-01 00:00:00"


@query(
    "q_tpch_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = '{_Q8_REGION}'
          AND p.p_type = '{_Q8_TYPE}'
          AND o.o_orderdate >= TIMESTAMP '{_Q8_LO}'
          AND o.o_orderdate < TIMESTAMP '{_Q8_HI}'
    )
    SELECT o_year,
           {roundn_sql(
        dsum_sql("CASE WHEN supp_nation = '" + _Q8_NATION
                 + "' THEN volume ELSE 0 END")
        + " / " + dsum_sql("volume"), 6)} AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of the PROMO-part market sold into
    one region, by order year — the deepest join tree in the suite
    (7 relations, nation joined TWICE in different roles).

    Plan intent: every dimension shrinks before touching the fact —
    part filters to one type and broadcasts onto lineitem first (the
    most selective cut), region→nation(n1)→customer collapses the
    demand side to the region's customers (broadcast), supplier+n2 is
    broadcast-attached only to carry the supplier-nation name. The only
    fact-sized shuffle is lineitem⋈orders on orderkey. The share is a
    conditional-aggregate ratio computed inside ONE grouped pass
    (sum-of-CASE over sum), not a join of two aggregates; both legs
    quantize through dsum so the ratio is repartition-invariant. Group
    count is |years| — nothing downstream of the agg matters at any
    scale."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    n1 = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_nationkey"))
        .select("s_suppkey", "supp_nation")
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q8_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q8_HI).cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"), "left_semi")
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == _Q8_NATION, F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return vol.groupBy("o_year").agg(
        roundn(dsum(nation_vol) / dsum(F.col("volume")), 6).alias("mkt_share")
    )


@query(
    "q_tpch_customer_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q_tpch_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the distribution of customers by order count — how
    many customers placed 0, 1, 2... qualifying orders. Adaptation
    (docstring rule, module header): the fixture has no o_comment, so
    the classic NOT LIKE '%special%requests%' exclusion becomes
    o_orderpriority <> '1-URGENT'; the shape under test is unchanged.

    The shape's two traps, both encoded here: (1) the exclusion MUST
    live in the LEFT JOIN's ON clause, not a WHERE — filtering after
    the join would delete the zero-order customers that are the
    distribution's head; (2) the per-customer count must be
    count(o_orderkey), not count(*), so an unmatched customer counts 0,
    not 1. Plan: one custkey-keyed shuffle for join+count (the
    aggregate reuses the join's partitioning — no second exchange),
    then a tiny count-of-counts hash agg over |customers| rows. Scales
    as a single co-partitioned join at any SF."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                              "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q22_NATIONS = tuple(f"NATION_{k}" for k in (1, 2, 5, 9, 13, 17, 21))
_Q22_SINCE = "2001-01-01 00:00:00"  # lapsed = no order on/after this date


@query(
    "q_tpch_sales_opportunity",
    oracle=f"""
    WITH inset AS (
        SELECT c.c_custkey, n.n_name, c.c_acctbal
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE n.n_name IN {_Q22_NATIONS!r}
    ),
    cut AS (SELECT avg(c_acctbal) AS cutoff FROM inset WHERE c_acctbal > 0)
    SELECT i.n_name AS nation,
           CAST(count(*) AS BIGINT) AS numcust,
           {dsum_sql('i.c_acctbal')} AS totacctbal
    FROM inset i, cut
    WHERE i.c_acctbal > cut.cutoff
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = i.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '{_Q22_SINCE}')
    GROUP BY i.n_name
    """,
)
def q_tpch_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: per-country count and balance of well-funded customers
    who LAPSED — no order since a cutoff date — the anti-join +
    scalar-subquery shape. Adaptations (documented per module rule):
    no c_phone in the fixture, so country = nation name via the nation
    join and the classic 7 phone prefixes become 7 named nations; and
    where classic Q22 anti-joins on "never ordered at all" (vacuously
    empty here — every fixture customer has an order), the anti-join
    predicate is "no order on/after _Q22_SINCE (2001-01-01)", which keeps the
    decorrelated-average + NOT EXISTS structure AND a non-empty,
    hash-checkable result.

    Plan intent: the 7-nation filter broadcasts onto customer; the
    positive-balance average decorrelates to a 1-row aggregate attached
    by broadcast (the sanctioned scalar-stat BNLJ — never a global
    window); NOT EXISTS compiles to a LEFT ANTI join against orders
    projected to its 8-byte custkey only, the single fact-sized
    exchange. The double-typed cutoff comparison is engine-exact: both
    engines average the same doubles over the same row set. Final agg
    is |nations| rows."""
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q22_NATIONS))
    inset = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("nation"), "c_acctbal")
    )
    cut = inset.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("cutoff")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_SINCE).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        inset.join(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


_Q21_NATION = "NATION_3"
_Q21_LATE_DAYS = 90


@query(
    "q_tpch_waiting_suppliers",
    oracle=f"""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = '{_Q21_NATION}'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate
                        + INTERVAL {_Q21_LATE_DAYS} DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q_tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (Suppliers Who Kept Orders Waiting), ADAPTED: the
    fixture lineitem has no l_commitdate/l_receiptdate, so "late" is
    l_shipdate > o_orderdate + 90 days (same shape: a per-line lateness
    predicate against its order). The hardest decorrelation pattern in
    the suite — one EXISTS and one NOT EXISTS, both correlated on the
    order key with a supplier INEQUALITY, the second also referencing
    the OUTER order's date: suppliers from one nation who were the
    ONLY late supplier on a multi-supplier finished order.

    Plan (decorrelated by construction rather than left to the
    rewriter, so the shape is pinned): the late-line relation builds
    once (fact⋈fact join of lineitem with F-status orders, shuffled on
    the order key) and serves both the probe side and the NOT EXISTS
    side; EXISTS becomes a LEFT SEMI against lineitem and NOT EXISTS a
    LEFT ANTI against the late relation — all three joins key on
    l_orderkey, so they reuse ONE exchange partitioning end to end;
    supplier⋈nation broadcasts onto the probe side; the top-20 is a
    TakeOrdered. At 100 TB nothing changes: the semi/anti fan-out is
    bounded by lines-per-order (~7), and no join ever keys on anything
    but the already-partitioned order key."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == _Q21_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    probe = late.join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    probe = probe.join(
        l2,
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    probe = probe.join(
        l3,
        (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        probe.groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round-10 widening: the six remaining TPC-H shapes (Q2/Q9/Q11/Q12/Q16/Q20),
# adapted to the fixture schema the same way Q21/Q22 were — every
# adaptation is named in the docstring. With these the suite carries all
# 22 TPC-H query SHAPES (Q1 = q_sql_pricing_summary, Q21/Q22 adapted in
# earlier rounds).
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"


@query(
    "q_tpch_min_cost_supplier",
    oracle=f"""
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice * (1 - l_discount)) AS cost
        FROM lineitem GROUP BY 1, 2
    ),
    rsupp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = '{_Q2_REGION}'
    ),
    best AS (
        SELECT l_partkey, min(cost) AS min_cost
        FROM supply JOIN rsupp ON s_suppkey = l_suppkey
        GROUP BY 1
    )
    SELECT s.s_acctbal, s.s_name, s.n_name, s.s_suppkey,
           p.p_partkey, p.p_brand, p.p_type, sp.cost AS supply_cost
    FROM supply sp
    JOIN rsupp s ON s.s_suppkey = sp.l_suppkey
    JOIN best b ON b.l_partkey = sp.l_partkey
    JOIN part p ON p.p_partkey = sp.l_partkey
    WHERE sp.cost = b.min_cost
    ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey, s.s_suppkey
    LIMIT 100
    """,
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), ADAPTED: the fixture has no
    partsupp table, so the part-supplier relation is the DISTINCT
    (l_partkey, l_suppkey) pairs observed in lineitem and "supply cost"
    is the cheapest net line price min(extendedprice * (1-discount)) the
    supplier ever charged for the part — no division, so the min is a
    fold over bit-identical IEEE products in both engines. Same shape as
    the original: a correlated MIN subquery per part over one region's
    suppliers, decorrelated by construction.

    Plan: the supply relation aggregates lineitem once (shuffle on
    (partkey, suppkey) — the only fact-sized exchange); region->nation->
    supplier prunes to a ~|region suppliers| relation and BROADCASTS onto
    it; the per-part MIN is a second aggregate of the already-small
    region-filtered supply relation, joined back on partkey (AQE-sized);
    part attaches by broadcast; top-100 is a TakeOrdered. At 100 TB the
    supply relation is the distinct part-supplier catalog — 2-3 orders
    below lineitem — and nothing downstream touches the fact again."""
    supply = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("cost")
        )
    )
    rsupp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        table(spark, sf_dir, "region").filter(
                            F.col("r_name") == _Q2_REGION
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # the region-filtered supply catalog feeds BOTH the per-part MIN and
    # the probe side — unmaterialized, Spark recomputes the fact-scan
    # aggregate twice (two lineitem scans, the dominant cost at 100 TB).
    # The relation is |distinct region part-supplier pairs|, 2-3 orders
    # below lineitem, so persisting it is scale-safe (the
    # q_resample_interpolate multi-consumer doctrine: persist beats
    # checkpoint for a small lazily-shared aggregate). Persist-once via
    # the LRU cache — a bare .persist() here leaked one relation per
    # invocation across bench reps / oracle sweeps.
    regional = lru_persisted(
        _TPCH_PERSIST_CACHE,
        f"{spark.sparkContext.applicationId}:{sf_dir}:q2_regional",
        lambda: supply.join(
            F.broadcast(rsupp), F.col("l_suppkey") == F.col("s_suppkey")
        ),
    )
    best = regional.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type"
    )
    return (
        # per-part MIN relation is bounded by the part dim's
        # cardinality — broadcast, or Spark sort-merges two
        # unknown-size aggregates
        regional.join(
            F.broadcast(best),
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "s_suppkey",
            "p_partkey",
            "p_brand",
            "p_type",
            F.col("cost").alias("supply_cost"),
        )
        # tie-break mirrors the oracle's ORDER BY key-for-key, ending on
        # s_suppkey — the one guaranteed-unique column per (part,
        # supplier) row, so the LIMIT boundary can never diverge
        # cross-engine even if two suppliers share a name and a balance
        # (r10 code-review finding: the old 5th key was supply_cost,
        # which EQUALS min_cost on every retained row for the part)
        .orderBy(
            F.col("s_acctbal").desc(),
            "n_name",
            "s_name",
            "p_partkey",
            "s_suppkey",
        )
        .limit(100)
    )


_Q9_PART_LIKE = "%gear%"
_Q9_COST_FRAC = 0.6  # supply-cost proxy: 60% of the part's retail price


@query(
    "q_tpch_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           {dsum_sql(
        "l.l_extendedprice * (1 - l.l_discount) "
        f"- {_Q9_COST_FRAC} * p.p_retailprice * l.l_quantity"
    )} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '{_Q9_PART_LIKE}'
    GROUP BY 1, 2
    """,
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), ADAPTED: no partsupp, so
    ps_supplycost is proxied as 60% of p_retailprice (a schema-level
    constant — the profit expression stays the original's
    revenue-minus-cost-times-quantity shape); the part filter keeps the
    original's name-LIKE form on the fixture's vocabulary.

    Plan: the part filter prunes to ~13% of parts and BROADCASTS — at
    the scan, so only matching lines survive to the orders join;
    supplier->nation broadcasts; the single fact-sized exchange is
    lineitem⋈orders on the order key (AQE-owned). The (nation, year)
    aggregate is partial map-side. dsum keeps the profit sum
    engine-stable (decimal quantization, identical operands)."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(_Q9_PART_LIKE))
        .select("p_partkey", "p_retailprice")
    )
    sn = table(spark, sf_dir, "supplier").join(
        F.broadcast(table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    profit_line = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        _Q9_COST_FRAC
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        profit_line.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


_Q11_REGION = "AMERICA"
_Q11_AVG_MULT = 2.0


@query(
    "q_tpch_important_parts",
    oracle=f"""
    WITH val AS (
        SELECT l.l_partkey AS p_key,
               {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = '{_Q11_REGION}'
        GROUP BY 1
    )
    SELECT p_key AS l_partkey, value
    FROM val
    WHERE value > (SELECT {dsum_sql('value')} / count(*) * {_Q11_AVG_MULT}
                   FROM val)
    """,
)
def q_tpch_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), ADAPTED: no partsupp, so a part's
    "inventory value" held by one region's suppliers is the net revenue
    dsum(extendedprice * (1-discount)) of that region's lines for the
    part; the HAVING-vs-global-scalar shape is the original's. Two
    deliberate departures from the original's constants (r10
    code-review finding — the first draft's fixed share-of-total
    fraction provably emptied at sf0.1 and beyond, exactly why TPC-H
    scales its fraction by 1/SF): the scope is a REGION (a nation holds
    0-1 suppliers at the smallest fixture SF, so any single nation is
    vacuous somewhere), and the cut is SCALE-FREE — value > 2x the mean
    per-part value, non-vacuous and selective at every SF (12 / 45 /
    638 rows at sf0.001/0.01/0.1).

    Plan: region->nation->supplier prunes ~20% of suppliers and
    broadcasts onto the lineitem scan; the per-part value aggregates on
    one partkey exchange; the global threshold is a 1-row aggregate OF
    THAT SAME relation attached by broadcast cross join (the
    q_tpch_top_supplier scalar pattern — never a global window). The
    mean is dsum(value)/count — decimal-quantized numerator, exact
    count, ONE IEEE division — so the > compare is engine-stable (a
    plain avg() would sum in engine-specific order)."""
    sn = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        table(spark, sf_dir, "region").filter(
                            F.col("r_name") == _Q11_REGION
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    # val feeds BOTH the scalar threshold and the probe side; persisted
    # once per (session, corpus) so the fact scan runs once (|parts|-row
    # relation — the same multi-consumer doctrine as
    # q_tpch_min_cost_supplier), via the LRU cache rather than a bare
    # per-invocation .persist() that leaks across bench reps.
    val = lru_persisted(
        _TPCH_PERSIST_CACHE,
        f"{spark.sparkContext.applicationId}:{sf_dir}:q11_val",
        lambda: (
            table(spark, sf_dir, "lineitem")
            .join(
                F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey")
            )
            .groupBy("l_partkey")
            .agg(
                dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("value")
            )
        ),
    )
    threshold = val.agg(
        (
            dsum(F.col("value"))
            / F.count(F.lit(1))
            * F.lit(_Q11_AVG_MULT)
        ).alias("_thr")
    )
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_thr"))
        .select("l_partkey", "value")
    )


_Q12_LATE_DAYS = 60
_Q12_YEAR_LO = "1998-01-01 00:00:00"
_Q12_YEAR_HI = "1999-01-01 00:00:00"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


@query(
    "q_tpch_late_priority",
    oracle=f"""
    SELECT l.l_linestatus,
           CAST(count(*) FILTER (o.o_orderpriority IN
               ('{_Q12_HIGH[0]}', '{_Q12_HIGH[1]}')) AS BIGINT)
               AS high_line_count,
           CAST(count(*) FILTER (o.o_orderpriority NOT IN
               ('{_Q12_HIGH[0]}', '{_Q12_HIGH[1]}')) AS BIGINT)
               AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL {_Q12_LATE_DAYS} DAY
      AND l.l_shipdate >= TIMESTAMP '{_Q12_YEAR_LO}'
      AND l.l_shipdate < TIMESTAMP '{_Q12_YEAR_HI}'
    GROUP BY 1
    """,
)
def q_tpch_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), ADAPTED: the
    fixture lineitem has no l_shipmode/l_commitdate/l_receiptdate, so
    the grouping column is l_linestatus and "late" is shipdate more
    than 60 days after the order date (the Q21 lateness predicate) —
    the shape is the original's: per-mode counts of high- vs
    low-priority orders among late lines in one year.

    Plan: the year filter pushes into the lineitem scan; the one
    fact-sized exchange is the lineitem⋈orders key join (the lateness
    predicate rides ON it); the CASE counts are one partial-aggregated
    grouped pass over 2 groups. Exact integer counts — nothing to
    quantize."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q12_YEAR_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q12_YEAR_HI).cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAYS")
    )
    is_high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return late.groupBy("l_linestatus").agg(
        F.count(F.when(is_high, 1)).cast("long").alias("high_line_count"),
        F.count(F.when(~is_high, 1)).cast("long").alias("low_line_count"),
    )


_Q16_EXCL_BRAND = "Brand#2"
_Q16_EXCL_TYPE = "ECONOMY%"
_Q16_SIZES = (1, 4, 7, 11, 14, 19, 23, 28)


@query(
    "q_tpch_parts_supplier_count",
    oracle=f"""
    WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT r.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM rel r
    JOIN part p ON p.p_partkey = r.l_partkey
    JOIN ok_supp s ON s.s_suppkey = r.l_suppkey
    WHERE p.p_brand <> '{_Q16_EXCL_BRAND}'
      AND p.p_type NOT LIKE '{_Q16_EXCL_TYPE}'
      AND p.p_size IN ({", ".join(str(s) for s in _Q16_SIZES)})
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), ADAPTED: the
    part-supplier relation is DISTINCT (l_partkey, l_suppkey) from
    lineitem (no partsupp), and the original's complaint exclusion
    (o_comment LIKE '%Customer%Complaints%' — no such column) becomes
    "suppliers in good standing": s_acctbal >= 0. Shape preserved:
    exclusion predicates on brand/type/size, a supplier NOT-IN
    exclusion, COUNT(DISTINCT suppkey) per (brand, type, size).

    Plan (r13): NO standalone distinct — count(DISTINCT suppkey) per
    (brand, type, size) is invariant to duplicate (partkey, suppkey)
    pairs, so the oracle's DISTINCT rel CTE is a semantic no-op that
    cost a full exchange of every lineitem pair BEFORE the selective
    part predicates could drop anything (guide §2.3/§2.4: aggregate
    once, filter before the exchange). Instead the raw 8-byte-pair
    projection map-side joins the broadcast filtered part (brand/type/
    size predicates prune ~⅞ of parts) and the good-standing supplier
    key list, and the only exchange left is the distinct-count
    aggregate's own two-phase dedup — over the filtered relation, with
    map-side partial dedup collapsing duplicate pairs before the wire.
    Exact counts — engine-trivial; same oracle, r13-verified match at
    sf0.01 and sf0.1."""
    rel = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != _Q16_EXCL_BRAND)
            & ~F.col("p_type").like(_Q16_EXCL_TYPE)
            & F.col("p_size").isin(*_Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    ok = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    return (
        rel.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(ok), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
        )
    )


_Q20_PART_LIKE = "small%"
_Q20_YEAR_LO = "1997-01-01 00:00:00"
_Q20_YEAR_HI = "1998-01-01 00:00:00"
_Q20_QTY_THRESHOLD = 40.0


@query(
    "q_tpch_promotion_suppliers",
    oracle=f"""
    WITH shipped AS (
        SELECT l.l_suppkey, l.l_partkey,
               {dsum_sql('l.l_quantity')} AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '{_Q20_PART_LIKE}'
          AND l.l_shipdate >= TIMESTAMP '{_Q20_YEAR_LO}'
          AND l.l_shipdate < TIMESTAMP '{_Q20_YEAR_HI}'
        GROUP BY 1, 2
        HAVING {dsum_sql('l.l_quantity')} > {_Q20_QTY_THRESHOLD}
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped)
    ORDER BY s.s_name
    """,
)
def q_tpch_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), ADAPTED: no partsupp means
    no ps_availqty, so "has excess stock to promote" becomes "shipped
    more than a threshold quantity of a promotable part in the year" —
    the nested IN-chain shape (parts by name LIKE -> per-(supplier,
    part) year quantity -> qualifying suppliers) is the original's; the
    half-of-availqty compare becomes the fixed threshold. The original
    also filters one nation; the fixture's per-nation supplier counts
    (~7) would make that near-vacuous, so this adaptation keeps all
    nations and returns (s_name, s_acctbal) ordered by name.

    Plan: the name-filtered part keys broadcast onto the year-pruned
    lineitem scan; the per-(suppkey, partkey) quantity aggregate is the
    one fact exchange; qualifying supplier keys collapse by distinct
    and drive a LEFT SEMI against the supplier dim (never the fact).
    The HAVING sum is dsum-quantized so the threshold compare is
    engine-stable."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(_Q20_PART_LIKE))
        .select("p_partkey")
    )
    shipped = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q20_YEAR_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q20_YEAR_HI).cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(_Q20_QTY_THRESHOLD))
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        # the qualifying-key list is bounded by the supplier dim's
        # cardinality (it is a subset of supplier keys), so it
        # broadcasts by the same argument as the dim itself — without
        # the hint Spark can't size the post-aggregate relation and
        # falls back to a sort-merge semi join
        s.join(
            F.broadcast(shipped),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
