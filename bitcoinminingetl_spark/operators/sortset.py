"""Sort / limit / top-k and set operations (SURVEY.md §2.2).

Global sorts are the one operator where "just let Spark do it" needs a
scale caveat: orderBy().limit(k) compiles to TakeOrderedAndProject — each
partition keeps its local top-k and only k rows per partition reach the
driver-side merge, so a 100 TB top-100 never materializes a total sort.
tests/test_plans.py asserts the TakeOrderedAndProject node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.registry import query


@query(
    "q_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 orders by price. Unique o_orderkey tiebreak makes the limit
    deterministic; the plan is TakeOrderedAndProject (per-partition heap),
    not a global sort."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number over a per-key window +
    filter. One shuffle on the key; at 100 TB this beats any sort-based
    approach because each partition's heap is bounded by k."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_union",
    oracle="""
    SELECT event_id, ts, value, NULL AS props FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, ts, NULL AS value, props FROM events WHERE event_type = 'purchase'
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing-column completion — R14's ONE_SUCCESS
    merge: whichever source produced data flows on, absent columns
    NULL-filled. Narrow op: no shuffle."""
    events = table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "props"
    )
    return clicks.unionByName(purchases, allowMissingColumns=True)


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics): nations having both
    customers and suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (distinct semantics): customers who ordered but
    never urgently. Re-keyed in r8 from nations-without-suppliers,
    which is EMPTY on every fixture (each nation carries both) — a
    0-row hash match verifies that both engines agree on emptiness but
    exercises none of the distinct-difference machinery (the vacuity
    doctrine of r7 VERDICT item 1); this key yields 203 rows at
    sf0.01."""
    o = table(spark, sf_dir, "orders")
    all_cust = o.select(F.col("o_custkey").alias("custkey"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_cust.subtract(urgent)


@query(
    "q_except_all",
    oracle="""
    SELECT event_type FROM events WHERE value > 100
    EXCEPT ALL
    SELECT event_type FROM events WHERE value > 150
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (bag semantics): keeps duplicate multiplicity —
    the count of each event_type with value in (100, 150]."""
    events = table(spark, sf_dir, "events")
    hi = events.filter(F.col("value") > 100).select("event_type")
    vhi = events.filter(F.col("value") > 150).select("event_type")
    return hi.exceptAll(vhi)


@query(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS val
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey' AS measure, CAST(o_custkey AS DOUBLE) AS val
    FROM orders
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide columns -> (key, measure, value) long form —
    the inverse of q_pivot's avg_info widening. Spark's native unpivot
    generates the rows without a shuffle (narrow op); the long form is
    what per-metric operators (histograms, quality profiles) consume."""
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
        .unpivot("o_orderkey", ["totalprice", "custkey"], "measure", "val")
    )


@query(
    "q_hash_split",
    oracle="""
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs
    FROM (
        SELECT CASE
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                 IN ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
            ELSE 'test'
        END AS split
        FROM documents
    ) GROUP BY split
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split — the assignment every training
    pipeline needs to be REPRODUCIBLE and ENGINE-PORTABLE: bucket by the
    first hex digit of md5(doc_id) (12/2/2 of 16 ≈ 75/12.5/12.5%). md5 is
    identical across engines (unlike xxhash64/rand seeds), so the same
    row lands in the same split everywhere, forever — no shuffle, no
    state, pure projection; new data partitions assign independently."""
    first = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(first.isin(*list("0123456789ab")), "train")
        .when(first.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        table(spark, sf_dir, "documents")
        .select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
