"""UDF surface: the three sanctioned Python escape hatches, each
demonstrated once and oracle-checked (SURVEY.md §2.2 "UDF/UDAF/UDTF").

Policy (SURVEY §2.2): built-ins first — everything else in this engine is
JVM-side. When Python is genuinely needed, the only acceptable shapes are
Arrow-batched: pandas_udf (vectorized scalar/grouped-agg), applyInPandas
(grouped map = UDAF-shaped), mapInPandas (table-function-shaped). Never
row-at-a-time `F.udf` in a hot path — ~10-100× slower than Arrow batches.

The grouped-agg demo reimplements the reference's one piece of Python
"aggregation": the hand-rolled str->float mean at load.py:34-35
(`sum(int(i[0]) for ...) / len(...)`), vectorized.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.functions.numeric import roundn, roundn_sql
from bitcoinminingetl_spark.registry import query


@query(
    "q_pandas_udf",
    oracle=f"""
    SELECT event_type,
           {roundn_sql('avg(CASE WHEN isfinite(value) THEN value END)', 6)}
               AS str_mean
    FROM events GROUP BY event_type
    """,
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 as a vectorized grouped-agg pandas UDF: values arrive as strings
    (the reference stores hashrate as str — transform.py:23-24), parsed
    and averaged per group in one Arrow batch per group. Spark's
    double->string cast is shortest-roundtrip, so parsing back yields the
    identical double and the oracle is avg over the same readings.

    The mean is over FINITE readings only, on both engines (r8
    adversarial sweep). Two boundary facts force this: pandas parses a
    NULL entry to NaN, so a naive running total silently poisons the
    whole group the way SQL avg never would (avg skips NULLs); and the
    pandas->Arrow return conversion renders a NaN result as NULL, so
    true NaN/Inf propagation cannot round-trip out of the kernel
    anyway. Finite-only is the one semantic BOTH the kernel and plain
    SQL can express identically; an all-corrupt group reads NULL."""

    @pandas_udf("double")
    def str_mean(s: pd.Series) -> float | None:
        import numpy as np

        # NULL strings parse to NaN; keep the finite readings only
        x = s.astype("float64").to_numpy()
        x = x[np.isfinite(x)]
        if len(x) == 0:
            return None
        # naive running mean, same accumulation order as the SQL oracle
        total = 0.0
        for v in x:
            total += v
        return total / len(x)

    return (
        table(spark, sf_dir, "events")
        .select("event_type", F.col("value").cast("string").alias("value_str"))
        .groupBy("event_type")
        .agg(roundn(str_mean("value_str"), 6).alias("str_mean"))
    )


@query(
    "q_map_in_pandas",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_obs
    FROM documents
    """,
)
def q_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (UDTF-shaped): per-batch Python tokenization emitting a
    new schema. Each Arrow batch is a pandas DataFrame — vectorized string
    ops, zero per-row Python calls. Oracle: the equivalent SQL split."""

    def tokenize(batches):
        for pdf in batches:
            # nullable Int64, not int64: NULL text must yield NULL counts
            # (SQL split/length semantics) instead of an IntCastingNaNError
            # killing the worker — real corpora contain null documents.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("Int64"),
                    "n_chars_obs": pdf["text"].str.len().astype("Int64"),
                }
            )

    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(tokenize, "doc_id long, n_tokens long, n_chars_obs long")
    )


@query(
    "q_apply_in_pandas",
    oracle=f"""
    WITH stats AS (
        SELECT lang, avg(n_chars) AS mu, stddev_samp(n_chars) AS sigma,
               count(*) AS n
        FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           CASE WHEN s.n < 2 THEN NULL
                ELSE {roundn_sql('(d.n_chars - s.mu) / s.sigma', 6)}
           END AS zscore
    FROM documents d JOIN stats s USING (lang)
    """,
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped-map / UDAF-shaped): per-language z-score of
    document length. Each language group becomes one pandas DataFrame on
    one executor — the pattern for group-local logic Spark expressions
    can't state. Skew note: a hot group lands on one task; at 100 TB
    pre-aggregate or salt instead of shipping giant groups to Python."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            z = pd.Series([None] * n, dtype="float64")
        else:
            mu = pdf["n_chars"].astype("float64").sum() / n
            var = ((pdf["n_chars"].astype("float64") - mu) ** 2).sum() / (n - 1)
            z = ((pdf["n_chars"] - mu) / var**0.5).round(6)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "zscore": z}
        )

    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(zscore, "doc_id long, lang string, zscore double")
    )


_CHUNK = 32


@query(
    "q_python_udtf",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
        SELECT doc_id, toks,
               unnest(generate_series(
                   0, CAST(ceil(len(toks) / {_CHUNK}.0) AS INT) - 1)) AS chunk_idx
        FROM d
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(
               toks[chunk_idx * {_CHUNK} + 1 :
                    least((chunk_idx + 1) * {_CHUNK}, len(toks))], ' ')
               AS chunk_text,
           CAST(least((chunk_idx + 1) * {_CHUNK}, len(toks))
                - chunk_idx * {_CHUNK} AS INT) AS n_tokens
    FROM g
    """,
)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth Python escape hatch: a table-generating UDTF
    (`@udtf`, Spark 3.5+) — one input row yields many output rows with
    their own schema. Demo: context-window chunking, the split every LLM
    training pipeline runs before tokenization (fixed 32-token windows,
    last chunk ragged). Invoked via SQL LATERAL join, the idiomatic UDTF
    call site; each executor runs the generator over its partition, so
    the operation stays embarrassingly parallel. For chunking
    specifically a pure-SQL rewrite exists (the oracle IS one) — the
    UDTF form is the template for chunkers with real tokenizers, which
    are Python-library-bound."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id: bigint, chunk_idx: int, chunk_text: string, n_tokens: int"
        )
    )
    class ChunkDoc:
        def eval(self, doc_id, text):  # noqa: ANN001 — signature fixed by Spark
            if text is None:
                # NULL text chunks to nothing — matches the oracle, where
                # unnest(generate_series over NULL) emits no rows.
                return
            toks = text.split(" ")
            for i in range(0, len(toks), _CHUNK):
                chunk = toks[i : i + _CHUNK]
                yield doc_id, i // _CHUNK, " ".join(chunk), len(chunk)

    spark.udtf.register("chunk_doc", ChunkDoc)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    return spark.sql(
        "SELECT c.* FROM documents_udtf, LATERAL chunk_doc(doc_id, text) c"
    )


@query(
    "q_cogroup_pandas",
    oracle="""
    WITH o AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS order_total
        FROM orders GROUP BY 1
    ), l AS (
        SELECT date_trunc('month', l_shipdate) AS m,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4))) AS DOUBLE) AS ship_revenue
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(COALESCE(o.m, l.m) AS TIMESTAMP) AS month,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(l.n_lines, 0) AS n_lines,
           COALESCE(o.order_total, 0.0) AS order_total,
           COALESCE(l.ship_revenue, 0.0) AS ship_revenue,
           CAST(round(CAST(CASE WHEN COALESCE(o.order_total, 0.0) > 0
                THEN COALESCE(l.ship_revenue, 0.0) / o.order_total
                ELSE NULL END AS DECIMAL(28,12)), 9) AS DOUBLE)
               AS ship_to_order_ratio
    FROM o FULL OUTER JOIN l ON o.m = l.m
    """,
)
def q_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the two-sided per-key Python escape
    hatch (`groupBy().cogroup().applyInPandas`), completing the UDF
    surface alongside the one-sided applyInPandas, mapInPandas and the
    UDTF: per calendar month, merge the orders-side and shipping-side
    aggregates in pandas and derive a ship-to-order revenue ratio.

    100 TB doctrine for cogroup: NEVER feed raw facts to Python. Both
    sides pre-aggregate JVM-side to month-cardinality relations first
    (decimal-quantized sums), so the cogroup shuffles ~100 rows per side
    and each pandas call merges two 1-row frames; the Python stage cost
    is per-month, not per-fact-row. The same shape handles asymmetric
    keys (outer cogroup semantics: either side may be empty — exercised
    here because order months and ship months only partially overlap)."""
    import numpy as np

    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("order_total"),
        )
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("ship_revenue"),
        )
    )

    def merge(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        n_orders = int(odf["n_orders"].iloc[0]) if len(odf) else 0
        order_total = float(odf["order_total"].iloc[0]) if len(odf) else 0.0
        n_lines = int(ldf["n_lines"].iloc[0]) if len(ldf) else 0
        ship_revenue = float(ldf["ship_revenue"].iloc[0]) if len(ldf) else 0.0
        ratio = (
            round(ship_revenue / order_total, 9) if order_total > 0 else np.nan
        )
        return pd.DataFrame(
            {
                "month": [key[0]],
                "n_orders": [n_orders],
                "n_lines": [n_lines],
                "order_total": [order_total],
                "ship_revenue": [ship_revenue],
                "ship_to_order_ratio": [ratio],
            }
        )

    return (
        o.groupBy("month")
        .cogroup(l.groupBy("month"))
        .applyInPandas(
            merge,
            "month timestamp, n_orders long, n_lines long, "
            "order_total double, ship_revenue double, "
            "ship_to_order_ratio double",
        )
    )
