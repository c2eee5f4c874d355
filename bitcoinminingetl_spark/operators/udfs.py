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
    SELECT event_type, {roundn_sql('avg(value)', 6)} AS str_mean
    FROM events GROUP BY event_type
    """,
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 as a vectorized grouped-agg pandas UDF: values arrive as strings
    (the reference stores hashrate as str — transform.py:23-24), parsed
    and averaged per group in one Arrow batch per group. Spark's
    double->string cast is shortest-roundtrip, so parsing back yields the
    identical double and the oracle is plain avg(value)."""

    @pandas_udf("double")
    def str_mean(s: pd.Series) -> float:
        # naive running mean, same accumulation order as the SQL oracle
        total = 0.0
        for v in s.astype("float64").to_numpy():
            total += v
        return total / len(s)

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
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("int64"),
                    "n_chars_obs": pdf["text"].str.len().astype("int64"),
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
