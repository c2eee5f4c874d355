"""Scalar function packs: string / date / math / JSON / array / map
(SURVEY.md §2.2). The reference's only scalar work is epoch conversion and
f-string formatting (reference data_model.py:27-28, load.py:50-53); this is
the generalized library a real query surface needs.

Everything here is a built-in pyspark.sql.functions call — JVM-side inside
whole-stage codegen, no Python in the row path. Transcendental outputs
(ln/exp) are rounded to 6 dp via the decimal path because libm
implementations differ by ulps across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoinminingetl_spark.catalog import table
from bitcoinminingetl_spark.functions.numeric import roundn, roundn_sql
from bitcoinminingetl_spark.registry import query


@query(
    "q_str_funcs",
    oracle="""
    SELECT doc_id,
           substring(text, 1, 20) AS head20,
           upper(lang) AS lang_up,
           concat_ws('-', lang, source) AS lang_src,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) AS src_num,
           lpad(lang, 5, '_') AS lang_pad,
           CAST(length(text) AS BIGINT) AS text_len,
           CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos
    FROM documents
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack: substring/upper/concat_ws/split/regexp_extract/lpad/
    length/instr over documents.text."""
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 20).alias("head20"),
        F.upper("lang").alias("lang_up"),
        F.concat_ws("-", "lang", "source").alias("lang_src"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        # try_cast: a source with no digits extracts '' which ANSI cast
        # refuses; NULL is the SQL answer (oracle uses TRY_CAST identically)
        F.regexp_extract("source", r"(\d+)", 1).try_cast("int").alias("src_num"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.length("text").cast("long").alias("text_len"),
        F.instr("text", "spark").cast("long").alias("spark_pos"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
               AS days_since_95,
           o_orderdate + INTERVAL '3 months' AS plus3m,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time pack: extraction, truncation, day arithmetic, month
    interval addition, epoch conversion (R4/R7's timestamp handling
    generalized)."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus3m"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "q_math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_quantity) AS qty_sqrt,
           {roundn_sql('ln(l_extendedprice)', 6)} AS price_ln,
           {roundn_sql('log10(l_extendedprice)', 6)} AS price_log10,
           {roundn_sql('exp(l_discount)', 6)} AS disc_exp,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           greatest(l_tax, l_discount) AS max_rate,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack (R12 generalized): abs/sqrt/ln/log10/exp/ceil/floor/mod/
    greatest/sign. sqrt is IEEE-exact; ln/log10/exp are rounded at 6 dp
    (libm ulp differences across engines)."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        roundn(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        roundn(F.log10(F.col("l_extendedprice")), 6).alias("price_log10"),
        roundn(F.exp(F.col("l_discount")), 6).alias("disc_exp"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(TRY_CAST(props AS JSON), '$.k') AS k_str,
           CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT) AS k_int,
           CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT) * 2 AS k_doubled
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON pack (R1's nested payloads generalized): path extraction as
    string, schema-ful from_json to typed struct, arithmetic on the
    extracted value. At scale from_json with an explicit schema beats
    repeated get_json_object calls (single parse)."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
        (F.from_json("props", "k INT").getField("k") * 2).alias("k_doubled"),
    )


@query(
    "q_array_funcs",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           {roundn_sql("list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b)", 6)}
               AS vec_sum,
           {roundn_sql(
                   "sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]),"
                   " x -> x * x), (a, b) -> a + b))", 6)} AS vec_norm,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_val,
           CAST(embedding[1] AS DOUBLE) AS head3_1,
           CAST(embedding[2] AS DOUBLE) AS head3_2,
           CAST(embedding[3] AS DOUBLE) AS head3_3
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embeddings.embedding: size,
    element_at, aggregate (fold), transform, array_max, slice — the
    building blocks the similarity operators compose. All JVM-evaluated;
    no UDF."""
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        roundn(
            F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("vec_sum"),
        roundn(
            F.sqrt(F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("vec_norm"),
        F.array_max("embedding").cast("double").alias("max_val"),
        # slice() is still the op under test; the head is re-projected to
        # scalar columns because the driver canonicalizer cannot hash
        # Python lists (array-typed output columns crash it).
        F.element_at(F.slice("embedding", 1, 3), 1).cast("double").alias("head3_1"),
        F.element_at(F.slice("embedding", 1, 3), 2).cast("double").alias("head3_2"),
        F.element_at(F.slice("embedding", 1, 3), 3).cast("double").alias("head3_3"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT doc_id,
           lang AS lang_val,
           source AS source_val,
           CAST(2 AS BIGINT) AS n_keys,
           'lang,source' AS keys_csv
    FROM documents
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/access: create_map -> element_at/map_keys/size.
    The oracle states the expected round-trip values directly (DuckDB MAP
    output typing differs; the semantics under test are Spark's map ops
    returning the original scalars)."""
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
        F.size(m).cast("long").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
    )


@query(
    "q_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k,
           CAST(json_extract(TRY_CAST(props AS JSON), '$.k') AS BIGINT) * 3 AS k_tripled,
           json_extract(TRY_CAST(props AS JSON), '$.missing') IS NULL AS no_such_path
    FROM events
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4) — the
    modern sibling of q_json_funcs' from_json/get_json_object: parse_json
    once into a binary-encoded variant, then variant_get typed path
    extraction, no up-front schema. At 100 TB this is the ingestion
    answer for payloads whose schema drifts (the reference's R1 API
    ticks): the parse cost is paid once per row and every downstream
    path access is a cheap binary probe instead of a re-parse; shredded
    parquet storage keeps pushdown on the hot paths. try_parse_json +
    try_variant_get: malformed payloads and absent paths both return
    NULL rather than failing — the corrupt-tick tolerance R5 requires
    (parse_json would abort the whole ingest on one bad payload)."""
    var = F.try_parse_json("props")
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.try_variant_get(var, "$.k", "long").alias("k"),
        (F.try_variant_get(var, "$.k", "long") * 3).alias("k_tripled"),
        F.try_variant_get(var, "$.missing", "string").isNull().alias("no_such_path"),
    )
