"""Kafka-shaped streaming source (SURVEY.md §3.4: at production scale the
file-stream plans read Kafka instead — reference main.py:18-21 polls an
HTTP API on a tick; the cluster-scale equivalent of that unbounded feed
is a Kafka topic).

Three pieces, deliberately separable:

- ``kafka_stream`` builds the real connector plan. The
  spark-sql-kafka connector jar is not bundled with plain pyspark, so
  this raises a clear error at ``load()`` when the package is absent —
  the plan itself is the standard production wiring.
- ``parse_kafka_events`` is the value-decoding transform — pure
  DataFrame logic over the connector's fixed output shape, fully
  testable without a broker by synthesizing that shape in a batch frame.
- ``rate_event_stream`` shapes Spark's built-in ``rate`` source into the
  same events schema: an unbounded, broker-free stand-in for load tests
  and the Trigger.ProcessingTime cadence test.

Scale notes: one Kafka partition maps to one Spark task (parallelism =
topic partitions; repartition after parse if the downstream agg needs
more). ``maxOffsetsPerTrigger`` is the backpressure knob — without it a
backlogged topic lands as one giant first batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoinminingetl_spark.streaming.pipeline import EVENT_SCHEMA

# The connector's fixed output schema — what parse_kafka_events consumes.
KAFKA_SHAPE = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """The production source plan: subscribe to ``topic`` and return the
    raw connector frame (KAFKA_SHAPE). Requires the spark-sql-kafka
    connector package on the classpath; without it Spark raises
    "Failed to find data source: kafka" at load()."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def parse_kafka_events(kafka_df: DataFrame) -> DataFrame:
    """Decode the connector frame into the events schema: value is
    UTF-8 JSON -> from_json against the declared schema (never inferred —
    from_json is PERMISSIVE, so a poison message yields a struct with
    NULL fields; rows missing the required event_id are routed out, not
    a stream crash). Keeps (topic, partition, offset) as
    lineage columns — the exactly-once bookkeeping key downstream sinks
    dedup on."""
    parsed = kafka_df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("ev"),
    )
    return parsed.filter(F.col("ev.event_id").isNotNull()).select(
        "ev.*", "topic", "partition", "offset"
    )


def rate_event_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Unbounded synthetic events from the built-in rate source, shaped to
    EVENT_SCHEMA: deterministic event_type/user_id/value derived from the
    monotonic `value` counter. Drop-in for kafka_stream|parse in tests and
    cadence/load experiments — no broker, no files."""
    types = F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup")])
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value"), F.lit(97)).alias("user_id"),
        F.element_at(types, (F.pmod(F.col("value"), F.lit(4)) + 1).cast("int")).alias(
            "event_type"
        ),
        (F.pmod(F.col("value"), F.lit(1000)) / 10.0).alias("value"),
    )
