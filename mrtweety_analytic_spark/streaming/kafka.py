"""Kafka source/sink wiring — the reference's R1 ingest and its
Structured Streaming equivalent.

Reference behavior (cited for parity):
- subscribe topic `tweet`, string key/value, `auto.offset.reset=latest`,
  consumer group `tweet`, offsets uncommitted
  (spark/src/main/scala/.../SparkApplication.scala:45-61);
- in Structured Streaming, offsets live in the CHECKPOINT, not the
  consumer group — `enable.auto.commit=false` (:54) is the built-in
  behavior, and `startingOffsets=latest` replaces
  `auto.offset.reset=latest` (:52).

No Kafka broker exists in the test container, so these builders are
exercised by construction-time tests only (the options dict and the
parse stage are unit-tested; the live path needs a broker). The parse
→ explode → filter → window → top-k pipeline downstream of the source
is broker-independent and fully tested via the file-source replay
(tests/test_streaming_pipeline.py) — swapping in this source changes
ONE line of the composition, which is the point of keeping the
pipeline a pure function of a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TOPIC = "tweet"  # ProducerApplication.java:34


def kafka_source_options(
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """The exact option set for the reference-parity Kafka source."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # Safety at scale: cap per-trigger intake so one slow batch
        # doesn't snowball (the DStream direct API had backpressure
        # configs; this is the Structured Streaming equivalent).
        "maxOffsetsPerTrigger": "1000000",
        # Don't fail a long-running job because retention expired
        # offsets the checkpoint still references.
        "failOnDataLoss": "false",
    }


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "latest",
) -> DataFrame:
    """R1: the tweet-JSON value stream. Returns one string column
    `value` ≙ the reference's `stream.map(record.value)`
    (SparkApplication.scala:63) — key/offset/partition metadata are
    dropped by projection (Catalyst prunes them out of the source).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topic, starting_offsets
    ).items():
        reader = reader.option(k, v)
    return reader.load().select(F.col("value").cast("string"))


def kafka_payload(df: DataFrame) -> DataFrame:
    """One `value` column: the full row JSON-serialized — the shape
    the Kafka sink requires. Split out so the serialization contract
    is testable without a broker.
    """
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """Kafka sink for a result stream: the value column is the
    JSON-serialized row. Offsets + sink state ride the checkpoint, so
    the stream is restart-safe — delivery is AT-LEAST-ONCE (a batch
    re-executed after failure re-publishes; Spark's Kafka sink is not
    transactional), which still beats the reference's fire-and-forget
    producer (ProducerApplication.java:63-72: at-most-once, no
    recovery at all). Consumers needing exactly-once semantics dedup
    on a key downstream (s_dedup_stream is that operator).
    """
    payload = kafka_payload(df)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
