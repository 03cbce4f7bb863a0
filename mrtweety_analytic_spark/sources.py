"""Table loaders and explicit schemas for the test corpus.

Batch reads rely on the parquet footer schema (self-describing;
Catalyst pushes filters/pruning into the scan). Streaming file reads
require an explicit schema — declared here once (FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Streaming-source schema for the events table (FIXTURES.md §A).
# ts is physically timestamp[ns]: Spark's parquet reader has no ns
# timestamp type, so it arrives as long nanoseconds (see the
# nanosAsLong conf in session.RUNTIME_CONF) and _restore_event_time
# converts to µs TimestampType (lossless — corpus values are µs).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _restore_event_time(df: DataFrame) -> DataFrame:
    """long-nanos ts -> TimestampType(µs), preserving column order."""
    from pyspark.sql import functions as F

    # Integer DIV, not `/`: float division of ~1.7e18 ns exceeds the
    # double mantissa and lands ±1 µs off. Conversion only applies
    # when ts is physically long nanos (the driver corpus); fixture
    # tables written with a native TimestampType pass through.
    if "ts" not in df.columns or not isinstance(
        df.schema["ts"].dataType, T.LongType
    ):
        return df
    cols = [
        F.timestamp_micros(F.expr(f"{c} DIV 1000")).alias(c)
        if c == "ts"
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)

# Tweet-input contract of the reference pipeline: records navigated as
# entities.hashtags[].text, tolerating absent `entities`
# (reference: SparkApplication.scala:66-85). `from_json` with this
# schema + null-dropping explode reproduces those semantics.
TWEET_SCHEMA = T.StructType(
    [
        T.StructField(
            "entities",
            T.StructType(
                [
                    T.StructField(
                        "hashtags",
                        T.ArrayType(
                            T.StructType([T.StructField("text", T.StringType())])
                        ),
                    )
                ]
            ),
        )
    ]
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch-load one corpus table, tuning the session on the way."""
    tune(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = _restore_event_time(df)
    return df


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a replayable file-source stream.

    Stands in for the reference's Kafka direct stream
    (SparkApplication.scala:45-61) in a broker-less test environment;
    the downstream pipeline code is source-agnostic.
    """
    tune(spark)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        # File stream sources take a directory; the glob filter picks
        # the events table out of the shared sf_dir.
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return _restore_event_time(raw)
