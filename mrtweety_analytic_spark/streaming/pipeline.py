"""The reference dataflow as a pure DataFrame transformation.

Reference pipeline (SparkApplication.scala:63-95):
  Kafka value -> JSON parse -> explode entities.hashtags[].text ->
  blacklist filter -> case-insensitive count over a 15-min window
  sliding every 10 s -> sort desc -> top 5 -> JSON file overwrite.

Everything here is expressed as functions DataFrame -> DataFrame so
the SAME code runs in batch (tests, oracle comparison) and streaming
(readStream + writeStream) — the batch/stream equivalence strategy of
SURVEY.md §7.4.

Time semantics: the reference's DStream windows are processing-time.
This engine uses event-time + watermark (a documented upgrade); for
exact reference parity `stamp_processing_time` substitutes ingest
wall-clock as the event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import TWEET_SCHEMA

# ≙ reference WORD_BLACKLIST (SparkApplication.scala:29): terms the
# producer tracks and the analytic job therefore suppresses.
WORD_BLACKLIST = ("europe", "europa", "eu", "euro")

WINDOW_DURATION = "15 minutes"   # ≙ Minutes(15), SparkApplication.scala:88
SLIDE_DURATION = "10 seconds"    # ≙ batch interval, SparkApplication.scala:37
TOP_K = 5                        # ≙ take(5), SparkApplication.scala:93


def parse_hashtags(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """value (JSON string) -> one row per hashtag text.

    ≙ the flatMap at SparkApplication.scala:66-85: from_json yields a
    null struct for malformed/absent entities and explode drops
    null/empty arrays, so such records contribute no rows (:82-84).
    Passes through every other column (e.g. the event-time stamp).
    """
    passthrough = [c for c in raw.columns if c != value_col]
    return (
        raw.withColumn("_tweet", F.from_json(F.col(value_col), TWEET_SCHEMA))
        .select(
            *passthrough,
            F.explode(F.col("_tweet.entities.hashtags.text")).alias("hashtag"),
        )
        .filter(F.col("hashtag").isNotNull())
    )


def blacklist_filter(
    df: DataFrame, col: str = "hashtag", blacklist: tuple = WORD_BLACKLIST
) -> DataFrame:
    """Case-insensitive NOT-IN ≙ SparkApplication.scala:29,77."""
    return df.filter(~F.lower(F.col(col)).isin(*blacklist))


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "hashtag",
    window: str = WINDOW_DURATION,
    slide: str = SLIDE_DURATION,
    watermark: str | None = "1 minute",
) -> DataFrame:
    """Sliding-window case-folded counts.

    ≙ reduceByKeyAndWindow(_+_, Minutes(15)) with the Hashtag
    case-insensitive key (SparkApplication.scala:88, Hashtag.scala:
    11-17) — but incremental via the state store instead of the
    reference's re-reduce of ~90 retained RDDs per slide, and with a
    watermark bounding state (the reference had none and leaked
    nothing only because DStream windows drop old RDDs wholesale).
    Key display casing: min() (deterministic) instead of the
    reference's first-seen-wins race.
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"),
            F.lower(F.col(key_col)).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.min(key_col).alias("hashtag"),
        )
    )


def top_k_per_window(counts: DataFrame, k: int = TOP_K) -> DataFrame:
    """Latest-window top-k with deterministic tiebreak (count desc,
    key asc) ≙ sortByKey(desc) + take(5) (SparkApplication.scala:
    90-93), planned as TakeOrderedAndProject / WindowGroupLimit
    instead of a full sort.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("w").orderBy(F.desc("count"), F.asc("key"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def stamp_processing_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Processing-time mode for exact reference parity (DStream windows
    are wall-clock): stamp arrival time as the event time.
    """
    return df.withColumn(ts_col, F.current_timestamp())
