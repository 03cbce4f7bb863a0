"""Custom connector via the Python Data Source API (Spark 4) — the
modern answer to SURVEY.md §4.2's "source conventions" line.

`TweetGenDataSource` is a deterministic synthetic tweet-JSON source:
it emits the same corpus the reference consumed from Kafka
(`{"entities": {"hashtags": [{"text": ...}]}}` documents,
SparkApplication.scala:66-74), generated partition-parallel from a
seeded stream so every read is reproducible. It demonstrates the real
connector contract — schema declaration, partition planning
(`partitions()` → one split per task, the scan parallelizes across
executors), per-partition iteration — with zero driver-side
materialization; a 100 TB source differs only in what `read`
iterates over.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

HASHTAG_POOL = (
    "spark", "Spark", "SPARK", "python", "data", "streaming",
    "europe", "kafka", "scale", "parquet",
)


def _tweet_json(i: int) -> str:
    # Deterministic, seedless arithmetic (no RNG: reproducible across
    # retries, the same property q_sample_hash_mod relies on).
    n_tags = i % 4  # 0..3 hashtags; 1 in 4 tweets has none
    if n_tags == 0:
        return '{"text": "tweet %d"}' % i
    tags = ",".join(
        '{"text": "%s"}' % HASHTAG_POOL[(i * 7 + k * 3) % len(HASHTAG_POOL)]
        for k in range(n_tags)
    )
    return '{"text": "tweet %d", "entities": {"hashtags": [%s]}}' % (i, tags)


class TweetGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))

    def partitions(self):
        # Contiguous row ranges, one per split — the planner schedules
        # one task per partition, reading in parallel.
        step = max(1, self.n_rows // self.n_parts)
        return [
            InputPartition((start, min(start + step, self.n_rows)))
            for start in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        start, end = partition.value
        for i in range(start, end):
            yield (i, _tweet_json(i))


class TweetGenDataSource(DataSource):
    @classmethod
    def name(cls):
        return "tweetgen"

    def schema(self):
        return "id bigint, value string"

    def reader(self, schema):
        return TweetGenReader(self.options)


def register_tweetgen(spark) -> None:
    """Idempotent registration: spark.read.format('tweetgen')."""
    spark.dataSource.register(TweetGenDataSource)


class TweetStreamReader(SimpleDataSourceStreamReader):
    """Streaming tweet-JSON source: offset = rows emitted so far.
    Each microbatch drains one chunk; readBetweenOffsets makes any
    batch re-playable from the checkpoint (exactly-once replay —
    the property the reference's fire-and-forget producer lacked,
    ProducerApplication.java:63-72).
    """

    def __init__(self, options):
        self.total = int(options.get("rows", "500"))
        self.chunk = int(options.get("chunk", "100"))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        s = start["i"]
        e = min(s + self.chunk, self.total)
        return iter([(i, _tweet_json(i)) for i in range(s, e)]), {"i": e}

    def readBetweenOffsets(self, start, end):
        return iter(
            [(i, _tweet_json(i)) for i in range(start["i"], end["i"])]
        )


class TweetGenStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "tweetgen_stream"

    def schema(self):
        return "id bigint, value string"

    def simpleStreamReader(self, schema):
        return TweetStreamReader(self.options)


def register_tweetgen_stream(spark) -> None:
    """Idempotent registration: spark.readStream.format('tweetgen_stream')."""
    spark.dataSource.register(TweetGenStreamDataSource)
