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


# ---------------------------------------------------------------------------
# Custom SINK via the Python Data Source writer API: partition-parallel
# JSON-lines with two-phase commit. Completes the connector contract
# the reader half demonstrates (the reference only ever wrote its one
# driver-side document, SparkApplication.scala:109-130; a real engine
# needs task-parallel, atomically-committed table sinks).
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp: str
    final: str
    rows: int


class JsonLinesDirWriter(DataSourceWriter):
    """Two-phase-commit JSON-lines writer.

    Tasks write to uniquely-named `.tmp-*` files (invisible to readers:
    Spark's file index skips dot-files) and report them in their commit
    message; the driver's commit() renames every temp to its final
    `part-*.jsonl` name and stamps a `_SUCCESS` manifest — so a reader
    never sees a half-written table, and a failed/speculative task's
    litter is removed by abort(). On a cluster the same protocol runs
    against shared storage, exactly like Hadoop's output committer.
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonldir sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        tag = uuid.uuid4().hex[:12]
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{tag}.jsonl")
        final = os.path.join(self.path, f"part-{tag}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), ensure_ascii=False))
                f.write("\n")
                n += 1
        return _FileCommit(tmp=tmp, final=final, rows=n)

    def commit(self, messages):
        import glob
        import json
        import os

        if self.overwrite:
            keep = {m.tmp for m in messages if m is not None}
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.unlink(old)
            for stale in glob.glob(os.path.join(self.path, ".tmp-*.jsonl")):
                if stale not in keep:
                    os.unlink(stale)
        file_rows: dict[str, int] = {}
        if not self.overwrite:
            # Append commit: the manifest must describe the WHOLE
            # committed table, not just this write's files. Disk is
            # the ground truth — the prior manifest only supplies
            # per-file row counts so unchanged files aren't
            # re-counted. Manifest entries whose files vanished are
            # dropped (a stale manifest must not overstate the
            # table), and committed files the manifest doesn't know
            # (manifest-less prior state) are line-counted once.
            prior_rows: dict[str, int] = {}
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                with open(success) as f:
                    prior = json.load(f)
                prior_rows = prior.get("file_rows", {})
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                name = os.path.basename(old)
                if name in prior_rows:
                    file_rows[name] = prior_rows[name]
                else:
                    with open(old) as f:
                        file_rows[name] = sum(1 for _ in f)
        for m in messages:
            if m is None:
                continue
            os.replace(m.tmp, m.final)
            file_rows[os.path.basename(m.final)] = m.rows
        files = sorted(file_rows)
        total = sum(file_rows.values())
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(
                {"files": files, "rows": total, "file_rows": file_rows}, f
            )

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is not None and os.path.exists(m.tmp):
                os.unlink(m.tmp)


class JsonLinesDirDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonldir"

    def schema(self):
        return "value string"  # unused for writes

    def writer(self, schema, overwrite):
        return JsonLinesDirWriter(self.options, overwrite)


def register_jsonldir(spark) -> None:
    """Idempotent registration: df.write.format('jsonldir')."""
    spark.dataSource.register(JsonLinesDirDataSource)
