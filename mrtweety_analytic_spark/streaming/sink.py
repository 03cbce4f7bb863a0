"""The top-k JSON document sink — the reference's R10 output contract.

Per trigger, serialize the current top-k as
    {"items": [{"hashtag": str, "count": int}, ...], "datetime": ISO}
and atomically overwrite ONE result file
(≙ SparkApplication.scala:109-130 and the committed sample
web/analytic.json: at most 5 items, counts descending, datetime is the
batch wall-clock as an ISO-8601 offset string).

Driver-side by design: the payload is ≤ k rows — the only part of the
pipeline that is *supposed* to collect.
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def render_document(rows, now: datetime | None = None) -> str:
    now = now or datetime.now(timezone.utc)
    items = [
        {"hashtag": r["hashtag"], "count": int(r["count"])} for r in rows
    ]
    return json.dumps(
        {"items": items, "datetime": now.isoformat()}, ensure_ascii=False
    )


def write_result_file(path: str, payload: str) -> None:
    """Atomic overwrite: write-to-temp + rename (the reference's
    FileUtils.write at :125 is a plain overwrite; rename removes the
    torn-read window its 5 s web poller could hit).
    """
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".analytic-", suffix=".json")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def make_topk_file_sink(path: str, k: int = 5):
    """foreachBatch hook: emit the top-k of the LATEST complete window
    each trigger ≙ the reference's per-batch foreachRDD(save)
    (SparkApplication.scala:92-95).
    """

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        latest = batch_df.agg(F.max(F.col("w.start")).alias("m")).collect()[0]["m"]
        if latest is None:
            # Update-mode batches carry deltas only; a trailing empty
            # micro-batch must not wipe the last good result.
            return
        rows = (
            batch_df.filter(F.col("w.start") == latest)
            .orderBy(F.desc("count"), F.asc("key"))
            .limit(k)
            .collect()
        )
        write_result_file(path, render_document(rows))

    return emit
