"""Checkpoint recovery — the capability the reference explicitly
lacked (no checkpointing anywhere; window state lost on restart,
SURVEY.md §2A negative space / BASELINE.md fault-tolerance row).

A streaming aggregation is run, stopped, fed more data, and
RESTARTED from the same checkpoint: state must survive (counts keep
accumulating, no double-counting of batch-1 rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "key string, ts_s string").select(
        "key", F.col("ts_s").cast("timestamp").alias("ts")
    ).write.mode("append").parquet(path)


def _start(spark, src, ckpt, name):
    agg = (
        spark.readStream.schema("key string, ts timestamp").parquet(src)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_restart_resumes_state_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [("a", "2024-01-01 00:00:00"),
                              ("a", "2024-01-01 00:00:01"),
                              ("b", "2024-01-01 00:00:02")])
    q1 = _start(spark, src, ckpt, "ckpt_run1")
    try:
        q1.processAllAvailable()
        first = {r["key"]: r["n"] for r in spark.table("ckpt_run1").collect()}
    finally:
        q1.stop()
        q1.awaitTermination()
    assert first == {"a": 2, "b": 1}

    # New data arrives while the query is DOWN.
    _write_batch(spark, src, [("a", "2024-01-01 00:01:00"),
                              ("c", "2024-01-01 00:01:01")])

    # Restart from the same checkpoint: prior state recovered, only
    # the new file processed (no double count of batch-1 rows).
    q2 = _start(spark, src, ckpt, "ckpt_run2")
    try:
        q2.processAllAvailable()
        second = {r["key"]: r["n"] for r in spark.table("ckpt_run2").collect()}
    finally:
        q2.stop()
        q2.awaitTermination()
    assert second == {"a": 3, "b": 1, "c": 1}

    for v in ("ckpt_run1", "ckpt_run2"):
        spark.catalog.dropTempView(v)
