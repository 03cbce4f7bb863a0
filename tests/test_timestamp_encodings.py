"""Corpus timestamp-encoding contract (the round-3 regression class).

The driver has shipped the same logical corpus under different
physical timestamp encodings across generations: timestamp[ns]
(readable only as int64 nanos under nanosAsLong), timestamp[us]
without timezone (Spark reads TIMESTAMP_NTZ), and tz-tagged
timestamp[us] (LTZ). A loader hard-coded to any single encoding
either errors — or worse, silently rescales the timeline (µs read as
ns compressed event time 1000x in round 3). These tests pin the
contract: batch and stream loaders must produce IDENTICAL
session-UTC TimestampType rows for every encoding.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ROWS = [
    # (event_id, ts as UTC-naive datetime, user_id, event_type, value, props)
    (1, "2024-01-01 00:09:58.778549", 7, "view", 1.5, '{"k": 1}'),
    (2, "2024-01-02 13:00:00.000001", 8, "purchase", 2.5, '{"k": 2}'),
    (3, "2024-02-28 23:59:59.999999", 7, "click", 3.5, '{"k": 3}'),
]


def _write_events(dirpath: str, ts_type: pa.DataType) -> None:
    import datetime as dt

    ts = [
        dt.datetime.strptime(r[1], "%Y-%m-%d %H:%M:%S.%f") for r in ROWS
    ]
    epoch_ns = pa.array(
        [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6) * 1000
         for t in ts],
        type=pa.int64(),
    )
    if ts_type == "int64-nanos":
        # Physically timestamp[ns]: what rounds 1-2 shipped. Spark
        # reads it as long nanos under nanosAsLong=true.
        arr = epoch_ns.cast(pa.timestamp("ns"))
    elif getattr(ts_type, "unit", None) == "ns":
        # tz-tagged ns: ALSO surfaces as INT64 under nanosAsLong —
        # the stream-schema branch must key on the unit, not the tz.
        arr = epoch_ns.cast(ts_type)
    else:
        arr = pa.array(ts, type=ts_type)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": arr,
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))


ENCODINGS = {
    "nanos": "int64-nanos",
    "nanos_utc": pa.timestamp("ns", tz="UTC"),
    "us_ntz": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("name", list(ENCODINGS))
def test_batch_loader_normalizes_every_encoding(spark, tmp_path, name):
    from pyspark.sql import types as T

    from mrtweety_analytic_spark.sources import load_table

    d = str(tmp_path / name)
    _write_events(d, ENCODINGS[name])
    df = load_table(spark, d, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"{name}: ts must land on LTZ TimestampType, got "
        f"{df.schema['ts'].dataType}"
    )
    got = sorted(
        (r["event_id"], r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"))
        for r in df.select("event_id", "ts").collect()
    )
    want = sorted((r[0], r[1]) for r in ROWS)
    assert got == want, f"{name}: timestamp values drifted"


@pytest.mark.parametrize("name", list(ENCODINGS))
def test_stream_loader_matches_batch(spark, tmp_path, name):
    """The streaming source must produce the same event times as the
    batch loader for every encoding — the round-3 failure was exactly
    a batch/stream divergence (stream schema hard-coded to one
    encoding while batch used the footer)."""
    from mrtweety_analytic_spark.sources import (
        load_events_stream,
        load_table,
    )

    d = str(tmp_path / name)
    _write_events(d, ENCODINGS[name])
    batch = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, d, "events").collect()
    }
    stream = load_events_stream(spark, d)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(f"enc_{name}")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout=120)
    got = {
        r["event_id"]: r["ts"]
        for r in spark.table(f"enc_{name}").collect()
    }
    spark.catalog.dropTempView(f"enc_{name}")
    assert got == batch, f"{name}: stream/batch event-time divergence"
