"""Round-7 pytest pins: behaviors SQL oracles can't express.

- UpsertKeyedSink reopen-and-continue (ADVICE r06 item 2): a new sink
  instance over an existing base_dir must resume versioning after the
  newest committed snapshot instead of colliding with v000001.
"""

from __future__ import annotations

from datetime import datetime

EVENT_SCHEMA = (
    "user_id long, ts timestamp, event_id long, "
    "event_type string, value double"
)


def test_upsert_sink_reopen_and_continue(spark, tmp_path):
    """Restart recovery: reopening an existing base_dir picks up the
    version counter from committed snapshots, the next commit lands in
    a FRESH version dir, and the merged table reflects both the
    pre-restart and post-restart batches under the same merge law."""
    from mrtweety_analytic_spark.streaming.queries import UpsertKeyedSink

    base = str(tmp_path / "tbl")
    first = UpsertKeyedSink(base_dir=base)
    first(
        spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 0, 0, 10), 100, "a", 1.0),
                (2, datetime(2024, 1, 1, 0, 0, 20), 101, "b", 2.0),
            ],
            EVENT_SCHEMA,
        ),
        0,
    )
    first(
        spark.createDataFrame(
            [(1, datetime(2024, 1, 1, 0, 0, 30), 102, "c", 3.0)],
            EVENT_SCHEMA,
        ),
        1,
    )
    committed = first.snapshots()
    assert committed == [1, 2]

    # Simulate a driver restart: a brand-new sink object, same dir.
    reopened = UpsertKeyedSink(base_dir=base)
    assert reopened._version == 2  # resumed, not reset to 0
    reopened(
        spark.createDataFrame(
            [
                (2, datetime(2024, 1, 1, 0, 0, 40), 103, "d", 4.0),
                (3, datetime(2024, 1, 1, 0, 0, 50), 104, "e", 5.0),
            ],
            EVENT_SCHEMA,
        ),
        2,
    )
    assert reopened.snapshots() == [1, 2, 3]

    got = {
        r.user_id: (r.event_id, r.value)
        for r in reopened.table().collect()
    }
    assert got == {1: (102, 3.0), 2: (103, 4.0), 3: (104, 5.0)}

    # Time travel across the restart boundary still resolves.
    pre = {
        r.user_id: r.event_id for r in reopened.table(as_of=2).collect()
    }
    assert pre == {1: 102, 2: 101}
