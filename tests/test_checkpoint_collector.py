"""Round-13 generation-scoped checkpoint collector (util.py +
registry.py).

Every localCheckpoint an operator creates while building one
top-level registered query forms a generation; generations are
released two top-level builds later. These tests pin the three
behaviors the bench depends on:

1. the monkeypatched `DataFrame.localCheckpoint` registers frames in
   the current generation,
2. a generation's blocks are actually FREED (LogicalRDD leaf
   unpersist — plain `DataFrame.unpersist()` is a no-op on
   checkpoint blocks) once two newer generations exist,
3. the keep=2 window retains the two newest generations, so the
   previous build's returned DataFrame still acts correctly.
"""

from __future__ import annotations

from mrtweety_analytic_spark import util
from mrtweety_analytic_spark.queries import QUERIES


def _ckpt_rdd_is_persisted(df) -> bool:
    plan = df._jdf.queryExecution().analyzed()
    assert plan.getClass().getSimpleName() == "LogicalRDD"
    return plan.rdd().getStorageLevel().useMemory()


def test_collector_installed_and_registers(spark):
    assert getattr(
        type(spark.range(1)).localCheckpoint, "_ckpt_collector", False
    ), "DataFrame.localCheckpoint is not the collector wrapper"
    util.begin_checkpoint_generation()
    df = spark.range(5).localCheckpoint()
    assert df in util._current_gen
    assert _ckpt_rdd_is_persisted(df)


def test_generations_released_after_two_builds(spark, sf_dir):
    util.begin_checkpoint_generation()
    old = spark.range(7).localCheckpoint()
    assert _ckpt_rdd_is_persisted(old)
    # Two top-level registered-query builds open two newer
    # generations -> `old`'s generation falls out of the keep=2
    # window and its blocks are freed.
    QUERIES["q_graph_degree"](spark, sf_dir)
    assert _ckpt_rdd_is_persisted(old), "released one build too early"
    QUERIES["q_graph_degree"](spark, sf_dir)
    assert not _ckpt_rdd_is_persisted(old), (
        "checkpoint blocks not freed two generations later"
    )
    # The keep window must leave the newest generation fully live:
    util.begin_checkpoint_generation()
    fresh = spark.range(3).localCheckpoint()
    assert _ckpt_rdd_is_persisted(fresh)
    assert fresh.count() == 3


def test_nested_registry_calls_share_generation(spark, sf_dir):
    # A query invoked while another build is in flight must append to
    # the CALLER's generation (depth guard in registry.py): simulate
    # by entering a top-level build that calls a registered query.
    util.begin_checkpoint_generation()
    gen = util._current_gen
    inner = QUERIES["q_graph_degree"]
    # Direct call opens a NEW generation (depth 0 -> 1)...
    inner(spark, sf_dir)
    assert util._current_gen is not gen
