"""Small shared runtime utilities."""

from __future__ import annotations

import atexit
from collections.abc import Callable
from typing import Any


class LastHandle:
    """Supersession holder for a per-operator resource (cached
    DataFrame, scratch/checkpoint dir): releasing the PREVIOUS
    instance when a new one replaces it bounds accumulation across
    repeated bench/verify runs, and the final instance is released at
    interpreter exit.

    `keep` > 1 retains that many generations before releasing — used
    where the previous generation's resource may still back a
    lazily-re-evaluated DataFrame held by the caller (scratch dirs).

    Release errors are swallowed: the classic failure is a stale
    handle from a stopped SparkSession (unpersist on a dead py4j
    gateway raises), which must not break the operator's first call
    in the next session.
    """

    def __init__(self, release: Callable[[Any], None], keep: int = 1):
        self._release = release
        self._keep = max(1, keep)
        self._values: list[Any] = []
        atexit.register(self.clear)

    def replace(self, value: Any) -> None:
        self._values.append(value)
        while len(self._values) > self._keep:
            self._release_one(self._values.pop(0))

    def current(self) -> Any | None:
        """The newest live value, or None — lets an operator serve a
        repeat call from its pinned resource instead of rebuilding."""
        return self._values[-1] if self._values else None

    def clear(self) -> None:
        while self._values:
            self._release_one(self._values.pop())

    def _release_one(self, value: Any) -> None:
        try:
            self._release(value)
        except Exception:
            pass


def release_checkpoint(df: Any) -> None:
    """Free a `localCheckpoint`ed DataFrame's blocks.

    Checkpoint blocks are NOT in the CacheManager, so
    `DataFrame.unpersist()` is a no-op on them — the persisted RDD
    hangs off the LogicalRDD leaf and must be released there. Plain
    persisted frames fall through to the normal unpersist.

    Only MATERIALIZED checkpoints are released: a lazy
    (eager=False) checkpoint that has not run a job yet is an RDD
    persisted at MEMORY_AND_DISK with checkpointData pending, and
    unpersisting it trips Spark's LocalRDDCheckpointData assertion
    ("Storage level ... is not appropriate for local checkpointing")
    the moment any still-live consumer finally acts on it (caught by
    test_round12_ops::test_export_full_no_val_cluster_doc_exports:
    helpers called OUTSIDE the registry build+hold frames across
    several registered-query builds). Unmaterialized checkpoints
    hold no blocks, so skipping them leaks nothing."""
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() == "LogicalRDD":
        r = plan.rdd()
        if r.isCheckpointed():
            r.unpersist(False)
    else:
        df.unpersist()


# Generation-scoped checkpoint collector (round 13). Every
# `localCheckpoint` this package creates truncates lineage by storing
# RDD blocks in the block manager, and those blocks are only freed by
# driver-GC-driven ContextCleaner passes — far too lazily for a
# 259-query bench session, where the accumulated dead blocks showed
# up as late-session drag on EVERY tail query (r13 mid-round bench:
# untouched queries regressing 2-5x in the final warm pass only).
# The fix mirrors graph.py's _LAST_GRAPH_CKPT, generalized: all
# checkpoints created while building ONE top-level registered query
# form one GENERATION, and generations are released two top-level
# builds later (keep=2: the previous build's returned DataFrame may
# still be acting when the next build starts; two generations bound
# worst-case liveness). Queries composing through the registry
# (QUERIES[...] called inside an operator) stay in the caller's
# generation via the depth guard in registry.py — a nested build's
# checkpoints must outlive the outer build's action.
_CKPT_GENERATIONS = LastHandle(
    lambda dfs: [release_checkpoint(df) for df in dfs], keep=2
)
_current_gen: list | None = None


def begin_checkpoint_generation() -> None:
    """Open a new checkpoint generation (top-level query boundary)."""
    global _current_gen
    _current_gen = []
    _CKPT_GENERATIONS.replace(_current_gen)


def _register_checkpoint(df: Any) -> None:
    if _current_gen is None:
        begin_checkpoint_generation()
    _current_gen.append(df)


def install_checkpoint_collector() -> None:
    """Idempotently wrap `DataFrame.localCheckpoint` so every
    checkpointed frame this package creates is registered in the
    current generation. A monkeypatch rather than 40+ call-site
    edits: the collector must see every site, including ones added
    later, or the leak silently returns.

    Spark 4 note: instances are `pyspark.sql.classic.dataframe.
    DataFrame`, which OVERRIDES `localCheckpoint` — patching only the
    `pyspark.sql.DataFrame` facade never fires (verified by
    tests/test_checkpoint_collector.py), so the classic class is the
    patch target, with the facade as fallback for older layouts."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    if getattr(DataFrame.localCheckpoint, "_ckpt_collector", False):
        return
    orig = DataFrame.localCheckpoint

    def localCheckpoint(self, *args, **kwargs):  # noqa: N802
        out = orig(self, *args, **kwargs)
        _register_checkpoint(out)
        return out

    localCheckpoint._ckpt_collector = True
    localCheckpoint.__doc__ = orig.__doc__
    DataFrame.localCheckpoint = localCheckpoint
