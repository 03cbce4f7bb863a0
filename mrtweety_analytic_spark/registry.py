"""Query + oracle registry — the driver-contract backbone.

Every operator registers a `(spark, sf_dir) -> DataFrame` callable and
(when ANSI-SQL-expressible) a DuckDB oracle string with IDENTICAL
column aliases. Non-SQL-expressible operators register with
oracle=None and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(
    name: str, oracle: Optional[str] = None, enabled: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """`enabled=False` defines the function without advertising it in
    the driver contract — for operators whose runtime dependency is
    absent in the current environment (e.g. transformWithState needs
    protobuf). The code stays importable and testable either way."""

    def deco(fn: QueryFn) -> QueryFn:
        if not enabled:
            return fn
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
