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


def _dates_as_ts(df: DataFrame) -> DataFrame:
    """Cast every DateType output column to TIMESTAMP_NTZ.

    Cross-engine dtype alignment at the PANDAS layer the driver hashes:
    Spark DateType reaches toPandas() as object[datetime.date] while a
    DuckDB DATE reaches fetchdf() as datetime64 — different dtype
    families the driver's canonicalizer happens to normalize today but
    is one version bump away from hashing apart (the round-8
    int-vs-float incident, one class over). Casting to TIMESTAMP_NTZ
    (midnight, no zone) lands both engines in the datetime64 family;
    values are unchanged (a day bucket at 00:00:00). NTZ, not LTZ, so
    the rendering cannot depend on the driver session's timezone."""
    from pyspark.sql import functions as F, types as T

    if not any(
        isinstance(f.dataType, T.DateType) for f in df.schema.fields
    ):
        return df
    return df.select(
        *[
            F.col(f.name).cast("timestamp_ntz").alias(f.name)
            if isinstance(f.dataType, T.DateType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def register(
    name: str,
    oracle: Optional[str] = None,
    enabled: bool = True,
    date_as_ts: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """`enabled=False` defines the function without advertising it in
    the driver contract — for operators whose runtime dependency is
    absent in the current environment (e.g. transformWithState needs
    protobuf). The code stays importable and testable either way.
    `date_as_ts=True` wraps the callable with `_dates_as_ts` (see its
    docstring) — set it on queries whose output carries a day/date
    bucket column."""

    def deco(fn: QueryFn) -> QueryFn:
        if not enabled:
            return fn
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        if date_as_ts:

            def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
                return _dates_as_ts(fn(spark, sf_dir))

            wrapped.__name__ = fn.__name__
            wrapped.__doc__ = fn.__doc__
            wrapped.__wrapped__ = fn
            QUERIES[name] = wrapped
        else:
            QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
