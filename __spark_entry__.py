"""Driver contract for the spark-graft builder (PySpark target).

entry()     — flagship trending-terms query at sf 0.001 (the reference
              dataflow transplanted to the documents corpus;
              SURVEY.md §7.1).
queries()   — one callable per implemented operator (SURVEY.md §2B).
oracle_sql()— DuckDB twins with matching column aliases; operators
              without an entry get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mrtweety_analytic_spark.queries import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_text_trending"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
