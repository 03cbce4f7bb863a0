"""Set operations (§2B: q_set_*). SQL set semantics (distinct):
UNION / INTERSECT / EXCEPT — Spark's union+distinct / intersect /
subtract. (exceptAll/intersectAll give the bag variants; the oracle
checks the distinct forms.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def _cust_nations(spark, sf_dir) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "q_set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .unionByName(_supp_nations(spark, sf_dir))
        .distinct()
    )


@register(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "q_set_except",
    oracle="""
    SELECT event_id FROM events WHERE value > 90
    EXCEPT
    SELECT event_id FROM events WHERE user_id % 3 = 0
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT/subtract). Operands are high-value
    events minus a user cohort — chosen because the result AND the
    removed overlap are both non-empty at every corpus SF; the
    earlier customer-minus-supplier nation difference was empty on
    the dense synthetic corpus, so its gate certified nothing (both
    engines agreeing on the empty set is a trivial pass).
    """
    ev = load_table(spark, sf_dir, "events")
    hi = ev.filter(F.col("value") > 90).select("event_id")
    cohort = ev.filter(F.col("user_id") % 3 == 0).select("event_id")
    return hi.subtract(cohort)


@register(
    "q_set_except_all",
    oracle="""
    SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL): multiplicity-aware subtraction,
    planned as a single hash-partition exchange with per-key counters
    — no row-by-row anti join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_partkey").alias("partkey")
    )
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("partkey")
    )
    return a.exceptAll(r)


@register(
    "q_set_intersect_all",
    oracle="""
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL, min-multiplicity semantics):
    one hash-partition exchange per side with per-key counters —
    completes the bag algebra alongside q_set_union_all /
    q_set_except_all.
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return a.intersectAll(b)
