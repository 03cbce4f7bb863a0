"""Projection and filter operators (§2B: q_project_expr, q_filter_*).

Rounding policy (SURVEY.md §7.5 risk 1): computed doubles are rounded
to the decimal grid of their exact rational value (2-dec × 2-dec
product → 4 decimals; three-way product → 6), so the rounded value can
never sit on a rounding boundary and Spark/DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# Case-insensitive NOT-IN blacklist ≙ reference WORD_BLACKLIST
# semantics (SparkApplication.scala:29,77), applied to event types.
EVENT_BLACKLIST = ("error", "click")


@register(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(revenue, 4).alias("revenue"),
        F.round(revenue * (1 + F.col("l_tax")), 6).alias("charge"),
    )


@register(
    "q_filter_blacklist",
    oracle=f"""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE lower(event_type) NOT IN ({', '.join(repr(w) for w in EVENT_BLACKLIST)})
    """,
)
def q_filter_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        ~F.lower(F.col("event_type")).isin(*EVENT_BLACKLIST)
    ).select("event_id", "event_type", "user_id")


@register(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IS NOT NULL
      AND (l_discount > 0.05 OR l_tax < 0.02)
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isNotNull()
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.02))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
