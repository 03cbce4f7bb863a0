"""Global sort + limit (§2B: q_sort_limit_topk).

The reference computes a full global sort then takes 5 rows on the
driver (sortByKey + take(5), SparkApplication.scala:90-93). Catalyst
rewrites orderBy+limit into TakeOrderedAndProject: each partition
keeps a k-row heap, the driver merges partitions' heaps — no
range-partitioning shuffle, no total sort. O(n log k) instead of
O(n log n) + shuffle; the win grows with scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Generic deterministic top-k (callers supply a total order)."""
    return df.orderBy(*order_cols).limit(k)


@register(
    "q_sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 5
    """,
)
def q_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return top_k(
        orders.select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        5,
    )
