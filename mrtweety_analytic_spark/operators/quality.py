"""Data-quality operators: column profiling, expectation checks,
changelog (CDC) application.

A 100 TB training-data pipeline gates ingest on exactly these:
profile the batch, assert the contract, apply the upstream changelog
— all as single-pass declarative plans, never row-at-a-time
validators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

PROFILE_COLS = ("o_orderstatus", "o_custkey", "o_totalprice", "o_orderpriority")


@register(
    "q_dq_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col_name,
           count(*) FILTER (WHERE o_orderstatus IS NULL) AS n_nulls,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           count(*) FILTER (WHERE o_custkey IS NULL),
           CAST(count(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           count(*) FILTER (WHERE o_totalprice IS NULL),
           CAST(count(DISTINCT o_totalprice) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           count(*) FILTER (WHERE o_orderpriority IS NULL),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT)
    FROM orders
    """,
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null count + exact distinct per column) in
    ONE scan: all metrics computed in a single wide aggregate, then
    unpivoted to long form with stack(). The oracle's UNION ALL reads
    the table 4 times; the engine reads it once — at 100 TB that is
    the difference between one pass and four. (Exact distincts expand
    to one hash-agg each; the approx tier for very-high-cardinality
    columns is q_agg_approx_distinct.)
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in PROFILE_COLS:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack_args}) "
        "AS (col_name, n_nulls, n_distinct)"
    )


@register(
    "q_dq_expectations",
    oracle="""
    SELECT 'pk_orders_unique' AS check_name,
           count(*) - CAST(count(DISTINCT o_orderkey) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'fk_lineitem_orders',
           count(*) FILTER (WHERE o.o_orderkey IS NULL)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'discount_in_range',
           count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
    FROM lineitem
    UNION ALL
    SELECT 'price_positive',
           count(*) FILTER (WHERE o_totalprice <= 0)
    FROM orders
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract assertions as data: PK uniqueness, FK orphan count,
    range and sign checks — one row per expectation with its
    violation count, computed in TWO fact passes (the oracle's
    UNION-ALL formulation needs four): the scalar orders checks share
    one wide aggregate, and the lineitem range check rides the same
    scan as the FK probe (a LEFT JOIN + null-count, so it shares the
    plan family — and the broadcast — with ordinary dimension joins).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    orders_checks = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("price"),
    ).selectExpr(
        "stack(2, 'pk_orders_unique', pk, 'price_positive', price)"
        " AS (check_name, n_violations)"
    )

    li_checks = (
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("fk"),
            F.count(
                F.when(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
                )
            ).alias("disc"),
        )
        .selectExpr(
            "stack(2, 'fk_lineitem_orders', fk, 'discount_in_range', disc)"
            " AS (check_name, n_violations)"
        )
    )

    return orders_checks.unionByName(li_checks)


@register(
    "q_cdc_apply",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, value, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, round(value, 4) AS last_value, ts AS last_ts
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog application (CDC upsert/delete → snapshot): keep the
    latest change per key — 'error' events act as deletes, anything
    else upserts. One WindowGroupLimit pass (partial top-1 per key
    before the shuffle), then the delete filter; the MERGE INTO
    pattern without a transactional table format. Generalizes
    q_dedup_keep_latest (reference has no state recovery at all —
    SURVEY.md §2A negative space).
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.round("value", 4).alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )
