"""Window functions (§2B: q_win_*).

Determinism contract: every ORDER BY inside a window carries a unique
tiebreak column (SURVEY.md §7.5 risk 1). rank()/dense_rank() are
deterministic under ties; row_number() is only used with a total
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           rank() OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC) AS drnk,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS rn
    FROM customer
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w_rank = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    w_rn = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w_rank).cast("long").alias("rnk"),
        F.dense_rank().over(w_rank).cast("long").alias("drnk"),
        F.row_number().over(w_rn).cast("long").alias("rn"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(value) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "q_win_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS avg_last3
    FROM orders
    """,
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running and sliding row frames — the batch analogue of the
    reference's sliding window count (SparkApplication.scala:88).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "avg_last3"
        ),
    )


@register(
    "q_win_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    )
    WHERE rn <= 5
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 per group — the per-group form of the reference's global
    top-5 (SparkApplication.scala:90-93). Spark 3.5+ plans the rn<=k
    filter as WindowGroupLimit: per-partition top-k BEFORE the
    shuffle, so only k rows per group per mapper move.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.col("rn").cast("long").alias("rn"),
        )
    )


@register(
    "q_win_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           nth_value(event_type, 3) OVER w AS third_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over an explicit full-partition frame.
    The UNBOUNDED FOLLOWING frame is stated explicitly because the
    SQL default frame stops at CURRENT ROW, which silently turns
    last_value into the current row's value — a classic drift trap.
    Ordering key event_id is unique → deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return events.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 3).over(w).alias("third_type"),
    )


@register(
    "q_win_fill_forward",
    oracle="""
    SELECT event_id, user_id,
           round(coalesce(last_value(good_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0), 4) AS filled_value
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type <> 'error' THEN value END AS good_value
        FROM events
    )
    """,
)
def q_win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last observation carried forward): error events'
    values are nulled and replaced by the user's most recent good
    value — THE gap-repair primitive of sensor/feature pipelines.
    last_value(ignoreNulls) over a running frame is one window pass
    on the user_id partitioning; no self-join, no UDF.
    """
    events = load_table(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(
            F.coalesce(
                F.last(good, ignorenulls=True).over(w), F.lit(0.0)
            ),
            4,
        ).alias("filled_value"),
    )


@register(
    "q_win_percentile",
    oracle="""
    SELECT event_id, user_id,
           round(quantile_cont(value, 0.5)
                     OVER (PARTITION BY user_id), 4) AS med_value
    FROM events
    """,
)
def q_win_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median as a WINDOW enrichment: every event row carries
    its user's median value — the enrich-don't-collapse form of
    q_agg_percentile (no join back to the group result). Computed by
    rank interpolation over one window sort (row_number + full-frame
    conditional max), NOT `percentile(...).over(...)`, whose
    aggregate buffer holds the whole partition's values in executor
    memory — the same O(group) hazard q_agg_percentile removes. All
    four window expressions here are constant-state aggregates
    sharing one user_id exchange + one sort.
    """
    ev = load_table(spark, sf_dir, "events")
    ws = W.partitionBy("user_id").orderBy("value")
    wn = W.partitionBy("user_id")
    # quantile_cont ignores NULL measures but still emits every row.
    # NULLs sort FIRST under Spark's default asc order, so the
    # non-null rank is rn - (#nulls) and n counts only non-nulls —
    # a nullable `value` no longer skews the interpolation
    # (ADVICE r05 item 1); all-NULL partitions yield NULL.
    ranked = ev.select(
        "event_id",
        "user_id",
        F.col("value").alias("v"),
        F.row_number().over(ws).alias("rn"),
        F.count("value").over(wn).alias("n"),
        (F.count(F.lit(1)).over(wn) - F.count("value").over(wn)).alias(
            "nulls"
        ),
    )
    h = 1 + (F.col("n") - 1) * F.lit(0.5)
    lo = F.floor(h)
    nn_rn = F.col("rn") - F.col("nulls")
    vlo = F.max(F.when(nn_rn == lo, F.col("v"))).over(wn)
    vhi = F.max(F.when(nn_rn == lo + 1, F.col("v"))).over(wn)
    med = vlo + (h - lo) * (F.coalesce(vhi, vlo) - vlo)
    return ranked.select(
        "event_id", "user_id", F.round(med, 4).alias("med_value")
    )


@register(
    "q_win_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS anchor
        FROM days
    ),
    streaks AS (
        SELECT user_id, count(*) AS len
        FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def q_win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-DAY activity streak per user — the
    calendar gaps-and-islands shape (distinct from q_sessionize_gaps'
    continuous-time gap): consecutive active dates share the constant
    `date - row_number` anchor, so streaks fall out of one window
    pass plus two aggregates, no self-join and no recursive walk.

    Scale: distinct (user, day) first — the fact collapses to at most
    users × days rows BEFORE the window — then everything downstream
    is O(active-days). One exchange on user_id, reused by the window
    and both aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


@register(
    "q_win_moving_regression",
    oracle="""
    WITH pts AS (
        SELECT user_id, event_id, ts,
               (epoch_us(ts) - 1704067200000000)
                   / 86400000000.0 AS x,
               value AS y
        FROM events WHERE event_type = 'purchase'
    ),
    sums AS (
        SELECT user_id, event_id, ts,
               count(*)   OVER w AS n_w,
               sum(x)     OVER w AS sx,
               sum(y)     OVER w AS sy,
               sum(x * y) OVER w AS sxy,
               sum(x * x) OVER w AS sxx
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts, CAST(n_w AS BIGINT) AS n_w,
           round((n_w * sxy - sx * sy)
                 / nullif(n_w * sxx - sx * sx, 0.0), 6) AS slope_per_day
    FROM sums
    WHERE n_w >= 3
    """,
)
def q_win_moving_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend: per user, the least-squares slope of
    purchase value against time over the trailing 5 events, from
    nothing but four running window sums (n, Sx, Sy, Sxy, Sxx) —
    slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²). O(1) state per row, no
    self-join, no UDF: the closed-form moving regression every
    monitoring stack wants, in pure window algebra.

    Numerical design: x is DAYS since a fixed epoch (~1e2-1e3
    magnitude), not epoch seconds (~1.7e9) — the normal-equation
    cancellation n·Sxx − Sx² is benign at day scale but loses ~10
    significant digits at second scale, which would make the
    round-6 grid engine-dependent. Zero-variance windows (all five
    events in the same instant) yield NULL via nullif in both
    engines.

    Scale: one shuffle on user_id; frames are 5-row bounded so the
    window state is constant-size regardless of user activity skew.
    """
    # Integer microseconds minus a fixed epoch, ONE division into
    # days — x is computed bit-identically in both engines (the
    # unix_micros <-> epoch_us pairing certified in analytics.py).
    base_us = F.lit(1704067200000000)  # 2024-01-01T00:00:00Z
    pts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "ts",
            ((F.unix_micros("ts") - base_us) / 86400000000.0).alias("x"),
            F.col("value").alias("y"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    num = n * sxy - sx * sy
    den = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return (
        pts.select(
            "user_id",
            "event_id",
            "ts",
            n.cast("bigint").alias("n_w"),
            F.round(num / den, 6).alias("slope_per_day"),
        )
        .filter(F.col("n_w") >= 3)
    )


@register(
    "q_win_cumulative_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(is_first) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_distinct_types_so_far
    FROM flagged
    """,
)
def q_win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window — the breadth-of-
    engagement curve (how many distinct event types has this user
    touched as of each event), which `count(distinct) OVER` cannot
    express in either engine. The standard rewrite: flag each
    (user, type)'s FIRST occurrence, then a running sum of flags —
    two windows, both O(1) state, no set materialization anywhere
    (a collect_set-based form would carry the whole set per row).

    Both windows partition by user_id ONLY — the first-occurrence
    flag comes from a lag over (event_type, ts, event_id) order
    (rows of one type are contiguous under that sort, so a type
    change marks exactly its min-(ts, event_id) row — the same rows
    a (user, type)-partitioned row_number()=1 flags, without the
    second partitioning). Plan-checked: ONE Exchange on user_id,
    two Sorts under it; the (user_id, event_type)-partitioned form
    costs a second full-data shuffle (round-12 audit fix).

    Scale: one shuffle of the fact, state per row is a single long.
    The same rewrite handles distinct-items-per-session,
    distinct-SKUs-per-customer, vocabulary growth curves.
    """
    ev = load_table(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id").orderBy(
        "event_type", "ts", "event_id"
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Null-safe first-occurrence flag (ADVICE r12): a bare
    # prev_type.isNull() | (prev_type != type) test flags EVERY row
    # following a NULL event_type (lag() returns NULL both at the
    # partition start and after a NULL-typed row). row_number()==1
    # pins the partition start explicitly and eqNullSafe treats NULL
    # as one ordinary type value — same window, still one Exchange.
    prev_type = F.lag("event_type").over(w_first)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.row_number().over(w_first) == 1)
            | ~prev_type.eqNullSafe(F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_first"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("is_first")
        .over(w_run)
        .cast("bigint")
        .alias("n_distinct_types_so_far"),
    )


@register(
    "q_win_tumbling",
    oracle="""
    SELECT make_timestamp(
               (epoch_us(ts) // 600000000) * 600000000) AS win_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window() TVF in BATCH mode: 10-minute tumbling buckets
    over the whole event log — the surface parity check that the
    same windowing expression Structured Streaming uses (s_tumbling)
    also runs against history, which is how backfills reproduce what
    the live pipeline computed (lambda-architecture equivalence).
    The oracle pins the exact bucket arithmetic: window.start =
    floor(epoch_µs / 600e6) · 600e6 — integer µs bucketing, no
    float rounding at the boundary.

    Scale: window() is a PROJECTION (one struct per row), so the
    whole query is a single partial-aggregable groupBy over
    O(buckets × types) groups — identical plan to grouping by a
    derived column.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
