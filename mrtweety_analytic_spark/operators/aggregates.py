"""Aggregation operators (§2B: q_agg_*).

All of these plan as HashAggregateExec partial→final (map-side
combine before the shuffle) — the Catalyst equivalent of the
reference's reduceByKeyAndWindow combiner (SparkApplication.scala:88).

Rounding policy: round every computed double AT or finer than the
exact rational's decimal grid, never coarser — and, since round 7,
any money SUM whose per-group row count can exceed ~10k accumulates
as EXACT INTEGER UNITS first (cents for 1e-2-grid columns, 1e-4
units for price*(1-discount) products, 1e-6 for triple products,
percent points for discounts; always floor(x*scale + 0.5) before
the integer cast), then divides once and rounds. Double sums at
those magnitudes carry merge-order error PAST the 1e-4 rounding
grid (caught live at sf0.1 — PLANS.md "money-sum hardening");
integer sums are exact under any merge order to 2^63 units.
Round 8 escalation: UNIT-PRODUCT sums (cents × percent factors,
~1.1e9 units/row) wrap int64 at ~8.4e9 rows/group — Spark wraps
silently where DuckDB promotes to HUGEINT — so they accumulate as
decimal(38,0) (exact 128-bit, partial-aggregable, ≙ HUGEINT;
ADVICE r07 on q_tpch_q1like, applied family-wide: q_agg_multi,
Q5/Q7/Q9/Q19 shapes). round(sum(double), 4) remains acceptable
only for provably-small groups (per-order, per-user). Rounded expressions that can be tiny
negatives additionally normalize IEEE -0.0 with `+ 0.0` on the
DuckDB side (Spark's BigDecimal round never emits -0.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q_agg_count_by_key",
    oracle="""
    SELECT lower(event_type) AS event_type, count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_agg_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core operation: case-folded count per key
    (Hashtag.scala:11-13 key semantics + reduceByKeyAndWindow count,
    SparkApplication.scala:87-88), as a declarative groupBy.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.lower(F.col("event_type")).alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_agg_multi",
    oracle="""
    WITH u AS (
        SELECT l_returnflag, l_linestatus, l_quantity,
               CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) AS cents,
               CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) AS d100
        FROM lineitem
    )
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(CAST(sum(cents) AS DOUBLE) / 100, 4) AS sum_base_price,
           round(CAST(sum(cents * (100 - d100)) AS DOUBLE) / 10000, 4)
               AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(CAST(sum(cents) AS DOUBLE) / 100 / count(*), 4)
               AS avg_price,
           round(CAST(sum(d100) AS DOUBLE) / 100 / count(*), 4)
               AS avg_disc,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           count(*) AS count_order
    FROM u
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: two-key groupBy, eight aggregates, one pass.

    Money aggregates accumulate as EXACT integer units (cents for
    prices, 1e-4 dollars for the discount product, percent points
    for discounts — the explicit-floor rule): a double money sum
    over 100k+ rows carries merge-order error past the 1e-4
    rounding grid, where the two engines deterministically diverge
    (caught live at sf0.1 in the round-7 differential on the
    structurally identical q_join_bucketed). Integer sums are exact
    under ANY merge order to 2^63 units, and quantities are
    integer-valued so their double sums are already exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    d100 = F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum(cents).cast("double") / 100, 4).alias(
            "sum_base_price"
        ),
        # product units reach ~1.1e9/row: 128-bit accumulation (≙
        # DuckDB's HUGEINT promotion) — int64 would wrap at ~8.4e9
        # rows/group, breached by Q1-shape groups near 10 TB
        F.round(
            F.sum((cents * (100 - d100)).cast("decimal(38,0)"))
            .cast("double")
            / 10000,
            4,
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.sum(cents).cast("double") / 100 / n, 4).alias(
            "avg_price"
        ),
        F.round(F.sum(d100).cast("double") / 100 / n, 4).alias(
            "avg_disc"
        ),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register("q_agg_approx_distinct")  # rows-only: HLL estimate ≠ oracle exact
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality — the 100 TB path for distinct counts
    (constant memory per group vs. countDistinct's expand+dedup).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_gsets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_gsets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty
        FROM v_lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q_agg_filtered",
    oracle="""
    SELECT l_returnflag,
           round(CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE)
                                     * 100 + 0.5) AS BIGINT))
                          FILTER (WHERE l_discount > 0.05) AS DOUBLE)
                 / 100, 4) AS disc_rev,
           count(*) FILTER (WHERE l_quantity > 25) AS n_heavy
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: sum(when(...)) ≙ SQL FILTER clause."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, cents))
            .cast("double")
            / 100,
            4,
        ).alias("disc_rev"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_heavy"),
    )


@register(
    "q_agg_argminmax",
    oracle="""
    SELECT user_id,
           arg_min(event_type, event_id) AS first_type,
           arg_max(event_type, event_id) AS last_type,
           round(max(value), 4) AS max_value
    FROM events GROUP BY user_id
    """,
)
def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max aggregation (min_by/max_by): the value of one
    column at the extremum of another, in one hash-agg pass — no
    self-join back to the extremum row. Ordering key event_id is
    unique, so the result is deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


@register(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS INTEGER) AS bucket,
           count(*) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a plain group-by on a computed bucket
    (floor of an IEEE double division — bit-identical across engines).
    At 100 TB this is the one-pass map-side-combinable way to build a
    distribution; no sort, no per-row UDF.
    """
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50.0).cast("int").alias("bucket")
    return events.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@register(
    "q_agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping_id: the bitmask that disambiguates 'NULL
    because subtotal' from 'NULL in the data' — required by any
    downstream consumer of multi-level aggregates.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_stringagg",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
               AS statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_set → array_sort →
    concat_ws. The explicit sort makes the concatenation
    deterministic regardless of shuffle arrival order — unordered
    listagg output is nondeterministic on any real cluster.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_set("l_linestatus"))
        ).alias("statuses")
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregation (every/any) + FILTERed count — one
    hash-agg pass, partial-aggregable like any other agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
    )


@register(
    "q_agg_mode",
    oracle="""
    WITH c AS (SELECT user_id % 10 AS cohort, event_type, count(*) AS n
               FROM events GROUP BY 1, 2)
    SELECT cohort, event_type AS mode_event, n
    FROM (SELECT *,
                 row_number() OVER (PARTITION BY cohort
                                    ORDER BY n DESC, event_type) AS rn
          FROM c)
    WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value, lowest-value
    tiebreak) per group. Built from count + WindowGroupLimit rather
    than the builtin `mode()` so tie semantics are explicit and
    identical in both engines (builtin mode breaks ties
    engine-arbitrarily). The count pass is partial-aggregable; the
    window runs on the already-tiny count table.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        (F.col("user_id") % 10).alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("cohort").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cohort", F.col("event_type").alias("mode_event"), "n")
    )


@register(
    "q_agg_moments",
    oracle="""
    WITH s AS (SELECT l_returnflag,
                      count(*) AS n,
                      sum(l_quantity) AS s1,
                      sum(l_quantity * l_quantity) AS s2,
                      sum(l_quantity * l_quantity * l_quantity) AS s3
               FROM lineitem GROUP BY 1)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           round(s1 / n, 4) AS mean_qty,
           round(s2 / n - (s1 / n) * (s1 / n), 4) + 0.0 AS var_qty,
           round((s3 / n - 3 * (s1 / n) * (s2 / n)
                  + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) + 0.0
               AS skew_qty
    FROM s
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance + skewness from one-pass power sums
    (n, Σx, Σx², Σx³) — the mergeable-moments pattern: each mapper
    emits four numbers per group, so the shuffle is O(groups)
    regardless of row count. Derived with the SAME algebra in both
    engines (builtin skewness/kurtosis differ between engines on
    bias correction, so they can never hash-match). The oracle adds
    `+ 0.0` after rounding: DuckDB's round preserves IEEE -0.0 (a
    tiny negative skew rounds to "-0.0") while Spark's
    BigDecimal-based round returns +0.0 — the addition normalizes
    the sign without changing any other value.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = F.col("s3") / F.col("n") - 3 * mean * (F.col("s2") / F.col("n")) \
        + 2 * mean * mean * mean
    return s.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.round(mean, 4).alias("mean_qty"),
        F.round(m2, 4).alias("var_qty"),
        F.round(m3 / F.pow(m2, 1.5), 4).alias("skew_qty"),
    )


@register("q_agg_sketch_merge")  # rows-only: HLL sketch ≠ exact oracle
def q_agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch re-aggregation: per-day HLL sketches of
    distinct users, then a union-merge to the month estimate WITHOUT
    re-scanning the raw data. This is the 100 TB distinct-count
    architecture — materialize small daily sketches (bytes per group),
    merge them at query time; an exact countDistinct would shuffle
    every user_id again. (Datasketches HLL: hll_sketch_agg /
    hll_union_agg, mergeability is the point.)
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )


@register(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS BIGINT)
               AS n_buyers
    FROM events
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable roaring-style bitmaps
    (bitmap_construct_agg / bitmap_or_agg / bitmap_count): per-day
    per-bucket bitmaps are built map-side, OR-merged across days,
    and popcounted — the exact-count sibling of q_agg_sketch_merge.
    Unlike HLL this IS oracle-checkable, and at 100 TB the daily
    bitmaps are materializable increments: yesterday's corpus never
    re-shuffles, only bitmap bytes merge. Shuffle is O(days x
    buckets), with each bucket covering 2^15 ids.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position("user_id")
        ).alias("bm_all"),
        F.bitmap_construct_agg(
            F.when(
                F.col("event_type") == "purchase",
                F.bitmap_bit_position("user_id"),
            )
        ).alias("bm_buy"),
    )
    merged = daily.groupBy("bucket").agg(
        F.bitmap_or_agg("bm_all").alias("bm_all"),
        F.bitmap_or_agg("bm_buy").alias("bm_buy"),
    )
    return merged.agg(
        F.sum(F.bitmap_count("bm_all")).alias("n_users"),
        F.sum(F.bitmap_count("bm_buy")).alias("n_buyers"),
    )


@register(
    "q_agg_salted_twophase",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 100, 4)
               AS sum_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
)
def q_agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the groupBy-side skew answer
    (complementing join-side salting in joins.salted_join and AQE's
    skew-JOIN splitting, which does not apply to aggregations): rows
    first aggregate on (key, salt) so a hot key's traffic spreads
    over N_SALTS reducers, then the per-salt partials re-aggregate on
    the key alone. Works because count/sum/max are commutative
    monoids — phase 2 combines partials exactly like Spark's own
    partial_agg, so the result is bit-identical to the plain groupBy
    (which is what the oracle checks). The second shuffle moves only
    |keys|·N_SALTS partial rows. With 5 event_type values over 100k+
    events, every key is 'hot' relative to a single reducer — the
    pattern under test is exactly what a power-law key distribution
    needs at 100 TB.
    """
    N_SALTS = 8
    events = load_table(spark, sf_dir, "events")
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS))
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    phase1 = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(cents).alias("psum"),
        F.max("value").alias("pmax"),
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("psum").cast("double") / 100, 4).alias("sum_value"),
        F.round(F.max("pmax"), 6).alias("max_value"),
    )


CMS_DEPTH = 4
CMS_WIDTH = 64


@register("q_agg_countmin_eval")  # rows-only: xxhash sketch ≠ SQL oracle
def q_agg_countmin_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the token stream with a MEASURED error
    certificate (the q_dedup_lsh_eval pattern: approximate tier +
    quantified trust, not asserted trust). The sketch is
    CMS_DEPTH × CMS_WIDTH counters (each row hashes into one cell
    per depth via seeded xxhash64); a point estimate is the MIN of a
    term's cells. The eval probes the 20 heaviest exact terms and
    reports the overestimate profile — CMS can only overestimate
    (one-sided error, pytest-pinned), and the expected excess is
    ~n_tokens/width per depth, min-ed across depths.

    Scale: the sketch aggregate is partial-aggregable into a FIXED
    256-cell table regardless of volume (the whole point: a mergeable
    sub-linear summary — per-partition sketches combine by cell-wise
    sum), and the probe join broadcasts 20 rows. The exact side here
    exists only to measure the sketch; production keeps the sketch
    and drops the exact pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    exact = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(20)
    )

    def cell(term: F.Column, d: int) -> F.Column:
        return F.pmod(
            F.xxhash64(F.concat(F.lit(f"d{d}:"), term)), F.lit(CMS_WIDTH)
        )

    sketch = None
    for d in range(CMS_DEPTH):
        part = toks.groupBy(cell(F.col("term"), d).alias("cell")).agg(
            F.count(F.lit(1)).alias("n")
        ).select(F.lit(d).alias("d"), "cell", "n")
        sketch = part if sketch is None else sketch.unionByName(part)

    probes = exact
    for d in range(CMS_DEPTH):
        probes = probes.withColumn(f"c{d}", cell(F.col("term"), d))
    est = probes
    for d in range(CMS_DEPTH):
        sk_d = sketch.where(F.col("d") == d).select(
            F.col("cell").alias(f"c{d}"), F.col("n").alias(f"n{d}")
        )
        est = est.join(F.broadcast(sk_d), f"c{d}")
    est_col = F.least(*[F.col(f"n{d}") for d in range(CMS_DEPTH)])
    rel = (est_col - F.col("cnt")) / F.col("cnt")
    return est.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.count(F.when(est_col < F.col("cnt"), 1)).alias("n_underestimates"),
        F.round(F.max(rel), 4).alias("max_rel_err"),
        F.round(F.avg(rel), 4).alias("avg_rel_err"),
    )


@register(
    "q_agg_regression",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, x) AS BIGINT) AS n,
           round(regr_slope(value, x), 6) AS slope_per_day,
           round(regr_intercept(value, x), 6) AS intercept,
           round(regr_r2(value, x), 6) AS r2
    FROM (
        SELECT event_type, value,
               (epoch_us(ts) - 1704067200000000) / 86400000000.0 AS x
        FROM events
    )
    GROUP BY event_type
    """,
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group linear regression with the SQL-standard `regr_*`
    aggregates: slope/intercept/R² of event value against time, one
    hash-agg, entirely JVM-side. These are one-pass partial-
    aggregable statistics (co-moment accumulators merge
    associatively), so at 100 TB each mapper emits a constant-size
    state per group — the textbook map-side-combine shape, with none
    of the window machinery q_win_moving_regression needs for its
    per-row trailing variant. x is integer-microsecond exact divided
    once into days (the engine's cross-engine timestamp rule).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (
            (F.unix_micros("ts") - F.lit(1704067200000000))
            / 86400000000.0
        ).alias("x"),
    )
    return ev.groupBy("event_type").agg(
        F.regr_count("value", "x").cast("bigint").alias("n"),
        F.round(F.regr_slope("value", "x"), 6).alias("slope_per_day"),
        F.round(F.regr_intercept("value", "x"), 6).alias("intercept"),
        F.round(F.regr_r2("value", "x"), 6).alias("r2"),
    )


@register(
    "q_agg_weighted_median",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag AS rf, l_extendedprice AS p,
               sum(l_quantity) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT rf, p, q,
               sum(q) OVER (PARTITION BY rf ORDER BY p) AS cum,
               sum(q) OVER (PARTITION BY rf) AS tot
        FROM agg
    )
    SELECT rf AS l_returnflag,
           round(min(CASE WHEN cum >= tot / 2 THEN p END), 2)
               AS w_median_price,
           round(sum(q), 2) AS total_qty
    FROM c GROUP BY rf
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the smallest price whose cumulative quantity
    weight reaches half the group's total — the inventory-valuation
    statistic `percentile(col)` can't express (every unit of
    quantity votes, not every row). Computed with O(1) window state:
    pre-aggregate to distinct (group, price) so the cumulative sum's
    order is total and engine-deterministic, one cumulative + one
    total window over the SAME partition ordering (single sort), and
    a conditional min — no per-group value buffering, unlike Spark's
    exact percentile aggregate (the engine's rank-interpolation rule,
    weighted form).

    Scale: the pre-aggregate collapses 100 TB of line items to
    |group × distinct price| rows before any window runs; the window
    partitions by group, so state is one running double per group.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_extendedprice").alias("p"),
        "l_quantity",
    )
    agg = li.groupBy("rf", "p").agg(F.sum("l_quantity").alias("q"))
    wc = W.partitionBy("rf").orderBy("p")
    c = agg.select(
        "rf",
        "p",
        "q",
        F.sum("q").over(wc).alias("cum"),
        F.sum("q").over(W.partitionBy("rf")).alias("tot"),
    )
    return c.groupBy(F.col("rf").alias("l_returnflag")).agg(
        F.round(
            F.min(F.when(F.col("cum") >= F.col("tot") / 2, F.col("p"))), 2
        ).alias("w_median_price"),
        F.round(F.sum("q"), 2).alias("total_qty"),
    )


@register(
    "q_agg_largest_remainder",
    oracle="""
    WITH counts AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    shares AS (
        SELECT source, n_docs,
               CAST(1000 AS DOUBLE) * n_docs
                   / (SELECT sum(n_docs) FROM counts) AS q
        FROM counts
    ),
    based AS (
        SELECT source, n_docs,
               CAST(floor(q) AS BIGINT) AS base,
               q - floor(q) AS rem
        FROM shares
    ),
    ranked AS (
        SELECT s.source,
               any_value(s.n_docs) AS n_docs,
               any_value(s.base) AS base,
               count(o.source) AS n_ahead
        FROM based s LEFT JOIN based o
          ON o.rem > s.rem OR (o.rem = s.rem AND o.source < s.source)
        GROUP BY s.source
    )
    SELECT source, n_docs,
           base + CASE WHEN n_ahead <
                       1000 - (SELECT sum(base) FROM based)
                  THEN 1 ELSE 0 END AS alloc
    FROM ranked
    """,
)
def q_agg_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional quota allocation with largest-remainder rounding
    (Hamilton's method): split a fixed budget of 1000 sample slots
    across document sources proportionally to their doc counts, with
    floor allocations first and the leftover slots going to the
    largest fractional remainders (ties broken by source name). The
    allocations always sum exactly to the budget — what naive
    per-group round() cannot guarantee — which is the property a
    corpus-mixing planner needs before drawing the per-source
    samples (q_sample_stratified consumes quotas like these).

    Scale shape: ONE map-side-combinable count over the corpus; all
    remaining steps run on the |sources|-row aggregate, where the
    remainder ranking is a window-free O(S^2) self-join on the tiny
    aggregate and the two scalar totals are 1-row broadcast
    subtrees. Nothing global touches full-corpus rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("t"))
    based = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("q", F.lit(1000).cast("double") * F.col("n_docs") / F.col("t"))
        .select(
            "source",
            "n_docs",
            F.floor("q").cast("bigint").alias("base"),
            (F.col("q") - F.floor("q")).alias("rem"),
        )
    )
    leftover = based.agg((F.lit(1000) - F.sum("base")).alias("leftover"))
    s, o = based.alias("s"), based.alias("o")
    ranked = (
        s.join(
            o,
            (F.col("o.rem") > F.col("s.rem"))
            | ((F.col("o.rem") == F.col("s.rem"))
               & (F.col("o.source") < F.col("s.source"))),
            "left",
        )
        .groupBy(F.col("s.source").alias("source"))
        .agg(
            F.any_value(F.col("s.n_docs")).alias("n_docs"),
            F.any_value(F.col("s.base")).alias("base"),
            F.count(F.col("o.source")).alias("n_ahead"),
        )
    )
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "source",
        "n_docs",
        (
            F.col("base")
            + F.when(F.col("n_ahead") < F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    )


@register(
    "q_agg_hhi",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey AS nationkey, l.l_suppkey,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS r
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT nationkey, sum(r) AS t FROM rev GROUP BY 1)
    SELECT n.n_name AS nation,
           round(sum((rev.r / tot.t) * (rev.r / tot.t)), 6) AS hhi,
           count(*) AS n_suppliers
    FROM rev JOIN tot ON tot.nationkey = rev.nationkey
    JOIN nation n ON n.n_nationkey = rev.nationkey
    GROUP BY n.n_name
    """,
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per nation: the sum
    of squared supplier revenue shares — 1/n for perfectly even
    markets, →1 when one supplier dominates. The single-number
    concentration summary that complements q_dq_skew's distribution
    profile and q_events_pareto's decile view, and the same math a
    corpus planner uses for domain-concentration checks.

    Scale: the fact table reduces to O(nations × suppliers) in one
    map-side-combinable pass; nation totals are a second tiny
    aggregate joined back on nationkey (broadcastable), and the
    share-square sum is again partial-aggregable. No windows, no
    driver math.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nationkey"), "l_suppkey"
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("r")
        )
    )
    tot = rev.groupBy("nationkey").agg(F.sum("r").alias("t"))
    share = F.col("r") / F.col("t")
    return (
        rev.join(F.broadcast(tot), "nationkey")
        .join(F.broadcast(nat), F.col("nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(share * share), 6).alias("hhi"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@register(
    "q_agg_winsorized",
    oracle="""
    WITH pct AS (
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.05) AS p05,
               quantile_cont(l_quantity, 0.95) AS p95
        FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           round(avg(greatest(least(l.l_quantity, p.p95), p.p05)), 4)
               AS winsorized_mean,
           round(avg(l.l_quantity), 4) AS raw_mean,
           count(*) AS n
    FROM lineitem l JOIN pct p ON p.l_returnflag = l.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def q_agg_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per return flag: clip values at the group's
    5th/95th percentile before averaging — the outlier-robust
    center estimate (next to q_agg_weighted_median and
    q_ts_theil_sen in the robust-statistics family) that a metrics
    layer reports when a handful of fat-finger values would drag the
    raw mean.

    The percentiles use the SAME rank-interpolation pattern as
    q_agg_percentile (row_number + count per partition, lerp between
    the floor/ceil ranks) — O(1) aggregation state, never the exact
    `percentile` aggregate whose buffer holds every group value —
    and come back as one row per flag, broadcast-joined to the fact
    rows for the clip+avg pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ws = W.partitionBy("l_returnflag").orderBy("l_quantity")
    wn = W.partitionBy("l_returnflag")
    ranked = li.where(F.col("l_quantity").isNotNull()).select(
        "l_returnflag",
        F.col("l_quantity").alias("v"),
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def lerp(p: float, nm: str):
        h = 1 + (F.col("n") - 1) * F.lit(p)
        lo = F.floor(h)
        vlo = F.max(F.when(F.col("rn") == lo, F.col("v")))
        vhi = F.max(F.when(F.col("rn") == lo + 1, F.col("v")))
        hh = 1 + (F.max("n") - 1) * F.lit(p)
        frac = hh - F.floor(hh)
        return (vlo + frac * (F.coalesce(vhi, vlo) - vlo)).alias(nm)

    pct = ranked.groupBy("l_returnflag").agg(
        lerp(0.05, "p05"), lerp(0.95, "p95")
    )
    clipped = F.greatest(
        F.least(F.col("l_quantity"), F.col("p95")), F.col("p05")
    )
    return (
        li.join(F.broadcast(pct), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
            F.round(F.avg("l_quantity"), 4).alias("raw_mean"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q_agg_anova",
    oracle="""
    WITH g AS (
        SELECT o_orderpriority, count(*) AS n, avg(o_totalprice) AS m
        FROM orders GROUP BY o_orderpriority
    ),
    tot AS (
        SELECT avg(o_totalprice) AS gm, count(*) AS nt FROM orders
    ),
    ssb AS (
        SELECT sum(n * (m - tot.gm) * (m - tot.gm)) AS v,
               count(*) AS k
        FROM g CROSS JOIN tot
    ),
    ssw AS (
        SELECT sum((o.o_totalprice - g.m) * (o.o_totalprice - g.m))
            AS v
        FROM orders o JOIN g ON g.o_orderpriority = o.o_orderpriority
    )
    SELECT CAST(ssb.k AS BIGINT) AS n_groups,
           round(ssb.v / 1e6, 4) AS ss_between_m,
           round(ssw.v / 1e6, 4) AS ss_within_m,
           round((ssb.v / (ssb.k - 1))
                 / (ssw.v / (tot.nt - ssb.k)), 6) AS f_stat
    FROM ssb CROSS JOIN ssw CROSS JOIN tot
    """,
)
def q_agg_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order totals across priorities: between- vs
    within-group sum of squares and the F statistic — the "does this
    dimension actually explain the metric" test that belongs next to
    q_events_ab_test's two-group z-test when there are k groups
    (F ≈ 1 here tells the analyst priority does NOT drive spend on
    this corpus, which is itself the finding).

    Scale: group means are one map-side-combinable pass; SSW is a
    second pass joining each row to its (broadcast, k-row) group
    mean; SSB and the F assembly run on k-row aggregates with 1-row
    broadcast totals. Two fact scans total, no windows.
    """
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.avg("o_totalprice").alias("m")
    )
    tot = orders.agg(
        F.avg("o_totalprice").alias("gm"), F.count(F.lit(1)).alias("nt")
    )
    ssb = (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n")
                * (F.col("m") - F.col("gm"))
                * (F.col("m") - F.col("gm"))
            ).alias("bv"),
            F.count(F.lit(1)).alias("k"),
            F.any_value("nt").alias("nt"),
        )
    )
    ssw = (
        orders.join(F.broadcast(g), "o_orderpriority")
        .agg(
            F.sum(
                (F.col("o_totalprice") - F.col("m"))
                * (F.col("o_totalprice") - F.col("m"))
            ).alias("wv")
        )
    )
    return ssb.crossJoin(F.broadcast(ssw)).select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.round(F.col("bv") / F.lit(1e6), 4).alias("ss_between_m"),
        F.round(F.col("wv") / F.lit(1e6), 4).alias("ss_within_m"),
        F.round(
            (F.col("bv") / (F.col("k") - 1))
            / (F.col("wv") / (F.col("nt") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@register(
    "q_agg_hll_md5",
    oracle="""
    WITH h AS (
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                    AS BIGINT) AS bucket,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 8))
                    AS BIGINT) AS w
        FROM events
    ),
    regs AS (
        SELECT bucket,
               max(CASE WHEN w = 0 THEN 33
                        ELSE 33 - length(bin(w)) END) AS rho
        FROM h GROUP BY bucket
    ),
    s AS (
        SELECT count(*) AS used,
               sum(pow(2.0, -rho)) AS present_sum
        FROM regs
    ),
    ex AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events),
    est AS (
        SELECT used,
               CASE WHEN CAST(0.7182725932495458 AS DOUBLE) * 256 * 256
                         / (present_sum + (256 - used)) <= 2.5 * 256
                         AND used < 256
                    THEN 256 * ln(CAST(256 AS DOUBLE) / (256 - used))
                    ELSE CAST(0.7182725932495458 AS DOUBLE) * 256 * 256
                         / (present_sum + (256 - used))
               END AS e
        FROM s
    )
    SELECT 256 AS m,
           used AS n_registers_used,
           round(e, 4) AS hll_estimate,
           exact_distinct,
           round((e - exact_distinct) / exact_distinct, 6) AS rel_err
    FROM est, ex
    """,
)
def q_agg_hll_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-CERTIFIED HyperLogLog: a from-scratch HLL (Flajolet et
    al. 2007) built on the engine-portable md5 hash, so — unlike
    `q_agg_approx_distinct`, whose xxhash64 sketch only DuckDB can't
    reproduce and which is therefore rows-only-graded — every
    register value, the raw estimate, and the relative error are
    bit-identical across engines and hash-compared by the driver.
    Register layout: bucket = first 8 hash bits (m=256), rho = count
    of leading zeros in the next 32 bits + 1 (computed portably as
    33 - length(bin(w)), both engines agreeing bin() drops leading
    zeros), register = max rho per bucket, estimate = alpha_256 * m^2
    / (sum 2^-rho + one unit per empty register), with the standard
    small-range correction (Flajolet 2007 §4): raw estimate <= 2.5m
    with empty registers remaining switches to linear counting
    m*ln(m/V) over the V empty registers — without it a 15-distinct
    input reads as ~190. The 2^-rho sum is
    EXACT in double arithmetic (≤256 terms on a 2^-33 grid spans 41
    mantissa bits), so parallel aggregation order cannot perturb it —
    that is what makes a floating-point sketch certifiable at all;
    the small-range ln() rounds to 4 decimals, far above any
    cross-engine libm ulp wobble.

    Scale: the map side collapses each partition to ≤256 (bucket,
    max-rho) rows before the shuffle — the same partial-aggregation
    shape as count(distinct) without its exact-dedup state. This is
    the mergeable-sketch contract: per-partition registers combine by
    elementwise max, the estimate is computed once at the end (the
    distributed pattern q_agg_sketch_merge demonstrates with
    library sketches, here with provable cross-engine parity). The
    exact count alongside is the certificate, affordable at bench SF
    and dropped at 100 TB.
    """
    hexid = F.md5(F.col("user_id").cast("string"))
    w = F.conv(F.substring(hexid, 3, 8), 16, 10).cast("bigint")
    h = load_table(spark, sf_dir, "events").select(
        F.conv(F.substring(hexid, 1, 2), 16, 10)
        .cast("bigint")
        .alias("bucket"),
        w.alias("w"),
        "user_id",
    )
    regs = h.groupBy("bucket").agg(
        F.max(
            F.when(F.col("w") == 0, 33).otherwise(
                33 - F.length(F.bin("w"))
            )
        ).alias("rho")
    )
    s = regs.agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("present_sum"),
    )
    ex = h.agg(F.countDistinct("user_id").alias("exact_distinct"))
    raw = (
        F.lit(0.7182725932495458)
        * 256
        * 256
        / (F.col("present_sum") + (256 - F.col("used")))
    )
    est = F.when(
        (raw <= 2.5 * 256) & (F.col("used") < 256),
        256 * F.log(F.lit(256.0) / (256 - F.col("used"))),
    ).otherwise(raw)
    return (
        s.crossJoin(F.broadcast(ex))
        .select(
            F.lit(256).alias("m"),
            F.col("used").alias("n_registers_used"),
            F.round(est, 4).alias("hll_estimate"),
            "exact_distinct",
            F.round(
                (est - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
    )


CMSX_DEPTH = 4
CMSX_WIDTH = 1024


@register(
    "q_agg_cms_md5",
    oracle=f"""
    WITH toks AS (
        SELECT lower(term) AS term
        FROM (SELECT unnest(string_split(text, ' ')) AS term
              FROM documents)
        WHERE term <> ''
    ),
    exact AS (
        SELECT term, count(*) AS exact_cnt
        FROM toks GROUP BY term
        ORDER BY exact_cnt DESC, term LIMIT 20
    ),
    depths AS (SELECT unnest(generate_series(0, {CMSX_DEPTH - 1})) AS d),
    cells AS (
        SELECT d, CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':'
                                       || term), 1, 8)) AS BIGINT)
                  % {CMSX_WIDTH} AS cell,
               count(*) AS n
        FROM toks, depths
        GROUP BY 1, 2
    ),
    est AS (
        SELECT e.term, e.exact_cnt, min(c.n) AS cms_est
        FROM exact e
        CROSS JOIN depths d
        JOIN cells c
          ON c.d = d.d
         AND c.cell = CAST(('0x' || substr(md5(CAST(d.d AS VARCHAR)
                           || ':' || e.term), 1, 8)) AS BIGINT)
                      % {CMSX_WIDTH}
        GROUP BY 1, 2
    )
    SELECT term, exact_cnt, cms_est,
           cms_est - exact_cnt AS overestimate
    FROM est
    """,
)
def q_agg_cms_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-CERTIFIED Count-Min sketch (Cormode & Muthukrishnan
    2005) — the engine-portable md5 twin of `q_agg_countmin_eval`,
    whose xxhash64 cells only Spark can compute and which is
    therefore rows-only-graded. Here every counter cell, every probe
    estimate, and the per-term overestimate are integers DuckDB
    reproduces bit-exactly, so the driver hash-compares the whole
    sketch evaluation (the same certification upgrade q_agg_hll_md5
    made for HyperLogLog). Layout: CMSX_DEPTH x CMSX_WIDTH counters,
    row d hashes a term to cell = first-32-md5-bits('d:term') mod
    width; a point estimate is the MIN of the term's d cells; the
    probe set is the 20 heaviest exact terms (ties broken by term so
    the probe list itself is deterministic). The certificate is the
    `overestimate` column: CMS error is one-sided (min of counters
    that each include the true count), so every value is provably
    >= 0 — pytest-pinned, and the magnitudes are the measured
    epsilon*N excess the width was sized for.

    Scale: the sketch aggregate collapses each partition to at most
    depth x width = 4096 cells before the shuffle (mergeable by
    cell-wise sum — the entire point of a CMS at 100 TB: fixed-size
    state regardless of volume, no exact-dedup memory); the depth
    fan-out is a map-side explode of 4 constants, and the probe join
    broadcasts 20 x 4 = 80 rows against the 4096-cell sketch. The
    exact side exists only to measure the sketch and is dropped in
    production.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.col("text"), " ")).alias("raw")
        )
        .where(F.col("raw") != "")
        .select(F.lower(F.col("raw")).alias("term"))
    )

    def cell(term: F.Column, d: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(d.cast("string"), F.lit(":"), term)
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % CMSX_WIDTH
        )

    depths = F.array(*[F.lit(d) for d in range(CMSX_DEPTH)])
    sketch = (
        toks.select("term", F.explode(depths).alias("d"))
        .groupBy("d", cell(F.col("term"), F.col("d")).alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exact = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "term")
        .limit(20)
    )
    probes = exact.select(
        "term", "exact_cnt", F.explode(depths).alias("d")
    ).select(
        "term",
        "exact_cnt",
        "d",
        cell(F.col("term"), F.col("d")).alias("cell"),
    )
    return (
        sketch.join(F.broadcast(probes), ["d", "cell"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("n").alias("cms_est"))
        .select(
            "term",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
    )


@register(
    "q_agg_hll_merge",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                    AS BIGINT) AS bucket,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 8))
                    AS BIGINT) AS w
        FROM events
    ),
    shard_regs AS (
        SELECT event_type, bucket,
               max(CASE WHEN w = 0 THEN 33
                        ELSE 33 - length(bin(w)) END) AS rho
        FROM h GROUP BY 1, 2
    ),
    merged AS (
        SELECT bucket, max(rho) AS rho FROM shard_regs GROUP BY 1
    ),
    globl AS (
        SELECT bucket,
               max(CASE WHEN w = 0 THEN 33
                        ELSE 33 - length(bin(w)) END) AS rho
        FROM h GROUP BY 1
    ),
    cmp AS (
        SELECT count(*) AS n_registers,
               sum(CASE WHEN m.rho IS DISTINCT FROM g.rho
                        THEN 1 ELSE 0 END) AS n_register_diffs
        FROM globl g FULL JOIN merged m USING (bucket)
    ),
    est AS (
        SELECT sum(pow(2.0, -rho)) AS ps, count(*) AS used FROM merged
    ),
    shards AS (SELECT count(DISTINCT event_type) AS n_shards FROM h)
    SELECT n_shards, n_registers,
           CAST(n_register_diffs AS BIGINT) AS n_register_diffs,
           round(CASE WHEN CAST(0.7182725932495458 AS DOUBLE) * 256 * 256
                           / (ps + (256 - used)) <= 2.5 * 256
                           AND used < 256
                      THEN 256 * ln(CAST(256 AS DOUBLE) / (256 - used))
                      ELSE CAST(0.7182725932495458 AS DOUBLE) * 256 * 256
                           / (ps + (256 - used))
                 END, 4) AS hll_estimate_merged
    FROM cmp, est, shards
    """,
)
def q_agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE contract of `q_agg_hll_md5`, proven rather than
    assumed: per-shard HLL registers (sharded by event_type, a
    stand-in for per-partition or per-day partial sketches) combined
    by element-wise max must equal the registers built in one global
    pass — max is associative and commutative, so a 1000-executor
    cluster can sketch shards independently, ship 256 bytes each,
    and merge losslessly. `n_register_diffs` MEASURES that equality
    register-by-register (provably 0, full-join so a bucket present
    on either side alone also counts as a diff), and the estimate is
    recomputed from the MERGED registers, hash-compared cross-engine
    like the parent op. This is what separates HLL from e.g. a naive
    distinct-sample: the merge loses nothing, at any split.

    Scale: shard_regs is map-side combinable to (shards x 256) rows;
    the merge is a second 256-group max; the comparison joins two
    256-row sides. Nothing here grows with data volume except the
    first scan.
    """
    hexid = F.md5(F.col("user_id").cast("string"))
    h = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.conv(F.substring(hexid, 1, 2), 16, 10)
        .cast("bigint")
        .alias("bucket"),
        F.conv(F.substring(hexid, 3, 8), 16, 10)
        .cast("bigint")
        .alias("w"),
    )
    rho = F.max(
        F.when(F.col("w") == 0, 33).otherwise(
            33 - F.length(F.bin("w"))
        )
    ).alias("rho")
    shard_regs = h.groupBy("event_type", "bucket").agg(rho)
    merged = shard_regs.groupBy("bucket").agg(
        F.max("rho").alias("rho")
    )
    globl = h.groupBy("bucket").agg(rho)
    cmp = (
        globl.withColumnRenamed("rho", "g_rho")
        .join(
            merged.withColumnRenamed("rho", "m_rho"),
            "bucket",
            "full",
        )
        .agg(
            F.count(F.lit(1)).alias("n_registers"),
            F.sum(
                F.when(
                    ~F.col("g_rho").eqNullSafe(F.col("m_rho")), 1
                ).otherwise(0)
            ).alias("n_register_diffs"),
        )
    )
    est = merged.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("ps"),
        F.count(F.lit(1)).alias("used"),
    )
    shards = h.agg(
        F.countDistinct("event_type").alias("n_shards")
    )
    raw = (
        F.lit(0.7182725932495458)
        * 256
        * 256
        / (F.col("ps") + (256 - F.col("used")))
    )
    e = F.when(
        (raw <= 2.5 * 256) & (F.col("used") < 256),
        256 * F.log(F.lit(256.0) / (256 - F.col("used"))),
    ).otherwise(raw)
    return (
        cmp.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(shards))
        .select(
            "n_shards",
            "n_registers",
            "n_register_diffs",
            F.round(e, 4).alias("hll_estimate_merged"),
        )
    )


@register(
    "q_agg_hll_intersect",
    oracle="""
    WITH h AS (
        SELECT user_id, event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                    AS BIGINT) AS bucket,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 8))
                    AS BIGINT) AS w
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    regs AS (
        SELECT event_type, bucket,
               max(CASE WHEN w = 0 THEN 33
                        ELSE 33 - length(bin(w)) END) AS rho
        FROM h GROUP BY 1, 2
    ),
    union_regs AS (
        SELECT bucket, max(rho) AS rho FROM regs GROUP BY 1
    ),
    est AS (
        SELECT 'click' AS side, count(*) AS used,
               sum(pow(2.0, -rho)) AS ps
        FROM regs WHERE event_type = 'click'
        UNION ALL
        SELECT 'purchase', count(*), sum(pow(2.0, -rho))
        FROM regs WHERE event_type = 'purchase'
        UNION ALL
        SELECT 'union', count(*), sum(pow(2.0, -rho)) FROM union_regs
    ),
    e AS (
        SELECT side,
               CASE WHEN CAST(0.7182725932495458 AS DOUBLE) * 256 * 256
                         / (ps + (256 - used)) <= 2.5 * 256
                         AND used < 256
                    THEN 256 * ln(CAST(256 AS DOUBLE) / (256 - used))
                    ELSE CAST(0.7182725932495458 AS DOUBLE) * 256 * 256
                         / (ps + (256 - used))
               END AS v
        FROM est
    ),
    wide AS (
        SELECT max(CASE WHEN side = 'click' THEN v END) AS ea,
               max(CASE WHEN side = 'purchase' THEN v END) AS eb,
               max(CASE WHEN side = 'union' THEN v END) AS eu
        FROM e
    ),
    ex AS (
        SELECT count(*) AS exact_intersect FROM (
            SELECT user_id FROM h GROUP BY user_id
            HAVING count(DISTINCT event_type) = 2
        )
    )
    SELECT round(ea, 4) AS est_clickers,
           round(eb, 4) AS est_purchasers,
           round(eu, 4) AS est_union,
           round(ea + eb - eu, 4) AS est_intersect,
           exact_intersect,
           round((ea + eb - eu - exact_intersect)
                 / exact_intersect, 6) AS rel_err
    FROM wide, ex
    """,
)
def q_agg_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA on the md5 HLL: audience-overlap cardinality
    (users who both click AND purchase) by inclusion-exclusion —
    |A∩B| = |A| + |B| - |A∪B| — where |A∪B| comes from the
    element-wise-max register merge `q_agg_hll_merge` proved
    lossless. This is the query behind every audience-overlap /
    cross-feature-reach dashboard at 100 TB: materialize one 256-byte
    sketch per segment ONCE, then answer any pairwise (or k-way, by
    iterated merge) overlap in O(m) register arithmetic with zero
    re-scans. The exact intersection runs alongside as the
    certificate; rel_err documents the known weakness — inclusion-
    exclusion differences amplify relative error when the overlap is
    small relative to the union (the reason production systems keep
    theta sketches for heavy set algebra; the pytest bounds the error
    at the textbook 3-sigma of the UNION's standard error scaled by
    union/intersect, not the intersect's own).

    Scale: one scan builds both per-segment register sets
    (map-side-combinable max over at most 2x256 cells); union is a
    256-row max-merge; every estimate is O(m) arithmetic on the
    driver-sized result. Only the certificate's exact distinct pass
    touches the fact twice, and it is dropped in production.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    hexid = F.md5(F.col("user_id").cast("string"))
    h = ev.select(
        "user_id",
        "event_type",
        F.conv(F.substring(hexid, 1, 2), 16, 10)
        .cast("bigint")
        .alias("bucket"),
        F.conv(F.substring(hexid, 3, 8), 16, 10)
        .cast("bigint")
        .alias("w"),
    )
    rho_expr = F.max(
        F.when(F.col("w") == 0, 33).otherwise(
            33 - F.length(F.bin("w"))
        )
    ).alias("rho")
    regs = h.groupBy("event_type", "bucket").agg(rho_expr)
    union_regs = regs.groupBy("bucket").agg(F.max("rho").alias("rho"))

    def est(df: DataFrame) -> F.Column:
        return df.agg(
            F.count(F.lit(1)).alias("used"),
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("ps"),
        )

    def raw_to_e(used: F.Column, ps: F.Column) -> F.Column:
        raw = (
            F.lit(0.7182725932495458) * 256 * 256 / (ps + (256 - used))
        )
        return F.when(
            (raw <= 2.5 * 256) & (used < 256),
            256 * F.log(F.lit(256.0) / (256 - used)),
        ).otherwise(raw)

    ea = est(regs.filter(F.col("event_type") == "click")).select(
        raw_to_e(F.col("used"), F.col("ps")).alias("ea")
    )
    eb = est(regs.filter(F.col("event_type") == "purchase")).select(
        raw_to_e(F.col("used"), F.col("ps")).alias("eb")
    )
    eu = est(union_regs).select(
        raw_to_e(F.col("used"), F.col("ps")).alias("eu")
    )
    ex = (
        h.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    inter = F.col("ea") + F.col("eb") - F.col("eu")
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(ex))
        .select(
            F.round("ea", 4).alias("est_clickers"),
            F.round("eb", 4).alias("est_purchasers"),
            F.round("eu", 4).alias("est_union"),
            F.round(inter, 4).alias("est_intersect"),
            "exact_intersect",
            F.round(
                (inter - F.col("exact_intersect"))
                / F.col("exact_intersect"),
                6,
            ).alias("rel_err"),
        )
    )


@register(
    "q_agg_corr_matrix",
    oracle="""
    WITH m AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS spd
        FROM lineitem
    )
    SELECT n,
           round((n * sqp - sq * sp)
                 / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6)
               AS corr_qty_price,
           round((n * sqd - sq * sd)
                 / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd)), 6)
               AS corr_qty_disc,
           round((n * spd - sp * sd)
                 / sqrt((n * spp - sp * sp) * (n * sdd - sd * sd)), 6)
               AS corr_price_disc
    FROM m
    """,
)
def q_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem numeric
    measures — the feature-redundancy screen every modeling pipeline
    runs before training. The determinism technique is the point:
    the engines' streaming `corr` aggregates merge partials in
    nondeterministic order (flaky last-ulp results under different
    partitionings), and plain double sums of squared prices exceed
    2^53 already at sf 0.01 — so the ten raw moments accumulate as
    DECIMAL (exact 128-bit integer arithmetic in BOTH engines, any
    merge order), are converted to double ONCE, and the closed-form
    corr arithmetic runs in a fixed operation order. The same
    discipline as q_sample_neyman's integer sums, extended to
    cent-scaled money via decimal.

    Scale: one map-side-combinable pass producing ten numbers total;
    the matrix assembles driver-side. Decimal aggregation is
    Tungsten-native (no Python, no UDF).
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(d).cast("double").alias("sd"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(p * p).cast("double").alias("spp"),
        F.sum(d * d).cast("double").alias("sdd"),
        F.sum(q * p).cast("double").alias("sqp"),
        F.sum(q * d).cast("double").alias("sqd"),
        F.sum(p * d).cast("double").alias("spd"),
    )
    n = F.col("n")

    def corr(sxy, sx, sy, sxx, syy):
        return F.round(
            (n * F.col(sxy) - F.col(sx) * F.col(sy))
            / F.sqrt(
                (n * F.col(sxx) - F.col(sx) * F.col(sx))
                * (n * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            6,
        )

    return m.select(
        "n",
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )


@register(
    "q_agg_skew_kurtosis",
    oracle="""
    WITH m AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4
        FROM lineitem
    ),
    c AS (
        SELECT n,
               s1 / n AS mu,
               (s2 - s1 * s1 / n) / n AS m2,
               (s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n)
                    * (s1 / n)) / n AS m3,
               (s4 - 4 * (s1 / n) * s3 + 6 * (s1 / n) * (s1 / n) * s2
                    - 3 * n * (s1 / n) * (s1 / n) * (s1 / n)
                    * (s1 / n)) / n AS m4
        FROM m
    )
    SELECT n,
           round(mu, 6) AS mean_qty,
           round(sqrt(m2), 6) AS std_qty,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
    FROM c
    """,
)
def q_agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment distribution profiling (skewness + excess
    kurtosis) of order quantities — the shape statistics a feature
    audit reads next after mean/stddev: skew flags asymmetric tails
    (price-like columns), kurtosis flags heavy tails that break
    z-score outlier rules (see q_events_hill_tail for the extreme-
    tail counterpart). Same determinism discipline as
    q_agg_corr_matrix, one tier higher: quantities are small
    integers, so the four raw power sums accumulate EXACTLY in
    64-bit arithmetic under any partition merge order (explicit
    bound: q^4 <= 6.25e6/row at quantity <= 50, so the int64 sum is
    exact to ~1.5e12 rows — ~2x headroom over a 100 TB lineitem's
    ~6.6e11; shard-fold or switch to decimal(38,0) beyond, as the
    unit-product sums do), and the
    central-moment algebra (population m2/m3/m4 expanded in raw
    sums, fixed operation order) is bit-reproducible cross-engine.
    The corpus's quantity is uniform on [1, 50], so the expected
    signature — skewness ~ 0, excess kurtosis ~ -1.2 (the uniform's
    platykurtic fingerprint) — is itself the pytest.

    Scale: one map-side-combinable pass, five numbers out. Skewness
    and kurtosis of a 100 TB column cost exactly one scan, which is
    why they belong in the standard profiling pass (q_dq_profile)
    rather than a sampled notebook.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = (F.col("s2") - F.col("s1") * F.col("s1") / n) / n
    m3 = (
        F.col("s3")
        - 3 * mu * F.col("s2")
        + 2 * n * mu * mu * mu
    ) / n
    m4 = (
        F.col("s4")
        - 4 * mu * F.col("s3")
        + 6 * mu * mu * F.col("s2")
        - 3 * n * mu * mu * mu * mu
    ) / n
    return m.select(
        "n",
        F.round(mu, 6).alias("mean_qty"),
        F.round(F.sqrt(m2), 6).alias("std_qty"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    )


# Histogram quantile sketch: fixed dyadic domain so bucket width and
# edges are EXACT doubles in both engines (131072/4096 = 32.0).
HQ_BUCKETS = 4096
HQ_DOMAIN = 131072.0  # 2^17 — covers l_extendedprice (max ~105k)
HQ_WIDTH = HQ_DOMAIN / HQ_BUCKETS  # 32.0 exactly
HQ_QS = [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)]


@register(
    "q_agg_histogram_quantile",
    oracle=f"""
    WITH v AS (
        SELECT l_returnflag AS flag, CAST(l_extendedprice AS DOUBLE) AS x
        FROM lineitem
    ),
    h AS (
        SELECT flag,
               LEAST({HQ_BUCKETS - 1},
                     CAST(floor(x / {HQ_WIDTH!r}) AS BIGINT)) AS b,
               count(*) AS c
        FROM v GROUP BY 1, 2
    ),
    cum AS (
        SELECT flag, b, c,
               sum(c) OVER (PARTITION BY flag ORDER BY b) AS cum,
               sum(c) OVER (PARTITION BY flag) AS total
        FROM h
    ),
    qs AS (SELECT * FROM (VALUES {", ".join(f"('{k}', CAST({q} AS DOUBLE))" for k, q in HQ_QS)})
           AS t(qk, q)),
    pick AS (
        SELECT cum.flag, qs.qk, min(cum.b) AS pb
        FROM cum, qs
        WHERE cum.cum >= ceil(qs.q * cum.total)
        GROUP BY 1, 2
    ),
    est AS (
        SELECT p.flag, p.qk,
               round({HQ_WIDTH!r} * (p.pb
                     + (ceil(q.q * c.total) - (c.cum - c.c))
                       / CAST(c.c AS DOUBLE)), 4) AS e
        FROM pick p
        JOIN cum c ON c.flag = p.flag AND c.b = p.pb
        JOIN qs q ON q.qk = p.qk
    ),
    ex AS (
        SELECT flag, count(*) AS n,
               {", ".join(f"round(quantile_cont(x, CAST({q} AS DOUBLE)), 4) AS x_{k}" for k, q in HQ_QS)}
        FROM v GROUP BY 1
    )
    SELECT ex.flag, ex.n,
           {", ".join(f"max(CASE WHEN est.qk = '{k}' THEN est.e END) AS est_{k}" for k, _ in HQ_QS)},
           {", ".join(f"round(abs(max(CASE WHEN est.qk = '{k}' THEN est.e END) - ex.x_{k}) / ex.x_{k}, 6) AS relerr_{k}" for k, _ in HQ_QS)}
    FROM ex JOIN est ON est.flag = ex.flag
    GROUP BY ex.flag, ex.n, {", ".join(f"ex.x_{k}" for k, _ in HQ_QS)}
    """,
)
def q_agg_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-quantile sketch with a measured-error
    certificate — the third member of the certified sketch suite
    (q_agg_hll_md5 = distinct, q_agg_cms_md5 = frequency, this =
    quantiles). A fixed 4096-bucket equi-width histogram over a
    dyadic domain (width 32.0, an exact double, so bucket ids are
    bit-identical cross-engine with no md5 needed) is the sketch:
    per-bucket counts are ADDITIVE, hence partial-aggregable,
    mergeable across shards/days, and streamable (twin:
    s_quantile_sketch). Quantiles come from a CDF walk — the first
    bucket whose running count reaches ceil(q·n) — with linear
    interpolation inside the bucket, all closed-form integer/double
    arithmetic, no data-dependent iteration.

    The certificate measures the estimate against the exact
    interpolated percentile (Spark `percentile` == DuckDB
    `quantile_cont`, the probed bit-exact pairing) as a relative
    error per (group, quantile) — at 4096 buckets over this corpus
    the p50/p95/p99 errors land well under 1e-3, and the same query
    re-reads the error after any re-bucketing decision.

    Scale: the sketch path is one map-side-combinable groupBy to at
    most groups×4096 rows, one bounded partitioned window over those
    rows, and a broadcast-argmin pick (min over a conditional
    struct). The exact side is the certificate only — it is the one
    fact-wide percentile and is dropped in production, exactly the
    hll_md5 pattern. A 100 TB rollup keeps one 4096-int array per
    (group, day) and answers any quantile after any merge.
    """
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("double").alias("x"),
    )
    h = v.groupBy(
        "flag",
        F.least(
            F.lit(HQ_BUCKETS - 1),
            F.floor(F.col("x") / F.lit(HQ_WIDTH)),
        ).alias("b"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wb = W.partitionBy("flag").orderBy("b")
    cum = h.select(
        "flag",
        "b",
        "c",
        F.sum("c").over(wb).alias("cum"),
        F.sum("c").over(W.partitionBy("flag")).alias("total"),
    )
    # Broadcast-argmin per quantile: min(struct(b, c, cum)) over the
    # buckets that reach the target rank — first qualifying bucket,
    # no second shuffle, no join back.
    aggs = []
    for k, q in HQ_QS:
        t = F.ceil(F.lit(q) * F.col("total"))
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= t,
                    F.struct(
                        F.col("b"), F.col("c"), F.col("cum"), t.alias("t")
                    ),
                )
            ).alias(f"pick_{k}")
        )
    picked = cum.groupBy("flag").agg(*aggs)
    est_cols = []
    for k, _q in HQ_QS:
        p = F.col(f"pick_{k}")
        est_cols.append(
            F.round(
                F.lit(HQ_WIDTH)
                * (
                    p["b"]
                    + (p["t"] - (p["cum"] - p["c"]))
                    / p["c"].cast("double")
                ),
                4,
            ).alias(f"est_{k}")
        )
    est = picked.select("flag", *est_cols)
    exact = v.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.percentile("x", F.lit(q)), 4).alias(f"x_{k}")
            for k, q in HQ_QS
        ],
    )
    out = exact.join(F.broadcast(est), "flag")
    return out.select(
        "flag",
        "n",
        *[F.col(f"est_{k}") for k, _ in HQ_QS],
        *[
            F.round(
                F.abs(F.col(f"est_{k}") - F.col(f"x_{k}"))
                / F.col(f"x_{k}"),
                6,
            ).alias(f"relerr_{k}")
            for k, _ in HQ_QS
        ],
    )
