"""Data-layout maintenance: multi-dimensional (Z-order) clustering.

At 100 TB, scan cost is dominated by how well file/row-group min-max
stats prune. Sorting by ONE column gives perfect pruning on that
column and none on others; interleaving the bits of two columns into
a Morton (Z-order) key and range-partitioning + sorting by it gives
good pruning on BOTH — the layout trick behind Delta/Iceberg
OPTIMIZE ZORDER, here expressed as plain integer algebra the engine
can codegen (no UDF).

The registered query certifies the Z-value computation and the
clustering quality it induces: group rows by Z-prefix (the
"file" a range-partitioned write would put them in) and report the
min-max envelope of each source dimension per group — tight
envelopes = effective two-dimensional skipping. The write path at
scale is `df.repartitionByRange(n, 'z').sortWithinPartitions('z')
.write.parquet(...)`, exercised in tests (sampling in
repartitionByRange makes partition *boundaries* nondeterministic, so
the certified output groups by Z-prefix, which is stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# Bit-spread masks: interleave two 16-bit keys into one 32-bit Morton
# code. Same constants both engines; all arithmetic is exact int64.
_MASKS = ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765))


def _spread_sql(x: str, shift_fmt: str) -> str:
    """SQL for the classic bit-spread of a 16-bit value (x -> bits at
    even positions). shift_fmt formats a left shift, e.g.
    'shiftleft({v}, {n})' (Spark) or '({v} << {n})' (DuckDB)."""
    e = x
    for n, mask in _MASKS:
        shifted = shift_fmt.format(v=e, n=n)
        e = f"(({e} | {shifted}) & {mask})"
    return e


def zvalue_sql(a: str, b: str, dialect: str) -> str:
    """Morton interleave of two pre-masked 16-bit int expressions."""
    fmt = "shiftleft({v}, {n})" if dialect == "spark" else "({v} << {n})"
    sa = _spread_sql(a, fmt)
    sb = _spread_sql(b, fmt)
    b_up = fmt.format(v=sb, n=1)
    return f"({sa} | {b_up})"


# Inputs cast to BIGINT first: the interleaved code uses bit 31, which
# would hit the int32 sign bit if either engine stayed in 32-bit.
_Z_SPARK = zvalue_sql(
    "(CAST(o_custkey AS BIGINT) & 65535)",
    "(CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) & 65535)",
    "spark",
)
_Z_DUCK = zvalue_sql(
    "(CAST(o_custkey AS BIGINT) & 65535)",
    "(date_diff('day', DATE '1970-01-01', o_orderdate) & 65535)",
    "duckdb",
)


@register(
    "q_maintenance_zorder",
    oracle=f"""
    WITH z AS (
        SELECT o_custkey,
               date_diff('day', DATE '1970-01-01', o_orderdate) AS day_nr,
               {_Z_DUCK} AS zval
        FROM orders
    )
    SELECT zval >> 18 AS zbucket,
           count(*) AS n,
           min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
           min(day_nr) AS min_day, max(day_nr) AS max_day
    FROM z GROUP BY zbucket
    """,
)
def q_maintenance_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit on orders(o_custkey, o_orderdate):
    Morton-interleave the two keys, bucket by Z-prefix, and emit each
    bucket's min-max envelope on both dimensions. Entirely
    whole-stage-codegen integer ops — the Z computation adds no
    Python and no shuffle beyond the final small aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    z = orders.select(
        "o_custkey",
        F.expr("CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)").alias(
            "day_nr"
        ),
        F.expr(_Z_SPARK).cast("long").alias("zval"),
    )
    return (
        z.groupBy(F.shiftright("zval", 18).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("day_nr").alias("min_day"),
            F.max("day_nr").alias("max_day"),
        )
    )
