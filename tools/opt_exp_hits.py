"""Round-13 in-session A/B: checkpoint-vs-recompute for the
q_graph_hits mutual-reinforcement chain. Variants interleaved."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def hits(spark, sf_dir, ckpt: bool):
    from mrtweety_analytic_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
    )
    if ckpt:
        e0 = e0.localCheckpoint(eager=False)
    a1 = e0.groupBy("sk").agg(F.count(F.lit(1)).cast("double").alias("a"))
    h1 = e0.join(a1, "sk").groupBy("ck").agg(F.sum("a").alias("h"))
    a2 = e0.join(h1, "ck").groupBy("sk").agg(F.sum("h").alias("a"))
    if ckpt:
        a2 = a2.localCheckpoint(eager=False)
    h2 = e0.join(a2, "sk").groupBy("ck").agg(F.sum("a").alias("h"))
    if ckpt:
        h2 = h2.localCheckpoint(eager=False)
    ma = a2.agg(F.max("a").alias("m"))
    mh = h2.agg(F.max("h").alias("m"))
    auths = a2.crossJoin(F.broadcast(ma)).select(
        F.concat(F.lit("s"), F.col("sk")).alias("node"),
        F.lit("authority").alias("role"),
        F.round(F.col("a") / F.col("m"), 6).alias("score"),
    )
    hubs = h2.crossJoin(F.broadcast(mh)).select(
        F.concat(F.lit("c"), F.col("ck")).alias("node"),
        F.lit("hub").alias("role"),
        F.round(F.col("h") / F.col("m"), 6).alias("score"),
    )
    return auths.unionAll(hubs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("opt-exp-hits")
    spark.sparkContext.setLogLevel("ERROR")
    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 101).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )
    QUERIES["q_scan_parquet"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def sig(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.crc32(F.concat_ws("|", "node", "role",
                                      F.col("score").cast("string")))
                  ).alias("s"),
        ).collect()[0]
        return (r.n, r.s)

    s_old, s_new = sig(hits(spark, sf_dir, False)), sig(hits(spark, sf_dir, True))
    print("signatures:", s_old, s_new, flush=True)
    assert s_old == s_new, "VARIANTS DISAGREE"

    for rep in range(3):
        r = {
            "nockpt": t(hits(spark, sf_dir, False)),
            "ckpt": t(hits(spark, sf_dir, True)),
        }
        print("rep", rep, r, flush=True)


if __name__ == "__main__":
    main()
