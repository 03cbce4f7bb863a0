"""Round-14 interleaved A/B: registry variant (current code) vs an
inline control variant built WITHOUT the round-14 edit, both in ONE
session, reps alternating, with order-insensitive result-hash
identity checks (the round-13 adjudication rule).

Usage: python tools/opt_exp_r14ab.py <exp> [reps]
  exp: skew_hybrid | rake
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sig(df) -> int:
    from pyspark.sql import functions as F

    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.select(
        F.sum(F.xxhash64(*cols)).alias("h"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return (row["h"] or 0, row["n"])


def control_skew_hybrid(spark, sf_dir):
    """q_join_skew_hybrid exactly as shipped in r13 (no hot_keys
    checkpoint)."""
    from pyspark.sql import functions as F

    from mrtweety_analytic_spark.operators.joins import _HYBRID_HOT_MIN
    from mrtweety_analytic_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    hot_keys = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > _HYBRID_HOT_MIN)
        .select("user_id")
    )
    hot_fact = ev.join(F.broadcast(hot_keys), "user_id", "left_semi")
    cold_fact = ev.join(F.broadcast(hot_keys), "user_id", "left_anti")
    hot_dim = cust.join(F.broadcast(hot_keys), "user_id", "left_semi")
    hot = hot_fact.join(F.broadcast(hot_dim), "user_id")
    cold = cold_fact.join(cust, "user_id")
    return (
        hot.unionAll(cold)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(
                    F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                ).cast("double")
                / 100,
                4,
            ).alias("total_value"),
        )
    )


def control_rake(spark, sf_dir):
    """q_text_rake exactly as shipped in r13 (words⋈ph join for
    wstat; no checkpoints)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mrtweety_analytic_spark.operators.textops import _RAKE_STOPWORDS
    from mrtweety_analytic_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).where(F.col("w") != "")
    t2 = toks.withColumn(
        "is_stop",
        F.when(F.col("w").isin(*_RAKE_STOPWORDS), 1).otherwise(0),
    )
    wisl = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    words = (
        t2.withColumn("grp", F.sum("is_stop").over(wisl))
        .where(F.col("is_stop") == 0)
        .select("doc_id", "grp", "pos", "w")
    )
    ph = words.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("plen"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))),
                lambda x: x["w"],
            ),
        ).alias("phrase"),
    )
    wstat = (
        words.join(
            ph.select("doc_id", "grp", "plen"), ["doc_id", "grp"]
        )
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("degree"),
        )
    )
    pcount = ph.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occur")
    )
    pwords = pcount.select(
        "phrase", F.explode(F.split("phrase", " ")).alias("w")
    )
    pscore = (
        pwords.join(F.broadcast(wstat), "w")
        .groupBy("phrase")
        .agg(
            F.round(
                F.sum(F.col("degree").cast("double") / F.col("freq")),
                6,
            ).alias("score")
        )
    )
    return (
        pscore.join(pcount, "phrase")
        .select("phrase", "n_occur", "score")
        .orderBy(F.desc("score"), "phrase")
        .limit(20)
    )


EXPS = {
    "skew_hybrid": ("q_join_skew_hybrid", control_skew_hybrid),
    "rake": ("q_text_rake", control_rake),
}


def main() -> None:
    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    qname, control = EXPS[exp]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("opt-exp-r14")
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

    def run(fn):
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3), _sig(fn(spark, sf_dir))

    # one unmeasured burn-in of each
    run(QUERIES[qname])
    run(control)
    for i in range(reps):
        tn, sn = run(QUERIES[qname])
        tc, sc = run(control)
        match = "IDENTICAL" if sn == sc else f"MISMATCH {sn} vs {sc}"
        print(f"rep{i}: new={tn:7.3f}  control={tc:7.3f}  sig={match}",
              flush=True)


if __name__ == "__main__":
    main()
