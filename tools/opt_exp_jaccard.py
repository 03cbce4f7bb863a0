"""Round-13 in-session A/B for the shared jaccard kernel.

Variants (same result set, checked by count + checksum):
  cur        — current _shingle_index/_pair_counts
  ckpt       — all_shingles lazily checkpointed (3 consumers -> 1 eval)
  ckpt+sz    — ckpt + sizes derived from the postings arrays
  dblexplode — pair fan-out via posexplode+slice+explode (codegen)
               instead of nested transform HOFs (interpreted)
  all        — ckpt + sizes-from-postings + codegen pair fan-out
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build(docs, variant: str):
    arr = F.split("text", " ")
    n, df_cap, threshold = 5, 100, 0.2
    win_len = F.greatest(F.lit(0), F.size(arr) - (n - 1))
    sh = F.arrays_zip(*[F.slice(arr, i + 1, win_len) for i in range(n)])
    all_shingles = (
        docs.select("doc_id", F.explode(sh).alias("g"))
        .select(
            "doc_id",
            F.xxhash64(
                F.concat_ws(" ", *[f"g.{i}" for i in range(n)])
            ).alias("shingle"),
        )
        .distinct()
    )
    if variant in ("ckpt", "ckpt+sz", "all"):
        all_shingles = all_shingles.localCheckpoint(eager=False)
    rare = (
        all_shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
    )
    shingles = all_shingles.join(F.broadcast(rare), "shingle", "left_semi")
    postings = shingles.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    if variant in ("ckpt+sz", "all"):
        postings = postings.localCheckpoint(eager=False)
        sizes = (
            postings.select(F.explode("ds").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    else:
        sizes = shingles.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        )
    if variant in ("dblexplode", "all"):
        pairs = (
            postings.select(
                F.posexplode("ds").alias("i", "doc_a"), F.col("ds")
            )
            .select(
                "doc_a",
                F.explode(
                    F.slice(
                        F.col("ds"), F.col("i") + 2,
                        F.greatest(
                            F.lit(0), F.size("ds") - F.col("i") - 1
                        ),
                    )
                ).alias("doc_b"),
            )
        )
    else:
        pairs = postings.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ds"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ds"), i + 2, F.size(F.col("ds"))
                            ),
                            lambda y: F.struct(
                                x.alias("doc_a"), y.alias("doc_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.doc_a", "p.doc_b")
    common = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark
    from mrtweety_analytic_spark.sources import load_table

    spark = get_spark("opt-exp-jac")
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
    docs = load_table(spark, sf_dir, "documents")

    # Result-identity check once per variant.
    def sig(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("doc_a") * 7 + F.col("doc_b")).alias("s"),
            F.sum((F.col("jaccard") * 10000).cast("long")).alias("j"),
        ).collect()[0]
        return (r.n, r.s, r.j)

    variants = ["cur", "ckpt", "ckpt+sz", "dblexplode", "all"]
    sigs = {v: sig(build(docs, v)) for v in variants}
    print("signatures:", sigs, flush=True)
    assert len(set(sigs.values())) == 1, "VARIANTS DISAGREE"

    for rep in range(3):
        row = {}
        for v in variants:
            t0 = time.time()
            build(docs, v).write.format("noop").mode("overwrite").save()
            row[v] = round(time.time() - t0, 3)
        print("rep", rep, row, flush=True)


if __name__ == "__main__":
    main()
