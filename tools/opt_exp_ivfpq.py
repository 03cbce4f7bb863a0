"""Round-13 in-session A/B for the IVF-PQ family.

Variants of _ivfpq_adc's `codes` stage:
  cur    — explode codebook labels + groupBy(vec_id, m) min(struct)
           (Exchange + SortAggregate on the widest intermediate)
  argmin — per-row array_min over the 8-entry packed codebook
           (the certified _km_assign_df shape: zero Exchange)

Also times pipeline prefixes (cent / codes / adc / full) to locate
the cost, and checks result identity between variants.

Usage: python tools/opt_exp_ivfpq.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402


def t(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def sig(df) -> str:
    import hashlib

    rows = sorted(repr(r) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()[:12]


def build(spark, sf_dir, argmin: bool):
    from mrtweety_analytic_spark.operators.similarity import (
        IVFPQ_K,
        NPROBE,
        PQ_M,
        PQ_S,
        PROBE_MOD,
        _km_assign_df,
        _km_train,
        cosine_expr,
    )
    from mrtweety_analytic_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    ev = emb.select("vec_id", "emb")
    cent = _km_train(ev)
    af = _km_assign_df(ev, cent).select("vec_id", "cl")

    lng = emb.select("label", F.posexplode("emb").alias("i0", "v"))
    pcent = (
        lng.groupBy("label", (F.col("i0") + 1).alias("dim"))
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("pce")
        )
    )
    split_m = lambda col: F.posexplode(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.lit(PQ_M)),
            lambda m: F.slice(col, (m - 1) * PQ_S + 1, PQ_S),
        )
    )
    codebook = pcent.select(
        F.col("label").alias("c_label"),
        split_m(F.col("pce")).alias("m0", "sub_ce"),
    ).select(
        (F.col("m0") + 1).alias("m"), "c_label", "sub_ce"
    ).localCheckpoint(eager=False)
    subs = emb.select(
        "vec_id", split_m(F.col("emb")).alias("m0", "sub")
    ).select("vec_id", (F.col("m0") + 1).alias("m"), "sub")
    d2 = F.aggregate(
        F.zip_with(
            F.col("sub"), F.col("sub_ce"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if argmin:
        packed = codebook.groupBy("m").agg(
            F.collect_list(F.struct("c_label", "sub_ce")).alias("cbs")
        )
        best = F.array_min(
            F.transform(
                F.col("cbs"),
                lambda s: F.struct(
                    F.round(
                        F.sqrt(
                            F.aggregate(
                                F.zip_with(
                                    F.col("sub"),
                                    s["sub_ce"],
                                    lambda x, y: (x - y) * (x - y),
                                ),
                                F.lit(0.0),
                                lambda acc, x: acc + x,
                            )
                        ),
                        6,
                    ).alias("d"),
                    s["c_label"].alias("code"),
                ),
            )
        )
        codes = subs.join(F.broadcast(packed), "m").select(
            "vec_id", "m", best["code"].alias("code")
        )
    else:
        codes = (
            subs.join(F.broadcast(codebook), "m")
            .groupBy("vec_id", "m")
            .agg(
                F.min(
                    F.struct(
                        F.round(F.sqrt(d2), 6).alias("d"),
                        F.col("c_label").alias("code"),
                    )
                ).alias("best")
            )
            .select("vec_id", "m", F.col("best.code").alias("code"))
        )

    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pe")
    )
    w_route = W.partitionBy("probe_id").orderBy(
        F.desc(F.round(cosine_expr(F.col("ce"), F.col("pe")), 4)),
        F.asc("cl"),
    )
    cells = (
        probes.join(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_route))
        .filter(F.col("rn") <= NPROBE)
        .select("probe_id", "cl")
    )
    cand = (
        cells.join(af, "cl")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
    )
    psubs = probes.select(
        "probe_id", split_m(F.col("pe")).alias("m0", "psub")
    ).select("probe_id", (F.col("m0") + 1).alias("m"), "psub")
    lut = psubs.join(F.broadcast(codebook), "m").select(
        "probe_id",
        "m",
        "c_label",
        F.aggregate(
            F.zip_with(
                F.col("psub"),
                F.col("sub_ce"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    adc = (
        codes.join(cand, "vec_id")
        .join(
            F.broadcast(lut),
            (codes["m"] == lut["m"])
            & (codes["code"] == lut["c_label"])
            & (cand["probe_id"] == lut["probe_id"]),
        )
        .drop(lut["probe_id"])
        .groupBy("probe_id", "vec_id")
        .agg(F.round(F.sqrt(F.sum("d2")), 6).alias("approx_l2"))
    )
    w = W.partitionBy("probe_id").orderBy("approx_l2", "vec_id")
    final = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVFPQ_K)
        .select("probe_id", "vec_id", "approx_l2")
    )
    return {"cent": cent, "codes": codes, "adc": adc, "final": final}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("opt-exp-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 101).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )

    s_cur = sig(build(spark, sf_dir, argmin=False)["final"])
    s_arg = sig(build(spark, sf_dir, argmin=True)["final"])
    print(f"final sig cur={s_cur} argmin={s_arg} "
          f"{'IDENTICAL' if s_cur == s_arg else 'MISMATCH'}")

    # Prefix timing (fresh lineage per call so nothing is reused).
    for rep in range(reps):
        parts = {}
        for key in ("cent", "codes", "adc", "final"):
            parts[key] = t(build(spark, sf_dir, argmin=False)[key])
        print(f"rep{rep} cur    " + " ".join(
            f"{k}={v:6.3f}" for k, v in parts.items()))
        parts = {}
        for key in ("cent", "codes", "adc", "final"):
            parts[key] = t(build(spark, sf_dir, argmin=True)[key])
        print(f"rep{rep} argmin " + " ".join(
            f"{k}={v:6.3f}" for k, v in parts.items()))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
