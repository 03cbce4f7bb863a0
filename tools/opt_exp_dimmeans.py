"""Round-14 interleaved A/B for the _dim_means rewrite (single
hash-aggregate per-dim sums vs the posexplode + double-groupBy avg
form). Both variants run from the SAME registry code in ONE session:
the control is selected per-call via SPARK_GRAFT_OLDMEANS=1, which
_dim_means reads at plan-build time. Reps alternate A/B/A/B... and
each rep's result signature (order-insensitive xxhash sum + count)
must match across variants (round-13 adjudication rule).

Usage: python tools/opt_exp_dimmeans.py [reps] [query ...]
Defaults: 3 reps; queries = the four family representatives.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_sim_pq_trained",
    "q_sim_kmeans_assign",
    "q_sim_ivfpq_residual",
    "q_sim_ivf_kmeans",
]


def _sig(df):
    from pyspark.sql import functions as F

    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.select(
        F.sum(F.xxhash64(*cols)).alias("h"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return (row["h"] or 0, row["n"])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark()
    for name in names:
        fn = QUERIES[name]
        # warm-up (new variant) — not timed, same as bench methodology
        os.environ.pop("SPARK_GRAFT_OLDMEANS", None)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        rows = []
        sigs = set()
        for r in range(reps):
            for variant, env in (("new", None), ("old", "1")):
                if env:
                    os.environ["SPARK_GRAFT_OLDMEANS"] = env
                else:
                    os.environ.pop("SPARK_GRAFT_OLDMEANS", None)
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:{variant}:rep{r}"
                )
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                rows.append((variant, r, dt))
                # signature check — rounded consumers make results
                # order-stable; full hash must match across variants
                sigs.add((variant, _sig(fn(spark, sf_dir))))
                print(f"  {name} {variant} rep{r}: {dt:.2f}s", flush=True)
        os.environ.pop("SPARK_GRAFT_OLDMEANS", None)
        new = sorted(dt for v, _, dt in rows if v == "new")
        old = sorted(dt for v, _, dt in rows if v == "old")
        n_sigs = {s for v, s in sigs if v == "new"}
        o_sigs = {s for v, s in sigs if v == "old"}
        match = "SIG_MATCH" if n_sigs == o_sigs else "SIG_MISMATCH"
        print(
            f"{name}: new med {new[len(new)//2]:.2f}s {new} | "
            f"old med {old[len(old)//2]:.2f}s {old} | {match} "
            f"new={n_sigs} old={o_sigs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
