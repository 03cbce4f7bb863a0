"""Generic round-14 interleaved A/B for rewrites guarded by an
in-code environment-variable control (the opt_exp_dimmeans pattern):
variant "new" runs with the env var unset, variant "old" with it set
to "1", both from the SAME registry code in ONE session, reps
alternating, with order-insensitive full-result-hash identity checks.

Usage: python tools/opt_exp_envab.py ENVVAR reps query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sig(df):
    from pyspark.sql import functions as F

    cols = [F.col(c).cast("string") for c in df.columns]
    row = df.select(
        F.sum(F.xxhash64(*cols)).alias("h"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return (row["h"] or 0, row["n"])


def main() -> None:
    envvar = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark()
    for name in names:
        fn = QUERIES[name]
        os.environ.pop(envvar, None)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        rows = []
        sigs = set()
        for r in range(reps):
            for variant, env in (("new", None), ("old", "1")):
                if env:
                    os.environ[envvar] = env
                else:
                    os.environ.pop(envvar, None)
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:{variant}:rep{r}"
                )
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                rows.append((variant, r, dt))
                sigs.add((variant, _sig(fn(spark, sf_dir))))
                print(f"  {name} {variant} rep{r}: {dt:.2f}s", flush=True)
        os.environ.pop(envvar, None)
        new = sorted(dt for v, _, dt in rows if v == "new")
        old = sorted(dt for v, _, dt in rows if v == "old")
        n_sigs = {s for v, s in sigs if v == "new"}
        o_sigs = {s for v, s in sigs if v == "old"}
        match = "SIG_MATCH" if n_sigs == o_sigs else "SIG_MISMATCH"
        print(
            f"{name}: new med {new[len(new)//2]:.2f}s "
            f"{[round(t, 2) for t in new]} | "
            f"old med {old[len(old)//2]:.2f}s "
            f"{[round(t, 2) for t in old]} | {match} "
            f"new={n_sigs} old={o_sigs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
