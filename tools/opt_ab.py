"""Tight A/B loop for round-13: N warm repetitions per named query
in one session (noop sink), printing each rep so noise is visible.

Usage: python tools/opt_ab.py N q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("opt-ab")
    spark.sparkContext.setLogLevel("ERROR")
    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 101).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )

    def _py_warm(it):
        import numpy as np  # noqa: F401

        for pdf in it:
            yield pdf

    (
        spark.range(100_000)
        .selectExpr("id", "cast(id as double) AS v")
        .mapInPandas(_py_warm, "id long, v double")
        .write.format("noop").mode("overwrite").save()
    )
    QUERIES["q_scan_parquet"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        times = []
        for _ in range(n + 1):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
        warm = times[1:]
        print(
            f"{name:40s} cold={times[0]:7.3f} "
            f"warm={' '.join(f'{t:6.3f}' for t in warm)} "
            f"min={min(warm):6.3f} med={sorted(warm)[len(warm)//2]:6.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
