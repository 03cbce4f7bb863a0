"""Round-13 optimization measurement harness (guide §1).

Times named queries in ISOLATION under the bench session state
(same warm-up as bench.py) through the noop sink, and captures
`.explain("formatted")` for each into plans/$OPT_PLANS_ROUND (default r14)/<name>_<tag>.txt.

Usage:
    python tools/opt_measure.py <tag> <query> [query ...]
    python tools/opt_measure.py <tag> --top N       # N slowest from bench_full_r12.json
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 (default)

Prints one line per query: name, cold, warm1, warm2 seconds.
Writes plans/<round>/<query>_<tag>.txt (explain formatted).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if names and names[0] == "--top":
        n = int(names[1])
        full = json.load(open(os.path.join(REPO, "bench_full_r12.json")))
        qw = full["queries_warm"]
        names = [k for k, _ in sorted(qw.items(), key=lambda kv: -kv[1])[:n]]

    from pyspark.sql import functions as F

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    # Same warm-up as bench.py: shuffle + codegen + Python worker pool.
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

    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("OPT_PLANS_ROUND", "r14")
    )
    os.makedirs(plans_dir, exist_ok=True)
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        times = []
        for _ in range(3):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        buf = io.StringIO()
        with redirect_stdout(buf):
            QUERIES[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        results[name] = times
        print(f"{name:45s} cold={times[0]:7.3f} warm={times[1]:7.3f} "
              f"warm2={times[2]:7.3f}", flush=True)
    out = os.path.join(plans_dir, f"_timings_{tag}.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "timings": results}, f, indent=1,
                  sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
