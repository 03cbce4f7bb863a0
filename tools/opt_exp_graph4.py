"""Round-13 in-session A/B: the multi-consumer localCheckpoint
truncations in 4 graph queries, adjudicated by interleaved reps in
ONE session. The "off" variant monkeypatches
DataFrame.localCheckpoint to a no-op, which reproduces the pre-edit
plan exactly (the edits differ ONLY by localCheckpoint calls).

Usage: python tools/opt_exp_graph4.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

NAMES = [
    "q_graph_common_neighbors",
    "q_graph_modularity",
    "q_graph_adamic_adar",
    "q_graph_degree_powerlaw",
]

_real_ckpt = DataFrame.localCheckpoint


def t(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def sig(df) -> str:
    import hashlib

    rows = sorted(repr(r) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()[:12]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("opt-exp-graph4")
    spark.sparkContext.setLogLevel("ERROR")
    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 101).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )

    # Result-identity check first (collect, order-insensitive hash).
    for name in NAMES:
        DataFrame.localCheckpoint = lambda self, eager=True: self
        s_off = sig(QUERIES[name](spark, sf_dir))
        DataFrame.localCheckpoint = _real_ckpt
        s_on = sig(QUERIES[name](spark, sf_dir))
        print(f"{name:34s} sig off={s_off} on={s_on} "
              f"{'IDENTICAL' if s_off == s_on else 'MISMATCH'}")

    for rep in range(reps):
        for name in NAMES:
            DataFrame.localCheckpoint = lambda self, eager=True: self
            off = t(QUERIES[name](spark, sf_dir))
            DataFrame.localCheckpoint = _real_ckpt
            on = t(QUERIES[name](spark, sf_dir))
            print(f"rep{rep} {name:34s} off={off:7.3f} on={on:7.3f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
