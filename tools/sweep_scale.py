"""Scale regression sweep: run EVERY registry query at a larger sf
(default sf0.1) and flag slow/failing entries.

The sf0.01 oracle gate proves correctness; this sweep is the
performance net that catches what it can't — quadratic pair joins,
degenerate LSH banding, scheduling-bound corpus ops (all previously
caught at sf0.1, see SURVEY.md §2C notes).

    python tools/sweep_scale.py [sf_dir] [--slow-threshold SECONDS]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    p.add_argument("--slow-threshold", type=float, default=30.0)
    args = p.parse_args()

    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    slow, failed = [], []
    for name in sorted(queries):
        t0 = time.time()
        try:
            n = queries[name](spark, args.sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            failed.append(name)
            print(f"FAIL {name}: {str(ex)[:150]}", flush=True)
            continue
        dt = time.time() - t0
        mark = "  <<< SLOW" if dt > args.slow_threshold else ""
        print(f"{name:30s} {n:8d} rows {dt:6.1f}s{mark}", flush=True)
        if mark:
            slow.append(name)
    print(f"swept {len(queries)}; slow {slow or 'none'}; "
          f"failed {failed or 'none'}", flush=True)
    return 1 if (slow or failed) else 0


if __name__ == "__main__":
    raise SystemExit(main())
