"""Registry-wide empty-input robustness audit.

Materializes a ZERO-ROW copy of every corpus table (schemas read from
the real sf0.001 footers, so they always track the fixture contract)
and runs every registered query against it. An operator that throws
on empty input would crash a production pipeline on a restart, an
empty partition backfill, or a filter that matched nothing — the
audit proves none does. Row counts are not asserted (an aggregate may
legitimately emit its summary row); only "does not raise" is the
contract here, with the per-operator row expectations pinned in
tests/test_round6_ops.py for the round-6 set.

Streaming queries run their availableNow replay over the empty stream
— also covered.

Usage:
    python tools/audit_empty.py [template_sf_dir]
Exit code 1 if any query raises.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    template = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark
    from mrtweety_analytic_spark.sources import TABLES

    spark = get_spark("empty-audit")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="mrtweety_empty_")
    try:
        import pyarrow.parquet as pq

        for t in TABLES:
            # single-FILE parquet, exactly like the driver's fixtures
            # (the streaming loader reads the footer from the file
            # path directly)
            src = pq.read_table(f"{template}/{t}.parquet")
            pq.write_table(src.slice(0, 0), f"{base}/{t}.parquet")
        n_fail = n_ok = 0
        for name in sorted(QUERIES):
            try:
                rows = QUERIES[name](spark, base).collect()
                n_ok += 1
                _ = rows
            except Exception as e:  # noqa: BLE001
                n_fail += 1
                print(f"{name:34s} RAISES {type(e).__name__}: {e}"[:160])
        print(
            f"empty-input audit: {n_ok} clean, {n_fail} raising "
            f"(of {len(QUERIES)})"
        )
        return 1 if n_fail else 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
