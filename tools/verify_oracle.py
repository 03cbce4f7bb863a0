"""Local replica of the driver's correctness gate.

For every query in QUERIES: run the Spark DataFrame and (when present)
the DuckDB oracle on the same parquet tables, then compare
  row count  +  sorted column names  +  order-insensitive values.
Usage:
    python tools/verify_oracle.py [sf_dir] [query ...]
Defaults to /root/testdata/sf0.001 and all queries.
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from mrtweety_analytic_spark.queries import ORACLES, QUERIES  # noqa: E402
from mrtweety_analytic_spark.session import get_spark  # noqa: E402
from mrtweety_analytic_spark.sources import TABLES  # noqa: E402


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full double precision; rounded upstream by policy
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat() + "T00:00:00"
    return str(v)


def _rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark, con, name: str, sf_dir: str) -> tuple[str, str]:
    t0 = time.time()
    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = list(sdf.columns)
    took = time.time() - t0
    if name not in ORACLES:
        return "ROWS_ONLY", f"{len(srows)} rows, {took:.1f}s (no oracle)"
    cur = con.execute(ORACLES[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    if sorted(scols) != sorted(dcols):
        return "SCHEMA_MISMATCH", f"spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return "ROWCOUNT_MISMATCH", f"spark={len(srows)} duck={len(drows)}"
    sk = _rows_key([tuple(r) for r in srows], scols)
    dk = _rows_key(drows, dcols)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
        return "VALUE_MISMATCH", f"first diffs: {diffs}"
    return "OK", f"{len(srows)} rows, {took:.1f}s"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or sorted(QUERIES)

    spark = get_spark("verify-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failed = []
    for name in names:
        try:
            status, detail = compare(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            status, detail = "ERROR", f"{type(e).__name__}: {e}"
            traceback.print_exc()
        marker = "  " if status in ("OK", "ROWS_ONLY") else "!!"
        print(f"{marker} {name:28s} {status:18s} {detail}")
        if status not in ("OK", "ROWS_ONLY"):
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
