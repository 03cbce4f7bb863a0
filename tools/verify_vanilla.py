"""Full differential under a VANILLA SparkSession (the driver's
environment: no session.py tuning — no AQE config, no UTC pin, no
shuffle-partition setting)."""
import sys
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

import tools.verify_oracle as vo
from mrtweety_analytic_spark.queries import QUERIES
from mrtweety_analytic_spark.sources import TABLES

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "4g")
    .getOrCreate()
)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
failed = []
for name in sorted(QUERIES):
    try:
        status, detail = vo.compare(spark, con, name, sf_dir)
    except Exception as e:
        status, detail = "ERROR", f"{type(e).__name__}: {e}"
    if status not in ("OK", "ROWS_ONLY"):
        failed.append(name)
        print(f"!! {name:28s} {status:18s} {detail}")
print(f"{len(QUERIES) - len(failed)}/{len(QUERIES)} vanilla-passed")
if failed:
    print("failed:", ", ".join(failed))
sys.exit(1 if failed else 0)
