"""Driver-contract tests: entry/queries/oracle_sql shape, plus a
fast oracle differential sample at sf0.001 (the full sweep lives in
tools/verify_oracle.py).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from mrtweety_analytic_spark.sources import TABLES
from tools.verify_oracle import compare

SAMPLE = [
    "q_text_trending",
    "q_agg_multi",
    "q_join_asof",
    "q_win_topk_per_group",
    "q_sim_knn_cosine",
    "q_dedup_exact",
    "q_fn_date",
]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["term", "cnt"]


def test_registry_shape():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert len(qs) >= 60
    assert set(osql) <= set(qs)
    # every query is callable
    assert all(callable(f) for f in qs.values())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_sample(spark, duck, sf_dir, name):
    status, detail = compare(spark, duck, name, sf_dir)
    assert status == "OK", f"{name}: {status} {detail}"
