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


def test_priority_window():
    """Engine-defining queries sit in the first 50 registry slots so a
    capped correctness sweep still covers them."""
    names = list(entrymod.queries())
    first = set(names[:50])
    for required in (
        "q_text_trending",
        "s_topk_pipeline",
        "q_dedup_minhash_lsh",
        "q_sim_lsh_bucketed",
        "q_tpch_q3like",
        "q_multimodal_decode",
    ):
        assert required in first, f"{required} outside driver window"


def test_batch_outputs_are_atomic(spark, sf_dir):
    """The driver's hasher cannot hash array/map/struct cells — every
    batch query must emit only atomic columns (CORRECTNESS_r01
    q_agg_collect failure class). Streaming queries are covered by
    tools/audit_schemas.py (they execute on call, too slow here)."""
    from pyspark.sql import types as T

    atomic = (
        T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType,
        T.DoubleType, T.FloatType, T.DecimalType, T.BooleanType,
        T.DateType, T.TimestampType, T.TimestampNTZType, T.BinaryType,
        T.NullType,
    )
    offenders = []
    for name, fn in entrymod.queries().items():
        if name.startswith("s_"):
            continue
        df = fn(spark, sf_dir)
        offenders.extend(
            (name, f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if not isinstance(f.dataType, atomic)
        )
    assert not offenders, offenders


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
