"""SRP-LSH skew guard + plan shape (VERDICT r09 item 3).

Two properties the SQL oracle can't certify:
  1. the _SRP_BUCKET_CAP stop-bucket eviction actually removes hot
     buckets from the candidate join (and leaves cold ones intact);
  2. the exact-cosine verify stage evaluates its Arrow UDF exactly
     once — the r9 plan carried TWO ArrowEvalPython nodes because
     Catalyst pushed the threshold filter back through the select.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrtweety_analytic_spark.queries import QUERIES
from mrtweety_analytic_spark.operators.dedup import (
    _SRP_BUCKET_CAP,
    _srp_candidates_from_sigs,
)


def _sig_frame(spark, groups):
    """(vec_id, sig) rows: groups is [(n_members, sig_value), ...];
    vec_ids are globally unique across groups."""
    rows, nxt = [], 0
    for n, sig in groups:
        for _ in range(n):
            rows.append((nxt, sig))
            nxt += 1
    return spark.createDataFrame(rows, "vec_id long, sig long")


def test_srp_hot_bucket_evicted(spark):
    """A bucket with occupancy > cap is dropped WHOLE: the 10-member
    hot signature group (all 4 band buckets at occupancy 10 > cap 8)
    contributes zero candidate pairs, while the 3-member cold group
    (occupancy 3) keeps its full pair set. Signatures 0x1111/0x2222
    put the two groups in disjoint buckets in every band."""
    sigs = _sig_frame(spark, [(10, 0x1111), (3, 0x2222)])
    pairs = {
        (r.vec_a, r.vec_b)
        for r in _srp_candidates_from_sigs(sigs, cap=8).collect()
    }
    hot_ids = set(range(10))
    assert not any(a in hot_ids or b in hot_ids for a, b in pairs)
    assert pairs == {(10, 11), (10, 12), (11, 12)}


def test_srp_cap_inactive_below_occupancy(spark):
    """With occupancy <= cap nothing is evicted — the same frame at
    the default cap yields all 45 + 3 within-group pairs, so the
    guard cannot silently change certification-scale results
    (measured max occupancy: 51 @ sf0.01, 209 @ sf0.1, cap 512)."""
    assert _SRP_BUCKET_CAP == 512
    sigs = _sig_frame(spark, [(10, 0x1111), (3, 0x2222)])
    n = _srp_candidates_from_sigs(sigs).count()
    assert n == 45 + 3


def test_srp_verify_single_arrow_eval(spark, sf_dir):
    """The cosine-verify stage must appear as exactly ONE
    ArrowEvalPython node: the UDF is fenced with asNondeterministic
    so the threshold filter stays above the projection instead of
    being substituted through it (which re-evaluates the batch)."""
    df = QUERIES["q_dedup_srp_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
