"""Round-12 operators: the s_schema_drift ingest dial and the
q_training_export_full composite (VERDICT r11 items 4 and 5).
Cross-engine value agreement is the DuckDB oracle's job
(tools/verify_oracle.py); these tests pin the SEMANTIC invariants
the oracle's aggregate output can't see — stream/batch parity,
leakage-safety of the exported set, and decontamination accounting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrtweety_analytic_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_schema_drift_stream_equals_batch_census(spark):
    """The monitor's replayed census must equal the batch twin
    row-for-row — same shape normalization, same counts."""
    got = QUERIES["s_schema_drift"](spark, SF).collect()[0]
    want = QUERIES["q_fn_variant_schema"](spark, SF).collect()[0]
    assert (got.n_rows, got.n_shapes) == (want.n_rows, want.n_shapes)
    assert got.n_shapes >= 1


def test_export_full_no_val_cluster_doc_exports(spark):
    """Leakage-safety: no kept doc may belong to a val-side near-dup
    cluster (cluster_id % VAL_MOD == 0, singleton = own doc_id) —
    the invariant that makes the export safe to train on while
    evaluating on the val split."""
    from mrtweety_analytic_spark.operators.dedup import VAL_MOD
    from mrtweety_analytic_spark.operators.lifecycle import (
        training_export_full_frames,
    )

    kept, _ = training_export_full_frames(spark, SF)
    clusters = QUERIES["q_dedup_clusters"](spark, SF)
    leaked = (
        kept.join(clusters, "doc_id", "left")
        .filter(
            F.coalesce("cluster_id", F.col("doc_id")) % VAL_MOD == 0
        )
        .count()
    )
    assert leaked == 0


def test_export_full_no_kept_doc_shares_benchmark_shingle(spark):
    """Decontamination: the kept set shares ZERO word-4-grams with
    the held-out benchmark (doc_id % DECON_BENCH_MOD == 0 over the
    raw corpus), and no benchmark member is exported."""
    from mrtweety_analytic_spark.operators.lifecycle import (
        training_export_full_frames,
    )
    from mrtweety_analytic_spark.operators.textops import (
        DECON_BENCH_MOD,
        DECON_N,
        _word_ngrams,
    )
    from mrtweety_analytic_spark.sources import load_table

    kept, _ = training_export_full_frames(spark, SF)
    assert kept.filter(
        F.col("doc_id") % DECON_BENCH_MOD == 0
    ).count() == 0

    docs = load_table(spark, SF, "documents")
    arr = F.split("text", " ")
    grams = docs.select(
        "doc_id", F.explode(_word_ngrams(arr, DECON_N)).alias("shingle")
    )
    bench = (
        grams.filter(F.col("doc_id") % DECON_BENCH_MOD == 0)
        .select("shingle")
        .distinct()
    )
    overlap = (
        grams.join(kept.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(bench), "shingle")
        .count()
    )
    assert overlap == 0


def test_export_full_manifest_accounts_every_doc(spark):
    """The manifest's totals must reconcile exactly with the
    doc-level frames: n_docs/sum_chars over kept, n_decontaminated
    over the dropped set — removal is audited, never silent. The
    gates only remove: the full export is <= the ungated
    q_training_export at every shard."""
    from mrtweety_analytic_spark.operators.lifecycle import (
        training_export_full_frames,
    )

    manifest = {
        r.shard: r for r in QUERIES["q_training_export_full"](
            spark, SF
        ).collect()
    }
    kept, cont = training_export_full_frames(spark, SF)
    kept_agg = {
        r.shard: (r.n, r.chars)
        for r in kept.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .collect()
    }
    cont_agg = {
        r.shard: r.n
        for r in cont.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(manifest) == set(kept_agg) | set(cont_agg)
    for s, row in manifest.items():
        k_n, k_chars = kept_agg.get(s, (0, None))
        assert row.n_docs == k_n
        assert row.sum_chars == (k_chars if k_n else 0)
        assert row.n_decontaminated == cont_agg.get(s, 0)

    ungated = {
        r.shard: r.n_docs
        for r in QUERIES["q_training_export"](spark, SF).collect()
    }
    # Not per-shard comparable (rates differ once the corpus
    # shrinks), but the total can only go down under extra gates.
    assert sum(r.n_docs for r in manifest.values()) <= sum(
        ungated.values()
    )
