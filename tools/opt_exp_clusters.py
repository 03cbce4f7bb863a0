"""Round-13 in-session A/B: min_label_propagate + funnel variants.

All variants run in ONE session, interleaved A B A B ..., so host /
session drift hits both sides equally. Times are noop-sink seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def propagate_old(pairs):
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint()
    labels = (
        edges.select(F.col("doc_a").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .localCheckpoint()
    )
    for _ in range(20):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc)
            .groupBy(F.col("doc_a").alias("doc"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc", "left")
            .select(
                "doc",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def propagate_new(pairs, eager=True):
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint()
    labels = (
        edges.select(F.col("doc_a").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .localCheckpoint()
    )
    for _ in range(20):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc)
            .groupBy(F.col("doc_a").alias("doc"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc", "left")
            .select(
                "doc",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
                (
                    F.col("nmin").isNotNull()
                    & (F.col("nmin") < F.col("label"))
                ).alias("chg"),
            )
            .localCheckpoint(eager=eager)
        )
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.select("doc", "label")
        if changed == 0:
            break
    return labels


def funnel_counts(docs, persist):
    from mrtweety_analytic_spark.operators.dedup import (
        _jaccard_pairs,
        normalized_text,
    )
    from mrtweety_analytic_spark.operators.textops import (
        STOPWORDS,
        _is_en_predicate,
        _lang_hit_cols,
    )

    tt = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    metrics = tt.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            F.sum(F.when(F.col("term").isin(*STOPWORDS), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("stop_ratio"),
        *_lang_hit_cols(),
    )
    q = (
        docs.join(metrics, "doc_id")
        .filter(
            _is_en_predicate()
            & (F.col("stop_ratio") <= 0.5)
            & F.col("n_tokens").between(10, 500)
        )
        .select(*docs.columns)
    )
    if persist:
        q = q.persist()
    exact_kept = (
        q.groupBy(F.md5(normalized_text(F.col("text"))).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    fdocs = q.join(exact_kept, "doc_id", "left_semi")
    if persist:
        fdocs = fdocs.persist()
    near_dropped = (
        _jaccard_pairs(fdocs)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = fdocs.join(near_dropped, "doc_id", "left_anti")

    def stage(idx, name, df):
        return df.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    out = (
        stage(1, "raw", docs)
        .unionByName(stage(2, "quality", q))
        .unionByName(stage(3, "exact_dedup", fdocs))
        .unionByName(stage(4, "near_dedup", final))
    )
    sec = t(out)
    if persist:
        q.unpersist()
        fdocs.unpersist()
    return sec


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mrtweety_analytic_spark.operators.dedup import q_dedup_ngram_jaccard
    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark
    from mrtweety_analytic_spark.sources import load_table

    spark = get_spark("opt-exp")
    spark.sparkContext.setLogLevel("ERROR")
    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 101).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )
    QUERIES["q_scan_parquet"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    docs = load_table(spark, sf_dir, "documents")

    # --- label propagation A/B (shared fresh pairs per rep) ---
    for rep in range(3):
        rows = {}
        for name, fn in [
            ("old_joincount", lambda p: propagate_old(p)),
            ("new_eager", lambda p: propagate_new(p, eager=True)),
            ("new_lazy", lambda p: propagate_new(p, eager=False)),
        ]:
            t0 = time.time()
            pairs = (
                q_dedup_ngram_jaccard(spark, sf_dir)
                .select("doc_a", "doc_b")
            )
            labels = fn(pairs)
            t(labels.select(F.col("doc").alias("doc_id"),
                            F.col("label").alias("cluster_id")))
            rows[name] = round(time.time() - t0, 3)
        print("propagate rep", rep, rows, flush=True)

    # --- funnel persist A/B ---
    for rep in range(3):
        a = funnel_counts(docs, persist=False)
        b = funnel_counts(docs, persist=True)
        print(f"funnel rep {rep} nopersist={a} persist={b}", flush=True)


if __name__ == "__main__":
    main()
