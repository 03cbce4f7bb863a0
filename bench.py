"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "core_total": N, "sf": 0.1}
and writes the FULL payload (every per-query cold + warm timing,
errors included) to bench_full.json next to this file, because the
driver's BENCH_r{N}.json artifact retains only a 2000-char tail of
stdout — r5 vs r6 could not be compared from artifacts alone
(VERDICT r06 item 3).

Round-over-round comparability: HEADLINE_CORE is the round-5
headline list, FROZEN — append new queries to HEADLINE_EXTRA only.
core_total / core_warm_total are computed over exactly these names
in exactly this order every round (they run first, so their cold
pass replicates the r5 measurement conditions).

Each query is forced to full materialization through the noop sink
(count()/collect() could let Spark skip columns). Unmeasured
warm-up queries absorb session startup, first-shuffle cost, AND the
Python-worker-pool fork + per-worker numpy/pandas import + Arrow
init (~2.5-2.7 s measured; PLANS.md "q_sim_knn_batch honest
number") so the numbers reflect steady-state engine throughput and
every round measures the same session state.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# FROZEN round-5 headline list (77 queries) — the round-comparable
# core. Do NOT add, remove, or reorder names here; new benchmarks go
# in HEADLINE_EXTRA below. BENCH_r05's headline_total (56.3 s warm
# session-state; see PLANS.md) and every later round's core_total
# are sums over exactly this list in exactly this order.
HEADLINE_CORE = [
    "q_text_trending",          # the flagship reference query
    "q_text_trending_by_source",
    "q_text_quality",
    "q_agg_multi",              # TPC-H Q1 shape
    "q_agg_rollup",
    "q_agg_count_by_key",
    "q_join_multiway",          # broadcast star join
    "q_join_theta_range",       # band self-join
    "q_join_asof",
    "q_win_topk_per_group",
    "q_sort_limit_topk",
    "q_dedup_exact",
    "q_sim_knn_cosine",
    "q_sim_knn_batch",          # Arrow/numpy matmul path
    "q_project_expr",
    "q_udf_scalar",             # pandas-UDF path
    "q_tpch_q3like",            # selective star join -> top-10
    "q_tpch_q5like",            # 5-way broadcast star join
    "q_sim_ivf_label",          # cell-blocked ANN
    "q_dedup_ngram_jaccard",    # inverted-index exact jaccard
    "q_text_tokencount",
    "q_agg_percentile",
    "q_dedup_pipeline",         # end-to-end corpus-prep composite
    "q_join_range_bucketed",    # no-equi-key band join, bucket-exploded
    "q_text_tfidf",
    "q_sessionize_gaps",
    "q_events_funnel",
    "q_dedup_keep_latest",
    "q_text_prep_pipeline",
    "q_tpch_q7like",             # 5-dim broadcast star, cross-path residual
    "q_dq_profile",              # single-scan column profile
    "q_sim_kmeans_assign",       # shuffle-free nearest-centroid pass
    "q_cdc_apply",               # changelog keep-latest
    "q_win_percentile",          # window-aggregate median
    "q_events_retention",        # cohort triangle, exchange reuse
    "q_text_pack_sequences",     # training-shard packing
    # round-2 additions (r1 names above unchanged for comparability)
    "q_graph_pagerank",          # iterative join/agg PageRank
    "q_dedup_containment",       # asymmetric shingle containment
    "q_sim_pq_assign",           # product-quantization encoding
    "q_text_chunk",              # overlapping token chunking
    "q_maintenance_zorder",      # Morton-key clustering audit
    "q_join_bloom_runtime",      # runtime bloom-filter pruned join
    # round-4 additions
    "q_udf_arrow",               # zero-copy mapInArrow batch path
    "q_table_diff",              # (key, digest) snapshot reconciliation
    "q_fn_variant_schema",       # variant schema-drift probe
    "q_sql_pipe",                # SQL pipe syntax surface
    "q_fn_collation",            # collated case-insensitive grouping
    # round-5 additions
    "q_text_passage_dedup",      # bounded shingle index, map-side fan-out
    "q_dedup_url",               # canonical-URL ingest dedup
    "q_cdc_scd2",                # changelog -> validity intervals
    "q_agg_decayed",             # recency-weighted aggregation
    "q_sample_reservoir",        # deterministic per-stratum top-k sample
    "q_sim_ivf_rerank",          # two-stage ANN: centroid routing + exact rerank
    "q_scan_schema_merge",       # mergeSchema scan over drifted generations
    "q_events_attribution",      # last-touch as-of argmax + rollup
    "q_text_heavy_hitters",      # Misra-Gries candidates + exact verify
    "q_corpus_funnel",           # capstone curation funnel composite
    "q_sim_ivf_kmeans",          # learned-quantizer IVF (2 Lloyd iters)
    "q_basket_pairs",            # a-priori support-pruned pair mining
    "q_text_pmi",                # PMI collocations, one-pass tokenize
    "q_ts_interpolate",          # date-spine linear gap repair
    "q_mv_incremental",          # partial-aggregate view maintenance
    "q_events_paths",            # first-3-event path counting
    "q_dq_referential",          # FK orphan/coverage audit
    "q_ts_autocorr",             # seasonality probe on daily series
    "q_ts_ewma",                 # one-pass EWMA window algebra
    "q_events_ltv",              # cohort LTV curves, window on tiny agg
    "q_events_concurrency",      # partition-parallel sweep-line
    "q_mv_join_incremental",     # delta-join view maintenance
    "q_text_feature_hash",       # 256-bucket hashing-trick featurizer
    "q_ts_similarity",           # sparse-identity trajectory top-k
    "q_events_active_users",     # DAU/WAU/MAU bounded fan-out
    "q_events_growth_accounting", # new/retained/resurrected/churned
    "q_win_capped_running_sum",  # non-associative fold, Arrow kernel
    "q_ts_forecast_eval",        # one-step-ahead EWMA backtest
    "q_multimodal_offload",      # content-addressed payload store
    "q_events_ab_test",          # deterministic-assignment z-test
]

# Open-ended: per-round additions land here (cold+warm timings are
# still recorded per-query in bench_full.json).
HEADLINE_EXTRA = [
    # round-6 additions
    "q_shard_assign",            # hash-addressed training shards
    "q_mix_rebalance",           # target-mix down-sampling plan
    "q_ts_changepoint",          # CUSUM level-shift argmax
    "q_ts_holt",                 # coupled-recurrence Arrow kernel
    "q_dq_drift",                # PSI train/serve drift audit
    "q_join_interval_overlap",   # interval x interval bucket join
    "q_text_bpe_pairs",          # BPE merge-step pair counts
    "q_events_pareto",           # Lorenz concentration deciles
    "q_graph_bfs",               # frontier BFS, recursive-CTE oracle
    "q_text_llr",                # Dunning LLR collocations
    "q_maintenance_vacuum",      # manifest-vs-listing GC
    "q_sample_weighted",         # integer-exact priority sampling
    "q_agg_countmin_eval",       # CMS sketch, measured error
    "q_training_export",         # curate -> rebalance -> shard capstone
    "q_multimodal_phash",        # banded aHash near-dup pairs
    "q_sink_text_roundtrip",     # text source/sink round-trip
    "q_dq_skew",                 # join-key skew diagnostic
    "q_ts_seasonal",             # moving-average decomposition
    "q_ts_outlier_mad",          # robust MAD anomaly days
    "q_join_asof_nearest",       # tolerance-bounded nearest-in-time
    "q_tpch_q1like",             # full-fidelity pricing summary
    "q_dedup_incremental",       # batch-vs-corpus digest anti-join
    "q_sim_gram",                # one-pass X^T X partial-agg kernel
    "q_sim_pca_power",           # Gram -> power iter -> PC1 projection
    "q_mix_temperature",         # alpha=0.7 source-mix flattening
    "q_win_moving_regression",   # rolling OLS slope, O(1) window state
    "q_text_bpe_train",          # vocab-reduced k-merge BPE loop
    "q_agg_regression",          # regr_* one-pass per-group OLS
    "q_events_feature_window",   # point-in-time leakage-safe features
    "q_sim_pq_adc",              # PQ asymmetric-distance top-k
    "q_sim_pq_adc_recall",       # measured ADC quality certificate
    "q_sim_pq_trained",          # Lloyd-trained codebook ADC (0.16->0.29)
    "q_sample_time_split",       # embargoed temporal train/test split
    "q_graph_common_neighbors",  # bounded-candidate link-pred scoring
    "q_agg_weighted_median",     # O(1)-state weighted percentile
    "q_text_bigram_logprob",     # add-one bigram-LM fluency score
    "q_dedup_threshold_sweep",   # semantic-dedup cutoff calibration
    "q_sql_execute_immediate",   # dynamic SQL, bound parameters
    "q_sql_union_by_name",       # schema-drift union, null-filled
    "q_dedup_minhash_md5",       # oracle-certified banded MinHash-LSH
    "q_text_pii_stats",          # per-source PII exposure report
    "q_events_bot_detect",       # timing-regularity bot flagging
    "q_ts_crosscorr",            # lead/lag cross-correlation grid
    "q_win_cumulative_distinct", # running distinct via first-flag sum
    "q_join_scd2_pit",           # point-in-time SCD2 dimension join
    "q_sim_semantic_clusters",   # paraphrase families via shared CC core
    "q_dedup_keep_best",         # quality-argmax canonical per cluster
    "q_sample_diversity",        # <=2 reps per paraphrase family
    "q_agg_largest_remainder",   # Hamilton quota allocation
    "q_dq_benford",              # first-digit drift check
    "q_ts_theil_sen",            # robust median-of-slopes trend
    "q_ts_periodogram",          # DFT seasonality detector
    "q_sample_negative_pairs",   # contrastive negatives via md5 argmin
    "q_graph_assortativity",     # degree-degree correlation
    "q_events_audience_overlap", # pairwise audience Jaccard
    "q_multimodal_validate",     # payload-vs-metadata integrity gate
    "q_agg_hhi",                 # market-concentration index
    "q_dq_duplicate_charges",    # double-billing pair detector
    "q_events_time_to_convert",  # funnel-latency histogram
    "q_events_stickiness",       # exact rolling DAU/MAU
    "q_text_source_divergence",  # per-source unigram KL drift
    "q_ts_drawdown",             # running-peak collapse metric
    "q_events_anomaly_deseasonalized",  # residual z-score alarms
    "q_agg_winsorized",          # percentile-clipped robust mean
    "q_sim_cluster_cohesion",    # direct-edge fraction certificate
    "q_text_templates",          # structural-shape boilerplate miner
    "q_events_behavior_entropy", # per-user type-mix entropy histogram
    "q_text_readability",        # Flesch score, regex-only map pass
    "q_dq_freshness",            # per-stream staleness vs corpus max
    "s_rate_limit",              # integer token-bucket admission
    "q_sim_dim_stats",           # per-dimension embedding QC
    "q_events_seq_trigrams",     # order-2 behavior sequences
    "q_graph_kcore",             # 2-core fringe peel
    "q_dedup_size_histogram",    # duplication profile buckets
    "q_agg_anova",               # one-way F-test across groups
    "q_orders_ship_sla",         # order-to-ship latency by priority
    "q_text_lang_confusion",     # langid evaluation matrix
    "q_events_ab_srm",           # sample-ratio-mismatch guard
    "q_sim_random_projection",   # JL norm-preservation certificate
    "q_events_bounce_rate",      # single-event session share
    "q_multimodal_size_histogram",  # power-of-two payload buckets
    "q_dedup_cross_source",      # syndication matrix
    "q_fn_struct",               # struct build/access/compare/json
    "q_ts_volatility",           # rolling stddev of daily deltas
    "q_text_code_detect",        # code-vs-prose router
    "q_orders_reorder_gaps",     # purchase-cadence histogram
    "q_mix_effective_counts",    # dedup-aware mixture denominators
    "q_join_asof_tolerance",     # staleness-bounded as-of join
    "q_events_calendar_heatmap", # dow x hour traffic matrix
    "s_priority_sample",         # order-independent stream sampler
    "q_sim_sparse_cosine",       # inverted-index sparse all-pairs cosine
    "q_sample_balanced",         # minority-class-balanced downsample
    "q_graph_modularity",        # community-quality certificate
    "q_sim_knn_filtered",        # pre-filtered vector search
    "q_events_gini",             # activity-concentration Gini
    "q_events_survival",         # Kaplan-Meier cohort survival
    "q_shard_balance",           # snake-order size-balanced shards
    "q_join_skew_hybrid",        # hot-broadcast/cold-shuffle join
    "q_ts_hampel",               # rolling robust outlier filter
    "s_scd2_stream",             # stateful streaming SCD2 build
    "q_sql_group_by_all",        # GROUP BY ALL / ORDER BY ALL surface
    "q_text_rake",               # RAKE keyphrase extraction
    "q_sim_nprobe_curve",        # IVF recall-vs-nprobe tuning curve
    "q_agg_bootstrap_ci",        # one-pass Poisson-bootstrap CI
    "q_text_winnowing",          # MOSS winnowing fingerprints
    "q_graph_hits",              # hubs/authorities duality
    "s_enrich_pit",              # stream-static point-in-time enrich
    "q_ts_strength",             # trend/seasonality strength F-measures
    "q_text_char_entropy",       # bits-per-char gibberish probe
    "q_orders_price_index",      # matched-basket Laspeyres index
    "q_events_hill_tail",        # power-law tail index (skew alarm)
    "q_win_tumbling",            # batch window() TVF parity
    "q_dq_reconciliation",       # header-vs-lines money audit
    "q_multimodal_webdataset",   # byte-budget shard manifest
    "q_orders_abc_xyz",          # revenue x volatility classification
    "q_agg_hll_md5",             # oracle-certified from-scratch HLL
    "q_scan_zonemap_skip",       # zone-map skip-safety certificate
    "q_agg_cms_md5",             # oracle-certified Count-Min sketch
    "q_scan_bloom_skip",         # bloom point-lookup skip certificate
    "q_graph_adamic_adar",       # degree-weighted link prediction
    "q_sim_mips_prune",          # norm-bound MIPS zero-miss pruning
    "q_events_ab_power",         # experiment sample-size planning
    "q_ts_dtw",                  # banded DTW via Arrow-batched DP
    "q_sample_neyman",           # variance-optimal sampling budget
    "q_text_burstiness",         # per-doc dispersion index
    "q_text_compress_ratio",     # real deflate quality signal
    "q_events_did",              # difference-in-differences + placebo
    "q_orders_backlog_aging",    # point-in-time open-order exposure
    "q_agg_hll_merge",           # lossless sketch-merge certificate
    "q_join_asof_forward",       # label-side as-of (time-to-next)
    "q_agg_hll_intersect",       # sketch set algebra w/ exact cert
    "q_dq_table_checksum",       # order-independent content digest
    "s_hll_distinct",            # 256-row-state streaming sketch
    "q_agg_corr_matrix",         # decimal-exact feature correlations
    "q_sample_ht_total",         # reproducible PPS + HT estimation
    "q_agg_skew_kurtosis",       # exact-moment shape profiling
    "q_fn_try_arith",            # ANSI-safe null-propagation tier
    "q_ts_holt_winters",         # seasonal triple smoothing
    "q_graph_degree_powerlaw",   # scale-free go/no-go fit
    "q_sim_lsh_md5",             # certified hyperplane LSH recall
    # round-7 additions
    "q_agg_histogram_quantile",  # mergeable quantile sketch + error cert
    "s_quantile_sketch",         # streaming twin, 4096-row state
    "q_dq_ks_test",              # exact two-sample KS drift test
    "q_events_cuped",            # variance-reduced A/B readout
    "q_graph_components_cert",   # certified connected components
    "q_sim_ivfpq",               # composed IVF routing + PQ ADC index
    "q_sim_ivfpq_recall",        # measured compression+routing cost
    "q_sample_kfold",            # leakage-safe K-fold CV assignment
    "q_ts_ljung_box",            # whiteness test before forecasting
    "q_dq_chi2",                 # categorical independence + Cramer's V
    "s_ks_drift",                # streaming binned-KS drift monitor
    # round-8 additions
    "q_graph_kcore_cert",        # certified degree-peel 2-core
    "q_dedup_simhash_md5",       # engine-portable simhash signatures
    "q_dedup_simhash_md5_pairs",  # certified Manku-banded pairs
    "q_sim_ivfpq_refine",        # ADC shortlist -> exact re-rank
    "q_sim_ivfpq_refine_recall",  # measured refine recall lift
    # round-9 additions
    "q_dq_gopher_rules",         # integer-exact quality-rule census
    "q_dedup_srp_pairs",         # hyperplane-LSH semantic near-dup
    "q_dedup_srp_cert",          # SRP recall/cost certificate
    "q_sim_ivfpq_residual",      # true-FAISS residual IVFADC
    "q_sim_ivfpq_residual_recall",  # measured residual-encoding lift
    "q_sim_ivfpq_residual_refine",  # residual shortlist -> exact re-rank
    "q_sim_ivfpq_residual_refine_recall",  # encoding x refine grid cell
    "s_novelty_decay",           # streaming first-seen-key decay curve
    "q_text_pretokenize",        # regex run-class census
    "q_text_bpe_apply",          # vocab-cached BPE encode
    "q_text_bm25",               # one-pass BM25 lexical ranker
    "q_sim_hybrid_rrf",          # lexical+dense reciprocal-rank fusion
    "q_mix_dsir_weights",        # hashed-feature importance resampling
    "q_sim_matryoshka_recall",   # prefix-dim recall certificate
    "q_sim_hamming_topk",        # 1-bit BQ + histogram-cutoff top-k
    "s_novelty_bucketed",        # hard-capped 2^8-bucket novelty state
    # s_minhash_dup_rate (md5 certification tier) was benched in r10
    # at 25-51 s — the cost is the cross-engine md5 family, not the
    # plan. The headline measures the xxhash64 PRODUCTION tier of the
    # same plan (VERDICT r10 item 4); the md5 tier remains the
    # oracle-certified twin outside the bench.
    "s_minhash_dup_rate_fast",   # streaming dup monitor, production hash
    "s_quality_gate",            # streaming Gopher-rule ingest gate
    "q_tokenizer_fertility",     # per-(source, lang) token-budget census
    # round-11 additions
    "s_dedup_url",               # streaming crawl-front-door URL dedup
    "s_tokenizer_fertility",     # streaming token-budget census
    "s_mix_rebalance",           # streaming mix-rebalance monitor
    "s_dq_freshness",            # streaming stalled-producer detector
    # round-12 additions
    "s_schema_drift",            # streaming variant-shape drift census
    "q_training_export_full",    # split+decontaminated gated export
    "s_decontaminate",           # streaming contamination-inflow dial
]

HEADLINE = HEADLINE_CORE + HEADLINE_EXTRA


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    errors: dict[str, str] = {}

    # Untimed block scrub between queries (round-14; VERDICT r13
    # item 1). Dead persist/localCheckpoint blocks accumulate across
    # the 259-query session (checkpoint RDDs are invisible to the
    # CacheManager and freed only by driver-GC ContextCleaner
    # passes); the measured effect was a second-warm core drift of
    # 1.06-1.18x at 32 cores and worse at 8. The round-13
    # in-registry collector was REVERTED because its releases fired
    # asynchronously inside later queries' timed regions; this scrub
    # instead runs in the bench loop strictly AFTER a query's timing
    # stops and BEFORE the next timer starts, and uses BLOCKING
    # unpersist so the BlockManager settles within the untimed gap.
    # Semantics: every registry query builds its frames per call (no
    # cross-call block reuse survives round 13's memo removals), so
    # releasing all blocks between queries cannot change any result —
    # it only stops dead blocks from dragging later measurements.
    # Timed methodology (noop sink, query list, pass structure) is
    # unchanged. Set SPARK_GRAFT_SCRUB=0 to measure the old
    # accumulating behavior.
    scrub_on = os.environ.get("SPARK_GRAFT_SCRUB", "1") != "0"

    def scrub() -> None:
        if not scrub_on:
            return
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                try:
                    jrdd.unpersist(True)
                except Exception:
                    pass
        except Exception:
            pass

    def run(name: str) -> float:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def run_guarded(name: str) -> float | None:
        # One broken query must not zero the whole bench line (round-3
        # lesson: a single AnalysisException cost every timing). The
        # failure is reported in the JSON, and the timing is None —
        # never 0.0, which would be summed and make a breakage look
        # like a speedup in headline_total.
        try:
            return run(name)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            return None
        finally:
            # Outside the timed region: `run` has already stopped
            # its timer (or raised) by the time this executes.
            scrub()

    # Warm-up, unmeasured: a real shuffle + codegen pass (a metadata-
    # only count would leave the first measured query paying the
    # session's one-time shuffle setup cost).
    from pyspark.sql import functions as F

    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 101).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save()
    )
    (
        spark.range(10_000)
        .select(F.explode(F.split(F.lit("a b c d e"), " ")).alias("t"))
        .groupBy("t").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t").limit(5)
        .write.format("noop").mode("overwrite").save()
    )
    # Python-worker warm-up, unmeasured: forks the Arrow worker pool
    # and imports numpy/pandas inside each worker. Without this, the
    # first pandas-UDF/mapInPandas query in the run pays ~2.5-2.7 s
    # of one-time pool setup and its number is not comparable across
    # rounds (this is exactly what made q_sim_knn_batch swing
    # 0.654 s <-> 2.5 s between r5 and r6 sessions on identical
    # code — see PLANS.md).
    def _py_warm(it):
        import numpy as np  # noqa: F401  (worker-side import cost)

        for pdf in it:
            yield pdf

    (
        spark.range(100_000)
        .selectExpr("id", "cast(id as double) AS v")
        .mapInPandas(_py_warm, "id long, v double")
        .write.format("noop").mode("overwrite").save()
    )
    run_guarded("q_scan_parquet")
    errors.pop("q_scan_parquet", None)

    # In-artifact noise probe (VERDICT r10 item 3b): the flagship
    # query timed at three points interleaved through the bench —
    # right after warm-up, between the core and extra passes, and at
    # the very end. Same code, same data; the spread is pure host /
    # session-state noise and lets a judge adjudicate apparent
    # regressions from the artifact alone (r10's same-code core_warm
    # spanned 60-140 s across builder runs with no code change).
    noise_runs: list[float] = []

    def noise_probe() -> None:
        t = run_guarded("q_text_trending")
        errors.pop("q_text_trending", None)
        if t is not None:
            noise_runs.append(t)

    def run_passes(names: list[str]) -> tuple[
        dict[str, float | None], dict[str, float], dict[str, str]
    ]:
        # A failed query records null (JSON) and is excluded from the
        # total, so a failure can only make the headline look WORSE
        # (n_failed > 0), never faster. The warm (second) pass
        # separates steady-state throughput from first-touch codegen/
        # JIT cost; a query failing only warm is dropped from the
        # warm set (not zero-summed) and reported separately.
        cold: dict[str, float | None] = {}
        for name in names:
            cold[name] = run_guarded(name)
        w: dict[str, float] = {}
        w_err: dict[str, str] = {}
        for name in names:
            if cold[name] is None:
                continue
            errors.pop(name, None)
            t = run_guarded(name)
            if name in errors or t is None:
                w_err[name] = errors.pop(name, "unknown")
            else:
                w[name] = t
        return cold, w, w_err

    noise_probe()
    # HEADLINE_CORE cold+warm measured FIRST, in ISOLATION (VERDICT
    # r10 item 3a): in earlier rounds the core warm pass ran after
    # the ever-growing EXTRA list's cold pass, so core_warm_total
    # accumulated block-manager/session-state drag proportional to
    # how many EXTRA queries existed that round — an artifact, not a
    # regression. Now nothing runs before the core metric except the
    # fixed warm-up and one noise-probe run, every round, forever.
    core_cold, core_warm, core_warm_err = run_passes(HEADLINE_CORE)
    # Second same-code warm pass over the core (VERDICT r11 item 3):
    # two same-HEAD measurements in ONE artifact give an in-artifact
    # noise band — future rounds adjudicate per-query deltas against
    # [min, max] of the two warm totals instead of PLANS.md prose.
    # Still before any EXTRA query, so the isolation invariant holds.
    core_warm2: dict[str, float] = {}
    warm2_err: dict[str, str] = {}
    for _name in HEADLINE_CORE:
        if core_cold.get(_name) is None:
            continue
        _t = run_guarded(_name)
        if _name in errors or _t is None:
            # A second-warm-pass failure must be REPORTED, not
            # silently dropped (ADVICE r12): the artifact otherwise
            # shows a narrowed band with no sign a query failed.
            warm2_err[_name] = errors.pop(_name, "unknown")
        else:
            core_warm2[_name] = _t
    noise_probe()
    extra_cold, extra_warm, extra_warm_err = run_passes(HEADLINE_EXTRA)
    noise_probe()

    timings = {**core_cold, **extra_cold}
    warm = {**core_warm, **extra_warm}
    warm_errors = {**core_warm_err, **extra_warm_err}

    total = round(sum(t for t in timings.values() if t is not None), 3)
    core_total = round(
        sum(t for t in core_cold.values() if t is not None), 3
    )
    core_warm_total = round(sum(core_warm.values()), 3)
    sorted_noise = sorted(noise_runs)
    payload = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        # round-comparable: frozen r5 list, cold pass / warm pass.
        # core_isolated marks the r11+ harness: core measured before
        # any EXTRA query runs (not comparable to r10-era
        # core_warm_total, which carried the EXTRA cold pass's
        # session drag).
        "core_total": core_total,
        "core_warm_total": core_warm_total,
        # In-artifact same-code band: [min, max] of the two warm core
        # passes. A per-query delta vs last round smaller than this
        # spread is host noise, not a regression. warm2 is summed
        # over the names present in BOTH warm passes so the totals
        # compare like-for-like even if a query failed once.
        "band": sorted(
            [
                round(
                    sum(
                        t for n, t in core_warm.items()
                        if n in core_warm2
                    ),
                    3,
                ),
                round(
                    sum(
                        t for n, t in core_warm2.items()
                        if n in core_warm
                    ),
                    3,
                ),
            ]
        ),
        "queries_warm2": core_warm2,
        "core_isolated": True,
        "n_core": len(HEADLINE_CORE),
        "queries": timings,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "sf": sf,
        "n_failed": len([t for t in timings.values() if t is None]),
        "noise_probe": {
            "query": "q_text_trending",
            "runs": noise_runs,
            "median": (
                sorted_noise[len(sorted_noise) // 2] if sorted_noise else None
            ),
            "spread": (
                round(max(noise_runs) / min(noise_runs), 3)
                if noise_runs and min(noise_runs) > 0
                else None
            ),
        },
        # Machine-readable flag (VERDICT r10 item 3c): warm slower
        # than cold is physically host noise — never interpret the
        # totals of a flagged artifact without the noise_probe.
        "noise_flag": core_warm_total > core_total,
    }
    if errors:
        payload["errors"] = errors
    if warm_errors:
        payload["warm_errors"] = warm_errors
    if warm2_err:
        payload["warm2_errors"] = warm2_err
    # Full artifact on disk: BENCH_r{N}.json keeps only a 2000-char
    # stdout tail, so the complete per-query record must live in the
    # repo for round-over-round comparison.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
