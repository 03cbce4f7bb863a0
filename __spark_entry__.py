"""Driver contract for the spark-graft builder (PySpark target).

entry()     — flagship trending-terms query at sf 0.001 (the reference
              dataflow transplanted to the documents corpus;
              SURVEY.md §7.1).
queries()   — one callable per implemented operator (SURVEY.md §2B).
oracle_sql()— DuckDB twins with matching column aliases; operators
              without an entry get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mrtweety_analytic_spark.queries import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Round-5 rotation (VERDICT r04 item 1): every name the driver's
# 50-entry correctness window samples this round is one it has NEVER
# sampled in rounds 1-4 (the flagship/streaming/LLM tiers already
# carry driver-green rows from r01-r04 and stay oracle-verified
# locally), plus five re-checks: the four stale r01 rows
# (q_agg_collect, whose only driver row predates its fix in commit
# 6841fdb, and the three rows-only sketches) and q_fn_variant_schema
# (oracle re-pinned this round with numeric-type normalization).
# After this round, 107 registered names remain never-driver-
# sampled (every one replica-green at sf 0.01 AND green under the
# vanilla driver-style session differential, tools/verify_vanilla.py):
# round 6's window takes 50 (late-round-5 rolled ops first, then
# q_fn_*/q_tpch_*), round 7 the rest. The exact set, recomputed from
# CORRECTNESS_r01-r04 union this PRIORITY against the registry:
# q_agg_salted_twophase q_anomaly_zscore q_cdc_apply q_corpus_funnel
# q_date_spine q_dedup_containment q_dedup_lsh_eval
# q_dedup_simhash_pairs q_dq_expectations q_dq_kanonymity
# q_dq_profile q_events_anomaly_zscore q_events_attribution
# q_events_funnel q_events_retention q_events_rfm
# q_events_transitions q_events_window_funnel q_fn_array
# q_fn_array_lambda q_fn_base64 q_fn_bitwise q_fn_case q_fn_date
# q_fn_date_arith q_fn_hash_digest q_fn_interval q_fn_json q_fn_map
# q_fn_math q_fn_regex_extract_all q_fn_sql_udf q_fn_string
# q_fn_try_cast q_fn_url_parse q_fn_variant q_fn_xml q_graph_degree
# q_join_bucketed q_join_dpp q_lateral_subquery
# q_maintenance_compact q_maintenance_zorder q_multimodal_cdc_chunks
# q_multimodal_pair_align q_observe_metrics q_recursive_cte
# q_scan_corrupt_tolerant q_scan_file_metadata q_scan_schema_merge
# q_sessionize_gaps q_sim_ivf_kmeans q_sim_ivf_kmeans_recall
# q_sim_ivf_recall_eval q_sim_lsh_eval q_sim_outliers
# q_sim_pq_assign q_sink_csv_roundtrip q_sink_json_roundtrip
# q_sink_orc_roundtrip q_source_json_corrupt q_split_leakage_safe
# q_sql_named_params q_subquery_in q_subquery_scalar q_table_diff
# q_text_chunk q_text_cooccur q_text_decontaminate
# q_text_domain_entropy q_text_domain_mix q_text_edit_distance
# q_text_heavy_hitters q_text_ngrams q_text_pack_sequences
# q_text_passage_scrub q_text_redact q_text_repetition
# q_text_sentiment q_text_unigram_logprob q_text_vocab_coverage
# q_text_zipf_fit q_tpch_q11like q_tpch_q12like q_tpch_q13like
# q_tpch_q14like q_tpch_q15like q_tpch_q16like q_tpch_q17like
# q_tpch_q19like q_tpch_q20like q_tpch_q21like q_tpch_q22like
# q_tpch_q2like q_tpch_q4like q_tpch_q8like q_tpch_q9like
# q_udtf_expand_json q_win_fill_forward q_win_first_last q_win_frame
# q_win_pct_change q_win_streaks s_dedup_within_watermark
# s_heavy_hitters s_session_dynamic s_topk_update_sink
# Of these, the 26 round-5-new operators should LEAD the round-6
# window (new code earns driver evidence first):
# q_corpus_funnel q_dedup_simhash_pairs q_dq_kanonymity
# q_events_attribution q_events_rfm q_events_window_funnel
# q_fn_sql_udf q_join_dpp q_multimodal_cdc_chunks
# q_multimodal_pair_align q_observe_metrics
# q_scan_corrupt_tolerant q_scan_schema_merge q_sim_ivf_kmeans
# q_sim_ivf_kmeans_recall q_text_passage_scrub q_sim_ivf_recall_eval q_sim_lsh_eval
# q_sim_outliers q_source_json_corrupt q_split_leakage_safe
# q_sql_named_params q_text_domain_entropy q_text_heavy_hitters
# q_text_zipf_fit q_win_streaks s_heavy_hitters
PRIORITY = [
    # stale-r01 re-checks
    "q_agg_collect",
    "q_agg_approx_distinct",
    "q_agg_sketch_merge",
    "q_agg_approx_quantile",
    # operators NEW this round — earn fresh driver rows first
    "q_basket_pairs",
    "q_text_pmi",
    "q_ts_interpolate",
    "q_mv_incremental",
    "q_events_paths",
    "q_dq_referential",
    "q_ts_autocorr",
    "q_ts_ewma",
    "q_events_ltv",
    "q_events_concurrency",
    "q_mv_join_incremental",
    "q_text_feature_hash",
    "s_window_distinct",
    "q_sink_partition_overwrite",
    "q_ts_similarity",
    "q_events_active_users",
    "q_events_growth_accounting",
    "q_win_capped_running_sum",
    "q_ts_forecast_eval",
    "q_multimodal_offload",
    "q_events_ab_test",
    "q_cdc_scd2",
    "q_dedup_url",
    "q_text_passage_dedup",
    "q_agg_decayed",
    "q_sample_reservoir",
    # operators changed this round — earn fresh driver rows
    "q_udf_arrow",
    "q_source_binaryfile",
    "q_join_bloom_runtime",
    "q_graph_triangles",
    "q_graph_pagerank",
    "s_decayed_score",  # new this round: stateful decayed-score streaming op
    "s_upsert_sink",  # new: foreachBatch CDC upsert, merge-law certified
    "q_fn_variant_schema",
    # window functions
    "q_win_rank",
    "q_win_lag_lead",
    "q_win_percentile",
    # set operations
    "q_set_union",
    "q_set_intersect",
    "q_set_except",
    "q_set_intersect_all",
    "q_set_except_all",
    # TPC-H shapes all rolled to the round-6 window (q2/q4/q8/q9/
    # q11/q12/q13/q15/q17/q20like) to make room for the mining,
    # time-series, and event-analytics waves above — every one stays
    # replica-green at sf 0.01 and vanilla-session-green
    "q_sim_ivf_rerank",  # new this round: two-stage ANN retrieval
    # sink roundtrips
    "q_sink_parquet_roundtrip",
    # (csv/json roundtrip sinks rolled to round 6 — parquet and
    # the custom Python-DS sink stay as the window's sink rows)
    "q_sink_custom_pyds",
    # data quality / changelog / recursion
    # (q_fn_xml rolled to round 6 for the delta-join MV op)
    "q_join_anti",  # gate made non-trivial this round — driver re-check
]


def _ordered(mapping: dict) -> dict:
    out = {n: mapping[n] for n in PRIORITY if n in mapping}
    out.update((n, v) for n, v in mapping.items() if n not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_text_trending"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
