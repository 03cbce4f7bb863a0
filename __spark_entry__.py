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

# Round-9 rotation (VERDICT r08 items 1+3): the 9 round-8
# hash_match:false rows lead (adjudicated oracle-dtype artifacts —
# DuckDB SUM(BIGINT)->HUGEINT->fetchdf float64 vs Spark int64; every
# oracle now carries CAST(... AS BIGINT) and passes the new pandas-
# dtype gate in tools/verify_oracle.py), then the 2 latent members of
# the same class (q_agg_hll_merge, q_sessionize_gaps — fixed BEFORE
# their first window), then the 5 round-8-new operators, then 34
# never-driver-sampled names from the round-8 remainder in its
# original order. Every name below passes the dtype-gated vanilla
# differential at sf 0.01.
#
# Never-driver-sampled remainder after this window (77 names + the 15
# round-9-new operators, which LEAD round 10's window in this order:
# q_dq_gopher_rules q_dedup_srp_pairs q_dedup_srp_cert
# q_sim_ivfpq_residual q_sim_ivfpq_residual_recall
# q_sim_ivfpq_residual_refine q_sim_ivfpq_residual_refine_recall
# s_novelty_decay q_text_pretokenize q_text_bpe_apply q_text_bm25
# q_sim_hybrid_rrf q_mix_dsir_weights q_sim_matryoshka_recall
# q_sim_hamming_topk — then the remainder below in order):
# q_shard_assign q_mix_rebalance q_ts_changepoint q_ts_holt
# q_dq_drift q_join_interval_overlap q_text_bpe_pairs
# q_events_pareto q_graph_bfs q_text_llr s_dq_drift
# q_maintenance_vacuum q_sample_weighted q_agg_countmin_eval
# q_multimodal_phash q_sql_identifier q_sink_text_roundtrip
# q_dq_skew q_ts_seasonal q_ts_outlier_mad q_join_asof_nearest
# q_tpch_q1like q_agg_salted_twophase q_anomaly_zscore q_cdc_apply
# q_date_spine q_dedup_containment q_dedup_lsh_eval
# q_dq_expectations q_dq_profile q_events_anomaly_zscore
# q_events_funnel q_events_retention q_events_transitions
# q_graph_degree q_join_bucketed q_lateral_subquery
# q_maintenance_compact q_maintenance_zorder q_recursive_cte
# q_scan_file_metadata q_sim_pq_assign q_sink_csv_roundtrip
# q_sink_json_roundtrip q_sink_orc_roundtrip q_subquery_in
# q_subquery_scalar q_table_diff q_text_chunk q_text_cooccur
# q_text_decontaminate q_text_domain_mix q_text_edit_distance
# q_text_ngrams q_text_pack_sequences q_text_redact
# q_text_repetition q_text_sentiment q_text_unigram_logprob
# q_text_vocab_coverage q_tpch_q11like q_tpch_q12like
# q_tpch_q13like q_tpch_q14like q_tpch_q15like q_tpch_q16like
# q_tpch_q17like q_tpch_q19like q_tpch_q20like q_tpch_q21like
# q_tpch_q22like q_tpch_q8like q_tpch_q9like q_udtf_expand_json
# q_win_fill_forward q_win_first_last q_win_pct_change
PRIORITY = [
    "q_dq_ks_test",
    "q_dq_chi2",
    "s_ks_drift",
    "q_shard_balance",
    "q_sql_group_by_all",
    "q_multimodal_webdataset",
    "q_scan_zonemap_skip",
    "q_scan_bloom_skip",
    "q_sim_mips_prune",
    "q_agg_hll_merge",
    "q_sessionize_gaps",
    "q_graph_kcore_cert",
    "q_dedup_simhash_md5",
    "q_dedup_simhash_md5_pairs",
    "q_sim_ivfpq_refine",
    "q_sim_ivfpq_refine_recall",
    "q_events_ab_power",
    "q_sample_neyman",
    "q_text_burstiness",
    "q_text_compress_ratio",
    "q_events_did",
    "q_orders_backlog_aging",
    "q_join_asof_forward",
    "q_agg_hll_intersect",
    "q_dq_table_checksum",
    "s_hll_distinct",
    "q_agg_corr_matrix",
    "q_sample_ht_total",
    "q_agg_skew_kurtosis",
    "q_fn_try_arith",
    "q_graph_degree_powerlaw",
    "q_sample_time_split",
    "q_graph_common_neighbors",
    "q_agg_weighted_median",
    "q_text_bigram_logprob",
    "q_dedup_threshold_sweep",
    "q_sql_execute_immediate",
    "q_sql_union_by_name",
    "q_dedup_incremental",
    "q_sim_gram",
    "q_sim_pca_power",
    "q_mix_temperature",
    "q_win_moving_regression",
    "q_text_bpe_train",
    "q_agg_regression",
    "q_events_feature_window",
    "q_sim_pq_adc",
    "q_sim_pq_adc_recall",
    "s_threshold_alert",
    "q_sim_pq_trained_recall",
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
