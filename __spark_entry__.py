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

# Round-10 rotation (VERDICT r09 item 1, followed exactly): the 14
# oracled round-9 operators lead (q_text_bpe_apply is rows-only by
# design and deliberately NOT windowed — a no_oracle row certifies
# nothing), then 36 never-driver-sampled oracled names taken from the
# round-9 remainder list in its original order, SKIPPING the three
# no-oracle names it contained (q_agg_countmin_eval, q_multimodal_phash,
# q_dedup_lsh_eval). Every name below has a DuckDB oracle and passes
# the dtype-gated vanilla differential at sf 0.01.
#
# Oracled-never-sampled remainder after this window: the 4 round-10
# operators LEAD round 11's window (s_novelty_bucketed,
# s_minhash_dup_rate, q_tokenizer_fertility, s_quality_gate), then
# the 38 names below in this order — 42 slots, which ZEROES the
# backlog with 8 slots spare for round-11 additions:
# q_scan_file_metadata q_sim_pq_assign q_recursive_cte q_subquery_in
# q_subquery_scalar q_table_diff q_udtf_expand_json
# q_sink_csv_roundtrip q_sink_json_roundtrip q_sink_orc_roundtrip
# q_text_chunk q_text_cooccur q_text_decontaminate q_text_domain_mix
# q_text_edit_distance q_text_ngrams q_text_pack_sequences
# q_text_redact q_text_repetition q_text_sentiment
# q_text_unigram_logprob q_text_vocab_coverage q_tpch_q11like
# q_tpch_q12like q_tpch_q13like q_tpch_q14like q_tpch_q15like
# q_tpch_q16like q_tpch_q17like q_tpch_q19like q_tpch_q20like
# q_tpch_q21like q_tpch_q22like q_tpch_q8like q_tpch_q9like
# q_win_fill_forward q_win_first_last q_win_pct_change
PRIORITY = [
    "q_dq_gopher_rules",
    "q_dedup_srp_pairs",
    "q_dedup_srp_cert",
    "q_sim_ivfpq_residual",
    "q_sim_ivfpq_residual_recall",
    "q_sim_ivfpq_residual_refine",
    "q_sim_ivfpq_residual_refine_recall",
    "s_novelty_decay",
    "q_text_pretokenize",
    "q_text_bm25",
    "q_sim_hybrid_rrf",
    "q_mix_dsir_weights",
    "q_sim_matryoshka_recall",
    "q_sim_hamming_topk",
    "q_shard_assign",
    "q_mix_rebalance",
    "q_ts_changepoint",
    "q_ts_holt",
    "q_dq_drift",
    "q_join_interval_overlap",
    "q_text_bpe_pairs",
    "q_events_pareto",
    "q_graph_bfs",
    "q_text_llr",
    "s_dq_drift",
    "q_maintenance_vacuum",
    "q_sample_weighted",
    "q_sql_identifier",
    "q_sink_text_roundtrip",
    "q_dq_skew",
    "q_ts_seasonal",
    "q_ts_outlier_mad",
    "q_join_asof_nearest",
    "q_tpch_q1like",
    "q_agg_salted_twophase",
    "q_anomaly_zscore",
    "q_cdc_apply",
    "q_date_spine",
    "q_dedup_containment",
    "q_dq_expectations",
    "q_dq_profile",
    "q_events_anomaly_zscore",
    "q_events_funnel",
    "q_events_retention",
    "q_events_transitions",
    "q_graph_degree",
    "q_join_bucketed",
    "q_lateral_subquery",
    "q_maintenance_compact",
    "q_maintenance_zorder",
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
