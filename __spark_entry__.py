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

# Round-11 rotation (VERDICT r10 item 1, executed exactly as
# pre-committed in round 10): the 4 round-10 operators LEAD, then
# the 38-name remainder of oracled-but-never-driver-windowed queries
# in its pre-committed order. These 42 names ZERO the certification
# backlog — after this window, every oracled operator in the registry
# has at least one driver full-pass row. The remaining slots carry
# the round-11 additions, windowed in their birth round (VERDICT r10
# item 2), plus changed-code re-checks. Every name below has a DuckDB
# oracle and passes the dtype-gated vanilla differential at sf 0.01.
#
# Pre-committed ROUND-12 window policy (the backlog is zero, so the
# window becomes a freshness rotation): (1) any oracled round-12
# births lead; (2) then operators whose code changed in round 12;
# (3) the remaining slots rotate through the oracled names with the
# STALEST driver row, oldest round first (start of that list:
# the r01-certified core — q_scan_parquet, q_scan_pruned,
# q_source_json_lines, q_project_expr, q_filter_blacklist, ... in
# registry order), skipping rows-only names as always.
PRIORITY = [
    "s_novelty_bucketed",
    "s_minhash_dup_rate",
    "q_tokenizer_fertility",
    "s_quality_gate",
    "q_scan_file_metadata",
    "q_sim_pq_assign",
    "q_recursive_cte",
    "q_subquery_in",
    "q_subquery_scalar",
    "q_table_diff",
    "q_udtf_expand_json",
    "q_sink_csv_roundtrip",
    "q_sink_json_roundtrip",
    "q_sink_orc_roundtrip",
    "q_text_chunk",
    "q_text_cooccur",
    "q_text_decontaminate",
    "q_text_domain_mix",
    "q_text_edit_distance",
    "q_text_ngrams",
    "q_text_pack_sequences",
    "q_text_redact",
    "q_text_repetition",
    "q_text_sentiment",
    "q_text_unigram_logprob",
    "q_text_vocab_coverage",
    "q_tpch_q11like",
    "q_tpch_q12like",
    "q_tpch_q13like",
    "q_tpch_q14like",
    "q_tpch_q15like",
    "q_tpch_q16like",
    "q_tpch_q17like",
    "q_tpch_q19like",
    "q_tpch_q20like",
    "q_tpch_q21like",
    "q_tpch_q22like",
    "q_tpch_q8like",
    "q_tpch_q9like",
    "q_win_fill_forward",
    "q_win_first_last",
    "q_win_pct_change",
    # round-11 additions (birth-round windowing per VERDICT r10
    # item 2). s_minhash_dup_rate_fast is rows-only by design and
    # deliberately NOT windowed (a no_oracle row certifies nothing).
    "s_dedup_url",
    "s_tokenizer_fertility",
    "s_mix_rebalance",
    "s_dq_freshness",
    # Remaining 4 slots: mandatory re-checks of operators whose code
    # changed this round — q_mix_dsir_weights (logw kernel factored
    # out), q_dedup_url (canonicalization factored out), and
    # q_mix_rebalance (report arithmetic factored out) — plus one
    # streaming op re-certified through the new _run_to_memory
    # row-budget guard path. All oracled; zero no_oracle slots.
    "q_mix_dsir_weights",
    "q_dedup_url",
    "q_mix_rebalance",
    "s_topk_pipeline",
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
