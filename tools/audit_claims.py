"""Docstring-claim audit (VERDICT r11 item 7, made a standing gate).

Round 12 hand-audited the five r01-era operator families' docstrings
against their shipped physical plans and found the BM25-docstring
drift class twice (q_win_cumulative_distinct claimed one Exchange but
planned two — fixed by restructuring; q_tpch_q13like asserted the
at-scale join shape as THE plan). This tool pins every NAMED
plan-shape claim that audit verified, so doc/plan divergence — the
likeliest silent defect in a 400+-op registry — is re-checked
mechanically each round instead of re-discovered by hand.

Each entry: query -> (must_contain, must_not_contain, max_exchanges).
`must_contain` are substrings of the executed plan (pre-AQE
toString), counted with multiplicity; `max_exchanges` bounds
`Exchange hashpartitioning` occurrences (None = unchecked) — the
machine form of a docstring's "one exchange" claim. Broadcast
exchanges are not counted (they are the cheap kind the claims
recommend).

    python tools/audit_claims.py [sf_dir]

Exit 0 = all claims hold; nonzero lists the drifted ops.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# query -> (must_contain: list[str], must_not: list[str],
#           max_shuffle_exchanges: int | None)
CLAIMS: dict[str, tuple[list[str], list[str], int | None]] = {
    # scans.py: "metadata-only parquet row-count (no column
    # materialization)" == empty ReadSchema on the scan.
    "q_scan_parquet": (["ReadSchema: struct<>"], [], 0),
    # "ReadSchema is 3 of 11 columns and PushedFilters carries the
    # range predicate".
    "q_scan_pruned": (
        ["PushedFilters: [IsNotNull(l_orderkey), LessThanOrEqual(l_orderkey"],
        [],
        0,
    ),
    # joins.py: "Star join: both dims broadcast, single pass over
    # the fact" — two BHJs, no sort-merge; the ONLY shuffle is the
    # report aggregate's partial->final exchange.
    "q_join_multiway": (
        ["BroadcastHashJoin", "BroadcastHashJoin", "partial_"],
        ["SortMergeJoin"],
        1,
    ),
    "q_join_left": (["BroadcastHashJoin"], ["SortMergeJoin"], None),
    "q_join_semi": (["LeftSemi"], [], None),
    "q_join_anti": (["LeftAnti"], [], None),
    # sort_limit.py: "plans as TakeOrderedAndProject" — and never a
    # global Sort.
    "q_sort_limit_topk": (["TakeOrderedAndProject"], ["Sort ["], 0),
    # windows.py / aggregates.py / dedup.py: "rn <= k plans as
    # WindowGroupLimit" (partial top-k before the shuffle).
    "q_win_topk_per_group": (
        ["WindowGroupLimit", "Partial"], [], 1,
    ),
    "q_agg_mode": (["WindowGroupLimit"], [], None),
    "q_dedup_keep_latest": (
        ["WindowGroupLimit", "Partial"], [], 1,
    ),
    # windows.py round-12 fix: "Plan-checked: ONE Exchange on
    # user_id, two Sorts under it" — the claim that drifted.
    "q_win_cumulative_distinct": (["Window"], [], 1),
    # aggregates.py module header: partial->final hash aggregation.
    "q_agg_count_by_key": (["partial_count"], [], 1),
    "q_agg_multi": (["partial_"], [], 1),
    # filters: pure scan-side filters, zero shuffles before the
    # (single) report aggregate.
    "q_filter_blacklist": ([], ["Exchange"], 0),
    "q_sample_stratified": (["partial_"], [], 1),
    # mining.py: "window and per-user pivot share the user_id
    # partitioning (one exchange) ... final path count is a tiny
    # aggregate" == exactly 2 shuffle exchanges.
    "q_events_paths": (["WindowGroupLimit"], [], 2),
    # "one exchange total after the daily reduce" == 2 total.
    "q_ts_changepoint": ([], [], 2),
    # lifecycle.py: "NO global sort/row_number ... the only exchange
    # is the shard hash partition itself".
    "q_shard_assign": ([], ["Exchange SinglePartition"], 1),
    # windows.py: "rank interpolation ... NOT percentile().over()
    # ... sharing one user_id exchange + one sort".
    "q_win_percentile": ([], ["percentile"], 1),
    # aggregates.py: exact percentile WITHOUT the O(group)-state
    # percentile aggregate buffer (window rank interpolation).
    "q_agg_percentile": ([], ["percentile"], 2),
    # the flagship: reference R7-R9 top-5 plans as
    # TakeOrderedAndProject over one count exchange — never a
    # global sort.
    "q_text_trending": (["TakeOrderedAndProject"], ["Sort ["], 1),
    # windows.py: distinct (user, day) partial-dedupes map-side
    # (exchange 1 moves day-level rows, not raw events), then the
    # user_id exchange is reused by the window and both aggregates.
    "q_win_streaks": ([], [], 2),
}


def main() -> int:
    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("audit-claims")
    spark.sparkContext.setLogLevel("ERROR")
    drifted: list[str] = []
    for name, (must, must_not, max_ex) in CLAIMS.items():
        plan = (
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        problems: list[str] = []
        for frag in set(must):
            want = must.count(frag)
            got = plan.count(frag)
            if got < want:
                problems.append(f"wants {want}x {frag!r}, plan has {got}")
        for frag in must_not:
            if frag in plan:
                problems.append(f"forbids {frag!r}, plan has it")
        if max_ex is not None:
            n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
            if n_ex > max_ex:
                problems.append(
                    f"claims <= {max_ex} shuffle exchange(s), plan has {n_ex}"
                )
        if problems:
            drifted.append(name)
            print(f"!! {name}: " + "; ".join(problems))
        else:
            print(f"   {name:28s} OK")
    print(
        f"claim audit: {len(CLAIMS) - len(drifted)}/{len(CLAIMS)} hold"
        + (f"; DRIFTED: {', '.join(drifted)}" if drifted else "")
    )
    return 1 if drifted else 0


if __name__ == "__main__":
    sys.exit(main())
