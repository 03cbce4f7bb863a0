"""Round-6 third-session additions: quality-aware canonical
selection, diversity sampling, largest-remainder allocation,
Benford DQ check."""

from datetime import datetime

from mrtweety_analytic_spark.queries import QUERIES


def test_keep_best_prefers_longest_then_min_id(spark, tmp_path):
    """Within a near-dup family the longest doc wins; equal-length
    winners tiebreak to min doc_id; singletons keep themselves."""
    fam = "alpha beta gamma delta epsilon zeta eta"
    rows = [
        (1, fam, "en", "web", len(fam)),
        (2, fam + " extra tail words", "en", "web", len(fam) + 17),
        (3, fam, "en", "web", len(fam)),
        (9, "totally unrelated text with no shared shingles at all",
         "en", "web", 53),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.cluster_id: (r.keep_doc_id, r.n_members)
        for r in QUERIES["q_dedup_keep_best"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: (2, 3), 9: (9, 1)}


def test_largest_remainder_sums_to_budget_and_tiebreaks_by_name(
    spark, tmp_path
):
    """Three equal sources: floor gives 333 each, the single
    leftover slot goes to the lexicographically first source; the
    allocation sums exactly to the 1000 budget."""
    rows = []
    did = 0
    for src in ("a_src", "b_src", "c_src"):
        rows.append((did, f"text {did}", "en", src, 10))
        did += 1
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.source: r.alloc
        for r in QUERIES["q_agg_largest_remainder"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"a_src": 334, "b_src": 333, "c_src": 333}
    assert sum(got.values()) == 1000


def test_benford_first_digit_extraction(spark, tmp_path):
    """Leading digit comes from the integer cent string: 123.00->1,
    999.99->9, 0.05->5; zero and negative totals are excluded."""
    base = datetime(2024, 1, 1)
    rows = [
        (1, 1, "O", 123.00, base, "1-URGENT"),
        (2, 1, "O", 999.99, base, "1-URGENT"),
        (3, 1, "O", 0.05, base, "1-URGENT"),
        (4, 1, "O", 0.0, base, "1-URGENT"),
        (5, 1, "O", -7.5, base, "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.digit: r.n
        for r in QUERIES["q_dq_benford"](spark, str(tmp_path)).collect()
    }
    assert got == {1: 1, 9: 1, 5: 1}
