"""Unit tests for the flagship trending pipeline — edge semantics the
reference pins down (SURVEY.md §5.2 item 3): case-insensitive
grouping, blacklist case-insensitivity, deterministic ties, empties.
"""

from __future__ import annotations

from mrtweety_analytic_spark.operators.textops import trending_terms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_case_insensitive_merge(spark):
    # "Spark"/"spark"/"SPARK" merge into one case-folded key
    # (≙ Hashtag.scala:11-13 semantics via lower(), SURVEY.md §1.2).
    df = _docs(spark, ["Spark spark SPARK", "flink"])
    rows = {r["term"]: r["cnt"] for r in trending_terms(df).collect()}
    assert rows == {"spark": 3, "flink": 1}


def test_stopword_blacklist_case_insensitive(spark):
    # Blacklist drops terms in ANY casing (≙ SparkApplication.scala:29,77).
    df = _docs(spark, ["THE The the spark"])
    terms = [r["term"] for r in trending_terms(df).collect()]
    assert terms == ["spark"]


def test_tie_broken_by_term_asc(spark):
    df = _docs(spark, ["zeta alpha", "zeta alpha"])
    rows = trending_terms(df, k=1).collect()
    assert rows[0]["term"] == "alpha"  # equal counts -> lexicographic


def test_top_k_limit_and_order(spark):
    df = _docs(spark, ["a1 a1 a1 b2 b2 c3 d4 e5 f6 g7"])
    rows = trending_terms(df, k=5).collect()
    assert len(rows) == 5
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["term"] == "a1" and rows[0]["cnt"] == 3


def test_empty_input_yields_empty(spark):
    df = _docs(spark, [])
    assert trending_terms(df).collect() == []


def test_empty_tokens_dropped(spark):
    # Double spaces produce empty split tokens; they must not count.
    df = _docs(spark, ["spark  flink"])
    rows = {r["term"]: r["cnt"] for r in trending_terms(df).collect()}
    assert rows == {"spark": 1, "flink": 1}
