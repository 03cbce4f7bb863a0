"""Edge-semantics tests for the dataset-lifecycle operators
(operators/lifecycle.py) — invariants the oracle comparison can't
isolate: interval disjointness, canonical-form collapse, brute-force
passage parity, sample determinism and plan shape.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_scd2_intervals_are_disjoint_and_single_current(spark, sf_dir):
    from mrtweety_analytic_spark.queries import QUERIES

    rows = QUERIES["q_cdc_scd2"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, versions in by_user.items():
        versions.sort(key=lambda r: r["valid_from"])
        currents = [r for r in versions if r["is_current"] == 1]
        assert len(currents) == 1, user
        assert currents[0] is versions[-1]
        # Half-open chain: each valid_to equals the next valid_from.
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"], user
        assert versions[-1]["valid_to"] is None


def test_url_dedup_collapses_all_four_variant_forms(spark, sf_dir):
    from mrtweety_analytic_spark.queries import QUERIES

    out = QUERIES["q_dedup_url"](spark, sf_dir).collect()
    assert out
    for r in out:
        # Every canonical URL is fully normalized: lowercase host, no
        # port, no tracking params, no trailing slash.
        u = r["canonical_url"]
        assert u == u.lower()
        assert ":443" not in u and "utm_" not in u and not u.endswith("/")
        # doc_ids 0..3 of a group share all four surface forms, so on
        # the dense test corpus every group fully collapses.
        assert r["n_variants"] == 4
        assert r["keep_doc_id"] % 4 == 0


def test_passage_dedup_matches_bruteforce(spark, tmp_path):
    import pandas as pd

    corpus = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "a quick brown fox jumps over the lazy dog today"),  # shares 9-1=8+ tail
        (2, "completely different text with no shared passages at all"),
        (3, "the quick brown fox jumps over the lazy dog today"),  # full dup of 0
    ]
    pd.DataFrame(
        {
            "doc_id": [c[0] for c in corpus],
            "text": [c[1] for c in corpus],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(c[1]) for c in corpus],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    from mrtweety_analytic_spark.queries import QUERIES

    got = {
        r["passage"]: (r["n_docs"], r["n_occurrences"])
        for r in QUERIES["q_text_passage_dedup"](
            spark, str(tmp_path)
        ).collect()
    }

    # Brute force: all 8-token windows, same tokenization.
    win: Counter = Counter()
    docs_of: dict = {}
    for doc_id, text in corpus:
        toks = text.lower().split(" ")
        for i in range(max(len(toks) - 7, 0)):
            p = " ".join(toks[i : i + 8])
            win[p] += 1
            docs_of.setdefault(p, set()).add(doc_id)
    want = {
        p: (len(docs_of[p]), win[p])
        for p in win
        if len(docs_of[p]) >= 2
    }
    assert got == want


def test_reservoir_sample_deterministic_and_bounded(spark, sf_dir):
    from mrtweety_analytic_spark.operators.lifecycle import _RESERVOIR_K
    from mrtweety_analytic_spark.queries import QUERIES

    a = sorted(map(tuple, QUERIES["q_sample_reservoir"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["q_sample_reservoir"](spark, sf_dir).collect()))
    assert a == b  # reproducible across runs
    per_stratum = Counter(t[0] for t in a)
    assert all(n <= _RESERVOIR_K for n in per_stratum.values())

    # Plan shape: the rank filter must push a partial top-k below the
    # exchange (WindowGroupLimit), not sort whole strata post-shuffle.
    plan = QUERIES["q_sample_reservoir"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_decayed_agg_discounts_older_events(spark, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-31"]),
            "user_id": [1, 1],
            "event_type": ["old", "new"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    ).to_parquet(tmp_path / "events.parquet")

    from mrtweety_analytic_spark.queries import QUERIES

    got = {
        r["event_type"]: r["decayed_sum"]
        for r in QUERIES["q_agg_decayed"](spark, str(tmp_path)).collect()
    }
    import math

    assert got["new"] == 1.0  # zero days back: weight exactly 1
    assert abs(got["old"] - round(math.exp(-30 / 30.0), 4)) < 1e-9
