"""Round-10 operators: runtime properties the SQL oracle can't
express — the bucketed novelty monitor's hard state bound under a
key domain larger than the bucket space.
"""

from __future__ import annotations

import pandas as pd

from mrtweety_analytic_spark.queries import QUERIES
from mrtweety_analytic_spark.streaming.queries import NOVELTY_BUCKETS


def _write_events(tmp_path, n_keys, days=3):
    """Single-FILE events.parquet (file-stream fixture rule): n_keys
    distinct (user_id, event_type) keys spread over `days` days,
    two events per key so min(ts) has work to do."""
    rows = []
    for k in range(n_keys):
        day = k % days
        rows.append(
            {
                "event_id": 2 * k,
                "user_id": k,
                "event_type": f"type_{k % 5}",
                "ts": pd.Timestamp(f"2024-03-0{day + 1} 08:00:00")
                + pd.Timedelta(minutes=k % 60),
                "value": 1.0,
            }
        )
        rows.append(
            {
                "event_id": 2 * k + 1,
                "user_id": k,
                "event_type": f"type_{k % 5}",
                "ts": pd.Timestamp(f"2024-03-0{day + 1} 18:00:00"),
                "value": 1.0,
            }
        )
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))


def test_novelty_bucketed_state_is_hard_capped(spark, tmp_path):
    """768 distinct keys (3x the 256-bucket space) may produce at
    most 256 state rows: cum_buckets saturates at NOVELTY_BUCKETS
    while the exact twin would report all 768 — the state bound the
    exact operator's docstring promises, certified here."""
    n_keys = 3 * NOVELTY_BUCKETS
    _write_events(tmp_path, n_keys)
    rows = (
        QUERIES["s_novelty_bucketed"](spark, str(tmp_path))
        .orderBy("day")
        .collect()
    )
    assert rows, "bucketed novelty curve must not be empty"
    final_cum = rows[-1]["cum_buckets"]
    assert final_cum <= NOVELTY_BUCKETS
    # With 768 uniform md5-hashed keys, expected empty buckets are
    # 256 * (255/256)^768 ~ 12 — well clear of both bounds, so the
    # assertion is meaningful, not vacuous.
    assert final_cum > NOVELTY_BUCKETS // 2
    assert sum(r["n_new_buckets"] for r in rows) == final_cum


def test_novelty_bucketed_lower_bounds_exact(spark, tmp_path):
    """Bucket novelty never exceeds key novelty on any prefix of
    days: a bucket turns new only when its first key arrives, and
    collisions only hide novelty (one-sided error, the sketch-family
    guarantee)."""
    _write_events(tmp_path, 100)
    bucketed = {
        r["day"]: r["cum_buckets"]
        for r in QUERIES["s_novelty_bucketed"](
            spark, str(tmp_path)
        ).collect()
    }
    exact = {
        r["day"]: r["cum_keys"]
        for r in QUERIES["s_novelty_decay"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(bucketed) == set(exact)
    for day, cum_b in bucketed.items():
        assert cum_b <= exact[day]


def test_minhash_dup_rate_flags_planted_duplicate(spark, tmp_path):
    """An exact copy has identical shingle sets, hence identical
    minhashes, bands, and buckets — the later doc_id MUST be flagged
    (recall 1.0 on true duplicates is a theorem); distinct docs with
    disjoint vocabulary share no bucket and must not be."""
    texts = {
        0: "the quick brown fox jumps over the lazy dog today",
        1: "completely different words about spark shuffle joins",
        2: "the quick brown fox jumps over the lazy dog today",
        3: "yet another unrelated document mentioning parquet scans",
    }
    pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": "s0",
                "n_chars": len(t),
            }
            for i, t in texts.items()
        ]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    [row] = QUERIES["s_minhash_dup_rate"](spark, str(tmp_path)).collect()
    assert row["n_docs"] == 4
    assert row["n_dup_flagged"] == 1
    assert abs(row["dup_rate"] - 0.25) < 1e-9


def test_quality_gate_matches_batch_verdicts(spark, tmp_path):
    """The streaming gate's per-row array algebra (translate-based
    sum_len, sort-then-run-length fold for max_cnt) must reproduce
    the batch (doc, term)-aggregate verdicts EXACTLY, including the
    grid-point boundary (a doc at mean word length exactly 4.2
    PASSES — the q_dq_gopher_rules pin)."""
    texts = [
        # 20 tokens x 5 chars => mean 5.0, has stopwords, no repeat
        " ".join(f"tok{i:02d}" for i in range(10))
        + " the and for each value here used once more done",
        # too short (5 tokens)
        "tiny doc of the it",
        # repetitive: 'spam' 10/21 tokens (> 0.2), long enough
        " ".join(["spam"] * 10)
        + " the of and to in is it a an or most",
        # boundary: 20 tokens, sum_len exactly 84 => 10*84 == 42*20,
        # NOT < threshold => PASSES wordlen rule; max_cnt=4 sits on
        # ITS boundary too (5*4 == 20, not >) and passes
        " ".join(["aaaa"] * 4 + ["bbbb"] * 4 + ["cccc"] * 4
                 + ["dddd"] * 4)
        + " the to abcdefgh abcdefg",
    ]
    pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": f"s{i}",
                "n_chars": len(t),
            }
            for i, t in enumerate(texts)
        ]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: (r["n_docs"], r["n_pass"], r["n_fail_repetition"])
        for r in QUERIES["s_quality_gate"](spark, str(tmp_path)).collect()
    }
    batch = {
        r["source"]: (r["n_docs"], r["n_pass"], r["n_fail_repetition"])
        for r in QUERIES["q_dq_gopher_rules"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == batch
    assert got["s0"] == (1, 1, 0)   # clean doc passes
    assert got["s1"] == (1, 0, 0)   # too short fails (not repetition)
    assert got["s2"] == (1, 0, 1)   # repetition flagged
    assert got["s3"][1] == 1        # 4.2 boundary doc PASSES


def test_quality_gate_random_corpus_parity(spark, tmp_path):
    """Seeded random corpus (mixed lengths, stopword densities,
    repetition levels) — streaming and batch verdicts must agree on
    every (source, counter) cell, not just on crafted cases."""
    import random

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(30)] + [
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    ]
    rows = []
    for i in range(200):
        n = rng.randint(1, 60)
        words = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        if rng.random() < 0.2:  # inject heavy repetition
            words += [words[0]] * rng.randint(5, 20)
        t = " ".join(words)
        rows.append(
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": f"s{i % 7}",
                "n_chars": len(t),
            }
        )
    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))
    key = lambda r: (  # noqa: E731
        r["source"],
        r["n_docs"],
        r["n_pass"],
        r["n_fail_repetition"],
        r["retention_rate"],
    )
    got = sorted(
        map(key, QUERIES["s_quality_gate"](spark, str(tmp_path)).collect())
    )
    want = sorted(
        (
            r["source"],
            r["n_docs"],
            r["n_pass"],
            r["n_fail_repetition"],
            r["retention_rate"],
        )
        for r in QUERIES["q_dq_gopher_rules"](
            spark, str(tmp_path)
        ).collect()
    )
    assert got == want


def test_minhash_dup_rate_fast_parity(spark, tmp_path):
    """The xxhash64 production tier must reproduce the certified md5
    tier's verdicts on planted duplicates: exact copies share shingle
    sets, hence band signatures and buckets, under EITHER hash family
    (recall 1.0 is a theorem in both); the distinct fillers share no
    shingle, so neither tier may flag them (2x5 band rows in a 2^16
    bucket space — the fixture is deterministic, so a collision-free
    draw stays collision-free). Per-source rows must match exactly."""
    texts = {
        0: "the quick brown fox jumps over the lazy dog today",
        1: "completely different words about spark shuffle joins",
        2: "the quick brown fox jumps over the lazy dog today",
        3: "yet another unrelated document mentioning parquet scans",
        4: "completely different words about spark shuffle joins",
        5: "bloom filters prune row groups before any decode work",
    }
    pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": "en",
                "source": f"s{i % 2}",
                "n_chars": len(t),
            }
            for i, t in texts.items()
        ]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    md5_rows = {
        r["source"]: (r["n_docs"], r["n_dup_flagged"], r["dup_rate"])
        for r in QUERIES["s_minhash_dup_rate"](
            spark, str(tmp_path)
        ).collect()
    }
    fast_rows = {
        r["source"]: (r["n_docs"], r["n_dup_flagged"], r["dup_rate"])
        for r in QUERIES["s_minhash_dup_rate_fast"](
            spark, str(tmp_path)
        ).collect()
    }
    assert md5_rows == fast_rows
    # And the planted truth itself: doc 2 (copy of 0, source s0) and
    # doc 4 (copy of 1, source s0) are the only duplicates.
    assert fast_rows["s0"] == (3, 2, round(2 / 3, 6))
    assert fast_rows["s1"][1] == 0
