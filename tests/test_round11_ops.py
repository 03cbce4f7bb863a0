"""Round-11 streaming ingest ops: planted-truth properties the SQL
oracles certify only in aggregate — exact per-source dup accounting
for the URL front-door monitor, and row-for-row stream/batch census
parity for the fertility twin.
"""

from __future__ import annotations

import pandas as pd

from mrtweety_analytic_spark.queries import QUERIES


def _write_docs(spark, tmp_path, rows):
    pd.DataFrame(rows).to_parquet(str(tmp_path / "documents.parquet"))


def test_dedup_url_flags_later_variants_per_source(spark, tmp_path):
    """The synthetic URL scheme maps doc_ids {4k..4k+3} to one
    canonical URL with owner 4k, so the flag set is fully
    deterministic: s0 (even ids 0,2,4,6) re-crawls 2 and 6 -> rate
    0.5; s1 (odd ids) owns nothing -> every fetch flagged, rate 1.0.
    This pins the ownership ARITHMETIC (owner strictly earlier, owner
    itself never flagged), which the aggregate oracle can't isolate."""
    _write_docs(
        spark,
        tmp_path,
        [
            {
                "doc_id": i,
                "text": f"document number {i} words",
                "lang": "en",
                "source": f"s{i % 2}",
                "n_chars": 20,
            }
            for i in range(8)
        ],
    )
    rows = {
        r["source"]: (r["n_docs"], r["n_dup_flagged"], r["dup_rate"])
        for r in QUERIES["s_dedup_url"](spark, str(tmp_path)).collect()
    }
    assert rows["s0"] == (4, 2, 0.5)
    assert rows["s1"] == (4, 4, 1.0)


def test_tokenizer_fertility_stream_equals_batch(spark, tmp_path):
    """The streaming census must equal the batch census ROW FOR ROW
    on a multi-(source, lang) corpus — additive counters replayed
    through the state store, finalized through the shared ratio
    arithmetic. Texts exercise the pre-token classes (letters,
    digits, punctuation runs) so fertility > 1 on the mixed rows."""
    texts = [
        (0, "plain lowercase words only here", "en", "s0"),
        (1, "digits 123 mixed with, punctuation! runs", "en", "s0"),
        (2, "short", "de", "s0"),
        (3, "ein zwei drei vier", "de", "s1"),
        (4, "x9y8z7 dense4mix", "en", "s1"),
    ]
    _write_docs(
        spark,
        tmp_path,
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t),
            }
            for i, t, lang, src in texts
        ],
    )
    key = lambda r: (r["source"], r["lang"])  # noqa: E731
    batch = {
        key(r): r.asDict()
        for r in QUERIES["q_tokenizer_fertility"](
            spark, str(tmp_path)
        ).collect()
    }
    stream = {
        key(r): r.asDict()
        for r in QUERIES["s_tokenizer_fertility"](
            spark, str(tmp_path)
        ).collect()
    }
    assert stream == batch
    assert stream[("s0", "en")]["fertility"] > 1.0


def test_mix_rebalance_stream_equals_batch(spark, tmp_path):
    """The live mix monitor must reproduce the batch rebalance rows
    EXACTLY (availability replayed through the state store, shared
    binding-constraint arithmetic and md5 keep-gate downstream) on a
    corpus where every target language exists and one is scarce —
    the scarce language (zh here) is the binding constraint and must
    keep rate 1.0."""
    langs = ["en"] * 20 + ["de"] * 8 + ["fr"] * 6 + ["es"] * 4 + ["zh"] * 1
    _write_docs(
        spark,
        tmp_path,
        [
            {
                "doc_id": i,
                "text": f"document {i} body",
                "lang": lang,
                "source": "s0",
                "n_chars": 15,
            }
            for i, lang in enumerate(langs)
        ],
    )
    batch = {
        r["lang"]: r.asDict()
        for r in QUERIES["q_mix_rebalance"](spark, str(tmp_path)).collect()
    }
    stream = {
        r["lang"]: r.asDict()
        for r in QUERIES["s_mix_rebalance"](spark, str(tmp_path)).collect()
    }
    assert stream == batch
    assert stream["zh"]["rate"] == 1.0
    assert stream["en"]["rate"] < 1.0


def test_dq_freshness_stream_equals_batch(spark, tmp_path):
    """The live freshness census must equal the batch one row for row
    (max-ts monotone state + additive counts), and the planted
    staleness must surface: 'view' last fires 01-01 12:30, the
    newest 'click' 01-02 02:30 -> 14 whole hours; the freshest type
    reads 0."""
    pd.DataFrame(
        {
            "event_id": range(4),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 12:30:00",
                    "2024-01-02 00:00:00",
                    "2024-01-02 02:30:00",
                ]
            ),
            "user_id": [1, 2, 1, 2],
            "event_type": ["view", "view", "click", "click"],
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": ['{"k": 1}'] * 4,
        }
    ).to_parquet(str(tmp_path / "events.parquet"))
    batch = {
        r["event_type"]: (r["n_events"], r["staleness_hours"])
        for r in QUERIES["q_dq_freshness"](spark, str(tmp_path)).collect()
    }
    stream = {
        r["event_type"]: (r["n_events"], r["staleness_hours"])
        for r in QUERIES["s_dq_freshness"](spark, str(tmp_path)).collect()
    }
    assert stream == batch
    assert stream["click"] == (2, 0)
    assert stream["view"] == (2, 14)


from hypothesis import given, settings, strategies as st  # noqa: E402

_words = st.lists(
    st.sampled_from(
        ["alpha", "beta", "gamma", "delta", "join", "scan", "the", "a"]
    ),
    min_size=0,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_words, min_size=1, max_size=5))
def test_minhash_band_recall_theorem_both_tiers(spark, corpora):
    """The property BOTH dup-rate tiers rest on, checked on random
    corpora: an exact copy carries the same shingle set, hence the
    same 4 band buckets, under the md5 AND the xxhash64 family
    (recall 1.0 on true duplicates is hash-independent); and the
    <3-word shingle threshold retains exactly the same doc_ids in
    both tiers. Each random doc is planted with one exact copy."""
    from mrtweety_analytic_spark.streaming.queries import (
        _mdr_band_buckets,
        _mdr_band_buckets_fast,
    )

    n = len(corpora)
    rows = [
        (i, " ".join(ws), "en", "s0", len(" ".join(ws)))
        for i, ws in enumerate(corpora)
    ] + [
        (i + n, " ".join(ws), "en", "s0", len(" ".join(ws)))
        for i, ws in enumerate(corpora)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    for fn in (_mdr_band_buckets, _mdr_band_buckets_fast):
        got = {}
        for r in fn(docs).collect():
            got.setdefault(r["doc_id"], set()).add(r["bucket"])
        retained = {i for i, ws in enumerate(corpora) if len(ws) >= 3}
        assert set(got) == retained | {i + n for i in retained}
        for i in retained:
            assert got[i] == got[i + n], (
                "exact copy landed in different buckets"
            )
