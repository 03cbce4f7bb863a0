"""Round-6 late additions: incremental dedup, Gram matrix, PCA."""

import numpy as np
import pytest

from mrtweety_analytic_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_dedup_incremental_semantics(spark, tmp_path):
    """Batch (doc_id%10==0) rows drop when a corpus twin exists;
    in-batch dups collapse to min doc_id; unique rows survive."""
    rows = [
        # corpus (doc_id % 10 != 0)
        (1, "alpha beta", "en", "web", 10),
        (2, "gamma delta", "en", "web", 11),
        # batch: 10 duplicates corpus doc 1 -> dropped entirely
        (10, "alpha beta", "en", "web", 10),
        # batch: 20/30 duplicate each other, no corpus twin -> keep 20
        (20, "epsilon zeta", "en", "web", 12),
        (30, "epsilon zeta", "en", "web", 12),
        # batch: unique -> kept
        (40, "eta theta", "en", "web", 9),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.n_batch_copies
        for r in QUERIES["q_dedup_incremental"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {20: 2, 40: 1}


def test_gram_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    x = np.asarray([r.embedding for r in emb], dtype=np.float64)
    expected = x.T @ x
    got = QUERIES["q_sim_gram"](spark, SF).collect()
    assert len(got) == 64 * 65 // 2
    for r in got:
        assert r.gram == pytest.approx(
            round(expected[r.i - 1, r.j - 1], 4), abs=2e-4
        )


def test_pca_power_matches_eigh(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    x = np.asarray([r.embedding for r in rows], dtype=np.float64)
    g = x.T @ x
    w, v = np.linalg.eigh(g)
    v1 = v[:, -1]
    k = int(np.argmax(np.abs(v1)))
    if v1[k] < 0:
        v1 = -v1
    expected = {r.vec_id: float(x[i] @ v1) for i, r in enumerate(rows)}
    got = {
        r.vec_id: r.pc1
        for r in QUERIES["q_sim_pca_power"](spark, SF).collect()
    }
    assert set(got) == set(expected)
    for vid, p in got.items():
        assert p == pytest.approx(expected[vid], abs=1e-3)


def test_mix_temperature_flattens(spark):
    """Temperature sampling must up-weight scarce sources
    (weight_mult > 1) and down-weight dominant ones, and p_temp must
    sum to ~1."""
    rows = QUERIES["q_mix_temperature"](spark, SF).collect()
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-3
    lo = min(rows, key=lambda r: r.n_avail)
    hi = max(rows, key=lambda r: r.n_avail)
    if lo.p_nat < hi.p_nat:  # non-degenerate mix
        assert lo.weight_mult > 1.0 > hi.weight_mult


def test_moving_regression_known_slope(spark, tmp_path):
    """Five equally spaced points with value = 2*day -> slope 2."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 10)
    rows = [
        (i, 1, base + timedelta(days=i), "purchase", 2.0 * i)
        for i in range(5)
    ]
    # zero-variance user: all events in the same instant -> NULL
    rows += [(10 + i, 2, base, "purchase", 1.0) for i in range(3)]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = QUERIES["q_win_moving_regression"](spark, str(tmp_path)).collect()
    u1 = {r.event_id: r.slope_per_day for r in got if r.user_id == 1}
    assert u1 == {2: 2.0, 3: 2.0, 4: 2.0}
    u2 = [r.slope_per_day for r in got if r.user_id == 2]
    assert u2 == [None]


def test_bpe_train_classic_example(spark, tmp_path):
    """Sennrich worked example: low x5, lower x2, newest x6,
    widest x3 -> first merges es, est, lo, low."""
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    spark.createDataFrame(
        [(i, w, "en", "web", len(w)) for i, w in enumerate(corpus)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = [
        (r.step, r.left, r.right, r.merged, r.wsum)
        for r in QUERIES["q_text_bpe_train"](spark, str(tmp_path))
        .orderBy("step")
        .collect()
    ]
    assert got[:4] == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
    ]


def test_bpe_train_matches_reference_on_corpus(spark):
    """The distributed word-count + driver loop must equal a pure
    in-memory reference over the same corpus."""
    from mrtweety_analytic_spark.operators.textops import _bpe_merge_loop
    import re
    from collections import Counter

    texts = [
        r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    wc = Counter(
        w
        for t in texts
        for w in re.split(r"\s+", t.lower())
        if re.fullmatch(r"[a-z]{2,}", w)
    )
    expected = _bpe_merge_loop(dict(wc), 10)
    got = [
        (r.step, r.left, r.right, r.merged, r.wsum)
        for r in QUERIES["q_text_bpe_train"](spark, SF)
        .orderBy("step")
        .collect()
    ]
    assert got == expected


def test_feature_window_excludes_self_and_simultaneous(spark, tmp_path):
    """The label row must never see itself, a simultaneous event, or
    anything outside the trailing 7 days."""
    from datetime import datetime, timedelta

    base = datetime(2024, 2, 1)
    rows = [
        # user 1: view 8 days before label -> OUTSIDE window
        (1, 1, base - timedelta(days=8), "view", 1.0),
        # view 3 days before -> counts
        (2, 1, base - timedelta(days=3), "view", 1.0),
        # purchase 1 day before -> counts (n_purchases, spend)
        (3, 1, base - timedelta(days=1), "purchase", 10.0),
        # SIMULTANEOUS view at the label instant -> must NOT count
        (4, 1, base, "view", 1.0),
        # the label itself -> must not see its own value
        (5, 1, base, "purchase", 99.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_id: (r.n_views_7d, r.n_purchases_7d, r.spend_7d)
        for r in QUERIES["q_events_feature_window"](
            spark, str(tmp_path)
        ).collect()
    }
    # label 3 (purchase at base-1d): its frame is [base-8d,
    # base-1d-1us] — the base-8d view sits EXACTLY 7 days back
    # (inclusive lower bound) and the base-3d view is inside; no
    # prior purchases.
    assert got[3] == (2, 0, 0.0)
    # label 5 (purchase at base): frame [base-7d, base-1us] — the
    # base-8d view has aged out, view@-3d and purchase@-1d count,
    # the simultaneous view 4 and the label itself are excluded.
    assert got[5] == (1, 1, 10.0)


def test_agg_regression_recovers_known_line(spark, tmp_path):
    """value = 3*day + 2 exactly -> slope 3, intercept 2, r2 1."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)  # x = 0 at the fixed epoch
    rows = [
        (i, 1, base + timedelta(days=i), "signup", 3.0 * i + 2.0)
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["q_agg_regression"](spark, str(tmp_path)).collect()[0]
    assert (r.n, r.slope_per_day, r.intercept, r.r2) == (10, 3.0, 2.0, 1.0)


def test_pq_adc_beats_random_and_is_self_consistent(spark):
    """ADC top-10 must (a) rank by the rounded approx distance with
    vec_id tiebreak, (b) recall well above the 10/(n-1) random
    floor."""
    adc = QUERIES["q_sim_pq_adc"](spark, SF).collect()
    by_probe = {}
    for r in adc:
        by_probe.setdefault(r.probe_id, []).append((r.approx_l2, r.vec_id))
    for probe, rows in by_probe.items():
        assert len(rows) == 10
        assert rows == sorted(rows)
    rec = QUERIES["q_sim_pq_adc_recall"](spark, SF).collect()[0]
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    random_floor = 10.0 / (n - 1)
    assert rec.recall_at_10 > 3 * random_floor


def test_threshold_alert_fires_once_at_crossing(spark, tmp_path):
    """One alert per user, at the exact crossing event, suppressed
    afterwards; under-threshold users never alert."""
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1)
    rows = [
        # user 1: 200 + 200 (under) then +200 -> crosses at event 3,
        # then keeps buying -> no second alert
        (1, 1, base, "purchase", 200.0),
        (2, 1, base + timedelta(hours=1), "purchase", 200.0),
        (3, 1, base + timedelta(hours=2), "purchase", 200.0),
        (4, 1, base + timedelta(hours=3), "purchase", 999.0),
        # user 2: stays under
        (5, 2, base, "purchase", 100.0),
        # user 3: single giant purchase crosses immediately
        (6, 3, base, "purchase", 600.0),
        # views never count
        (7, 2, base, "view", 1e9),
    ]
    # load_events_stream probes the parquet footer at
    # <dir>/events.parquet, so the fixture must be a single FILE
    # (the testdata layout), not a Spark output directory.
    import pandas as pd

    pd.DataFrame(
        rows,
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    got = {
        r.user_id: (r.alert_ts, r.cum_spend)
        for r in QUERIES["s_threshold_alert"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 3}
    assert got[1] == (base + timedelta(hours=2), 600.0)
    assert got[3] == (base, 600.0)


def test_pq_training_improves_recall(spark):
    """The Lloyd-trained codebook must strictly beat the untrained
    label-mean codebook on the same corpus and probe set."""
    base = QUERIES["q_sim_pq_adc_recall"](spark, SF).collect()[0]
    trained = QUERIES["q_sim_pq_trained_recall"](spark, SF).collect()[0]
    assert trained.n_exact == base.n_exact
    assert trained.recall_at_10 > base.recall_at_10


def test_time_split_embargo_gap_holds(spark):
    """max(train) + 1 day <= min(test); all three splits non-empty
    on the real corpus; counts partition the table."""
    from datetime import timedelta

    rows = {r.split: r for r in QUERIES["q_sample_time_split"](spark, SF).collect()}
    assert set(rows) == {"train", "embargo", "test"}
    assert rows["train"].max_ts + timedelta(days=1) <= rows["test"].min_ts
    total = sum(r.n_events for r in rows.values())
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == n


def test_common_neighbors_scores_candidates(spark):
    """Every candidate pair appears exactly once (zero scores kept),
    and each score equals the true neighbor-set intersection size."""
    from pyspark.sql import functions as F

    got = QUERIES["q_graph_common_neighbors"](spark, SF).collect()
    assert len(got) == 20
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    l = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    e = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    nbrs = {}
    for r in e:
        nbrs.setdefault(r.o_custkey, set()).add(r.l_suppkey)
    for r in got:
        expected = len(
            nbrs.get(r.cust_a, set()) & nbrs.get(r.cust_b, set())
        )
        assert r.n_common == expected
        assert r.cust_b == r.cust_a + 1


def test_weighted_median_votes_by_quantity(spark, tmp_path):
    """Weights decide: prices 1,2,3 with quantities 1,1,10 -> the
    unweighted median is 2 but the weighted median is 3."""
    rows = [
        ("A", 1.0, 1.0),
        ("A", 2.0, 1.0),
        ("A", 3.0, 10.0),
        # group B: equal weights -> cum>=tot/2 picks the lower middle
        ("B", 10.0, 1.0),
        ("B", 20.0, 1.0),
    ]
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double,"
        " l_quantity double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r.l_returnflag: (r.w_median_price, r.total_qty)
        for r in QUERIES["q_agg_weighted_median"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"A": (3.0, 12.0), "B": (10.0, 2.0)}


def test_bigram_logprob_ranks_coherence(spark, tmp_path):
    """A doc of corpus-frequent bigrams must outscore a doc whose
    bigrams never co-occur elsewhere (same unigrams!)."""
    rows = [
        # 'a b' appears 3x across docs 1-3 -> frequent bigram
        (1, "a b", "en", "web", 3),
        (2, "a b", "en", "web", 3),
        (3, "a b c d", "en", "web", 7),
        # doc 4 uses the SAME unigrams in unseen order
        (4, "b a d c", "en", "web", 7),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.bigram_logprob
        for r in QUERIES["q_text_bigram_logprob"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1] > got[4]
    assert got[3] > got[4]


def test_threshold_sweep_is_monotone(spark):
    """Raising the cutoff can only shrink pairs and drops; the 0.5
    row equals the exact tier's totals."""
    rows = {
        r.threshold: (r.n_pairs, r.n_docs_dropped)
        for r in QUERIES["q_dedup_threshold_sweep"](spark, SF).collect()
    }
    ths = sorted(rows)
    for lo, hi in zip(ths, ths[1:]):
        assert rows[lo][0] >= rows[hi][0]
        assert rows[lo][1] >= rows[hi][1]
    exact = QUERIES["q_dedup_embedding"](spark, SF)
    assert rows[0.5][0] == exact.count()


def test_minhash_md5_candidates_agree_with_exact_tier(spark):
    """Every verified md5-minhash pair must truly have jaccard >= 0.5
    (checked against a brute-force python jaccard), and the banded
    candidate stage must recover all such pairs on this corpus (the
    lsh_eval finding: 0 FN at sf0.001/0.01)."""
    import itertools

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["q_dedup_minhash_md5"](spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    sh = {}
    for d in docs:
        ws = [w for w in d.text.lower().split(" ") if w]
        sh[d.doc_id] = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }
    exact = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter:
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= 0.5:
                exact[(a, b)] = j
    assert set(got) == set(exact)
    for k, j in got.items():
        assert abs(j - exact[k]) < 1e-5


def test_bot_detect_flags_metronome_not_human(spark, tmp_path):
    """A perfectly periodic 25-event user is flagged; a bursty user
    with the same event count is not; a 3-event user never is."""
    from datetime import datetime, timedelta

    base = datetime(2024, 4, 1)
    rows = []
    # user 1: exact 60s metronome, 25 events -> 24 gaps, cv = 0
    rows += [
        (i, 1, base + timedelta(seconds=60 * i), "view", 1.0)
        for i in range(25)
    ]
    # user 2: bursty (1s, 1s, 3600s repeating), 25 events
    t = base
    gaps = [1, 1, 3600] * 8
    rows.append((100, 2, t, "view", 1.0))
    for j, g in enumerate(gaps[:24]):
        t = t + timedelta(seconds=g)
        rows.append((101 + j, 2, t, "view", 1.0))
    # user 3: metronomic but only 3 events -> below n_gaps floor
    rows += [
        (200 + i, 3, base + timedelta(seconds=60 * i), "view", 1.0)
        for i in range(3)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.user_id: (r.is_bot, r.n_gaps)
        for r in QUERIES["q_events_bot_detect"](spark, str(tmp_path)).collect()
    }
    assert got[1] == (1, 24)
    assert got[2][0] == 0
    assert got[3] == (0, 2)


def test_cumulative_distinct_counts_breadth(spark, tmp_path):
    """The running distinct-type count steps up exactly at first
    occurrences and never decreases."""
    from datetime import datetime, timedelta

    base = datetime(2024, 5, 1)
    seq = ["view", "view", "click", "view", "purchase", "click"]
    rows = [
        (i, 1, base + timedelta(minutes=i), t, 1.0)
        for i, t in enumerate(seq)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = [
        r.n_distinct_types_so_far
        for r in QUERIES["q_win_cumulative_distinct"](spark, str(tmp_path))
        .orderBy("event_id")
        .collect()
    ]
    assert got == [1, 1, 2, 2, 3, 3]


def test_crosscorr_full_lag_grid(spark):
    """All 7 lags present; lag 0 pairs every day with itself so
    n_days is the full spine; symmetric lags pair equally many days."""
    rows = {r.lag_days: r.n_days for r in QUERIES["q_ts_crosscorr"](spark, SF).collect()}
    assert set(rows) == set(range(-3, 4))
    assert rows[1] == rows[-1] and rows[3] == rows[-3]
    assert rows[0] == max(rows.values())


def test_scd2_pit_selects_the_version_valid_at_fact_time(spark, tmp_path):
    """Clicks land on the correct version: before any purchase -> no
    row; between versions -> the earlier one; at a boundary -> the
    NEW version (half-open intervals); after the last -> the open
    current version."""
    from datetime import datetime, timedelta

    base = datetime(2024, 6, 1)
    rows = [
        # two purchase versions for user 1
        (1, 1, base, "purchase", 10.0),
        (2, 1, base + timedelta(days=2), "purchase", 20.0),
        # clicks probing each regime
        (10, 1, base - timedelta(hours=1), "click", 0.0),   # before all
        (11, 1, base + timedelta(days=1), "click", 0.0),    # version 1
        (12, 1, base + timedelta(days=2), "click", 0.0),    # boundary -> v2
        (13, 1, base + timedelta(days=9), "click", 0.0),    # open v2
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_id: r.ver_value
        for r in QUERIES["q_join_scd2_pit"](spark, str(tmp_path)).collect()
    }
    assert got == {11: 10.0, 12: 20.0, 13: 20.0}


def test_semantic_clusters_group_paraphrase_families(spark, tmp_path):
    """Two cosine families on orthogonal axes cluster separately
    under the min-label id; edge-less vectors emit no row (no
    near-dup partner => nothing for diversity sampling to collapse)."""
    vecs = [
        (1, [1.0, 0.0]),      # family A (x-axis)
        (2, [0.9, 0.1]),      # family A
        (4, [0.95, 0.05]),    # family A
        (3, [0.0, 1.0]),      # family B (y-axis)
        (6, [0.1, 0.99]),     # family B
        (5, [-1.0, 0.0]),     # anti-aligned with A: no edge at cos>=0.5
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        r.vec_id: r.cluster_id
        for r in QUERIES["q_sim_semantic_clusters"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: 1, 2: 1, 4: 1, 3: 3, 6: 3}
