"""Bounded property-based checks (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

words = st.lists(
    st.sampled_from(["alpha", "beta", "Gamma", "GAMMA", "the", "a"]),
    min_size=0,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(st.lists(words, min_size=0, max_size=6))
def test_trending_counts_bounded_by_tokens(spark, docs):
    from mrtweety_analytic_spark.operators.textops import (
        STOPWORDS,
        trending_terms,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    rows = trending_terms(df, k=100).collect()
    n_tokens = sum(
        1
        for ws in docs
        for w in ws
        if w and w.lower() not in STOPWORDS
    )
    assert sum(r["cnt"] for r in rows) == n_tokens
    # case-folded keys are unique
    keys = [r["term"] for r in rows]
    assert len(keys) == len(set(keys))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30),
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30),
)
def test_union_count_additive(spark, xs, ys):
    a = spark.createDataFrame([(x,) for x in xs], "x int")
    b = spark.createDataFrame([(y,) for y in ys], "x int")
    assert a.unionByName(b).count() == len(xs) + len(ys)
    assert a.unionByName(b).distinct().count() == len(set(xs) | set(ys))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=0, max_size=5),
                min_size=0, max_size=20))
def test_dedup_idempotent(spark, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = (
        df.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    )
    twice = (
        once.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == len(set(texts))


def test_dedup_pipeline_monotone_retention(spark, sf_dir):
    """Each tier only removes documents: n_final <= n_exact_kept <=
    n_raw per source, and totals match the table row count."""
    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.sources import load_table

    rows = QUERIES["q_dedup_pipeline"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_final <= r.n_exact_kept <= r.n_raw
    total_raw = sum(r.n_raw for r in rows)
    assert total_raw == load_table(spark, sf_dir, "documents").count()


def test_sessionize_preserves_events(spark, sf_dir):
    """Session event counts sum to the table row count (no event is
    lost or double-assigned by the gap logic)."""
    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.sources import load_table

    rows = QUERIES["q_sessionize_gaps"](spark, sf_dir).collect()
    assert sum(r.n_events for r in rows) == load_table(
        spark, sf_dir, "events"
    ).count()


def test_transition_probabilities_sum_to_one(spark, sf_dir):
    """Each source state's outgoing transition probabilities sum to 1
    (within rounding of the 6-decimal grid)."""
    from collections import defaultdict

    from mrtweety_analytic_spark.queries import QUERIES

    sums = defaultdict(float)
    for r in QUERIES["q_events_transitions"](spark, sf_dir).collect():
        sums[r.cur] += r.p
    assert sums and all(abs(s - 1.0) < 1e-4 for s in sums.values())


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    """The bitmap OR-merge popcount equals Spark's own exact
    countDistinct — same engine, two physical strategies."""
    from pyspark.sql import functions as F

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.sources import load_table

    row = QUERIES["q_agg_bitmap_distinct"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("b"),
    ).collect()[0]
    assert (row.n_users, row.n_buyers) == (exact.u, exact.b)


def test_retention_day_zero_counts_cohort(spark, sf_dir):
    """Every user is active on their own cohort day, so the offset-0
    cell of each cohort equals the cohort's size — and cells never
    exceed it."""
    from mrtweety_analytic_spark.queries import QUERIES

    rows = QUERIES["q_events_retention"](spark, sf_dir).collect()
    day0 = {r.cohort_day: r.n_active for r in rows if r.day_offset == 0}
    for r in rows:
        assert r.cohort_day in day0
        assert r.n_active <= day0[r.cohort_day]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=150),  # offset seconds
            st.booleans(),                            # short (10s) vs long (30s) gap
        ),
        min_size=0,
        max_size=25,
    )
)
def test_session_window_dynamic_gap_matches_reference(spark, events):
    """session_window with a per-event gap expression must merge
    intervals exactly like the reference algorithm: sort by event
    time, a row joins the current session while its ts is at or
    before the running max end (ts + its own gap extends the end),
    and only ts strictly past the end starts a new session. Random
    offsets produce duplicate timestamps and exact-boundary
    collisions — the cases the sf-scale oracle never hits (this test
    caught the >= vs > boundary bug in the s_session_dynamic
    oracle)."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(seconds=off), 10 if short else 30)
        for off, short in events
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "ts timestamp, gap_s int")
    gap = F.when(F.col("gap_s") == 10, F.lit("10 seconds")).otherwise(
        F.lit("30 seconds")
    )
    got = sorted(
        (r["w"]["start"], r["n"])
        for r in df.groupBy(F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # Reference merge. Ties: same-ts rows always co-session (gap > 0),
    # so sorting by (ts, end) is order-deterministic. Boundary rule
    # (verified empirically, and what this test exists to pin): Spark
    # merges INCLUSIVELY — an event at exactly the session's current
    # end joins it; only ts strictly past the end opens a new session.
    items = sorted((ts, ts + dt.timedelta(seconds=g)) for ts, g in rows)
    sessions = []
    cur_start, cur_end, cur_n = None, None, 0
    for ts, end in items:
        if cur_end is None or ts > cur_end:
            if cur_end is not None:
                sessions.append((cur_start, cur_n))
            cur_start, cur_end, cur_n = ts, end, 1
        else:
            cur_end = max(cur_end, end)
            cur_n += 1
    sessions.append((cur_start, cur_n))
    assert got == sorted(sessions)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(  # (user, offset_s, is_purchase) — coarse offsets force ties
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=8),
            st.booleans(),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_asof_join_matches_reference(spark, raw):
    """q_join_asof's equi-join + max(struct) must pick exactly the
    reference answer — latest view at-or-before the purchase, ties on
    ts resolved to the larger event_id — including same-timestamp
    collisions the corpus's microsecond-random ts never produces."""
    import datetime as dt

    from mrtweety_analytic_spark.operators.joins import q_join_asof
    from mrtweety_analytic_spark.sources import table_path

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=off),
            user,
            "purchase" if purch else "view",
            float(i),
            "{}",
        )
        for i, (user, off, purch) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile
    import uuid

    d = tempfile.mkdtemp(prefix=f"asof_{uuid.uuid4().hex[:6]}_")
    df.write.mode("overwrite").parquet(table_path(d, "events"))
    got = {
        r["event_id"]: r["last_view_value"]
        for r in q_join_asof(spark, d).collect()
    }
    want = {}
    for i, (user, off, purch) in enumerate(raw):
        if not purch:
            continue
        cands = [
            (base + dt.timedelta(seconds=o2), j, float(j))
            for j, (u2, o2, p2) in enumerate(raw)
            if not p2 and u2 == user
            and base + dt.timedelta(seconds=o2) <= base + dt.timedelta(seconds=off)
        ]
        want[i] = max(cands)[2] if cands else None
    assert got == want


def test_variant_shape_partition_matches_duckdb(spark):
    """Pin the cross-engine shape partition for q_fn_variant_schema:
    after numeric-leaf normalization, Spark schema_of_variant and
    DuckDB json_structure must induce the SAME number of distinct
    shapes on a corpus designed to stress exactly their documented
    divergence (numeric literals of different scales, ints vs floats,
    nested objects, arrays)."""
    import duckdb

    from pyspark.sql import functions as F
    from mrtweety_analytic_spark.operators.modern import (
        _DUCK_NUM_TYPES,
        _SPARK_NUM_TYPES,
    )

    payloads = [
        '{"a": 1}',
        '{"a": 2}',            # same shape as above
        '{"a": 1.5}',          # DECIMAL(2,1) vs DOUBLE — must merge
        '{"a": 2.25}',         # DECIMAL(3,2) vs DOUBLE — must merge
        '{"a": -7}',           # BIGINT vs (U)BIGINT sign split
        '{"a": "s"}',          # string leaf: its own class
        '{"a": true}',
        '{"a": null}',
        '{"a": {"b": 1.5, "c": 2}}',
        '{"a": {"b": 99.125, "c": 3}}',  # same nested shape
        '{"a": [1, 2, 3]}',
        '{"a": [1.5, 2.25]}',
        '{"b": 1}',            # different field name: new shape
    ]

    df = spark.createDataFrame([(p,) for p in payloads], "props string")
    spark_shapes = (
        df.select(
            F.regexp_replace(
                F.schema_of_variant(F.parse_json("props")),
                _SPARK_NUM_TYPES,
                "NUM",
            ).alias("shape")
        )
        .groupBy("shape")
        .count()
        .collect()
    )

    con = duckdb.connect()
    duck_shapes = con.execute(
        f"""
        SELECT regexp_replace(CAST(json_structure(props) AS VARCHAR),
                              '{_DUCK_NUM_TYPES}', '"NUM"', 'g') AS shape,
               count(*) AS n
        FROM (SELECT unnest(?) AS props)
        GROUP BY shape
        """,
        [payloads],
    ).fetchall()

    # Same partition: same number of classes AND same class sizes.
    assert len(spark_shapes) == len(duck_shapes)
    assert sorted(r["count"] for r in spark_shapes) == sorted(
        n for _, n in duck_shapes
    )


def test_knn_batch_slab_boundary_invariance(spark, tmp_path, monkeypatch):
    """The probe-slab chunking inside q_sim_knn_batch is a pure
    execution detail: forcing PROBE_CHUNK=2 (probes split mid-slab)
    must give byte-identical results to one big slab, including
    score-tie ordering across slab boundaries."""
    import mrtweety_analytic_spark.operators.similarity as sim

    # 3 probes (vec_id 0, 50, 100 under PROBE_MOD=50); duplicate
    # embeddings manufacture exact score ties across candidates.
    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [1.0, 0.1], "a"),
        (2, [1.0, 0.1], "a"),   # tie with vec 1
        (3, [0.9, 0.2], "a"),
        (50, [0.0, 1.0], "a"),
        (51, [0.1, 1.0], "a"),
        (100, [0.5, 0.5], "a"),
        (101, [0.5, 0.5], "a"),  # tie with probe's own direction
        (102, [0.4, 0.6], "a"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(f"{out}/embeddings.parquet")

    def run():
        got = sim.q_sim_knn_batch(spark, out).collect()
        return sorted((r["probe_id"], r["vec_id"], r["score"]) for r in got)

    baseline = run()
    monkeypatch.setattr(sim, "PROBE_CHUNK", 2)
    assert run() == baseline
    assert len({p for p, _, _ in baseline}) == 3  # all probes answered


def test_bag_setops_multiplicity_matches_duckdb(spark):
    """Pin INTERSECT ALL / EXCEPT ALL bag semantics on constructed
    multiplicities (the class random corpus data rarely stresses):
    min-count for intersect-all, count-difference (floored at 0) for
    except-all, including keys present on only one side and NULLs
    (SQL bag ops match NULLs to each other)."""
    import duckdb

    a_vals = [1, 1, 1, 2, 2, 3, None, None]
    b_vals = [1, 1, 2, 2, 2, 4, None]
    a = spark.createDataFrame([(v,) for v in a_vals], "k int")
    b = spark.createDataFrame([(v,) for v in b_vals], "k int")

    def counts(df):
        out = {}
        for r in df.collect():
            out[r["k"]] = out.get(r["k"], 0) + 1
        return out

    con = duckdb.connect()

    def duck(op):
        rows = con.execute(
            f"""
            SELECT k FROM (SELECT unnest(?::INT[]) AS k)
            {op}
            SELECT k FROM (SELECT unnest(?::INT[]) AS k)
            """,
            [a_vals, b_vals],
        ).fetchall()
        out = {}
        for (v,) in rows:
            out[v] = out.get(v, 0) + 1
        return out

    assert counts(a.intersectAll(b)) == duck("INTERSECT ALL")
    assert counts(a.exceptAll(b)) == duck("EXCEPT ALL")
    # The constructed expectation, spelled out:
    assert counts(a.intersectAll(b)) == {1: 2, 2: 2, None: 1}
    assert counts(a.exceptAll(b)) == {1: 1, 3: 1, None: 1}


def test_window_percentile_interpolation_matches_duckdb(spark):
    """Pin Spark percentile(0.5) against DuckDB quantile_cont on the
    interpolation-sensitive shapes: even group sizes (midpoint
    interpolation), duplicate values at the median boundary, and a
    singleton group."""
    import duckdb

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    groups = {
        "even": [1.0, 2.0, 3.0, 10.0],       # interpolate 2.0..3.0
        "dup_edge": [1.0, 2.0, 2.0, 7.0],    # median inside a tie run
        "odd": [5.0, 1.0, 9.0],
        "single": [42.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    w = W.partitionBy("g")
    got = {
        (r["g"], r["v"]): r["med"]
        for r in df.select(
            "g", "v", F.round(F.percentile("v", 0.5).over(w), 4).alias("med")
        ).collect()
    }

    con = duckdb.connect()
    expect = {}
    for g, vs in groups.items():
        med = con.execute(
            "SELECT round(quantile_cont(x, 0.5), 4) "
            "FROM (SELECT unnest(?::DOUBLE[]) AS x)", [vs]
        ).fetchone()[0]
        for v in vs:
            expect[(g, v)] = med
    assert got == expect
    assert expect[("even", 1.0)] == 2.5
    assert expect[("dup_edge", 1.0)] == 2.0


@settings(max_examples=12, deadline=None)
@given(
    st.lists(  # per-doc shingle-id sets, ids from a small universe
        st.sets(st.integers(min_value=0, max_value=9), max_size=6),
        min_size=0,
        max_size=8,
    )
)
def test_pair_counts_matches_bruteforce(spark, doc_shingles):
    """_pair_counts (postings-array explode) must equal the brute-
    force pair intersection count for ANY doc->shingle-set incidence,
    including empty docs, singleton postings, and hot shingles shared
    by every doc."""
    from itertools import combinations

    from mrtweety_analytic_spark.operators.dedup import _pair_counts

    rows = [
        (doc_id, sh)
        for doc_id, shset in enumerate(doc_shingles)
        for sh in shset
    ]
    want = {}
    for (a, sa), (b, sb) in combinations(enumerate(doc_shingles), 2):
        n = len(sa & sb)
        if n:
            want[(a, b)] = n
    if not rows:
        assert want == {}
        return
    shingles = spark.createDataFrame(rows, "doc_id long, shingle long")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in _pair_counts(shingles).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=100.0,
                  allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=25,
    )
)
def test_ewma_window_algebra_matches_pandas(spark, values):
    """The (1-a)^t cancellation trick (q_ts_ewma): two cumulative
    window sums must reproduce pandas ewm(adjust=True) on ANY dense
    series, not just the fixture's."""
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from datetime import date, timedelta

    from mrtweety_analytic_spark.operators.mining import ewma_daily

    base = date(2024, 7, 1)
    df = spark.createDataFrame(
        [("t", base + timedelta(days=i), float(v))
         for i, v in enumerate(values)],
        "event_type string, day date, v double",
    )
    # drive the ACTUAL operator core
    out = sorted(ewma_daily(df).collect(), key=lambda r: r.day)
    expect = pd.Series(values).ewm(alpha=0.3, adjust=True).mean()
    for r, e in zip(out, expect):
        assert abs(r.ewma - e) < 1e-8


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # day offset
            st.floats(min_value=-50.0, max_value=50.0,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_interpolation_recovers_observations_and_stays_linear(spark, obs):
    """q_ts_interpolate's window algebra on arbitrary sparse series:
    observed days exact, gap days on the straight line between
    flanking observations (checked against a direct numpy recompute).
    """
    from datetime import date, timedelta

    import numpy as np

    from mrtweety_analytic_spark.operators.mining import interpolate_daily

    base = date(2024, 3, 1)
    daily = spark.createDataFrame(
        [(1, base + timedelta(days=d), float(v)) for d, v in obs],
        "user_id long, day date, v double",
    )
    # drive the ACTUAL operator core, not a re-derivation of it
    rows = sorted(interpolate_daily(daily).collect(), key=lambda r: r.day)
    rows = [type(r)(**{**r.asDict(), "val": r.val}) for r in rows]
    days = sorted(d for d, _ in obs)
    xs = np.array(days, dtype=float)
    ys = np.array([dict(obs)[d] for d in days], dtype=float)
    for r in rows:
        d = (r.day - base).days
        expect = float(np.interp(d, xs, ys))
        # the operator rounds to 6 decimals
        assert abs(r.val - expect) < 5.1e-7, (d, r.val, expect)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),    # user
            st.integers(min_value=0, max_value=50),   # ts second
            st.floats(min_value=0.0, max_value=9.0,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=11),           # split point
)
def test_upsert_merge_law_any_split(spark, events, split):
    """UpsertKeyedSink: ANY 2-way batch split of ANY event sequence
    yields the same final table as one batch (the merge-law property
    behind exactly-once effect, beyond the fixed-case test)."""
    from datetime import datetime

    from mrtweety_analytic_spark.streaming.queries import UpsertKeyedSink

    rows = [
        (u, datetime(2024, 1, 1, 0, 0, s), i, "t", v)
        for i, (u, s, v) in enumerate(events)
    ]
    schema = ("user_id long, ts timestamp, event_id long, "
              "event_type string, value double")
    split = min(split, len(rows))

    one = UpsertKeyedSink()
    one(spark.createDataFrame(rows, schema), 0)

    two = UpsertKeyedSink()
    for i, part in enumerate((rows[:split], rows[split:])):
        if part:
            two(spark.createDataFrame(part, schema), i)

    assert one.rows == two.rows


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),   # user
            st.integers(min_value=0, max_value=9),   # day offset
        ),
        min_size=1,
        max_size=25,
    )
)
def test_growth_accounting_books_balance_any_pattern(spark, activity):
    """growth_accounting() on ARBITRARY activity patterns: every
    day's actives partition exactly into new/retained/resurrected,
    and churn equals yesterday's DAU minus today's retained."""
    from datetime import date, timedelta

    from mrtweety_analytic_spark.operators.mining import growth_accounting

    base = date(2024, 5, 1)
    pairs = spark.createDataFrame(
        sorted({(u, base + timedelta(days=d)) for u, d in activity}),
        "user_id long, day date",
    )
    rows = sorted(growth_accounting(pairs).collect(), key=lambda r: r.day)
    prev_dau, prev_day = None, None
    for r in rows:
        assert r.dau == r.n_new + r.n_retained + r.n_resurrected
        if prev_day is not None and (r.day - prev_day).days == 1:
            assert r.n_churned == prev_dau - r.n_retained
        if prev_day is None:
            assert r.n_churned is None
        prev_dau, prev_day = r.dau, r.day


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2800),  # start minute
            st.integers(min_value=1, max_value=200),   # duration minutes
        ),
        min_size=1,
        max_size=15,
    )
)
def test_peak_concurrency_matches_bruteforce_any_intervals(spark, ivs):
    """peak_concurrency() on ARBITRARY interval sets (start minutes
    span two days, durations up to 200 min so midnight crossing
    occurs): per-day peaks must match the brute-force sweep with the
    same clip-at-midnight and starts-before-ends tie rule."""
    from datetime import datetime, timedelta

    from mrtweety_analytic_spark.operators.mining import peak_concurrency

    base = datetime(2024, 6, 1)
    rows = [
        (base + timedelta(minutes=m), base + timedelta(minutes=m + d))
        for m, d in ivs
    ]
    sess = spark.createDataFrame(rows, "s timestamp, e timestamp")
    got = {r.day: r.peak_concurrency
           for r in peak_concurrency(sess).collect()}

    by_day: dict = {}
    for s, e in rows:
        if s.date() == e.date():
            by_day.setdefault(s.date(), []).append((s, e))
        else:
            mid = datetime.combine(e.date(), datetime.min.time())
            by_day.setdefault(s.date(), []).append((s, mid))
            by_day.setdefault(e.date(), []).append((mid, e))
    expect = {}
    for day, intervals in by_day.items():
        peak = 0
        for t, _ in intervals:
            active = sum(1 for s, _ in intervals if s <= t) - sum(
                1 for _, e in intervals if e < t
            )
            peak = max(peak, active)
        expect[day] = peak
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),   # basket
            st.integers(min_value=0, max_value=12),  # item
        ),
        min_size=4,
        max_size=40,
    ),
    st.integers(min_value=2, max_value=4),           # cap R
)
def test_basket_cap_is_sound_subset(spark, rows, cap):
    """basket_pairs_core(cap_r=R) on ARBITRARY corpora: the capped
    result is a SOUND approximation — every reported pair exists in
    the exact result with pair_cnt_capped <= pair_cnt_exact (a pair
    is only counted in baskets where both members survived the
    top-R cut), and confidence/lift marginals still come from the
    UNCAPPED support table."""
    from mrtweety_analytic_spark.operators.mining import basket_pairs_core

    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    exact = {
        (r.p1, r.p2): r.pair_cnt for r in basket_pairs_core(li).collect()
    }
    capped = basket_pairs_core(li, cap_r=cap).collect()
    for r in capped:
        assert (r.p1, r.p2) in exact or len(exact) == 20, (r.p1, r.p2)
        if (r.p1, r.p2) in exact:
            assert r.pair_cnt <= exact[(r.p1, r.p2)]


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["en", "de", "fr", "es", "zh"]),
        st.integers(min_value=1, max_value=60),
        min_size=2,
        max_size=5,
    )
)
def test_mix_rebalance_rates_hit_targets_exactly(spark, tmp_path_factory, counts):
    """q_mix_rebalance on ARBITRARY availability: for every
    non-clamped language, rate*avail/target is the SAME constant k
    (the kept corpus hits the target ratios exactly in expectation),
    k is the binding constraint (min avail/target over sampled
    languages), and clamped languages are exactly those with
    avail <= k*target."""
    import pandas as pd

    from mrtweety_analytic_spark.operators.lifecycle import MIX_TARGETS
    from mrtweety_analytic_spark.queries import QUERIES

    tmp = tmp_path_factory.mktemp("mix")
    rows = []
    i = 0
    for lang, n in counts.items():
        for _ in range(n):
            rows.append((i, f"text {i}", lang, "s", 10))
            i += 1
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp / "documents.parquet")
    got = {r.lang: r for r in QUERIES["q_mix_rebalance"](spark, str(tmp)).collect()}
    assert set(got) == set(counts)
    k = min(counts[lg] / MIX_TARGETS[lg] for lg in counts)
    for lg, r in got.items():
        want_rate = min(1.0, k * MIX_TARGETS[lg] / counts[lg])
        assert r.rate == pytest.approx(want_rate, abs=1e-6), lg
        assert r.n_avail == counts[lg]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=30),
        min_size=2,
        max_size=10,
    )
)
def test_holt_kernel_matches_reference_on_random_series(
    spark, tmp_path_factory, series
):
    """q_ts_holt on ARBITRARY daily-count series: the Arrow kernel
    equals the plain-Python recurrence (same init, same op order)."""
    from datetime import datetime, timedelta

    from mrtweety_analytic_spark.operators.mining import (
        HOLT_ALPHA,
        HOLT_BETA,
    )
    from mrtweety_analytic_spark.queries import QUERIES

    tmp = tmp_path_factory.mktemp("holt")
    rows = []
    eid = 0
    for d, n in enumerate(series):
        for i in range(n):
            rows.append(
                (eid, 1, datetime(2024, 2, 1) + timedelta(days=d, seconds=i),
                 "t", 1.0)
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    got = QUERIES["q_ts_holt"](spark, str(tmp)).collect()[0]

    v = [float(x) for x in series]
    l, b = v[0], v[1] - v[0]
    for t in range(1, len(v)):
        l_new = HOLT_ALPHA * v[t] + (1 - HOLT_ALPHA) * (l + b)
        b = HOLT_BETA * (l_new - l) + (1 - HOLT_BETA) * b
        l = l_new
    assert got.level == pytest.approx(round(l, 6))
    assert got.trend == pytest.approx(round(b, 6))


@settings(max_examples=25, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=20),
        min_size=0,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bpe_merge_loop_invariants(word_counts, k):
    """The pure BPE trainer core: every recorded merge's wsum equals
    a recount of that pair at its own step (replayed independently),
    merges are deterministic, and symbols only ever concatenate."""
    from mrtweety_analytic_spark.operators.textops import _bpe_merge_loop

    merges = _bpe_merge_loop(dict(word_counts), k)
    assert merges == _bpe_merge_loop(dict(word_counts), k)  # pure
    # replay: apply merges one at a time, recount the pair just
    # before its merge step — must equal the recorded wsum
    syms = {w: tuple(w) for w in word_counts}
    for step, left, right, merged, wsum in merges:
        assert merged == left + right
        cnt = 0
        for w, s in syms.items():
            cnt += sum(
                word_counts[w]
                for a, b in zip(s, s[1:])
                if (a, b) == (left, right)
            )
        assert cnt == wsum and wsum >= 1
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.floats(min_value=1.0, max_value=100.0, allow_nan=False),
            st.floats(min_value=0.5, max_value=10.0, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_weighted_median_matches_expansion(spark, rows):
    """q_agg_weighted_median on random data == the plain median rule
    applied to each row repeated per its (integerized) weight."""
    import tempfile, os, shutil

    rows = [(g, round(p, 2), float(int(q))) for g, p, q in rows]
    rows = [(g, p, q) for g, p, q in rows if q >= 1.0]
    if not rows:
        return
    from mrtweety_analytic_spark.queries import QUERIES

    d = tempfile.mkdtemp()
    try:
        spark.createDataFrame(
            rows,
            "l_returnflag string, l_extendedprice double, l_quantity double",
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        got = {
            r.l_returnflag: r.w_median_price
            for r in QUERIES["q_agg_weighted_median"](spark, d).collect()
        }
        for g in {r[0] for r in rows}:
            expanded = sorted(
                p for gg, p, q in rows for _ in range(int(q)) if gg == g
            )
            tot = len(expanded)
            # smallest value whose cumulative count reaches half
            cum, pick = 0, None
            for p in expanded:
                cum += 1
                if cum >= tot / 2:
                    pick = p
                    break
            assert got[g] == pytest.approx(pick, abs=1e-6)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from([-1.0, 1.0]), min_size=64, max_size=64),
    st.lists(st.sampled_from([-1.0, 1.0]), min_size=64, max_size=64),
)
def test_hamming_signature_kernel_exact(spark, va, vb):
    """The packed two-half signature + XOR/popcount kernel of
    q_sim_hamming_topk must equal the brute-force count of sign
    disagreements for ANY ±1 vector pair — the integer-exactness
    invariant the operator's cross-engine hash match rests on."""
    from pyspark.sql import functions as F

    from mrtweety_analytic_spark.operators.similarity import (
        _PACK_HI,
        _PACK_LO,
    )

    expected = sum(1 for x, y in zip(va, vb) if (x > 0) != (y > 0))
    df = spark.createDataFrame(
        [(va, vb)], "a array<double>, b array<double>"
    )
    packed = df.select(
        F.expr(_PACK_LO.replace("e,", "a,")).alias("alo"),
        F.expr(_PACK_HI.replace("e,", "a,")).alias("ahi"),
        F.expr(_PACK_LO.replace("e,", "b,")).alias("blo"),
        F.expr(_PACK_HI.replace("e,", "b,")).alias("bhi"),
    ).select(
        (
            F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
            + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi")))
        ).alias("h")
    )
    assert packed.collect()[0].h == expected
