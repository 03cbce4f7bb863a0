"""Round-9 second-wave operators: properties the SQL oracles can't
express — BM25 tf saturation, RRF fusion arithmetic on planted ranks,
DSIR weight direction on a planted two-language corpus, Matryoshka
recall 1.0 when the prefix provably carries all the information.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mrtweety_analytic_spark.queries import QUERIES


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))


def test_bm25_tf_saturates(spark, tmp_path):
    """Same length, more query-term occurrences -> higher score, but
    SUB-linearly: doubling tf must not double the score (k1 damping) —
    the property that separates BM25 from raw tf weighting. Padding
    uses non-query terms so idf and avgdl stay fixed across docs."""
    q = "spark"
    mk = lambda n: " ".join([q] * n + ["pad"] * (8 - n))  # noqa: E731
    _write_docs(
        spark,
        tmp_path,
        [
            (0, mk(1), "en", "s0", 10),
            (1, mk(2), "en", "s0", 10),
            (2, mk(4), "en", "s0", 10),
            (3, "pad pad pad pad pad pad pad pad", "en", "s0", 10),
        ],
    )
    rows = {
        r.doc_id: r.score
        for r in QUERIES["q_text_bm25"](spark, str(tmp_path)).collect()
    }
    assert 3 not in rows  # no query term -> not retrieved
    assert rows[0] < rows[1] < rows[2]  # monotone in tf
    assert rows[1] < 2 * rows[0]  # saturation: tf=2 scores < 2x tf=1
    assert rows[2] < 2 * rows[1]


def test_rrf_fusion_arithmetic_planted(spark, tmp_path):
    """Plant a corpus where doc 1 is the OVERWHELMING lexical hit and
    vec 1 is the nearest dense neighbor of the probe — it must fuse at
    rank 1 with rrf = 1/61 + 1/61 exactly. A doc in only one list
    carries rank 0 in the other and exactly that list's term."""
    docs = [(1, "spark join window spark join window", "en", "s0", 30)]
    docs += [
        (i, "spark pad pad pad pad pad", "en", "s0", 20)
        for i in range(2, 8)
    ]
    docs += [(90, "pad pad", "en", "s0", 7)]  # lexical-absent, dense-only
    _write_docs(spark, tmp_path, docs)
    # probe 0; vec 1 nearly parallel to probe; 90 also present but
    # farther; others orthogonal-ish
    _write_embeddings(
        spark,
        tmp_path,
        [
            (0, 0, [1.0, 0.0, 0.0, 0.0]),
            (1, 0, [0.99, 0.1, 0.0, 0.0]),
            (90, 0, [0.5, 0.5, 0.5, 0.5]),
            (2, 0, [0.0, 1.0, 0.0, 0.0]),
            (3, 0, [0.0, 0.0, 1.0, 0.0]),
        ],
    )
    out = QUERIES["q_sim_hybrid_rrf"](spark, str(tmp_path)).collect()
    top = out[0]
    assert top.id == 1
    assert top.lex_rank == 1 and top.vec_rank == 1
    assert abs(top.rrf_score - round(2 / 61, 6)) < 1e-9
    by_id = {r.id: r for r in out}
    assert by_id[90].lex_rank == 0  # 'pad pad' matches no query term
    assert by_id[90].vec_rank > 0
    assert abs(
        by_id[90].rrf_score - round(1 / (60 + by_id[90].vec_rank), 6)
    ) < 1e-9


def test_dsir_weights_point_at_target(spark, tmp_path):
    """Two planted vocabularies: lang='en' docs speak only 'alpha',
    others only 'beta'. The en-like source must carry positive mean
    log-weight and frac_targetlike 1.0; the beta source negative and
    0.0 — the resampling direction DSIR exists to produce."""
    docs = [
        (i, "alpha alpha alpha alpha", "en", "src_en", 23)
        for i in range(10)
    ]
    docs += [
        (10 + i, "beta beta beta beta", "fr", "src_fr", 19)
        for i in range(10)
    ]
    _write_docs(spark, tmp_path, docs)
    rows = {
        r.source: r
        for r in QUERIES["q_mix_dsir_weights"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["src_en"].avg_logw > 0 > rows["src_fr"].avg_logw
    assert rows["src_en"].frac_targetlike == 1.0
    assert rows["src_fr"].frac_targetlike == 0.0


def test_matryoshka_recall_perfect_when_prefix_sufficient(
    spark, tmp_path
):
    """If every embedding is zero beyond the 32-dim prefix, prefix
    cosine IS full cosine (the padded dims contribute 0 to every dot
    product and norm), so both rankings coincide and recall@k = 1.0
    by construction — the identity the measurement is calibrated on."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(120):
        v = [rng.uniform(-1, 1) for _ in range(32)] + [0.0] * 32
        rows.append((i, 0, v))
    _write_embeddings(spark, tmp_path, rows)
    r = QUERIES["q_sim_matryoshka_recall"](
        spark, str(tmp_path)
    ).collect()[0]
    assert r.n_probes == 3  # vec_id 0, 50, 100
    assert r.recall_at_k == 1.0
    assert r.n_hit == r.n_probes * r.k


def test_hamming_topk_planted_distances(spark, tmp_path):
    """Plant a probe (vec_id 0) and neighbors that are the probe with
    exactly j signs flipped — their Hamming distance IS j by
    construction (sign quantization is exact on ±1 coordinates), so
    the top-k must be ids 1..k in flip-count order with hamming == j.
    Also exercises the tie path: two single-flip twins (ids 1, 2)
    share distance 1 and must order by vec_id."""
    base = [1.0 if (i * 7) % 3 else -1.0 for i in range(64)]

    def flipped(j, offset=0):
        v = list(base)
        for t in range(j):
            v[(t + offset) % 64] = -v[(t + offset) % 64]
        return v

    rows = [(0, 0, base), (1, 0, flipped(1, 0)), (2, 0, flipped(1, 5)),
            (3, 0, flipped(2, 10)), (4, 0, flipped(3, 20)),
            (5, 0, flipped(40, 0))]
    # pad the corpus so d* < 40: distant fillers at distance 32ish
    import random
    rng = random.Random(3)
    for i in range(6, 30):
        rows.append((i, 0, [rng.choice([-1.0, 1.0]) for _ in range(64)]))
    _write_embeddings(spark, tmp_path, rows)
    out = QUERIES["q_sim_hamming_topk"](spark, str(tmp_path)).collect()
    got = sorted(
        ((r.hamming, r.vec_id) for r in out if r.probe_id == 0)
    )
    assert len(got) == 10
    assert got[0] == (1, 1) and got[1] == (1, 2)  # tie ordered by id
    assert got[2] == (2, 3)
    assert got[3] == (3, 4)
    assert all(h < 40 for h, _ in got)  # the 40-flip plant is cut


def test_dsir_logw_clears_round6_half_grid(spark, sf_dir):
    """ADVICE r10: q_mix_dsir_weights rounds logw at 6 decimals
    before its logw > 0 predicate, which moves the cross-engine flip
    boundary from 0 to the round-6 half-grid (n + 0.5e-6). That is
    only deterministic if no document's TRUE (unrounded) sum sits
    within float-summation noise of a half-grid point — a
    data-dependent margin, so it is asserted here on the actual
    corpus rather than claimed in a comment. Double-precision noise
    on these sums is ~1e-13 absolute; the 1e-4-grid-unit (1e-10
    absolute) floor is >1000x noise, while the measured corpus
    margin is >1e-3 grid units at both shipped scales."""
    import math

    from mrtweety_analytic_spark.operators.lifecycle import (
        _dsir_doc_logw,
    )

    rows = _dsir_doc_logw(spark, sf_dir).collect()
    assert rows, "corpus produced no token-bearing documents"
    dists = []
    for r in rows:
        grid = r.logw_raw * 1e6
        frac = grid - math.floor(grid)
        dists.append(abs(frac - 0.5))
    assert min(dists) > 1e-4, (
        "a document's unrounded DSIR logw is within float noise of "
        "the round-6 half-grid; the round-before-compare convention "
        "is no longer deterministic on this corpus"
    )
