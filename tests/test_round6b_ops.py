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
