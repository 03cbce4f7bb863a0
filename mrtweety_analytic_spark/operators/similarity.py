"""Similarity search over the embeddings table (north-star extension).

Three paths:
  - q_sim_knn_cosine  — single-probe exact top-k, pure column
    expressions (zip_with + aggregate fold), TakeOrderedAndProject cut.
  - q_sim_knn_batch   — many probes, Arrow-batched numpy matmul
    (mapInPandas) with per-batch partial top-k, then a global window
    top-k. This is the distributed brute-force baseline: broadcast the
    probe matrix, stream the corpus through BLAS.
  - q_sim_lsh_bucketed — BucketedRandomProjectionLSH approximate join,
    the 100 TB path (candidates from bucket collisions, not n²).

Score parity: cosine computed in float64 in both engines, rounded to
6 decimals, ordered by (rounded score, vec_id) so the top-k cut is
identical under the DuckDB oracle (list_cosine_similarity on
DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from ..util import LastHandle

# Cache handle for the last q_sim_knn_batch result — unpersisted on
# the next call so repeated bench runs don't accumulate entries.
_LAST_KNN_BATCH_OUT = LastHandle(lambda df: df.unpersist())

KNN_K = 10
BATCH_K = 3
PROBE_MOD = 50  # probes = vec_id % 50 == 0


def dot_expr(x: F.Column, y: F.Column) -> F.Column:
    """Elementwise product fold — JVM-side, no UDF. NOTE: Catalyst's
    higher-order functions are interpreted (not codegen'd), so inside
    an n² pair join this fold is the per-pair unit of cost: compute
    per-ROW invariants (norms!) before the join, never per pair.
    """
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity between two array<double> columns, entirely
    JVM-side: elementwise product fold / norms. For pair joins prefer
    dot_expr with precomputed per-row norms (see q_dedup_embedding) —
    this convenience form folds three times per evaluation.
    """
    return dot_expr(a, b) / (
        F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b))
    )


@register(
    "q_sim_knn_cosine",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qe), 6)
               AS score
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY score DESC, vec_id
    LIMIT {KNN_K}
    """,
)
def q_sim_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe))  # 1-row broadcast, no shuffle
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("e"), F.col("qe")), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(KNN_K)


# Inner numpy slab width: bounds the transient score-matrix slice to
# arrow_batch_rows × PROBE_CHUNK doubles inside each executor batch.
PROBE_CHUNK = 4096
# Hard ceiling on the brute-force tier's probe-set size: the probe
# matrix is shipped once via torrent broadcast, so driver + each
# executor hold O(PROBE_MAX × dim) doubles (~50 MB at dim 64). Probe
# sets beyond this are not a brute-force workload — route them
# through q_sim_ivf_label (cell-blocked) or q_sim_lsh_bucketed.
PROBE_MAX = 100_000


@register(
    "q_sim_knn_batch",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
        FROM embeddings WHERE vec_id % {PROBE_MOD} = 0
    ),
    pairs AS (
        SELECT p.probe_id, e.vec_id,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            p.pe), 6) AS score
        FROM embeddings e, probes p
        WHERE e.vec_id <> p.probe_id
    )
    SELECT probe_id, vec_id, score
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                                       ORDER BY score DESC, vec_id) AS rn
          FROM pairs)
    WHERE rn <= {BATCH_K}
    """,
)
def q_sim_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN, brute-force tier: top-3 neighbours for every 50th
    vector — ONE distributed job over ONE corpus scan.

    Probe side: the probe set must reach every corpus partition (that
    is the definition of brute-force batch kNN). It is materialized
    once and shipped once per executor via sparkContext.broadcast
    (torrent, not per-task closure capture), behind a hard PROBE_MAX
    ceiling — beyond that this is no longer a brute-force workload
    and callers are pointed at the cell-blocked (q_sim_ivf_label) or
    LSH (q_sim_lsh_bucketed) tiers. No driver-sequential chunk loop:
    the earlier blocked design collected probes in PROBE_CHUNK slices
    and paid one full corpus scan per slice (O(corpus × probes/CHUNK)
    total); this shape is O(corpus) scan cost with the probe fan-out
    parallelized across (corpus-partition × probe-slab) work inside
    the executors.

    Corpus side: each Arrow batch computes float64 BLAS matmuls in
    PROBE_CHUNK-wide probe slabs (bounding the transient score-matrix
    slice) and keeps only its local top-k per probe, ordered by the
    same (rounded score desc, vec_id asc) lexsort as the global
    window, so cutoff ties can never drop a row the global tiebreak
    would keep. The final window sees k rows per (probe, partition)
    instead of the full n×m score matrix.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    probe_df = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        "vec_id", "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    sc = spark.sparkContext

    probes = probe_df.orderBy("vec_id").limit(PROBE_MAX + 1).collect()
    if len(probes) > PROBE_MAX:
        raise ValueError(
            f"q_sim_knn_batch is the brute-force tier, capped at "
            f"{PROBE_MAX} probes; route larger probe sets through "
            f"q_sim_ivf_label or q_sim_lsh_bucketed"
        )
    if not probes:
        return spark.createDataFrame(
            [], "probe_id long, vec_id long, score double"
        )
    bc = sc.broadcast(
        (
            np.array([r["vec_id"] for r in probes], dtype=np.int64),
            np.array([r["embedding"] for r in probes], dtype=np.float64),
        )
    )

    def score_batches(it):
        probe_ids, pm = bc.value
        pnorm = np.sqrt((pm * pm).sum(axis=1))
        for pdf in it:
            corpus_m = np.array(list(pdf["embedding"]), dtype=np.float64)
            vids = pdf["vec_id"].to_numpy()
            cnorm = np.sqrt((corpus_m * corpus_m).sum(axis=1))
            out = []
            for j0 in range(0, len(probe_ids), PROBE_CHUNK):
                pslab = slice(j0, j0 + PROBE_CHUNK)
                scores = np.round(
                    (corpus_m @ pm[pslab].T)
                    / np.outer(cnorm, pnorm[pslab]),
                    6,
                )
                for j, pid in enumerate(probe_ids[pslab]):
                    col = scores[:, j]
                    cand_idx = np.nonzero(vids != pid)[0]
                    if len(cand_idx) == 0:
                        continue
                    # (score desc, vec_id asc) — identical to the
                    # global window order, so BATCH_K local rows are
                    # always sufficient even under score ties.
                    sel = np.lexsort((vids[cand_idx], -col[cand_idx]))
                    top = cand_idx[sel[:BATCH_K]]
                    out.append(
                        pd.DataFrame(
                            {
                                "probe_id": pid,
                                "vec_id": vids[top],
                                "score": col[top],
                            }
                        )
                    )
            yield pd.concat(out) if out else pd.DataFrame(
                {"probe_id": pd.Series(dtype="int64"),
                 "vec_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64")}
            )

    partial = corpus.mapInPandas(
        score_batches, schema="probe_id long, vec_id long, score double"
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BATCH_K)
        .select("probe_id", "vec_id", "score")
    )
    # Materialize once so the probe broadcast can be released before
    # returning — otherwise executors retain it for the session's
    # lifetime. The cached k·|probes| rows are what the caller
    # re-reads. The previous call's entry is released BEFORE the new
    # persist (see q_join_bloom_runtime: a cache-identical repeat
    # plan would dedup onto the old entry and die with its unpersist;
    # knn_batch plans differ per call via fresh closures, but the
    # ordering keeps this safe if that ever changes), so repeated
    # bench runs hold at most one.
    _LAST_KNN_BATCH_OUT.clear()
    out = out.persist()
    _LAST_KNN_BATCH_OUT.replace(out)
    out.count()
    # unpersist (not destroy): frees executor copies now; the driver
    # copy remains, so a cache-evicted recompute can still
    # re-broadcast.
    bc.unpersist()
    return out


@register(
    "q_sim_ivf_label",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6)
                   AS score
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, score
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_a
                                       ORDER BY score DESC, vec_b) AS rn
          FROM pairs)
    WHERE rn <= {BATCH_K}
    """,
)
def q_sim_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: the label column acts as the coarse quantizer
    (inverted list id) — candidates come only from the same cell, so
    the pair space is Σ|cell|² instead of n². At 100 TB the cells are
    k-means centroid assignments computed the same way.

    Implementation: applyInPandas per cell — each cell's similarity
    block is ONE float64 matmul (BLAS), top-k extracted in-cell, only
    k rows per vector leave the Python worker. The per-pair expression
    fold (see q_sim_knn_cosine) is the right shape for one probe; for
    all-pairs-in-cell the dense block matmul is ~10× faster.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )

    def topk_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        E = np.array(list(pdf["embedding"]), dtype=np.float64)[order]
        norms = np.sqrt((E * E).sum(axis=1))
        S = np.round((E @ E.T) / np.outer(norms, norms), 6)
        n = len(ids)
        out_a, out_b, out_s = [], [], []
        for i in range(n - 1):
            # candidates: strictly larger vec_id (upper triangle)
            scores = S[i, i + 1:]
            cand = ids[i + 1:]
            take = min(BATCH_K, len(cand))
            # order by (score desc, vec_b asc) on ROUNDED scores —
            # identical to the oracle's ORDER BY
            sel = np.lexsort((cand, -scores))[:take]
            out_a.extend([ids[i]] * take)
            out_b.extend(cand[sel])
            out_s.extend(scores[sel])
        return pd.DataFrame(
            {"vec_a": out_a, "vec_b": out_b, "score": out_s}
        )

    return emb.groupBy("label").applyInPandas(
        topk_in_cell, schema="vec_a long, vec_b long, score double"
    )


@register("q_sim_lsh_bucketed")  # rows-only: approximate, seed-pinned
def q_sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate neighbour pairs via random-projection LSH buckets —
    the scale path: join cost ∝ bucket collisions, not n².
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("v")
    )
    if not emb.take(1):  # MLlib fit() raises on an empty dataset
        return spark.createDataFrame(
            [], "vec_a long, vec_b long, l2_dist double"
        )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(emb)
    # The corpus embeddings are unit-normalized, so L2 distance is
    # sqrt(2-2cos): threshold 1.0 ≙ cosine >= 0.5 — real neighbours,
    # not the whole bucket cross product.
    pairs = model.approxSimilarityJoin(emb, emb, threshold=1.0, distCol="l2_dist")
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("l2_dist", 4).alias("l2_dist"),
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
    )


@register(
    "q_sim_centroid",
    oracle="""
    SELECT label, i AS dim, round(avg(e), 4) + 0.0 AS centroid
    FROM (
        SELECT label,
               unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    )
    GROUP BY label, i
    """,
)
def q_sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one dimension per row: posexplode the
    vector and hash-aggregate (label, dim). Fully partial-aggregable
    — at 100 TB each mapper emits 64 partial sums per label, so the
    shuffle is O(labels × dims), independent of row count. (The
    re-assembled array form is a final array_agg over this tiny
    result; kept long-form for the oracle.)
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("i0", "e")
    )
    return (
        ex.groupBy("label", (F.col("i0") + 1).cast("long").alias("dim"))
        .agg(F.round(F.avg("e"), 4).alias("centroid"))
    )


@register(
    "q_sim_kmeans_assign",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    lng AS (SELECT label, unnest(emb) AS v,
                   generate_subscripts(emb, 1) AS dim
            FROM e),
    cl AS (SELECT label, dim, avg(v) AS c FROM lng GROUP BY 1, 2),
    cent AS (SELECT label AS c_label, list(c ORDER BY dim) AS ce
             FROM cl GROUP BY 1),
    scored AS (SELECT e.vec_id, e.label, cent.c_label,
                      round(list_distance(e.emb, cent.ce), 6) AS dist_l2
               FROM e CROSS JOIN cent)
    SELECT vec_id, label, c_label AS assigned_label, dist_l2
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist_l2, c_label) AS rn
          FROM scored)
    WHERE rn = 1
    """,
)
def q_sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step: per-label centroids (M-step shape — posexplode
    + hash-agg, shuffle O(k x dims)), then nearest-centroid by L2
    with a (rounded-distance, label) tiebreak. ALL centroids ship as
    one broadcast array row and each row's argmin is a per-row
    array_min over struct(dist, label) — the assignment pass is
    completely shuffle-free (no window, no groupBy on the big side),
    which is how an iterative k-means scales to 100 TB: per iteration
    one map-side scan + one tiny centroid shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    cent = (
        emb.select("label", F.posexplode("e").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy(F.col("label").alias("c_label"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("ce")
        )
        .agg(F.collect_list(F.struct("c_label", "ce")).alias("cents"))
    )
    dist2 = lambda ce: F.aggregate(  # noqa: E731
        F.zip_with(F.col("e"), ce, lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # struct field order (dist, label) makes array_min implement the
    # (rounded-distance, label) argmin tiebreak lexicographically.
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda s: F.struct(
                F.round(F.sqrt(dist2(s["ce"])), 6).alias("dist"),
                s["c_label"].alias("lb"),
            ),
        )
    )
    return emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        best["lb"].alias("assigned_label"),
        best["dist"].alias("dist_l2"),
    )


@register(
    "q_sim_quantize",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    s AS (SELECT vec_id, emb,
                 127.0 / list_max(list_transform(emb, x -> abs(x)))
                     AS scale
          FROM e)
    SELECT vec_id,
           round(list_max(list_transform(
                     emb, x -> abs(x - round(x * scale) / scale))), 6)
               AS max_abs_err
    FROM s
    """,
)
def q_sim_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of embeddings (per-vector
    scale = 127/max|x|), reporting the per-vector worst-case
    reconstruction error. Entirely row-local array lambdas — no
    shuffle, no UDF: the 4x memory-reduction preprocessing an ANN
    index applies before the 100 TB corpus ever leaves the scan
    stage. (The quantized vectors themselves are the int8 round(x *
    scale) values; the error column is the audit output.)
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    scale = 127.0 / F.array_max(
        F.transform("emb", lambda x: F.abs(x))
    )
    with_scale = emb.select("vec_id", "emb", scale.alias("scale"))
    err = F.array_max(
        F.transform(
            "emb",
            lambda x: F.abs(
                x - F.round(x * F.col("scale")) / F.col("scale")
            ),
        )
    )
    return with_scale.select(
        "vec_id", F.round(err, 6).alias("max_abs_err")
    )


PQ_M = 8  # subspaces
PQ_S = 8  # dims per subspace (M × S = 64 = embedding dim)


@register(
    "q_sim_pq_assign",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    lng AS (SELECT label, unnest(emb) AS v,
                   generate_subscripts(emb, 1) AS dim
            FROM e),
    cl AS (SELECT label, dim, avg(v) AS c FROM lng GROUP BY 1, 2),
    cent AS (SELECT label AS c_label, list(c ORDER BY dim) AS ce
             FROM cl GROUP BY 1),
    mm AS (SELECT unnest(range(1, 9)) AS m),
    codebook AS (SELECT m, c_label, ce[(m-1)*8+1 : m*8] AS sub_ce
                 FROM cent CROSS JOIN mm),
    subs AS (SELECT vec_id, m, emb[(m-1)*8+1 : m*8] AS sub
             FROM e CROSS JOIN mm),
    scored AS (SELECT vec_id, m, c_label,
                      round(list_distance(sub, sub_ce), 6) AS d
               FROM subs JOIN codebook USING (m))
    SELECT vec_id, CAST(m AS INTEGER) AS subspace, c_label AS code,
           d AS dist_l2
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                        ORDER BY d, c_label) AS rn
          FROM scored)
    WHERE rn = 1
    """,
)
def q_sim_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: split each 64-dim vector into
    8×8-dim subspaces and assign every subvector to its nearest
    sub-centroid — the PQ code that shrinks ANN memory ~32× (8 bytes
    of codes vs 256 bytes of floats per vector) and is how
    billion-vector indexes fit a cluster's RAM at 100 TB. The
    codebook here reuses the label partition as sub-centroid source
    (k-means E-step siblings: q_sim_centroid/q_sim_kmeans_assign);
    a trained codebook drops in as the same tiny broadcast table.

    Scale shape: the codebook (M × labels rows) is BROADCAST; the
    corpus side explodes into M subvectors per row map-side, and the
    nearest-code argmin is a partial-aggregable
    min(struct(rounded_dist, code)) — one shuffle of O(rows × M)
    compact tuples, no window over the corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    lng = emb.select("label", F.posexplode("emb").alias("i0", "v"))
    cent = (
        lng.groupBy("label", (F.col("i0") + 1).alias("dim"))
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("ce")
        )
    )
    msplit = F.transform(
        F.sequence(F.lit(1), F.lit(PQ_M)),
        lambda m: F.slice(F.col("ce"), (m - 1) * PQ_S + 1, PQ_S),
    )
    codebook = cent.select(
        F.col("label").alias("c_label"),
        F.posexplode(msplit).alias("m0", "sub_ce"),
    ).select((F.col("m0") + 1).alias("m"), "c_label", "sub_ce")
    subs = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.lit(PQ_M)),
                lambda m: F.slice(F.col("emb"), (m - 1) * PQ_S + 1, PQ_S),
            )
        ).alias("m0", "sub"),
    ).select("vec_id", (F.col("m0") + 1).alias("m"), "sub")
    d = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("sub"), F.col("sub_ce"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = subs.join(F.broadcast(codebook), "m").select(
        "vec_id",
        "m",
        F.struct(F.round(d, 6).alias("d"), F.col("c_label")).alias("cand"),
    )
    best = scored.groupBy("vec_id", "m").agg(F.min("cand").alias("b"))
    return best.select(
        "vec_id",
        F.col("m").cast("int").alias("subspace"),
        F.col("b.c_label").alias("code"),
        F.col("b.d").alias("dist_l2"),
    )


NPROBE = 2
RERANK_K = 3


@register(
    "q_sim_ivf_rerank",
    oracle=f"""
    WITH cent AS (
        SELECT label, list(c ORDER BY dim) AS ce FROM (
            SELECT label, i AS dim, avg(e) AS c FROM (
                SELECT label,
                       unnest(CAST(embedding AS DOUBLE[])) AS e,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            ) GROUP BY label, i
        ) GROUP BY label
    ),
    probes AS (
        SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
        FROM embeddings WHERE vec_id % {PROBE_MOD} = 0
    ),
    cells AS (
        SELECT probe_id, label FROM (
            SELECT p.probe_id, c.label,
                   row_number() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY round(list_cosine_similarity(c.ce, p.pe), 4)
                                    DESC, c.label
                   ) AS rn
            FROM probes p, cent c
        ) WHERE rn <= {NPROBE}
    ),
    cand AS (
        SELECT p.probe_id, e.vec_id,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            p.pe), 6) AS score
        FROM probes p
        JOIN cells s ON s.probe_id = p.probe_id
        JOIN embeddings e ON e.label = s.label
        WHERE e.vec_id <> p.probe_id
    )
    SELECT probe_id, vec_id, score FROM (
        SELECT probe_id, vec_id, score,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY score DESC, vec_id) AS rn
        FROM cand
    ) WHERE rn <= {RERANK_K}
    """,
)
def q_sim_ivf_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN retrieval — the production serving shape: a
    coarse quantizer routes each probe to its NPROBE closest cells,
    then ONLY those cells' vectors are exactly reranked. Completes
    the similarity tier-ladder: q_sim_knn_* (exact brute force) →
    q_sim_ivf_label (intra-cell all-pairs) → this (probe routing +
    rerank, what an IVF index actually executes per query).

    Scale shape: centroids are a partial-aggregable (label, dim)
    aggregate — shuffle O(labels × dims), independent of corpus size.
    Probe→cell routing is a window top-NPROBE over the tiny
    probes × labels grid. The rerank candidate set arrives via an
    EQUI-join on the cell id (probe routing broadcast onto the
    embeddings scan) — candidate cost is Σ|selected cells|, never
    n × probes. Both ranking cuts order by rounded scores with id
    tiebreaks, so the result is reproducible and engine-exact
    (float64, round 4 for routing / 6 for rerank — the same parity
    recipe as the knn tiers).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )

    # Coarse codebook: per-(label, dim) mean, re-assembled in dim
    # order. O(labels × dims) rows — broadcast-sized at any corpus
    # scale (the codebook IS small by construction; that's what makes
    # it a codebook).
    cent = (
        emb.select("label", F.posexplode("e").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("ce")
        )
    )

    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        F.sqrt(dot_expr(F.col("e"), F.col("e"))).alias("pnorm"),
    )

    routed = probes.join(F.broadcast(cent))  # probes × labels grid
    w_route = W.partitionBy("probe_id").orderBy(
        F.desc(F.round(cosine_expr(F.col("ce"), F.col("pe")), 4)),
        F.asc("label"),
    )
    cells = (
        routed.withColumn("rn", F.row_number().over(w_route))
        .filter(F.col("rn") <= NPROBE)
        .select("probe_id", "label", "pe", "pnorm")
    )

    # Norms are per-ROW invariants: computed once on each side before
    # the pair join, so the per-pair work is ONE interpreted HOF fold
    # (the dot product), not the three cosine_expr would do.
    cand = (
        emb.withColumn("enorm", F.sqrt(dot_expr(F.col("e"), F.col("e"))))
        .join(F.broadcast(cells), "label")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                dot_expr(F.col("e"), F.col("pe"))
                / (F.col("enorm") * F.col("pnorm")),
                6,
            ).alias("score"),
        )
    )
    w_rank = W.partitionBy("probe_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= RERANK_K)
        .select("probe_id", "vec_id", "score")
    )


@register(
    "q_sim_outliers",
    oracle="""
    WITH cent AS (
        SELECT label, list(c ORDER BY dim) AS ce FROM (
            SELECT label, i AS dim, avg(e) AS c FROM (
                SELECT label,
                       unnest(CAST(embedding AS DOUBLE[])) AS e,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            ) GROUP BY label, i
        ) GROUP BY label
    ),
    d AS (
        SELECT e.vec_id, e.label,
               list_distance(CAST(e.embedding AS DOUBLE[]), c.ce) AS dist
        FROM embeddings e JOIN cent c ON c.label = e.label
    ),
    stats AS (
        SELECT label, avg(dist) AS mu, stddev_samp(dist) AS sigma
        FROM d GROUP BY label
    )
    SELECT d.vec_id, d.label,
           round((dist - mu) / sigma, 4) AS z
    FROM d JOIN stats s ON s.label = d.label
    WHERE round((dist - mu) / sigma, 4) >= 2.0
    """,
)
def q_sim_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier audit: vectors whose Euclidean distance to
    their OWN cell centroid is >= 2 sigma for that cell — the
    mislabeled/noise-vector report run before trusting cell-routed
    ANN (an outlier-polluted cell degrades both q_sim_ivf_label's
    recall and q_sim_ivf_rerank's routing). The z-score cut is taken
    on the 4-decimal grid in both engines, so membership at the
    threshold is engine-exact.

    Scale: centroid build is the O(labels × dims) partial aggregate;
    distances are one map-side fold against the broadcast codebook;
    per-label moments are a second O(labels) aggregate broadcast
    back. The embedding column is scanned once and never shuffled.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    cent = (
        emb.select("label", F.posexplode("e").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("ce")
        )
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("e"), F.col("ce"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    d = emb.join(F.broadcast(cent), "label").select(
        "vec_id", "label", dist.alias("dist")
    )
    stats = d.groupBy("label").agg(
        F.avg("dist").alias("mu"), F.stddev_samp("dist").alias("sigma")
    )
    z = F.round((F.col("dist") - F.col("mu")) / F.col("sigma"), 4)
    return (
        d.join(F.broadcast(stats), "label")
        .select("vec_id", "label", z.alias("z"))
        .filter(F.col("z") >= 2.0)
    )


@register("q_sim_lsh_eval")  # rows-only: the LSH side is seeded-approximate
def q_sim_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess — for the EMBEDDING tier: precision/
    recall of the random-projection LSH neighbour pairs
    (q_sim_lsh_bucketed, L2 <= 1.0 on unit vectors ≙ cosine >= 0.5)
    against the exact blocked all-pairs tier (q_dedup_embedding,
    cosine >= 0.5). The audit row a pipeline reads before switching
    its semantic-dedup stage from the exact to the bucketed path at
    100 TB — the embedding-space sibling of q_dedup_lsh_eval's
    shingle-space certificate. Both inputs are pair-level results,
    so the full-outer comparison join is O(candidate pairs).
    """
    from .dedup import q_dedup_embedding

    exact = q_dedup_embedding(spark, sf_dir).select(
        "vec_a", "vec_b", F.lit(1).alias("in_exact")
    )
    approx = QUERIES_LSH_PAIRS(spark, sf_dir).select(
        "vec_a", "vec_b", F.lit(1).alias("in_approx")
    )
    j = exact.join(approx, ["vec_a", "vec_b"], "full_outer")
    return j.agg(
        F.count(
            F.when(
                F.col("in_exact").isNotNull()
                & F.col("in_approx").isNotNull(),
                1,
            )
        ).alias("tp"),
        F.count(F.when(F.col("in_exact").isNull(), 1)).alias("fp"),
        F.count(F.when(F.col("in_approx").isNull(), 1)).alias("fn"),
    ).select(
        "tp",
        "fp",
        "fn",
        F.round(
            F.when(
                F.col("tp") + F.col("fp") > 0,
                F.col("tp") / (F.col("tp") + F.col("fp")),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("precision"),
        F.round(
            F.when(
                F.col("tp") + F.col("fn") > 0,
                F.col("tp") / (F.col("tp") + F.col("fn")),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("recall"),
    )


def QUERIES_LSH_PAIRS(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sim_lsh_bucketed's pair set, deduplicated to canonical
    (vec_a < vec_b) rows for the eval join."""
    return q_sim_lsh_bucketed(spark, sf_dir).select("vec_a", "vec_b").distinct()


from ..registry import ORACLES as _ORACLES  # noqa: E402  (module-load order)


@register(
    "q_sim_ivf_recall_eval",
    oracle=f"""
    WITH ivf AS ({_ORACLES['q_sim_ivf_rerank']}),
    exact AS ({_ORACLES['q_sim_knn_batch']}),
    j AS (
        SELECT e.probe_id, e.vec_id, i.vec_id AS hit
        FROM exact e LEFT JOIN ivf i
          ON i.probe_id = e.probe_id AND i.vec_id = e.vec_id
    )
    SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes,
           count(*) AS n_exact,
           count(hit) AS n_hit,
           round(1.0 * count(hit) / count(*), 4) AS recall_at_k
    FROM j
    """,
)
def q_sim_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF routed-rerank tier against the exact
    brute-force top-k on the SAME probe set — the number that
    licenses replacing exact kNN with IVF at scale (accuracy lost to
    routing = 1 − recall, and it is measured, not assumed). Unlike
    the LSH evals this one is FULLY oracle-certified: both tiers are
    deterministic, so the oracle recomposes both CTE chains and
    takes the same overlap — the eval itself is hash-checked, not
    just its inputs.

    Measured result on this corpus: recall@3 ≈ 0.21 at sf 0.1 —
    LOW, and that is the finding, not a bug: the `label` column is an
    arbitrary class id, not a learned quantizer, so its centroids are
    not cosine-coherent cells and routing misses most true
    neighbours. This is precisely the failure the eval exists to
    catch before a production rollout — a real deployment trains the
    coarse quantizer on the vectors (k-means, q_sim_kmeans_assign)
    and re-runs this eval until recall clears its SLO.

    Scale: both sides are k·probes-row results; the comparison join
    is O(k·probes) regardless of corpus size.
    """
    ivf = q_sim_ivf_rerank(spark, sf_dir).select(
        F.col("probe_id").alias("i_probe"), F.col("vec_id").alias("i_vec")
    )
    exact = q_sim_knn_batch(spark, sf_dir).select("probe_id", "vec_id")
    j = exact.join(
        F.broadcast(ivf),
        (F.col("probe_id") == F.col("i_probe"))
        & (F.col("vec_id") == F.col("i_vec")),
        "left",
    )
    return j.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.count("i_vec").alias("n_hit"),
        F.round(F.count("i_vec") / F.count(F.lit(1)), 4).alias(
            "recall_at_k"
        ),
    )


KM_K = 8  # coarse-quantizer cells; seeds = the KM_K smallest vec_ids


def _km_assign_sql(cent: str, out: str) -> str:
    """One Lloyd assignment step in DuckDB (round-6 L2, cluster-asc
    tiebreak — the exact parity recipe the Spark side mirrors)."""
    return f"""
    {out} AS (
        SELECT vec_id, emb, cl FROM (
            SELECT e.vec_id, e.emb, c.cl,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_distance(e.emb, c.ce), 6), c.cl
                   ) AS rn
            FROM e CROSS JOIN {cent} c
        ) WHERE rn = 1
    )"""


def _km_centroid_sql(assign: str, out: str) -> str:
    return f"""
    {out} AS (
        SELECT cl, list(m ORDER BY dim) AS ce FROM (
            SELECT cl, dim, avg(v) AS m FROM (
                SELECT cl, unnest(emb) AS v,
                       generate_subscripts(emb, 1) AS dim
                FROM {assign}
            ) GROUP BY cl, dim
        ) GROUP BY cl
    )"""


_IVF_KMEANS_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    c0 AS (SELECT vec_id AS cl, emb AS ce FROM e WHERE vec_id < {KM_K}),
    {_km_assign_sql('c0', 'a1')},
    {_km_centroid_sql('a1', 'c1')},
    {_km_assign_sql('c1', 'a2')},
    {_km_centroid_sql('a2', 'c2')},
    {_km_assign_sql('c2', 'af')},
    probes AS (SELECT vec_id AS probe_id, emb AS pe FROM e
               WHERE vec_id % {PROBE_MOD} = 0),
    cells AS (
        SELECT probe_id, cl FROM (
            SELECT p.probe_id, c.cl,
                   row_number() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY round(list_cosine_similarity(c.ce, p.pe), 4)
                                    DESC, c.cl
                   ) AS rn
            FROM probes p CROSS JOIN c2 c
        ) WHERE rn <= {NPROBE}
    ),
    cand AS (
        SELECT p.probe_id, v.vec_id,
               round(list_cosine_similarity(v.emb, p.pe), 6) AS score
        FROM probes p
        JOIN cells s ON s.probe_id = p.probe_id
        JOIN af v ON v.cl = s.cl
        WHERE v.vec_id <> p.probe_id
    )
    SELECT probe_id, vec_id, score FROM (
        SELECT probe_id, vec_id, score,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY score DESC, vec_id) AS rn
        FROM cand
    ) WHERE rn <= {RERANK_K}
"""


def _km_l2(a: F.Column, b: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _km_assign_df(emb: DataFrame, c: DataFrame) -> DataFrame:
    """Shuffle-free argmin assignment (VERDICT r05 item 2): all K
    centroids collapse to ONE broadcast array row and each vector
    takes array_min over struct(round(dist,6), cl) — the same
    lexicographic (dist, cl) tiebreak the old window top-1 used,
    with zero Exchange of the K-fanned corpus (the
    q_sim_kmeans_assign shape, shared by every Lloyd step and by
    q_sim_nprobe_curve)."""
    packed = c.agg(F.collect_list(F.struct("cl", "ce")).alias("cents"))
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda s: F.struct(
                F.round(_km_l2(F.col("emb"), s["ce"]), 6).alias("dist"),
                s["cl"].alias("cl"),
            ),
        )
    )
    return emb.crossJoin(F.broadcast(packed)).select(
        "vec_id", "emb", best["cl"].alias("cl")
    )


def _km_centroids_df(a: DataFrame) -> DataFrame:
    return (
        a.select("cl", F.posexplode("emb").alias("dim", "v"))
        .groupBy("cl", "dim")
        .agg(F.avg("v").alias("m"))
        .groupBy("cl")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("ce")
        )
    )


def _km_train(emb: DataFrame) -> DataFrame:
    """Two deterministic Lloyd iterations from the KM_K smallest
    vec_ids — the learned coarse quantizer shared by
    q_sim_ivf_kmeans and q_sim_nprobe_curve.

    The returned frame is KM_K tiny rows but carries the full
    two-iteration training lineage (2× corpus scan + 2 aggregate
    rounds); every consumer (assignment, probe routing, residual
    subtraction) would re-execute that lineage per reference, so it
    is truncated once here (lazy localCheckpoint — materialized by
    the first action, reused by every later consumer; the iterative-
    algorithm hygiene rule of min_label_propagate). Also pins ONE
    evaluation of the float centroid means: without it, different
    consumers could observe different aggregation merge orders of
    the same avg() at the last bit (round-13 optimization pass)."""
    cent = emb.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cl"), F.col("emb").alias("ce")
    )
    for _ in range(2):
        cent = _km_centroids_df(_km_assign_df(emb, cent))
    return cent.localCheckpoint(eager=False)


@register("q_sim_ivf_kmeans", oracle=_IVF_KMEANS_ORACLE)
def q_sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF retrieval with a LEARNED coarse quantizer — the production
    fix for q_sim_ivf_recall_eval's finding (label cells are not
    cosine-coherent; recall@3 ≈ 0.21): two deterministic Lloyd
    iterations (seeds = the KM_K smallest vec_ids, round-6 L2
    assignment with cluster-asc tiebreaks) learn cells from the
    vectors themselves, then the same route-top-NPROBE → exact-rerank
    pipeline runs over the learned cells. Measured recall@3 ≈ 0.51
    at sf 0.1 — 2.4× the label-cell tier and 2× the NPROBE/K random
    floor — and q_sim_ivf_kmeans_recall certifies that number under
    the oracle hash.

    Scale: each Lloyd iteration is one broadcast of K centroids +
    one partial-aggregable (cluster, dim) mean — the q_graph_pagerank
    shape (fixed small iteration count, per-iteration shuffle
    O(K × dims), never O(n²)); the assignment step is completely
    SHUFFLE-FREE — centroids collapse to one broadcast array row and
    each vector's cell is a per-row array_min argmin (no window, no
    n×K Exchange; same (dist, cl) tiebreak, so results are
    bit-identical to the window form).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cent = _km_train(emb)
    af = _km_assign_df(emb, cent)

    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb").alias("pe"),
        F.sqrt(dot_expr(F.col("emb"), F.col("emb"))).alias("pnorm"),
    )
    w_route = W.partitionBy("probe_id").orderBy(
        F.desc(F.round(cosine_expr(F.col("ce"), F.col("pe")), 4)),
        F.asc("cl"),
    )
    cells = (
        probes.join(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_route))
        .filter(F.col("rn") <= NPROBE)
        .select("probe_id", "cl", "pe", "pnorm")
    )
    cand = (
        af.withColumn("enorm", F.sqrt(dot_expr(F.col("emb"), F.col("emb"))))
        .join(F.broadcast(cells), "cl")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(
                dot_expr(F.col("emb"), F.col("pe"))
                / (F.col("enorm") * F.col("pnorm")),
                6,
            ).alias("score"),
        )
    )
    w_rank = W.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= RERANK_K)
        .select("probe_id", "vec_id", "score")
    )


@register(
    "q_sim_ivf_kmeans_recall",
    oracle=f"""
    WITH ivf AS ({_IVF_KMEANS_ORACLE}),
    exact AS ({{knn_batch}}),
    j AS (
        SELECT e.probe_id, e.vec_id, i.vec_id AS hit
        FROM exact e LEFT JOIN ivf i
          ON i.probe_id = e.probe_id AND i.vec_id = e.vec_id
    )
    SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes,
           count(*) AS n_exact,
           count(hit) AS n_hit,
           round(1.0 * count(hit) / count(*), 4) AS recall_at_k
    FROM j
    """.replace("{knn_batch}", _ORACLES["q_sim_knn_batch"]),
)
def q_sim_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LEARNED-quantizer IVF tier vs exact brute
    force — the after picture to q_sim_ivf_recall_eval's before
    (≈0.51 vs ≈0.21 at sf 0.1): the measured, oracle-hash-certified
    evidence that training the coarse quantizer on the vectors is
    what makes IVF routing viable. Same O(k·probes) comparison join.
    """
    ivf = q_sim_ivf_kmeans(spark, sf_dir).select(
        F.col("probe_id").alias("i_probe"), F.col("vec_id").alias("i_vec")
    )
    exact = q_sim_knn_batch(spark, sf_dir).select("probe_id", "vec_id")
    j = exact.join(
        F.broadcast(ivf),
        (F.col("probe_id") == F.col("i_probe"))
        & (F.col("vec_id") == F.col("i_vec")),
        "left",
    )
    return j.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.count("i_vec").alias("n_hit"),
        F.round(F.count("i_vec") / F.count(F.lit(1)), 4).alias(
            "recall_at_k"
        ),
    )


@register(
    "q_sim_gram",
    oracle="""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    p AS (
        SELECT gi.i AS i, gj.j AS j, emb[gi.i] * emb[gj.j] AS prod
        FROM e,
             (SELECT unnest(generate_series(1, 64)) AS i) gi,
             (SELECT unnest(generate_series(1, 64)) AS j) gj
        WHERE gi.i <= gj.j
    )
    SELECT i, j, round(sum(prod), 4) + 0.0 AS gram
    FROM p GROUP BY i, j
    """,
)
def q_sim_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix G = X^T X over the embedding corpus —
    the one-pass kernel under PCA / linear probes / whitening. Each
    Arrow batch contributes a d x d partial via a single BLAS
    `X.T @ X` (mapInPandas, upper triangle only), so what crosses the
    shuffle is O(batches x d(d+1)/2) tiny partials, NEVER the n x d
    data: at 100 TB this is a pure map-side-combine scan whose
    reduce input is a few thousand doubles per task. Output long-form
    (i, j, gram), 1-based to match the oracle's array subscripts;
    rounded at 4 per the cross-engine float policy (reorder error
    ~1e-10 against a 1e-4 grid).
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    dim = 64
    iu = np.triu_indices(dim)

    def partial_gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf["e"].tolist(), dtype=np.float64)
            g = x.T @ x
            yield pd.DataFrame(
                {
                    "i": iu[0] + 1,
                    "j": iu[1] + 1,
                    "part": g[iu],
                }
            )

    parts = emb.mapInPandas(
        partial_gram, schema="i long, j long, part double"
    )
    return parts.groupBy("i", "j").agg(
        F.round(F.sum("part"), 4).alias("gram")
    )


def _top_eigvec_power(gram, dim: int, iters: int = 100):
    """Deterministic power iteration on a dense d x d Gram matrix
    (driver-side — d is 64, the matrix is 32 KiB; the DISTRIBUTED
    work is building the Gram, see q_sim_gram). Fixed start vector,
    fixed iteration count, sign normalized so the largest-|.|
    component is positive (ties -> lowest index): every run yields
    the same vector regardless of partial-sum order upstream."""
    import numpy as np

    g = np.zeros((dim, dim), dtype=np.float64)
    for i, j, v in gram:
        g[i - 1, j - 1] = v
        g[j - 1, i - 1] = v
    v = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(iters):
        w = g @ v
        n = np.linalg.norm(w)
        if n == 0.0:
            break
        v = w / n
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    return v


@register("q_sim_pca_power")  # rows-only: eigen solve not SQL-expressible
def q_sim_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PC1 projection of every embedding: distributed one-pass Gram
    (q_sim_gram's mapInPandas partial-sum kernel, unrounded), a
    driver-side power iteration on the 64 x 64 result (bounded by
    construction — 2080 doubles cross to the driver, never rows),
    then a shuffle-free broadcast dot product per row. This is the
    scale shape for PCA over 100 TB: one scan builds X^T X, the eigen
    solve is O(d^3) on the driver, and the projection pass is
    map-only. Pinned against numpy.linalg.eigh by pytest (no SQL
    oracle — iterative eigen solve)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    dim = 64
    iu = np.triu_indices(dim)

    def partial_gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf["e"].tolist(), dtype=np.float64)
            g = x.T @ x
            yield pd.DataFrame(
                {"i": iu[0] + 1, "j": iu[1] + 1, "part": g[iu]}
            )

    gram = (
        emb.select("e")
        .mapInPandas(partial_gram, schema="i int, j int, part double")
        .groupBy("i", "j")
        .agg(F.sum("part").alias("g"))
        .collect()
    )
    v1 = _top_eigvec_power([(r["i"], r["j"], r["g"]) for r in gram], dim)
    vlit = F.array(*[F.lit(float(c)) for c in v1])
    proj = F.aggregate(
        F.zip_with(F.col("e"), vlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id", F.round(proj, 4).alias("pc1")
    )


_PQ_ADC_ORACLE_CORE = """
    e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
    mm AS (SELECT unnest(range(1, 9)) AS m),
    lng AS (SELECT label, unnest(emb) AS v,
                   generate_subscripts(emb, 1) AS dim
            FROM e),
    cl AS (SELECT label, dim, avg(v) AS c FROM lng GROUP BY 1, 2),
    cent AS (SELECT label AS c_label, list(c ORDER BY dim) AS ce
             FROM cl GROUP BY 1),
    codebook AS (SELECT m, c_label, ce[(m-1)*8+1 : m*8] AS sub_ce
                 FROM cent CROSS JOIN mm),
    subs AS (SELECT vec_id, m, emb[(m-1)*8+1 : m*8] AS sub
             FROM e CROSS JOIN mm),
    codes AS (
        SELECT vec_id, m, c_label AS code
        FROM (SELECT s.vec_id, s.m, cb.c_label,
                     row_number() OVER (
                         PARTITION BY s.vec_id, s.m
                         ORDER BY round(list_distance(s.sub, cb.sub_ce),
                                        6), cb.c_label) AS rn
              FROM subs s JOIN codebook cb USING (m))
        WHERE rn = 1
    ),
    probes AS (SELECT vec_id AS probe_id, emb FROM e
               WHERE vec_id % 50 = 0),
    psubs AS (SELECT probe_id, m, emb[(m-1)*8+1 : m*8] AS psub
              FROM probes CROSS JOIN mm),
    lut AS (SELECT p.probe_id, p.m, cb.c_label,
                   list_distance(p.psub, cb.sub_ce)
                       * list_distance(p.psub, cb.sub_ce) AS d2
            FROM psubs p JOIN codebook cb USING (m)),
    adc AS (SELECT l.probe_id, c.vec_id,
                   round(sqrt(sum(l.d2)), 6) AS approx_l2
            FROM codes c
            JOIN lut l ON l.m = c.m AND l.c_label = c.code
            WHERE c.vec_id <> l.probe_id
            GROUP BY 1, 2),
    topk AS (
        SELECT probe_id, vec_id, approx_l2,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY approx_l2, vec_id) AS rn
        FROM adc
    )
"""


@register(
    "q_sim_pq_adc",
    oracle=f"""
    WITH {_PQ_ADC_ORACLE_CORE}
    SELECT probe_id, vec_id, approx_l2 FROM topk WHERE rn <= 10
    """,
)
def q_sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric distance computation over PQ codes — the scoring
    half of a FAISS-style IVF-PQ index: the corpus exists only as
    8-byte codes (q_sim_pq_assign's encoding), and each probe scores
    a candidate by table lookup — approx L2 = sqrt(Σ_m
    d²(probe_sub_m, codeword[code_m])) — touching 8 precomputed
    cells instead of 64 floats.

    Scale shape: the per-probe lookup table (probes × M × K rows —
    KiB-sized) is BROADCAST; scoring is an equi-join of corpus codes
    against it on (m, code) followed by a partial-aggregable 8-row
    sum per (probe, candidate) — no window over the corpus, and the
    full vectors never ship (codes are 32× smaller; that compression
    is the point of PQ at 100 TB). Composes with IVF routing
    (q_sim_ivf_kmeans's cell filter) to cut the candidate set before
    scoring; kept flat here so the oracle certifies the ADC math
    itself. Final top-10 is a window over the already-aggregated
    candidate scores.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    lng = emb.select("label", F.posexplode("emb").alias("i0", "v"))
    cent = (
        lng.groupBy("label", (F.col("i0") + 1).alias("dim"))
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("ce")
        )
    )
    split_m = lambda col: F.posexplode(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.lit(PQ_M)),
            lambda m: F.slice(col, (m - 1) * PQ_S + 1, PQ_S),
        )
    )
    codebook = cent.select(
        F.col("label").alias("c_label"), split_m(F.col("ce")).alias("m0", "sub_ce")
    ).select((F.col("m0") + 1).alias("m"), "c_label", "sub_ce")
    subs = emb.select(
        "vec_id", split_m(F.col("emb")).alias("m0", "sub")
    ).select("vec_id", (F.col("m0") + 1).alias("m"), "sub")
    d2 = F.aggregate(
        F.zip_with(
            F.col("sub"), F.col("sub_ce"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # Encode: nearest sub-centroid per (vec, m) — partial-aggregable
    # min(struct(rounded_dist, code)), no window over the corpus.
    codes = (
        subs.join(F.broadcast(codebook), "m")
        .groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(
                    F.round(F.sqrt(d2), 6).alias("d"),
                    F.col("c_label").alias("code"),
                )
            ).alias("best")
        )
        .select("vec_id", "m", F.col("best.code").alias("code"))
    )
    psubs = (
        emb.filter(F.col("vec_id") % PROBE_MOD == 0)
        .select(
            F.col("vec_id").alias("probe_id"),
            split_m(F.col("emb")).alias("m0", "psub"),
        )
        .select("probe_id", (F.col("m0") + 1).alias("m"), "psub")
    )
    lut = psubs.join(F.broadcast(codebook), "m").select(
        "probe_id",
        "m",
        "c_label",
        F.aggregate(
            F.zip_with(
                F.col("psub"),
                F.col("sub_ce"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["m"] == lut["m"]) & (codes["code"] == lut["c_label"]),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(F.round(F.sqrt(F.sum("d2")), 6).alias("approx_l2"))
    )
    w = W.partitionBy("probe_id").orderBy("approx_l2", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "vec_id", "approx_l2")
    )


@register(
    "q_sim_pq_adc_recall",
    oracle=f"""
    WITH {_PQ_ADC_ORACLE_CORE},
    exact AS (
        SELECT probe_id, vec_id,
               row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY round(list_distance(c.emb, p.emb), 6),
                            vec_id) AS rn
        FROM e c JOIN probes p ON c.vec_id <> p.probe_id
    )
    SELECT count(DISTINCT x.probe_id) AS n_probes,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(t.vec_id) AS BIGINT) AS n_hit,
           round(CAST(count(t.vec_id) AS DOUBLE) / count(*), 4)
               AS recall_at_10
    FROM exact x
    LEFT JOIN (SELECT probe_id, vec_id FROM topk WHERE rn <= 10) t
        ON t.probe_id = x.probe_id AND t.vec_id = x.vec_id
    WHERE x.rn <= 10
    """,
)
def q_sim_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured quality certificate for the PQ-ADC tier: recall@10 of
    the code-based approximate top-10 against the exact-L2 top-10,
    per the family's measure-don't-guess rule (the LSH/IVF tiers
    carry the same certificate). Measured 0.16 at sf 0.01 with the
    UNTRAINED label-cell codebook (~8× the 0.02 random floor) — the
    same finding as q_sim_ivf_recall_eval's 0.21: label cells are
    not metric-coherent, and the production fix is the one
    q_sim_ivf_kmeans made for routing (a Lloyd-trained codebook,
    here over residuals, drops in as the identical broadcast table).
    The number quantifies exactly what the 32× compression costs —
    the trade a 100 TB index makes on purpose — and the oracle hash
    pins it cross-engine.
    """
    adc = q_sim_pq_adc(spark, sf_dir).select(
        F.col("probe_id").alias("a_probe"), F.col("vec_id").alias("a_vec")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pe")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("emb"), F.col("pe"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    w = W.partitionBy("probe_id").orderBy(
        F.round(l2, 6).asc(), F.col("vec_id").asc()
    )
    exact = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "vec_id")
    )
    j = exact.join(
        F.broadcast(adc),
        (F.col("probe_id") == F.col("a_probe"))
        & (F.col("vec_id") == F.col("a_vec")),
        "left",
    )
    return j.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.count("a_vec").alias("n_hit"),
        F.round(F.count("a_vec") / F.count(F.lit(1)), 4).alias(
            "recall_at_10"
        ),
    )


PQT_K = 16  # trained codewords per subspace; seeds = 16 smallest vec_ids
PQT_ITERS = 2

_PQ_TRAINED_ORACLE_CORE = """
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings),
    mm AS (SELECT unnest(range(1, 9)) AS m),
    subs AS (SELECT vec_id, m, emb[(m-1)*8+1 : m*8] AS sub
             FROM e CROSS JOIN mm),
    cb0 AS (SELECT m, vec_id AS code, sub AS cw
            FROM subs WHERE vec_id < 16),
    a1 AS (
        SELECT vec_id, m, code, sub
        FROM (SELECT s.vec_id, s.m, c.code, s.sub,
                     row_number() OVER (
                         PARTITION BY s.vec_id, s.m
                         ORDER BY round(list_distance(s.sub, c.cw), 6),
                                  c.code) AS rn
              FROM subs s JOIN cb0 c USING (m))
        WHERE rn = 1
    ),
    m1 AS (SELECT m, code, list(av ORDER BY dim) AS cw
           FROM (SELECT m, code, dim, avg(v) AS av
                 FROM (SELECT m, code, unnest(sub) AS v,
                              generate_subscripts(sub, 1) AS dim
                       FROM a1)
                 GROUP BY 1, 2, 3)
           GROUP BY 1, 2),
    cb1 AS (SELECT c.m, c.code, coalesce(n.cw, c.cw) AS cw
            FROM cb0 c LEFT JOIN m1 n ON n.m = c.m AND n.code = c.code),
    a2 AS (
        SELECT vec_id, m, code, sub
        FROM (SELECT s.vec_id, s.m, c.code, s.sub,
                     row_number() OVER (
                         PARTITION BY s.vec_id, s.m
                         ORDER BY round(list_distance(s.sub, c.cw), 6),
                                  c.code) AS rn
              FROM subs s JOIN cb1 c USING (m))
        WHERE rn = 1
    ),
    m2 AS (SELECT m, code, list(av ORDER BY dim) AS cw
           FROM (SELECT m, code, dim, avg(v) AS av
                 FROM (SELECT m, code, unnest(sub) AS v,
                              generate_subscripts(sub, 1) AS dim
                       FROM a2)
                 GROUP BY 1, 2, 3)
           GROUP BY 1, 2),
    cb AS (SELECT c.m, c.code, coalesce(n.cw, c.cw) AS cw
           FROM cb1 c LEFT JOIN m2 n ON n.m = c.m AND n.code = c.code),
    codes AS (
        SELECT vec_id, m, code
        FROM (SELECT s.vec_id, s.m, c.code,
                     row_number() OVER (
                         PARTITION BY s.vec_id, s.m
                         ORDER BY round(list_distance(s.sub, c.cw), 6),
                                  c.code) AS rn
              FROM subs s JOIN cb c USING (m))
        WHERE rn = 1
    ),
    probes AS (SELECT vec_id AS probe_id, emb FROM e
               WHERE vec_id % 50 = 0),
    psubs AS (SELECT probe_id, m, emb[(m-1)*8+1 : m*8] AS psub
              FROM probes CROSS JOIN mm),
    lut AS (SELECT p.probe_id, p.m, c.code,
                   list_distance(p.psub, c.cw)
                       * list_distance(p.psub, c.cw) AS d2
            FROM psubs p JOIN cb c USING (m)),
    adc AS (SELECT l.probe_id, c.vec_id,
                   round(sqrt(sum(l.d2)), 6) AS approx_l2
            FROM codes c
            JOIN lut l ON l.m = c.m AND l.code = c.code
            WHERE c.vec_id <> l.probe_id
            GROUP BY 1, 2),
    topk AS (
        SELECT probe_id, vec_id, approx_l2,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY approx_l2, vec_id) AS rn
        FROM adc
    )
"""


def _pq_trained_codebook(emb: DataFrame) -> DataFrame:
    """Lloyd-train PQT_K codewords per subspace (seeds = subvectors
    of the PQT_K smallest vec_ids, PQT_ITERS deterministic
    iterations, empty clusters keep their previous codeword). Each
    iteration is: one broadcast of the KiB-sized codebook, one
    shuffle-free per-row argmin (min over struct(rounded_dist, code)
    — no window over the corpus), one partial-aggregable
    (m, code, dim) mean. The k-means cost shape, in subspace."""
    split_m = F.posexplode(
        F.transform(
            F.sequence(F.lit(1), F.lit(PQ_M)),
            lambda m: F.slice(F.col("emb"), (m - 1) * PQ_S + 1, PQ_S),
        )
    )
    subs = emb.select("vec_id", split_m.alias("m0", "sub")).select(
        "vec_id", (F.col("m0") + 1).alias("m"), "sub"
    )
    cb = subs.filter(F.col("vec_id") < PQT_K).select(
        "m", F.col("vec_id").alias("code"), F.col("sub").alias("cw")
    )

    def assign(codebook: DataFrame) -> DataFrame:
        # Shuffle-free argmin (the q_sim_kmeans_assign /
        # q_sim_ivf_kmeans shape): the codebook collapses to ONE
        # 8-row broadcast (per-m codeword list) and each (vec, m) row
        # takes array_min over struct(round(dist, 6), code) — a
        # map-only broadcast join, no groupBy of the n×8 sub rows.
        packed = codebook.groupBy("m").agg(
            F.collect_list(F.struct("code", "cw")).alias("cws")
        )
        sub_d2 = lambda cw: F.aggregate(  # noqa: E731
            F.zip_with(
                F.col("sub"), cw, lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        best = F.array_min(
            F.transform(
                F.col("cws"),
                lambda s: F.struct(
                    F.round(F.sqrt(sub_d2(s["cw"])), 6).alias("d"),
                    s["code"].alias("code"),
                ),
            )
        )
        return subs.join(F.broadcast(packed), "m").select(
            "vec_id", "m", best["code"].alias("code"), "sub"
        )

    for _ in range(PQT_ITERS):
        means = (
            assign(cb)
            .select("m", "code", F.posexplode("sub").alias("dim", "v"))
            .groupBy("m", "code", "dim")
            .agg(F.avg("v").alias("av"))
            .groupBy("m", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "av"))),
                    lambda s: s["av"],
                ).alias("ncw")
            )
        )
        # Iterative-algorithm hygiene (the min_label_propagate rule):
        # cb appears TWICE per iteration (assign input + empty-cluster
        # fallback join), so an untruncated lineage DOUBLES each round
        # — 2^ITERS copies of the base scan by the time the trained
        # codebook is consumed. Checkpoint the KiB-sized codebook so
        # iteration k never re-executes 1..k-1 (round-13 optimization
        # pass; measured 4.6 s -> ~1 s warm on q_sim_pq_trained).
        cb = (
            cb.join(means, ["m", "code"], "left")
            .select(
                "m", "code", F.coalesce("ncw", "cw").alias("cw")
            )
            .localCheckpoint(eager=False)
        )
    return cb, subs, assign


@register(
    "q_sim_pq_trained",
    oracle=f"""
    WITH {_PQ_TRAINED_ORACLE_CORE}
    SELECT probe_id, vec_id, approx_l2 FROM topk WHERE rn <= 10
    """,
)
def q_sim_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search over a TRAINED product-quantization codebook — the
    production fix q_sim_pq_adc_recall's 0.16 finding calls for:
    PQT_K=16 Lloyd-trained codewords per subspace (vs the 8 untrained
    label means) lift measured recall@10 to 0.29 at sf 0.01
    (q_sim_pq_trained_recall certifies the number) — the same
    measure→train→re-measure arc as the IVF coarse quantizer
    (0.21 → 0.51). Scoring is identical to q_sim_pq_adc: broadcast
    LUT, (m, code) equi-join, 8-row partial-aggregable sum; training
    adds PQT_ITERS iterations of broadcast-argmin + tiny means, never
    an n×n or window-over-corpus shape.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cb, subs, assign = _pq_trained_codebook(emb)
    codes = assign(cb).select("vec_id", "m", "code")
    split_m = F.posexplode(
        F.transform(
            F.sequence(F.lit(1), F.lit(PQ_M)),
            lambda m: F.slice(F.col("emb"), (m - 1) * PQ_S + 1, PQ_S),
        )
    )
    psubs = (
        emb.filter(F.col("vec_id") % PROBE_MOD == 0)
        .select(F.col("vec_id").alias("probe_id"), split_m.alias("m0", "psub"))
        .select("probe_id", (F.col("m0") + 1).alias("m"), "psub")
    )
    lut = psubs.join(F.broadcast(cb), "m").select(
        "probe_id",
        "m",
        F.col("code").alias("c_code"),
        F.aggregate(
            F.zip_with(
                F.col("psub"), F.col("cw"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["m"] == lut["m"]) & (codes["code"] == lut["c_code"]),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", "vec_id")
        .agg(F.round(F.sqrt(F.sum("d2")), 6).alias("approx_l2"))
    )
    w = W.partitionBy("probe_id").orderBy("approx_l2", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "vec_id", "approx_l2")
    )


@register(
    "q_sim_pq_trained_recall",
    oracle=f"""
    WITH {_PQ_TRAINED_ORACLE_CORE},
    exact AS (
        SELECT probe_id, vec_id,
               row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY round(list_distance(c.emb, p.emb), 6),
                            vec_id) AS rn
        FROM e c JOIN probes p ON c.vec_id <> p.probe_id
    )
    SELECT count(DISTINCT x.probe_id) AS n_probes,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(t.vec_id) AS BIGINT) AS n_hit,
           round(CAST(count(t.vec_id) AS DOUBLE) / count(*), 4)
               AS recall_at_10
    FROM exact x
    LEFT JOIN (SELECT probe_id, vec_id FROM topk WHERE rn <= 10) t
        ON t.probe_id = x.probe_id AND t.vec_id = x.vec_id
    WHERE x.rn <= 10
    """,
)
def q_sim_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall certificate for the trained-PQ tier: 0.29 at sf 0.01 vs
    the untrained tier's 0.16 (q_sim_pq_adc_recall) — the training
    step's value, measured under the oracle hash rather than
    asserted. Same eval shape as the family's other certificates."""
    adc = q_sim_pq_trained(spark, sf_dir).select(
        F.col("probe_id").alias("a_probe"), F.col("vec_id").alias("a_vec")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pe")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("emb"), F.col("pe"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    w = W.partitionBy("probe_id").orderBy(
        F.round(l2, 6).asc(), F.col("vec_id").asc()
    )
    exact = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "vec_id")
    )
    j = exact.join(
        F.broadcast(adc),
        (F.col("probe_id") == F.col("a_probe"))
        & (F.col("vec_id") == F.col("a_vec")),
        "left",
    )
    return j.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.count("a_vec").alias("n_hit"),
        F.round(F.count("a_vec") / F.count(F.lit(1)), 4).alias(
            "recall_at_10"
        ),
    )


@register(
    "q_sim_semantic_clusters",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= 0.5
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, other) AS (
        SELECT a, a FROM edges
        UNION
        SELECT r.doc, e.b FROM reach r JOIN edges e ON e.a = r.other
    )
    SELECT doc AS vec_id, min(other) AS cluster_id
    FROM reach GROUP BY doc
    """,
)
def q_sim_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC near-dup clusters: connected components over the
    embedding-cosine pair graph (cos >= 0.5, the exact blocked join)
    — paraphrase families, where q_dedup_clusters finds
    shingle-overlap families. The cluster id is what diversity-aware
    sampling keys on (keep one per family) and what
    q_split_leakage_safe needs to stop paraphrases straddling
    train/val. Reuses the iterative min-label propagation core
    (dedup.min_label_propagate — per round one join+aggregate,
    re-checkpointed labels, convergence count only to the driver);
    the oracle is DuckDB's recursive CTE over the same edge set.
    """
    from .dedup import min_label_propagate, q_dedup_embedding

    pairs = q_dedup_embedding(spark, sf_dir).select("vec_a", "vec_b")
    labels = min_label_propagate(
        pairs.select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
    )
    return labels.select(
        F.col("doc").alias("vec_id"), F.col("label").alias("cluster_id")
    )


@register(
    "q_sample_diversity",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= 0.5
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, other) AS (
        SELECT a, a FROM edges
        UNION
        SELECT r.doc, e.b FROM reach r JOIN edges e ON e.a = r.other
    ),
    clusters AS (
        SELECT doc AS vec_id, min(other) AS cluster_id
        FROM reach GROUP BY doc
    ),
    members AS (
        SELECT e.vec_id,
               coalesce(c.cluster_id, e.vec_id) AS cluster_id,
               md5(CAST(e.vec_id AS VARCHAR)) AS priority
        FROM embeddings e LEFT JOIN clusters c ON e.vec_id = c.vec_id
    ),
    ranked AS (
        SELECT vec_id, cluster_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY priority, vec_id) AS pick_rank
        FROM members
    )
    SELECT vec_id, cluster_id, pick_rank
    FROM ranked WHERE pick_rank <= 2
    """,
)
def q_sample_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware corpus sampling: keep at most TWO
    representatives per semantic near-dup family (paraphrase cluster
    from q_sim_semantic_clusters) and every singleton — the sampling
    rule that collapses redundant paraphrases while preserving
    corpus breadth, the complement of q_dedup_keep_best's
    one-winner rule.

    The pick priority is md5(vec_id) — seed-free, uniform, and
    bit-identical across engines (the cross-engine md5 gate pattern)
    — so reruns and the DuckDB oracle select the same rows. The
    row_number window is PARTITIONED by cluster_id (cluster sizes
    are near-dup family sizes, naturally small), never global, so
    the plan holds at corpus scale.
    """
    from ..registry import QUERIES

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    clusters = QUERIES["q_sim_semantic_clusters"](spark, sf_dir)
    members = emb.join(clusters, "vec_id", "left").select(
        "vec_id",
        F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
        F.md5(F.col("vec_id").cast("string")).alias("priority"),
    )
    win = W.partitionBy("cluster_id").orderBy("priority", "vec_id")
    return (
        members.withColumn("pick_rank", F.row_number().over(win))
        .filter(F.col("pick_rank") <= 2)
        .select(
            "vec_id",
            "cluster_id",
            F.col("pick_rank").cast("long").alias("pick_rank"),
        )
    )


@register(
    "q_sample_negative_pairs",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= 0.5
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, other) AS (
        SELECT a, a FROM edges
        UNION
        SELECT r.doc, e.b FROM reach r JOIN edges e ON e.a = r.other
    ),
    clusters AS (
        SELECT doc AS vec_id, min(other) AS cluster_id
        FROM reach GROUP BY doc
    ),
    pool AS (
        SELECT e.vec_id, coalesce(c.cluster_id, e.vec_id) AS cluster_id
        FROM embeddings e LEFT JOIN clusters c ON e.vec_id = c.vec_id
        ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id
        LIMIT 8
    ),
    picks AS (
        SELECT m.vec_id, m.cluster_id,
               min(md5(CAST(m.vec_id AS VARCHAR) || ':'
                       || CAST(p.vec_id AS VARCHAR))
                   || '|' || CAST(p.vec_id AS VARCHAR)) AS pick
        FROM clusters m JOIN pool p ON p.cluster_id <> m.cluster_id
        GROUP BY m.vec_id, m.cluster_id
    )
    SELECT vec_id, cluster_id,
           CAST(split_part(pick, '|', 2) AS BIGINT) AS neg_vec_id
    FROM picks
    """,
)
def q_sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling: every member of a
    semantic near-dup family (its cluster_id IS the positive-pair
    key) gets ONE deterministic negative drawn from a small global
    candidate pool, restricted to candidates outside its own
    cluster. (anchor, same-cluster member, neg_vec_id) is then the
    (a, p, n) triplet an embedding trainer consumes.

    Scale shape: the pool is a TakeOrdered top-8 by md5 priority
    (seed-free uniform sample, never a full sort) broadcast to every
    anchor — the non-equi cluster check is a BNLJ against 8 rows,
    bounded fan-out 8 per anchor. The per-anchor pick is a window-
    free string-min argmin on md5(anchor:candidate) — fixed-width
    hex, so the '|'-suffixed candidate id never perturbs the
    ordering — bit-identical across engines.
    """
    from ..registry import QUERIES

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    clusters = QUERIES["q_sim_semantic_clusters"](spark, sf_dir)
    pool = (
        emb.join(clusters, "vec_id", "left")
        .select(
            F.col("vec_id").alias("p_vec"),
            F.coalesce("cluster_id", "vec_id").alias("p_cluster"),
            F.md5(F.col("vec_id").cast("string")).alias("prio"),
        )
        .orderBy("prio", "p_vec")
        .limit(8)
        .drop("prio")
    )
    pick_key = F.concat(
        F.md5(
            F.concat(
                F.col("vec_id").cast("string"),
                F.lit(":"),
                F.col("p_vec").cast("string"),
            )
        ),
        F.lit("|"),
        F.col("p_vec").cast("string"),
    )
    return (
        clusters.join(
            F.broadcast(pool), F.col("p_cluster") != F.col("cluster_id")
        )
        .groupBy("vec_id", "cluster_id")
        .agg(F.min(pick_key).alias("pick"))
        .select(
            "vec_id",
            "cluster_id",
            F.substring_index("pick", "|", -1).cast("bigint").alias(
                "neg_vec_id"
            ),
        )
    )


@register(
    "q_sim_cluster_cohesion",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= 0.5
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, other) AS (
        SELECT a, a FROM edges
        UNION
        SELECT r.doc, e.b FROM reach r JOIN edges e ON e.a = r.other
    ),
    clusters AS (
        SELECT doc AS vec_id, min(other) AS cluster_id
        FROM reach GROUP BY doc
    ),
    mates AS (
        SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
        FROM clusters x JOIN clusters y
          ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
    )
    SELECT CAST((SELECT count(*) FROM (
                 SELECT DISTINCT cluster_id FROM clusters))
                AS BIGINT) AS n_clusters,
           CAST(count(*) AS BIGINT) AS n_mate_pairs,
           CAST(sum(CASE WHEN p.doc_a IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_direct,
           round(CAST(sum(CASE WHEN p.doc_a IS NOT NULL
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS direct_frac
    FROM mates m
    LEFT JOIN pairs p
      ON p.doc_a = m.doc_a AND p.doc_b = m.doc_b
    """,
)
def q_sim_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohesion certificate for the semantic clusters: of all
    same-cluster pairs, what fraction is a DIRECT cos≥0.5 edge? The
    transitive closure can chain A–B–C where A–C is dissimilar;
    direct_frac ≈ 1 means tight paraphrase families, a low value
    warns that chaining has merged unrelated docs and the threshold
    (q_dedup_threshold_sweep) needs raising. Measure-don't-guess for
    q_sim_semantic_clusters, like q_dedup_lsh_eval is for MinHash.

    Scale: mate pairs are generated per cluster (fan-out bounded by
    near-dup family size², small by construction), the direct-edge
    probe is an equi left join on the pair key, and the verdict is
    one global aggregate row.
    """
    from .dedup import min_label_propagate, q_dedup_embedding

    # ONE evaluation of the exact cos>=0.5 pair join feeds BOTH the
    # cluster labels and the direct-edge probe — invoking
    # q_sim_semantic_clusters and q_dedup_embedding as separate
    # registered queries executed the blocked O(n²) BLAS join twice
    # (round-13 optimization pass; the q_sample_kfold pattern).
    pairs0 = (
        q_dedup_embedding(spark, sf_dir)
        .select("vec_a", "vec_b")
        .localCheckpoint()
    )
    clusters = min_label_propagate(
        pairs0.select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        ),
        pairs_materialized=True,
    ).select(
        F.col("doc").alias("vec_id"), F.col("label").alias("cluster_id")
    )
    x = clusters.select(
        F.col("vec_id").alias("doc_a"), F.col("cluster_id").alias("ca")
    )
    y = clusters.select(
        F.col("vec_id").alias("doc_b"), F.col("cluster_id").alias("cb")
    )
    mates = x.join(
        y,
        (F.col("ca") == F.col("cb")) & (F.col("doc_a") < F.col("doc_b")),
    ).select("doc_a", "doc_b")
    direct = pairs0.select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        F.lit(1).alias("hit"),
    )
    probed = mates.join(direct, ["doc_a", "doc_b"], "left")
    n_clusters = clusters.select("cluster_id").distinct().count()
    return probed.agg(
        F.lit(n_clusters).cast("bigint").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_mate_pairs"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias(
            "n_direct"
        ),
        F.round(
            F.sum(F.coalesce("hit", F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("direct_frac"),
    )


@register(
    "q_sim_dim_stats",
    oracle="""
    WITH flat AS (
        SELECT generate_subscripts(embedding, 1) AS dim,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings
    )
    SELECT dim,
           round(avg(v), 6) AS mean_v,
           round(var_samp(v), 6) AS var_v,
           CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
           count(*) AS n
    FROM flat GROUP BY dim
    """,
)
def q_sim_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding QC profile: mean, variance, and
    exact-zero count for every embedding coordinate — the
    dead/collapsed-dimension detector run before any ANN index
    build (a near-zero-variance dimension carries no signal but
    still costs distance FLOPs, and a dimension whose mean drifts
    between corpus versions signals an encoder change that
    invalidates stored centroids/codebooks — q_sim_ivf_kmeans,
    q_sim_pq_trained).

    Scale: posexplode fans each vector into (dim, value) rows —
    dim× growth, but the rows are 12 bytes and reduce immediately
    into a |dims|-group mergeable aggregate (avg/var_samp are
    second-moment merges), so the shuffle carries |dims| partial
    states per task, not the fan-out.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    flat = emb.select(
        F.posexplode("e").alias("pos", "v")
    ).select((F.col("pos") + 1).cast("long").alias("dim"), "v")
    return flat.groupBy("dim").agg(
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.var_samp("v"), 6).alias("var_v"),
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_sim_random_projection",
    oracle="""
    WITH flat AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings
    ),
    norms AS (SELECT vec_id, sum(v * v) AS n2 FROM flat GROUP BY vec_id),
    grid AS (SELECT unnest(range(16)) AS j),
    proj AS (
        SELECT f.vec_id, g.j,
               sum(f.v * CASE WHEN substr(md5(f.i || ':' || g.j), 1, 1)
                              IN ('0','1','2','3','4','5','6','7')
                         THEN 1 ELSE -1 END) AS p
        FROM flat f CROSS JOIN grid g
        GROUP BY f.vec_id, g.j
    ),
    pn AS (SELECT vec_id, sum(p * p) / 16 AS pn2 FROM proj
           GROUP BY vec_id)
    SELECT count(*) AS n_vecs,
           round(avg(pn.pn2 / norms.n2), 6) AS mean_ratio,
           round(min(pn.pn2 / norms.n2), 6) AS min_ratio,
           round(max(pn.pn2 / norms.n2), 6) AS max_ratio
    FROM pn JOIN norms ON norms.vec_id = pn.vec_id
    WHERE norms.n2 > 0
    """,
)
def q_sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sanity certificate: project every
    embedding to 16 dims with a seed-free ±1 matrix (sign = first
    md5 hex digit of 'i:j' — reproducible in any engine, no RNG
    state to ship) and report the norm-preservation ratio
    ‖Px‖²/‖x‖² across the corpus. Mean ≈ 1 with bounded spread is
    the license to run the cheap 16-dim distance tier before the
    exact rerank (q_sim_ivf_rerank's pattern at a quarter of the
    FLOPs); a wide spread says 16 dims is too aggressive for this
    corpus.

    Scale: the fan-out is rows × dims × 16 but each term reduces
    immediately into (vec, j) partial sums — map-side combinable,
    thin rows, no vector ever shuffles whole. The sign matrix is
    VIRTUAL (computed from md5 inline), so there is no codebook to
    broadcast at all.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    flat = emb.select(
        "vec_id", F.posexplode("e").alias("pos", "v")
    ).select("vec_id", (F.col("pos") + 1).alias("i"), "v")
    norms = flat.groupBy("vec_id").agg(F.sum(F.col("v") * F.col("v")).alias("n2"))
    grid = spark.createDataFrame([(j,) for j in range(16)], "j long")
    sign = F.when(
        F.substring(
            F.md5(
                F.concat(
                    F.col("i").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            ),
            1,
            1,
        ).isin(*"01234567"),
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    proj = (
        flat.crossJoin(F.broadcast(grid))
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("v") * sign).alias("p"))
    )
    pn = proj.groupBy("vec_id").agg(
        (F.sum(F.col("p") * F.col("p")) / 16).alias("pn2")
    )
    ratio = F.col("pn2") / F.col("n2")
    return (
        pn.join(norms, "vec_id")
        .filter(F.col("n2") > 0)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(ratio), 6).alias("mean_ratio"),
            F.round(F.min(ratio), 6).alias("min_ratio"),
            F.round(F.max(ratio), 6).alias("max_ratio"),
        )
    )


_SPARSE_DF_CAP = 100  # posting lists longer than this are stop terms


@register(
    "q_sim_sparse_cosine",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (SELECT doc_id, w[i.i] || ' ' || w[i.i + 1] AS term
           FROM t, unnest(generate_series(1, greatest(len(w) - 1, 0)))
                   AS i(i)),
    post AS (SELECT doc_id, term, count(*) AS cnt FROM bg GROUP BY 1, 2),
    kept AS (SELECT term FROM post GROUP BY term
             HAVING count(*) <= {_SPARSE_DF_CAP}),
    p AS (SELECT post.* FROM post JOIN kept USING (term)),
    ss AS (SELECT doc_id, sum(cnt * cnt) AS ss FROM p GROUP BY 1),
    dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    sum(a.cnt * b.cnt) AS dot
             FROM p a JOIN p b USING (term) WHERE a.doc_id < b.doc_id
             GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(sa.ss AS DOUBLE))
                    * sqrt(CAST(sb.ss AS DOUBLE))), 6) AS cos
    FROM dots JOIN ss sa ON sa.doc_id = dots.doc_a
              JOIN ss sb ON sb.doc_id = dots.doc_b
    ORDER BY cos DESC, doc_a, doc_b LIMIT 20
    """,
)
def q_sim_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector cosine similarity via an INVERTED-INDEX posting
    join — the all-pairs similarity path for documents that have no
    dense embedding (tf vectors over word bigrams). This is the plan
    shape dense kNN can't give you at corpus scale: candidate pairs
    come only from co-occurring terms, so the join cost is
    sum(df(t)^2) over kept terms — bounded by the stop-term cap
    (df > {0}-doc posting lists dropped, the same
    inverted-index governor as q_dedup_ngram_jaccard) — never the
    n^2 of brute force. Everything downstream of the explode is
    integer arithmetic (tf counts), so the dot products are EXACT
    across engines; floats appear only in the final
    dot/sqrt(ss_a)/sqrt(ss_b) scoring, computed with the identical
    operation order in both engines and rounded to 6.

    Scale: bigrams built with arrays_zip over two shifted slices
    (codegen, not HOF); postings hash-partition on term so each
    term's pair fan-out is generated inside one partition; the
    stop-term table is tiny and broadcast; the top-20 cut is
    TakeOrderedAndProject. Cosine over the PRUNED vocabulary is the
    documented semantic (stop terms carry no discriminative mass).
    """.format(_SPARSE_DF_CAP)
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    pairs = F.arrays_zip(
        F.slice(arr, 1, F.size(arr) - 1), F.slice(arr, 2, F.size(arr) - 1)
    )
    post = (
        docs.select("doc_id", F.explode(pairs).alias("pr"))
        .select(
            "doc_id", F.concat_ws(" ", "pr.0", "pr.1").alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    kept = (
        post.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _SPARSE_DF_CAP)
        .select("term")
    )
    p = post.join(F.broadcast(kept), "term")
    ss = p.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss")
    )
    a = p.select(
        F.col("term").alias("t"),
        F.col("doc_id").alias("doc_a"),
        F.col("cnt").alias("cnt_a"),
    )
    b = p.select(
        F.col("term").alias("t"),
        F.col("doc_id").alias("doc_b"),
        F.col("cnt").alias("cnt_b"),
    )
    dots = (
        a.join(b, "t")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("dot"))
    )
    sa = ss.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ssa"))
    sb = ss.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ssb"))
    cos = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("ssa").cast("double"))
            * F.sqrt(F.col("ssb").cast("double"))
        ),
        6,
    ).alias("cos")
    return (
        dots.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", cos)
        .orderBy(F.desc("cos"), "doc_a", "doc_b")
        .limit(20)
    )


@register(
    "q_sim_knn_filtered",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        q.qe), 6) AS score
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id, q
    WHERE e.vec_id <> 0 AND d.lang = 'en' AND d.n_chars >= 150
    ORDER BY score DESC, e.vec_id
    LIMIT {KNN_K}
    """,
)
def q_sim_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — top-k cosine restricted to vectors
    whose document metadata passes a predicate (lang = 'en', length
    >= 150), the retrieval shape every RAG/curation stack needs. The
    correctness point is PRE-filtering: the predicate intersects the
    candidate set BEFORE the top-k cut, so the result is the true
    top-k of the filtered corpus. Post-filtering a top-k of the
    whole corpus (the tempting cheap variant) silently returns
    FEWER than k or misses qualifying vectors entirely — a recall
    bug, not a tuning choice.

    Scale: the metadata predicate lives on the documents side where
    parquet pushes it down (PushedFilters), the equi-join on
    vec_id = doc_id prunes the embedding scan to survivors, and the
    probe ships as a 1-row broadcast; the k-cut is
    TakeOrderedAndProject. On an IVF-routed corpus the same
    pre-filter composes with cell selection (filter the posting
    lists, then score) — this operator certifies the semantics on
    the exact path.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    meta = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"), "lang", "n_chars"
    )
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    allowed = meta.filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 150)
    ).select(F.col("doc_id").alias("vec_id"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .join(allowed, "vec_id")
        .join(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("e"), F.col("qe")), 6).alias(
                "score"
            ),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(KNN_K)


_NPROBE_CURVE = (1, 2, 4, 8)

_NPROBE_CURVE_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    c0 AS (SELECT vec_id AS cl, emb AS ce FROM e WHERE vec_id < {KM_K}),
    {_km_assign_sql('c0', 'a1')},
    {_km_centroid_sql('a1', 'c1')},
    {_km_assign_sql('c1', 'a2')},
    {_km_centroid_sql('a2', 'c2')},
    {_km_assign_sql('c2', 'af')},
    probes AS (SELECT vec_id AS probe_id, emb AS pe FROM e
               WHERE vec_id % {PROBE_MOD} = 0),
    routes AS (
        SELECT p.probe_id, c.cl,
               row_number() OVER (
                   PARTITION BY p.probe_id
                   ORDER BY round(list_cosine_similarity(c.ce, p.pe), 4)
                                DESC, c.cl
               ) AS rn
        FROM probes p CROSS JOIN c2 c
    ),
    nps AS (SELECT unnest([{", ".join(str(p) for p in _NPROBE_CURVE)}])
                AS np),
    cand AS (
        SELECT n.np, p.probe_id, v.vec_id,
               round(list_cosine_similarity(v.emb, p.pe), 6) AS score
        FROM probes p
        JOIN routes r ON r.probe_id = p.probe_id
        CROSS JOIN nps n
        JOIN af v ON v.cl = r.cl
        WHERE r.rn <= n.np AND v.vec_id <> p.probe_id
    ),
    topk AS (
        SELECT np, probe_id, vec_id FROM (
            SELECT np, probe_id, vec_id,
                   row_number() OVER (PARTITION BY np, probe_id
                                      ORDER BY score DESC, vec_id) AS rn
            FROM cand
        ) WHERE rn <= {RERANK_K}
    ),
    exact AS ({{knn_batch}}),
    ex AS (SELECT n.np, e.probe_id, e.vec_id
           FROM exact e CROSS JOIN nps n)
    SELECT CAST(ex.np AS BIGINT) AS nprobe,
           count(*) AS n_exact,
           count(t.vec_id) AS n_hit,
           round(1.0 * count(t.vec_id) / count(*), 4) AS recall_at_k
    FROM ex LEFT JOIN topk t
      ON t.np = ex.np AND t.probe_id = ex.probe_id
     AND t.vec_id = ex.vec_id
    GROUP BY ex.np
""".replace("{knn_batch}", _ORACLES["q_sim_knn_batch"])


@register("q_sim_nprobe_curve", oracle=_NPROBE_CURVE_ORACLE)
def q_sim_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF TUNING CURVE: recall@k of the learned-quantizer
    retrieval at nprobe = 1, 2, 4, 8 — measured, oracle-hashed, in
    one pass. This is the artifact an operator actually reads when
    setting the recall/cost knob: candidate cost grows linearly in
    nprobe while recall saturates, and the nprobe = K = {0} endpoint
    probes every cell, so its recall is exactly 1.0 by construction
    — a self-certifying sanity anchor for the whole measurement
    (q_sim_ivf_kmeans_recall gives the single operating point; this
    gives the curve around it).

    Scale: training + cell assignment run ONCE (shared with
    q_sim_ivf_kmeans via _km_train); the per-probe route ranking is
    computed once WITHOUT an nprobe cut and the 4 curve points are a
    broadcast fan-out of that tiny routing table (probes × K rows) —
    the corpus is scanned once, candidates form per (cell) via the
    same equi-join, and each point's top-k is a window over its own
    candidate set. No step re-trains or re-scans per point.
    """.format(KM_K)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cent = _km_train(emb)
    af = _km_assign_df(emb, cent)
    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb").alias("pe"),
        F.sqrt(dot_expr(F.col("emb"), F.col("emb"))).alias("pnorm"),
    )
    w_route = W.partitionBy("probe_id").orderBy(
        F.desc(F.round(cosine_expr(F.col("ce"), F.col("pe")), 4)),
        F.asc("cl"),
    )
    routes = (
        probes.join(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_route))
        .select("probe_id", "cl", "rn", "pe", "pnorm")
    )
    nps = F.explode(
        F.array(*[F.lit(p) for p in _NPROBE_CURVE])
    ).alias("np")
    rcells = routes.select("*", nps).filter(
        F.col("rn") <= F.col("np")
    )
    cand = (
        af.withColumn(
            "enorm", F.sqrt(dot_expr(F.col("emb"), F.col("emb")))
        )
        .join(F.broadcast(rcells), "cl")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "np",
            "probe_id",
            "vec_id",
            F.round(
                dot_expr(F.col("emb"), F.col("pe"))
                / (F.col("enorm") * F.col("pnorm")),
                6,
            ).alias("score"),
        )
    )
    w_rank = W.partitionBy("np", "probe_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    topk = (
        cand.withColumn("krn", F.row_number().over(w_rank))
        .filter(F.col("krn") <= RERANK_K)
        .select(
            F.col("np").alias("t_np"),
            F.col("probe_id").alias("t_probe"),
            F.col("vec_id").alias("t_vec"),
        )
    )
    exact = q_sim_knn_batch(spark, sf_dir).select("probe_id", "vec_id")
    ex = exact.select(
        "probe_id", "vec_id", nps
    )
    # Both recall-join sides are workload-bounded (probes × np × k
    # rows, never corpus-sized) — broadcast the retrieved side so the
    # outer join is map-side instead of a two-Exchange sort-merge
    # (round-14; guide §3.1).
    j = ex.join(
        F.broadcast(topk),
        (F.col("np") == F.col("t_np"))
        & (F.col("probe_id") == F.col("t_probe"))
        & (F.col("vec_id") == F.col("t_vec")),
        "left",
    )
    return (
        j.groupBy(F.col("np").cast("bigint").alias("nprobe"))
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("t_vec").alias("n_hit"),
            F.round(
                F.count("t_vec") / F.count(F.lit(1)), 4
            ).alias("recall_at_k"),
        )
    )


@register(
    "q_sim_mips_prune",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id = 0),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE vec_id <> 0),
    scored AS (
        SELECT vec_id,
               list_inner_product(e, qe) AS ip,
               sqrt(list_inner_product(e, e)) AS vnorm
        FROM v, q
    ),
    qn AS (SELECT sqrt(list_inner_product(qe, qe)) AS qnorm FROM q),
    theta AS (
        SELECT min(ip) AS kth FROM (
            SELECT ip FROM scored ORDER BY ip DESC, vec_id
            LIMIT {KNN_K}
        )
    )
    SELECT count(*) AS n_vectors,
           CAST(sum(CASE WHEN round(vnorm * qnorm, 6) >= round(kth, 6)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
           round(1.0 - sum(CASE WHEN round(vnorm * qnorm, 6)
                                     >= round(kth, 6)
                                THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS prune_ratio,
           round(min(kth), 6) AS kth_best_ip,
           CAST(sum(CASE WHEN round(ip, 6) > round(vnorm * qnorm, 6)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_bound_violations
    FROM scored, theta, qn
    """,
)
def q_sim_mips_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search with NORM-BOUND pruning and a
    zero-miss certificate — the index-free core of every MIPS system
    (ip(q, v) <= ||q||*||v|| by Cauchy-Schwarz, so once a running
    top-k threshold theta is known, any vector with
    ||v|| < theta/||q|| provably cannot enter the top-k and is
    skipped without computing its dot product; norm-sorted storage
    makes that a prefix scan). The certificate is twofold:
    `n_bound_violations` counts rows whose actual inner product
    exceeds its own Cauchy-Schwarz bound (provably 0, pytest-pinned
    — the bound the pruning trusts is MEASURED over the whole
    corpus), and every exact top-k member satisfies
    ip >= kth => ||v||*||q|| >= kth, so the `n_scanned` survivor
    set contains the full exact top-k by construction: zero recall
    loss, unlike the LSH/IVF tiers whose recall is measured, not
    proven. `prune_ratio` is the fraction of dot products a
    norm-indexed scan never evaluates. Bound comparisons use the
    same round-before-compare discipline as the ranking ops so the
    survivor count is cross-engine stable.

    Scale: norms are one map-side pass; theta comes from a TakeOrdered
    top-k (no global sort); the certificate aggregate is one
    partial-aggregable pass. prune_ratio is exactly the scan-cost
    reduction of storing embeddings sorted by norm (Teflioudi &
    Gemulla's LEMP setup) — and it is DATA-DEPENDENT: this corpus's
    isotropic random embeddings have near-equal norms and
    near-orthogonal directions (bound >> kth ip), so the measured
    ratio is ~0 and the op's verdict is "norm indexing won't help
    here; use the IVF/LSH tiers" — for real embedding corpora with
    skewed norm distributions (frequency-weighted word vectors,
    unnormalized two-tower outputs) the same one-multiply-per-row
    check is the go/no-go measurement run BEFORE building the index.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    dot = F.aggregate(
        F.zip_with("e", "qe", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qdot = F.aggregate(
        F.zip_with("qe", "qe", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe))
        .select(
            "vec_id",
            dot.alias("ip"),
            F.sqrt(
                F.aggregate(
                    F.zip_with("e", "e", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("vnorm"),
            F.sqrt(qdot).alias("qnorm"),
        )
    )
    kth = (
        scored.orderBy(F.desc("ip"), "vec_id")
        .limit(KNN_K)
        .agg(F.min("ip").alias("kth"))
    )
    bound = F.round(F.col("vnorm") * F.col("qnorm"), 6)
    survives = bound >= F.round(F.col("kth"), 6)
    return scored.crossJoin(F.broadcast(kth)).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.when(survives, 1).otherwise(0)).alias("n_scanned"),
        F.round(
            1.0
            - F.sum(F.when(survives, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("prune_ratio"),
        F.round(F.min("kth"), 6).alias("kth_best_ip"),
        F.sum(
            F.when(F.round(F.col("ip"), 6) > bound, 1).otherwise(0)
        ).alias("n_bound_violations"),
    )


# Fixed random-hyperplane LSH model: 4 sign-planes over 64 dims,
# coefficients +-1 derived from md5 of "plane:dim" via hashlib at
# import (a frozen model artifact, identical in the Spark code and
# the generated oracle SQL — the engine-portable analogue of seeding).
import hashlib as _hashlib

_RHP_PLANES = 4
_RHP_DIM = 64
_RHP_COEFS = [
    [
        1.0
        if int(
            _hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0], 16
        )
        % 2
        == 0
        else -1.0
        for i in range(_RHP_DIM)
    ]
    for p in range(_RHP_PLANES)
]


def _rhp_bucket_sql(col: str) -> str:
    terms = []
    for p, coefs in enumerate(_RHP_COEFS):
        arr = "[" + ", ".join(f"CAST({c} AS DOUBLE)" for c in coefs) + "]"
        terms.append(
            f"(CASE WHEN list_inner_product({col}, {arr}) >= 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


@register(
    "q_sim_lsh_md5",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    ),
    b AS (SELECT vec_id, {_rhp_bucket_sql('e')} AS bucket FROM v),
    q AS (SELECT bucket AS qb FROM b WHERE vec_id = 0),
    topk AS (
        SELECT v.vec_id
        FROM v, (SELECT e AS qe FROM v WHERE vec_id = 0) p
        WHERE v.vec_id <> 0
        ORDER BY round(list_cosine_similarity(v.e, p.qe), 6) DESC, v.vec_id
        LIMIT {KNN_K}
    )
    SELECT (SELECT count(*) FROM b) AS n_vectors,
           q.qb AS probe_bucket,
           (SELECT count(*) FROM b, q
            WHERE b.bucket = q.qb AND b.vec_id <> 0) AS n_candidates,
           (SELECT round(CAST(count(*) AS DOUBLE) / {KNN_K}, 4)
            FROM topk JOIN b ON b.vec_id = topk.vec_id, q
            WHERE b.bucket = q.qb) AS recall_at_k
    FROM q
    """,
)
def q_sim_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-CERTIFIED random-hyperplane (SimHash-for-vectors) LSH —
    the certification upgrade of the rows-only `q_sim_lsh_bucketed`/
    `q_sim_lsh_eval` pair, completing the md5 series (minhash_md5,
    hll_md5, cms_md5): the 4 sign-planes are +-1 vectors derived
    from md5 at import and frozen into BOTH the Spark plan and the
    generated oracle SQL as literal arrays, so every projection
    sign, every bucket id, and the measured recall are bit-identical
    cross-engine (dot products evaluate in the same left-to-right
    order that certifies q_sim_knn_cosine). The output is the LSH
    quality triple a tuner reads: candidate-set size (the cost) and
    recall of the true cosine top-{KNN_K} inside the probe's bucket
    (the quality) — on this isotropic corpus recall tracks the
    1/2^planes bucket fraction plus the angular-locality lift, and
    the same certified query re-tunes the planes/probes trade-off on
    any real corpus.

    Scale: bucketing is one map-side pass (4 fixed dot products per
    vector, JVM codegen, no shuffle); candidate counting groups by
    bucket; only the CERTIFICATE's exact top-k does a full scan, and
    it is dropped in production — the production path joins query
    buckets to a bucket-partitioned index, touching 1/2^planes of
    the corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )

    def dot_lit(coefs: list) -> F.Column:
        arr = F.array(*[F.lit(c) for c in coefs])
        return F.aggregate(
            F.zip_with("e", arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = None
    for p, coefs in enumerate(_RHP_COEFS):
        term = F.when(dot_lit(coefs) >= 0, F.lit(1 << p)).otherwise(0)
        bucket = term if bucket is None else bucket + term
    b = emb.select("vec_id", bucket.alias("bucket"))
    q = b.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qb")
    )
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("e").alias("qe")
    )
    cos = F.aggregate(
        F.zip_with("e", "qe", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (
        F.sqrt(
            F.aggregate(
                F.zip_with("e", "e", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        * F.sqrt(
            F.aggregate(
                F.zip_with("qe", "qe", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    )
    # Round-before-ranking (repo rule): the oracle's
    # list_cosine_similarity and the manual left-to-right fold are
    # not bit-identical, so a near-tie at rank K could flip the
    # certified top-k set; 6-decimal rounding in BOTH engines before
    # ORDER BY removes the hazard (vec_id breaks residual ties).
    topk = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe))
        .select("vec_id", F.round(cos, 6).alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(KNN_K)
        .select("vec_id")
    )
    n_vectors = b.agg(F.count(F.lit(1)).alias("n_vectors"))
    n_cand = (
        b.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qb")) & (F.col("vec_id") != 0))
        .agg(F.count(F.lit(1)).alias("n_candidates"))
    )
    hits = (
        topk.join(b, "vec_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("bucket") == F.col("qb"))
        .agg(
            F.round(
                F.count(F.lit(1)).cast("double") / KNN_K, 4
            ).alias("recall_at_k")
        )
    )
    return (
        q.crossJoin(F.broadcast(n_vectors))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(hits))
        .select(
            "n_vectors",
            F.col("qb").alias("probe_bucket"),
            "n_candidates",
            "recall_at_k",
        )
    )


IVFPQ_K = 10  # final ADC top-k per probe (matches q_sim_pq_adc)
IVFPQ_REFINE_R = 40  # ADC shortlist size the exact refine re-scores

# CTE chain shared by q_sim_ivfpq (ADC top-k final) and
# q_sim_ivfpq_refine (ADC top-R shortlist -> exact re-rank final).
_IVFPQ_CTES = f"""
    e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    c0 AS (SELECT vec_id AS cl, emb AS ce FROM e WHERE vec_id < {KM_K}),
    {_km_assign_sql('c0', 'a1')},
    {_km_centroid_sql('a1', 'c1')},
    {_km_assign_sql('c1', 'a2')},
    {_km_centroid_sql('a2', 'c2')},
    {_km_assign_sql('c2', 'af')},
    mm AS (SELECT unnest(range(1, {PQ_M + 1})) AS m),
    lng AS (SELECT label, unnest(emb) AS v,
                   generate_subscripts(emb, 1) AS dim FROM e),
    clm AS (SELECT label, dim, avg(v) AS c FROM lng GROUP BY 1, 2),
    pcent AS (SELECT label AS c_label, list(c ORDER BY dim) AS pce
              FROM clm GROUP BY 1),
    codebook AS (SELECT m, c_label,
                        pce[(m-1)*{PQ_S}+1 : m*{PQ_S}] AS sub_ce
                 FROM pcent CROSS JOIN mm),
    subs AS (SELECT vec_id, m, emb[(m-1)*{PQ_S}+1 : m*{PQ_S}] AS sub
             FROM e CROSS JOIN mm),
    codes AS (
        SELECT vec_id, m, c_label AS code
        FROM (SELECT s.vec_id, s.m, cb.c_label,
                     row_number() OVER (
                         PARTITION BY s.vec_id, s.m
                         ORDER BY round(list_distance(s.sub, cb.sub_ce),
                                        6), cb.c_label) AS rn
              FROM subs s JOIN codebook cb USING (m))
        WHERE rn = 1
    ),
    probes AS (SELECT vec_id AS probe_id, emb AS pe FROM e
               WHERE vec_id % {PROBE_MOD} = 0),
    cells AS (
        SELECT probe_id, cl FROM (
            SELECT p.probe_id, c.cl,
                   row_number() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY round(list_cosine_similarity(c.ce, p.pe), 4)
                                    DESC, c.cl
                   ) AS rn
            FROM probes p CROSS JOIN c2 c
        ) WHERE rn <= {NPROBE}
    ),
    cand AS (
        SELECT s.probe_id, v.vec_id
        FROM cells s JOIN af v ON v.cl = s.cl
        WHERE v.vec_id <> s.probe_id
    ),
    psubs AS (SELECT probe_id, m, pe[(m-1)*{PQ_S}+1 : m*{PQ_S}] AS psub
              FROM probes CROSS JOIN mm),
    lut AS (SELECT p.probe_id, p.m, cb.c_label,
                   list_distance(p.psub, cb.sub_ce)
                       * list_distance(p.psub, cb.sub_ce) AS d2
            FROM psubs p JOIN codebook cb USING (m)),
    adc AS (
        SELECT cd.probe_id, cd.vec_id, round(sqrt(sum(l.d2)), 6) AS approx_l2
        FROM (SELECT c.vec_id, c.m, c.code, ca.probe_id
              FROM codes c JOIN cand ca ON ca.vec_id = c.vec_id) cd
        JOIN lut l ON l.probe_id = cd.probe_id AND l.m = cd.m
                  AND l.c_label = cd.code
        GROUP BY 1, 2
    )"""

_IVFPQ_ORACLE = f"""
    WITH {_IVFPQ_CTES}
    SELECT probe_id, vec_id, approx_l2 FROM (
        SELECT probe_id, vec_id, approx_l2,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY approx_l2, vec_id) AS rn
        FROM adc
    ) WHERE rn <= {IVFPQ_K}
"""


@register("q_sim_ivfpq", oracle=_IVFPQ_ORACLE)
def q_sim_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the full FAISS-style ANN index architecture
    assembled from the two certified halves: the LEARNED coarse
    quantizer (q_sim_ivf_kmeans's two deterministic Lloyd
    iterations) routes each probe to its top-{NPROBE} of {KM_K}
    cells, and within those cells candidates are scored by PQ
    asymmetric distance (q_sim_pq_adc's 8×8 codebook lookup) — the
    corpus is touched as CODES only (8 bytes/vector, 32× smaller
    than the floats), and only ~NPROBE/K of it per probe. This is
    the operator a 100 TB vector store actually runs: routing
    bounds the scan, PQ bounds the bytes, and the exact vectors are
    never shipped at query time.

    Scale: both training loops are fixed-iteration broadcast+
    partial-agg (never O(n²)); encoding is one map pass against the
    broadcast codebook; query time is cells (broadcast window over
    K·probes rows) → candidate equi-join on cl → LUT equi-join on
    (probe, m, code) → 8-row partial-aggregable sum per candidate →
    per-probe top-{IVFPQ_K} window over the already-reduced scores.
    Companion q_sim_ivfpq_recall measures what the compression
    costs; every stage of the composition is hash-certified by the
    composed oracle.
    """
    adc, _, _ = _ivfpq_adc(spark, sf_dir)
    w = W.partitionBy("probe_id").orderBy("approx_l2", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVFPQ_K)
        .select("probe_id", "vec_id", "approx_l2")
    )


def _ivfpq_adc(spark: SparkSession, sf_dir: str):
    """Shared IVF-route + PQ-ADC pipeline: returns (adc scores over
    routed candidates, probes with float vectors, embeddings) so the
    ADC-final (q_sim_ivfpq) and exact-refine (q_sim_ivfpq_refine)
    tiers window the same certified frame."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    ev = emb.select("vec_id", "emb")
    cent = _km_train(ev)
    af = _km_assign_df(ev, cent).select("vec_id", "cl")

    # PQ codebook from label means (the q_sim_pq_adc recipe).
    lng = emb.select("label", F.posexplode("emb").alias("i0", "v"))
    pcent = (
        lng.groupBy("label", (F.col("i0") + 1).alias("dim"))
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("pce")
        )
    )
    split_m = lambda col: F.posexplode(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.lit(PQ_M)),
            lambda m: F.slice(col, (m - 1) * PQ_S + 1, PQ_S),
        )
    )
    # labels×PQ_M tiny rows consumed TWICE (corpus encoding `codes`
    # and probe LUT build) — truncate the label-mean lineage once
    # instead of re-executing the full posexplode aggregate per
    # consumer (round-13 optimization pass).
    codebook = pcent.select(
        F.col("label").alias("c_label"),
        split_m(F.col("pce")).alias("m0", "sub_ce"),
    ).select(
        (F.col("m0") + 1).alias("m"), "c_label", "sub_ce"
    ).localCheckpoint(eager=False)
    subs = emb.select(
        "vec_id", split_m(F.col("emb")).alias("m0", "sub")
    ).select("vec_id", (F.col("m0") + 1).alias("m"), "sub")
    # Corpus encoding by shuffle-free per-row argmin (the certified
    # _km_assign_df / _pq_trained_codebook shape): the 8-label
    # codebook collapses to ONE row per m and each (vec, m) row takes
    # array_min over struct(round(dist, 6), label) — same
    # lexicographic (d, code) tiebreak as the old explode +
    # groupBy(vec_id, m) min(struct), with zero Exchange and no
    # SortAggregate of the n×M×labels fan-out (round-13 optimization
    # pass; interleaved A/B confirmed identical output).
    packed_cb = codebook.groupBy("m").agg(
        F.collect_list(F.struct("c_label", "sub_ce")).alias("cbs")
    )
    best_code = F.array_min(
        F.transform(
            F.col("cbs"),
            lambda s: F.struct(
                F.round(
                    F.sqrt(
                        F.aggregate(
                            F.zip_with(
                                F.col("sub"),
                                s["sub_ce"],
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    ),
                    6,
                ).alias("d"),
                s["c_label"].alias("code"),
            ),
        )
    )
    codes = subs.join(F.broadcast(packed_cb), "m").select(
        "vec_id", "m", best_code["code"].alias("code")
    )

    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pe")
    )
    w_route = W.partitionBy("probe_id").orderBy(
        F.desc(F.round(cosine_expr(F.col("ce"), F.col("pe")), 4)),
        F.asc("cl"),
    )
    cells = (
        probes.join(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_route))
        .filter(F.col("rn") <= NPROBE)
        .select("probe_id", "cl")
    )
    cand = (
        cells.join(af, "cl")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
    )
    psubs = probes.select(
        "probe_id", split_m(F.col("pe")).alias("m0", "psub")
    ).select("probe_id", (F.col("m0") + 1).alias("m"), "psub")
    lut = psubs.join(F.broadcast(codebook), "m").select(
        "probe_id",
        "m",
        "c_label",
        F.aggregate(
            F.zip_with(
                F.col("psub"),
                F.col("sub_ce"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    adc = (
        codes.join(cand, "vec_id")
        .join(
            F.broadcast(lut),
            (codes["m"] == lut["m"])
            & (codes["code"] == lut["c_label"])
            & (cand["probe_id"] == lut["probe_id"]),
        )
        .drop(lut["probe_id"])
        .groupBy("probe_id", "vec_id")
        .agg(F.round(F.sqrt(F.sum("d2")), 6).alias("approx_l2"))
    )
    return adc, probes, emb


@register(
    "q_sim_ivfpq_refine",
    oracle=f"""
    WITH {_IVFPQ_CTES},
    short AS (
        SELECT probe_id, vec_id FROM (
            SELECT probe_id, vec_id,
                   row_number() OVER (PARTITION BY probe_id
                                      ORDER BY approx_l2, vec_id) AS rn
            FROM adc
        ) WHERE rn <= {IVFPQ_REFINE_R}
    ),
    re AS (
        SELECT s.probe_id, s.vec_id,
               round(list_cosine_similarity(v.emb, p.pe), 6) AS cos_sim
        FROM short s
        JOIN e v ON v.vec_id = s.vec_id
        JOIN probes p ON p.probe_id = s.probe_id
    )
    SELECT probe_id, vec_id, cos_sim FROM (
        SELECT probe_id, vec_id, cos_sim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM re
    ) WHERE rn <= {IVFPQ_K}
    """,
)
def q_sim_ivfpq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact REFINE — the production third stage of the
    FAISS arc (IndexIVFFlat ≙ q_sim_ivf_rerank, IndexIVFPQ ≙
    q_sim_ivfpq, IVFPQ+refine ≙ this): the ADC scores are treated as
    a SHORTLIST generator (top-{IVFPQ_REFINE_R} per probe, 4× the
    final k) and only the shortlist is re-scored with exact cosine
    against the float vectors. This is how a 100 TB vector store
    spends its bytes: the corpus is scanned as 8-byte codes
    (q_sim_ivfpq's bound), and FLOATS are fetched for only
    {IVFPQ_REFINE_R} candidates per probe — a bounded-row equi-join,
    not a cell-wide float shuffle like the IVFFlat tier. The refine
    step converts the PQ quantization noise (ADC agreement ≈ 0.15 on
    this isotropic corpus) back into exact ordering, so recall
    recovers toward the routing bound — measured, not asserted, by
    q_sim_ivfpq_refine_recall.

    Determinism: cosine rounded to 6 BEFORE ranking with a vec_id
    tiebreak (the round-before-ranking repo rule), identical in the
    oracle.
    """
    adc, probes, emb = _ivfpq_adc(spark, sf_dir)
    w_short = W.partitionBy("probe_id").orderBy("approx_l2", "vec_id")
    short = (
        adc.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= IVFPQ_REFINE_R)
        .select("probe_id", "vec_id")
    )
    re = (
        short.join(emb.select("vec_id", "emb"), "vec_id")
        .join(probes, "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_expr(F.col("emb"), F.col("pe")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        re.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVFPQ_K)
        .select("probe_id", "vec_id", "cos_sim")
    )


@register(
    "q_sim_ivfpq_recall",
    oracle=f"""
    WITH ivfpq AS ({_IVFPQ_ORACLE}),
    exact AS ({{knn_batch}}),
    j AS (
        SELECT e.probe_id, e.vec_id, i.vec_id AS hit
        FROM exact e LEFT JOIN ivfpq i
          ON i.probe_id = e.probe_id AND i.vec_id = e.vec_id
    )
    SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes,
           count(*) AS n_exact,
           count(hit) AS n_hit,
           round(1.0 * count(hit) / count(*), 4) AS recall_at_k
    FROM j
    """.replace("{knn_batch}", _ORACLES["q_sim_knn_batch"]),
)
def q_sim_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the composed IVF-PQ index against exact brute-force
    cosine top-{BATCH_K} — the certificate that quantifies what the
    32× compression + {NPROBE}/{KM_K} routing jointly cost, closing
    the measured arc cell-recall (ivf_kmeans ≈ 0.51) → ADC-recall
    (pq_trained 0.29) → the production composition. Same bounded
    O(k·probes) comparison join as every recall certificate in this
    family.
    """
    ivfpq = q_sim_ivfpq(spark, sf_dir).select(
        F.col("probe_id").alias("i_probe"), F.col("vec_id").alias("i_vec")
    )
    exact = q_sim_knn_batch(spark, sf_dir).select("probe_id", "vec_id")
    j = exact.join(
        F.broadcast(ivfpq),
        (F.col("probe_id") == F.col("i_probe"))
        & (F.col("vec_id") == F.col("i_vec")),
        "left",
    )
    return j.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.count("i_vec").alias("n_hit"),
        F.round(F.count("i_vec") / F.count(F.lit(1)), 4).alias(
            "recall_at_k"
        ),
    )


@register(
    "q_sim_ivfpq_refine_recall",
    oracle=f"""
    WITH refined AS ({{refine}}),
    exact AS ({{knn_batch}}),
    j AS (
        SELECT e.probe_id, e.vec_id, r.vec_id AS hit
        FROM exact e LEFT JOIN refined r
          ON r.probe_id = e.probe_id AND r.vec_id = e.vec_id
    )
    SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes,
           count(*) AS n_exact,
           count(hit) AS n_hit,
           round(1.0 * count(hit) / count(*), 4) AS recall_at_k
    FROM j
    """.replace("{refine}", _ORACLES["q_sim_ivfpq_refine"])
       .replace("{knn_batch}", _ORACLES["q_sim_knn_batch"]),
)
def q_sim_ivfpq_refine_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall of IVF-PQ + exact refine against brute-force cosine
    top-{BATCH_K} — the measured completion of the compression arc:
    cell recall (~0.51) bounds what routing loses, ADC agreement
    (~0.15) is what 32x compression costs when trusted for final
    ORDER, and this certificate measures what the refine stage buys
    back when ADC is only trusted to build a 4k shortlist: 0.2583
    at sf 0.1, DOUBLE the ADC-final 0.125. The remaining gap to the
    0.51 routing bound is shortlist miss — on this isotropic corpus
    the ADC ordering is noisy enough that true neighbors fall
    outside the top-{IVFPQ_REFINE_R}; recall approaches the bound
    as R grows toward the cell size, and that limit IS the IVFFlat
    tier (q_sim_ivf_rerank) with its cell-wide float cost. Same
    bounded O(k-probes) comparison join as the other recall
    certificates.
    """
    refined = q_sim_ivfpq_refine(spark, sf_dir).select(
        F.col("probe_id").alias("r_probe"), F.col("vec_id").alias("r_vec")
    )
    exact = q_sim_knn_batch(spark, sf_dir).select("probe_id", "vec_id")
    j = exact.join(
        F.broadcast(refined),
        (F.col("probe_id") == F.col("r_probe"))
        & (F.col("vec_id") == F.col("r_vec")),
        "left",
    )
    return j.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.count("r_vec").alias("n_hit"),
        F.round(F.count("r_vec") / F.count(F.lit(1)), 4).alias(
            "recall_at_k"
        ),
    )


# --- Residual-encoded IVF-PQ (true-FAISS IVFADC) --------------------
# q_sim_ivfpq PQ-encodes RAW vectors, so every codeword must span the
# whole corpus spread; FAISS's actual IVFPQ encodes the RESIDUAL
# v − c(v) after coarse quantization — residuals concentrate near the
# origin, so the same 8×8 codebook budget buys finer cells, and the
# ADC lookup table becomes per-probed-CELL (the probe's residual is
# relative to each cell it probes). Same training determinism recipe
# (label-mean codebook, round-6 argmin, cl-asc tiebreaks), same
# oracle-certification of every stage.

_IVFPQ_RES_CTES = f"""
    e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    c0 AS (SELECT vec_id AS cl, emb AS ce FROM e WHERE vec_id < {KM_K}),
    {_km_assign_sql('c0', 'a1')},
    {_km_centroid_sql('a1', 'c1')},
    {_km_assign_sql('c1', 'a2')},
    {_km_centroid_sql('a2', 'c2')},
    {_km_assign_sql('c2', 'af')},
    mm AS (SELECT unnest(range(1, {PQ_M + 1})) AS m),
    red AS (
        SELECT vec_id, cl, list(v - cv ORDER BY d) AS remb
        FROM (SELECT a.vec_id, a.cl, unnest(a.emb) AS v,
                     unnest(c.ce) AS cv,
                     generate_subscripts(a.emb, 1) AS d
              FROM af a JOIN c2 c ON c.cl = a.cl)
        GROUP BY 1, 2
    ),
    rlng AS (SELECT e.label, unnest(r.remb) AS v,
                    generate_subscripts(r.remb, 1) AS dim
             FROM red r JOIN e ON e.vec_id = r.vec_id),
    rclm AS (SELECT label, dim, avg(v) AS c FROM rlng GROUP BY 1, 2),
    rpcent AS (SELECT label AS c_label, list(c ORDER BY dim) AS pce
               FROM rclm GROUP BY 1),
    rcodebook AS (SELECT m, c_label,
                         pce[(m-1)*{PQ_S}+1 : m*{PQ_S}] AS sub_ce
                  FROM rpcent CROSS JOIN mm),
    rsubs AS (SELECT vec_id, m, remb[(m-1)*{PQ_S}+1 : m*{PQ_S}] AS sub
              FROM red CROSS JOIN mm),
    rcodes AS (
        SELECT vec_id, m, c_label AS code
        FROM (SELECT s.vec_id, s.m, cb.c_label,
                     row_number() OVER (
                         PARTITION BY s.vec_id, s.m
                         ORDER BY round(list_distance(s.sub, cb.sub_ce),
                                        6), cb.c_label) AS rn
              FROM rsubs s JOIN rcodebook cb USING (m))
        WHERE rn = 1
    ),
    probes AS (SELECT vec_id AS probe_id, emb AS pe FROM e
               WHERE vec_id % {PROBE_MOD} = 0),
    cells AS (
        SELECT probe_id, cl FROM (
            SELECT p.probe_id, c.cl,
                   row_number() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY round(list_cosine_similarity(c.ce, p.pe), 4)
                                    DESC, c.cl
                   ) AS rn
            FROM probes p CROSS JOIN c2 c
        ) WHERE rn <= {NPROBE}
    ),
    pres AS (
        SELECT probe_id, cl, list(pv - cv ORDER BY d) AS rpe
        FROM (SELECT s.probe_id, s.cl, unnest(p.pe) AS pv,
                     unnest(c.ce) AS cv,
                     generate_subscripts(p.pe, 1) AS d
              FROM cells s JOIN probes p USING (probe_id)
              JOIN c2 c ON c.cl = s.cl)
        GROUP BY 1, 2
    ),
    rpsubs AS (SELECT probe_id, cl, m,
                      rpe[(m-1)*{PQ_S}+1 : m*{PQ_S}] AS psub
               FROM pres CROSS JOIN mm),
    rlut AS (SELECT p.probe_id, p.cl, p.m, cb.c_label,
                    list_distance(p.psub, cb.sub_ce)
                        * list_distance(p.psub, cb.sub_ce) AS d2
             FROM rpsubs p JOIN rcodebook cb USING (m)),
    rcand AS (
        SELECT s.probe_id, s.cl, v.vec_id
        FROM cells s JOIN af v ON v.cl = s.cl
        WHERE v.vec_id <> s.probe_id
    ),
    radc AS (
        SELECT cd.probe_id, cd.vec_id,
               round(sqrt(sum(l.d2)), 6) AS approx_l2
        FROM (SELECT rc.probe_id, rc.cl, rc.vec_id, c.m, c.code
              FROM rcand rc JOIN rcodes c ON c.vec_id = rc.vec_id) cd
        JOIN rlut l ON l.probe_id = cd.probe_id AND l.cl = cd.cl
                   AND l.m = cd.m AND l.c_label = cd.code
        GROUP BY 1, 2
    )"""

_IVFPQ_RES_ORACLE = f"""
    WITH {_IVFPQ_RES_CTES}
    SELECT probe_id, vec_id, approx_l2 FROM (
        SELECT probe_id, vec_id, approx_l2,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY approx_l2, vec_id) AS rn
        FROM radc
    ) WHERE rn <= {IVFPQ_K}
"""


def _ivfpq_residual_adc(spark: SparkSession, sf_dir: str):
    """Residual-encoded IVF-ADC pipeline — the Spark twin of the radc
    CTE above. Returns (adc scores, probes, embeddings) so the
    ADC-final and exact-refine tiers window the same certified frame
    (the _ivfpq_adc contract)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    ev = emb.select("vec_id", "emb")
    cent = _km_train(ev)
    # afv feeds TWO consumers (the residual subtraction `red` and the
    # candidate-side `af`), each otherwise replaying the broadcast-
    # argmin assignment over the corpus — truncate it once (round-13
    # optimization pass, the q_graph_hits multi-consumer pattern).
    afv = _km_assign_df(ev, cent).localCheckpoint(
        eager=False
    )  # (vec_id, emb, cl)
    red = afv.join(F.broadcast(cent), "cl").select(
        "vec_id",
        "cl",
        F.zip_with("emb", "ce", lambda x, y: x - y).alias("remb"),
    )
    rlng = red.join(emb.select("vec_id", "label"), "vec_id").select(
        "label", F.posexplode("remb").alias("i0", "v")
    )
    rpcent = (
        rlng.groupBy("label", (F.col("i0") + 1).alias("dim"))
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s["c"],
            ).alias("pce")
        )
    )
    split_m = lambda col: F.posexplode(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.lit(PQ_M)),
            lambda m: F.slice(col, (m - 1) * PQ_S + 1, PQ_S),
        )
    )
    # Same two-consumer truncation as _ivfpq_adc's codebook — here
    # the re-executed lineage would be even heavier (residual
    # subtraction + posexplode aggregate per reference).
    codebook = rpcent.select(
        F.col("label").alias("c_label"),
        split_m(F.col("pce")).alias("m0", "sub_ce"),
    ).select(
        (F.col("m0") + 1).alias("m"), "c_label", "sub_ce"
    ).localCheckpoint(eager=False)
    rsubs = red.select(
        "vec_id", split_m(F.col("remb")).alias("m0", "sub")
    ).select("vec_id", (F.col("m0") + 1).alias("m"), "sub")
    # Residual-corpus encoding by the same shuffle-free per-row
    # argmin as _ivfpq_adc's codes (round-13 optimization pass): no
    # explode of the n×M×labels fan-out, no Exchange, no
    # SortAggregate — identical (d, code) lexicographic tiebreak.
    packed_cb = codebook.groupBy("m").agg(
        F.collect_list(F.struct("c_label", "sub_ce")).alias("cbs")
    )
    best_code = F.array_min(
        F.transform(
            F.col("cbs"),
            lambda s: F.struct(
                F.round(
                    F.sqrt(
                        F.aggregate(
                            F.zip_with(
                                F.col("sub"),
                                s["sub_ce"],
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    ),
                    6,
                ).alias("d"),
                s["c_label"].alias("code"),
            ),
        )
    )
    rcodes = rsubs.join(F.broadcast(packed_cb), "m").select(
        "vec_id", "m", best_code["code"].alias("code")
    )
    probes = emb.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("pe")
    )
    w_route = W.partitionBy("probe_id").orderBy(
        F.desc(F.round(cosine_expr(F.col("ce"), F.col("pe")), 4)),
        F.asc("cl"),
    )
    # NOTE: cells feeds two consumers (pres, rcand) but must NOT be
    # localCheckpoint-truncated — both branches meet again in the
    # radc join, and a shared RDD relation gives them identical
    # exprIds, breaking df["col"] disambiguation (AMBIGUOUS_REFERENCE,
    # caught by the round-13 oracle re-check). The replayed lineage is
    # only the probes×K route window — cheap.
    cells = (
        probes.join(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_route))
        .filter(F.col("rn") <= NPROBE)
        .select("probe_id", "cl")
    )
    pres = (
        cells.join(probes, "probe_id")
        .join(F.broadcast(cent), "cl")
        .select(
            "probe_id",
            "cl",
            F.zip_with("pe", "ce", lambda x, y: x - y).alias("rpe"),
        )
    )
    rpsubs = pres.select(
        "probe_id", "cl", split_m(F.col("rpe")).alias("m0", "psub")
    ).select("probe_id", "cl", (F.col("m0") + 1).alias("m"), "psub")
    rlut = rpsubs.join(F.broadcast(codebook), "m").select(
        "probe_id",
        "cl",
        "m",
        "c_label",
        F.aggregate(
            F.zip_with(
                F.col("psub"),
                F.col("sub_ce"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    af = afv.select("vec_id", "cl")
    rcand = (
        cells.join(af.withColumnRenamed("vec_id", "cand_vec"), "cl")
        .filter(F.col("cand_vec") != F.col("probe_id"))
        .select("probe_id", "cl", F.col("cand_vec").alias("vec_id"))
    )
    joined = rcodes.join(rcand, "vec_id")
    radc = (
        joined.join(
            F.broadcast(rlut),
            (joined["m"] == rlut["m"])
            & (joined["code"] == rlut["c_label"])
            & (joined["probe_id"] == rlut["probe_id"])
            & (joined["cl"] == rlut["cl"]),
        )
        .drop(rlut["probe_id"])
        .drop(rlut["cl"])
        .groupBy("probe_id", "vec_id")
        .agg(F.round(F.sqrt(F.sum("d2")), 6).alias("approx_l2"))
    )
    return radc, probes, emb


@register("q_sim_ivfpq_residual", oracle=_IVFPQ_RES_ORACLE)
def q_sim_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — FAISS's actual IVFADC: each
    vector is PQ-coded as (v − its coarse centroid), and each probe
    builds one ADC lookup table PER PROBED CELL from its own residual
    in that cell. Residuals concentrate near the origin (the coarse
    quantizer has already absorbed the between-cell spread), so the
    same {PQ_M}×8 codebook budget quantizes a tighter distribution
    than q_sim_ivfpq's raw-vector coding — the textbook reason FAISS
    defaults to residual encoding. q_sim_ivfpq_residual_recall
    measures the effect on this corpus against identical routing
    (sf 0.1: 0.1583 vs raw ADC's 0.125 — +27% relative at zero extra
    query cost; sf 0.01's 30-pair sample is inside noise).

    Scale: identical shape to q_sim_ivfpq plus one broadcast join
    (centroids are K rows) to form residuals; the per-cell LUT is
    NPROBE× larger than the shared one — still K·PQ_M·8 tiny rows,
    broadcast. Corpus is still touched as {PQ_M}-byte codes at query
    time; the residual subtraction happens once at index-build.
    """
    adc, _, _ = _ivfpq_residual_adc(spark, sf_dir)
    w = W.partitionBy("probe_id").orderBy("approx_l2", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVFPQ_K)
        .select("probe_id", "vec_id", "approx_l2")
    )


@register(
    "q_sim_ivfpq_residual_recall",
    oracle=f"""
    WITH ivfpqr AS ({_IVFPQ_RES_ORACLE}),
    exact AS ({{knn_batch}}),
    j AS (
        SELECT e.probe_id, e.vec_id, i.vec_id AS hit
        FROM exact e LEFT JOIN ivfpqr i
          ON i.probe_id = e.probe_id AND i.vec_id = e.vec_id
    )
    SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes,
           count(*) AS n_exact,
           count(hit) AS n_hit,
           round(1.0 * count(hit) / count(*), 4) AS recall_at_k
    FROM j
    """.replace("{knn_batch}", _ORACLES["q_sim_knn_batch"]),
)
def q_sim_ivfpq_residual_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall of residual-encoded IVF-PQ against exact brute-force
    cosine top-{BATCH_K}, under identical routing and codebook budget
    as q_sim_ivfpq_recall — the measured answer to "what does
    residual encoding buy": the difference between the two
    certificates isolates the encoding change, everything else held
    fixed (same cells, same NPROBE, same {PQ_M}×8 codes).
    """
    ivfpqr = q_sim_ivfpq_residual(spark, sf_dir).select(
        F.col("probe_id").alias("i_probe"), F.col("vec_id").alias("i_vec")
    )
    exact = q_sim_knn_batch(spark, sf_dir).select("probe_id", "vec_id")
    j = exact.join(
        F.broadcast(ivfpqr),
        (F.col("probe_id") == F.col("i_probe"))
        & (F.col("vec_id") == F.col("i_vec")),
        "left",
    )
    return j.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.count("i_vec").alias("n_hit"),
        F.round(F.count("i_vec") / F.count(F.lit(1)), 4).alias(
            "recall_at_k"
        ),
    )


@register(
    "q_sim_ivfpq_residual_refine",
    oracle=f"""
    WITH {_IVFPQ_RES_CTES},
    short AS (
        SELECT probe_id, vec_id FROM (
            SELECT probe_id, vec_id,
                   row_number() OVER (PARTITION BY probe_id
                                      ORDER BY approx_l2, vec_id) AS rn
            FROM radc
        ) WHERE rn <= {IVFPQ_REFINE_R}
    ),
    re AS (
        SELECT s.probe_id, s.vec_id,
               round(list_cosine_similarity(v.emb, p.pe), 6) AS cos_sim
        FROM short s
        JOIN e v ON v.vec_id = s.vec_id
        JOIN probes p ON p.probe_id = s.probe_id
    )
    SELECT probe_id, vec_id, cos_sim FROM (
        SELECT probe_id, vec_id, cos_sim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM re
    ) WHERE rn <= {IVFPQ_K}
    """,
)
def q_sim_ivfpq_residual_refine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The production endpoint of the residual arc: residual-ADC
    top-{IVFPQ_REFINE_R} shortlist → bounded float fetch → exact
    cosine re-rank to top-{IVFPQ_K} — q_sim_ivfpq_refine with the
    better shortlist generator underneath. A better shortlist is the
    whole leverage of refinement: refine can only surface what the
    shortlist kept. Measured (q_sim_ivfpq_residual_refine_recall,
    sf 0.1): 0.2417 vs raw-coding refine's 0.2583 — statistically
    indistinguishable (29 vs 31 hits of 120). The finding: with
    R = {IVFPQ_REFINE_R} >> k both shortlists already saturate, so
    refinement WASHES OUT the encoder difference; residual coding
    pays off when ADC is the final ranking (0.1583 vs 0.125), and
    shortlist width R, not encoder quality, is the lever once an
    exact refine is affordable.

    Scale: identical to q_sim_ivfpq_refine — one equi-join fetching
    {IVFPQ_REFINE_R} float vectors per probe, never a cell-wide
    shuffle; the corpus stays 8-byte codes.
    """
    adc, probes, emb = _ivfpq_residual_adc(spark, sf_dir)
    w_short = W.partitionBy("probe_id").orderBy("approx_l2", "vec_id")
    short = (
        adc.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= IVFPQ_REFINE_R)
        .select("probe_id", "vec_id")
    )
    re = (
        short.join(emb.select("vec_id", "emb"), "vec_id")
        .join(probes, "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine_expr(F.col("emb"), F.col("pe")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        re.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVFPQ_K)
        .select("probe_id", "vec_id", "cos_sim")
    )


@register(
    "q_sim_ivfpq_residual_refine_recall",
    oracle=f"""
    WITH refined AS ({{refine}}),
    exact AS ({{knn_batch}}),
    j AS (
        SELECT e.probe_id, e.vec_id, r.vec_id AS hit
        FROM exact e LEFT JOIN refined r
          ON r.probe_id = e.probe_id AND r.vec_id = e.vec_id
    )
    SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes,
           count(*) AS n_exact,
           count(hit) AS n_hit,
           round(1.0 * count(hit) / count(*), 4) AS recall_at_k
    FROM j
    """.replace("{refine}", _ORACLES["q_sim_ivfpq_residual_refine"])
       .replace("{knn_batch}", _ORACLES["q_sim_knn_batch"]),
)
def q_sim_ivfpq_residual_refine_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall of residual IVF-PQ + exact refine against brute-force
    cosine top-{BATCH_K} — completing the encoding × refinement grid
    of the certified FAISS arc at this routing budget: every cell
    (raw/residual × ADC-final/refined) now carries a hash-certified
    measured recall, and the grid's read is in
    q_sim_ivfpq_residual_refine's docstring (encoder choice matters
    for ADC-final; shortlist width matters once refined).
    """
    refined = q_sim_ivfpq_residual_refine(spark, sf_dir).select(
        F.col("probe_id").alias("i_probe"), F.col("vec_id").alias("i_vec")
    )
    exact = q_sim_knn_batch(spark, sf_dir).select("probe_id", "vec_id")
    j = exact.join(
        F.broadcast(refined),
        (F.col("probe_id") == F.col("i_probe"))
        & (F.col("vec_id") == F.col("i_vec")),
        "left",
    )
    return j.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.count(F.lit(1)).alias("n_exact"),
        F.count("i_vec").alias("n_hit"),
        F.round(F.count("i_vec") / F.count(F.lit(1)), 4).alias(
            "recall_at_k"
        ),
    )


# --- Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25)
# and dense (cosine) rankers. The embeddings table is the corpus's
# dense index (vec_id ≡ doc_id; at larger SFs it indexes a PREFIX of
# the corpus — exactly the partial-coverage case RRF is built for:
# a doc absent from one ranker simply contributes nothing there).
from .textops import BM25_SCORED_SQL, bm25_scored  # noqa: E402

RRF_K = 60        # the canonical Cormack/Clarke/Buettcher constant
RRF_DEPTH = 20    # per-ranker candidate depth
RRF_TOPN = 10
RRF_PROBE_ID = 0  # dense query = embedding of vec_id 0


@register(
    "q_sim_hybrid_rrf",
    oracle=f"""
    WITH lex AS (
        SELECT doc_id AS id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS lex_rank
        FROM ({BM25_SCORED_SQL}) b
        QUALIFY lex_rank <= {RRF_DEPTH}
    ),
    dense AS (
        SELECT id,
               CAST(row_number() OVER (ORDER BY score DESC, id)
                    AS BIGINT) AS vec_rank
        FROM (
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id = {RRF_PROBE_ID})
            SELECT vec_id AS id,
                   round(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]), q.qe), 6) AS score
            FROM embeddings, q
            WHERE vec_id <> {RRF_PROBE_ID}
        ) d
        QUALIFY vec_rank <= {RRF_DEPTH}
    )
    SELECT COALESCE(l.id, d.id) AS id,
           COALESCE(l.lex_rank, 0) AS lex_rank,
           COALESCE(d.vec_rank, 0) AS vec_rank,
           round(CASE WHEN l.lex_rank IS NOT NULL
                      THEN 1.0 / ({RRF_K} + l.lex_rank) ELSE 0.0 END
                 + CASE WHEN d.vec_rank IS NOT NULL
                        THEN 1.0 / ({RRF_K} + d.vec_rank) ELSE 0.0 END,
                 6) AS rrf_score
    FROM lex l FULL OUTER JOIN dense d ON l.id = d.id
    ORDER BY rrf_score DESC, id
    LIMIT {RRF_TOPN}
    """,
)
def q_sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: reciprocal-rank fusion (RRF, score = sum over
    rankers of 1/(60+rank)) of the BM25 lexical top-20 and the dense
    cosine top-20 — the standard fusion step of a lexical+vector
    retrieval stack (Elasticsearch/Vespa/Lucene all ship exactly
    this). Ranks, not scores, are fused, so the two rankers need no
    score calibration; a doc present in only one list contributes
    only that list's term (rank 0 in the output marks absence).

    Determinism: both per-ranker rankings order by (round-6 score,
    id) — the repo's top-k convention — so ranks are cross-engine
    identical; the fused score is a sum of two exact rationals,
    rounded at 6; final order (rrf_score, id).

    Scale: each ranker independently reduces the corpus to DEPTH
    rows BEFORE fusion (BM25 via TakeOrderedAndProject over the
    query-term-filtered aggregate, dense via the broadcast-probe
    scan) — the fusion join touches 2*DEPTH rows no matter the
    corpus size. The window rank runs on the already-cut DEPTH-row
    frame, never on the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )

    lex_top = (
        bm25_scored(docs)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
    )
    w_lex = W.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = lex_top.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(w_lex).cast("long").alias("lex_rank"),
    )

    probe = emb.filter(F.col("vec_id") == RRF_PROBE_ID).select(
        F.col("e").alias("qe")
    )
    dense_top = (
        emb.filter(F.col("vec_id") != RRF_PROBE_ID)
        .join(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("id"),
            F.round(cosine_expr(F.col("e"), F.col("qe")), 6).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(RRF_DEPTH)
    )
    w_dense = W.orderBy(F.desc("score"), F.asc("id"))
    dense = dense_top.select(
        "id",
        F.row_number().over(w_dense).cast("long").alias("vec_rank"),
    )

    fused = lex.join(dense, "id", "full")
    contrib = F.when(
        F.col("lex_rank").isNotNull(),
        1.0 / (RRF_K + F.col("lex_rank")),
    ).otherwise(0.0) + F.when(
        F.col("vec_rank").isNotNull(),
        1.0 / (RRF_K + F.col("vec_rank")),
    ).otherwise(0.0)
    return (
        fused.select(
            "id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
            F.round(contrib, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(RRF_TOPN)
    )


# --- Matryoshka (MRL) prefix-dimension evaluation: how much of the
# exact top-k survives truncating embeddings to their first
# MRL_PREFIX dims. Matryoshka-trained models front-load information
# so the prefix is a valid cheap index; this is the measurement that
# certifies (or refutes) that property for a given corpus.
MRL_PREFIX = 32
MRL_K = 10


@register(
    "q_sim_matryoshka_recall",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
        FROM embeddings WHERE vec_id % {PROBE_MOD} = 0
    ),
    pairs AS (
        SELECT p.probe_id, e.vec_id,
               CASE WHEN list_inner_product(
                        CAST(e.embedding AS DOUBLE[]),
                        CAST(e.embedding AS DOUBLE[])) > 0
                     AND list_inner_product(p.pe, p.pe) > 0
                    THEN round(list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]), p.pe), 6)
                    ELSE CAST(-2 AS DOUBLE) END AS s_full,
               CASE WHEN list_inner_product(
                        CAST(e.embedding AS DOUBLE[])[1:{MRL_PREFIX}],
                        CAST(e.embedding AS DOUBLE[])[1:{MRL_PREFIX}])
                        > 0
                     AND list_inner_product(
                        p.pe[1:{MRL_PREFIX}], p.pe[1:{MRL_PREFIX}]) > 0
                    THEN round(list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[])[1:{MRL_PREFIX}],
                        p.pe[1:{MRL_PREFIX}]), 6)
                    ELSE CAST(-2 AS DOUBLE) END AS s_pre
        FROM embeddings e, probes p
        WHERE e.vec_id <> p.probe_id
    ),
    ranked AS (
        SELECT probe_id, vec_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY s_full DESC, vec_id)
                   AS rn_full,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY s_pre DESC, vec_id)
                   AS rn_pre
        FROM pairs
    )
    SELECT CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes,
           CAST({MRL_K} AS BIGINT) AS k,
           CAST(sum(CASE WHEN rn_full <= {MRL_K}
                          AND rn_pre <= {MRL_K}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(sum(CASE WHEN rn_full <= {MRL_K}
                           AND rn_pre <= {MRL_K}
                          THEN 1.0 ELSE 0.0 END)
                 / (count(DISTINCT probe_id) * {MRL_K}), 4)
               AS recall_at_k
    FROM ranked
    """,
)
def q_sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-dim recall@k: rank the corpus per probe by
    full-dim cosine AND by first-32-dim cosine, and measure
    the top-k overlap (Kusupati et al. 2022 — MRL-trained embeddings
    keep most nearest-neighbor structure in their prefix, enabling a
    truncate-then-refine retrieval funnel at 1/2 the FLOPs and
    bandwidth). This is the honest-measurement twin of the IVF/PQ
    recall certificates: the number it emits is the funnel's
    candidate-recall ceiling for this corpus.

    Determinism: both rankings order by (round-6 score, vec_id); the
    final recall divides exact integer counts, rounded at 4 (the
    recall-certificate convention).

    Scale: the pair scan is the brute-force certificate side (probes
    × corpus, broadcast probe matrix, one corpus pass computing BOTH
    scores per pair — the prefix fold reuses the fetched array, no
    second scan). Production uses the measured prefix as the FILTER
    stage (prefix top-c » exact refine, c > k), which scans the
    corpus as prefix-dim slices — half the bytes; the
    certificate itself runs on a fixed probe stratum, like
    q_sim_ivfpq_recall's exact side.
    """
    # Per-ROW invariants BEFORE the pair join (the dot_expr rule:
    # inside an n²/PROBE_MOD join the interpreted fold is the unit of
    # cost — precomputing prefix slices and norms per row cuts the
    # per-pair work from six 64-element folds to two, at bit-identical
    # arithmetic: dot/(na*nb) with na, nb the same sqrt(dot(x,x))
    # values cosine_expr would fold inline).
    pre = lambda c: F.slice(c, 1, MRL_PREFIX)  # noqa: E731
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    aug = emb.select(
        "vec_id",
        "e",
        pre(F.col("e")).alias("ep"),
        F.sqrt(dot_expr(F.col("e"), F.col("e"))).alias("nf"),
        F.sqrt(
            dot_expr(pre(F.col("e")), pre(F.col("e")))
        ).alias("np"),
    )
    probes = aug.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        F.col("ep").alias("pep"),
        F.col("nf").alias("pnf"),
        F.col("np").alias("pnp"),
    )
    pairs = (
        aug.join(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            # Zero-norm guard (ADVICE r09): a vector whose (prefix)
            # norm is 0 would make 0/0 = NaN, and NaN sorts LARGEST
            # in Spark's DESC window while DuckDB's
            # list_cosine_similarity diverges on the same input — so
            # degenerate vectors get an explicit -2 sentinel (below
            # any true cosine) in BOTH engines and rank last
            # deterministically.
            F.when(
                (F.col("nf") > 0) & (F.col("pnf") > 0),
                F.round(
                    dot_expr(F.col("e"), F.col("pe"))
                    / (F.col("nf") * F.col("pnf")),
                    6,
                ),
            ).otherwise(F.lit(-2.0)).alias("s_full"),
            F.when(
                (F.col("np") > 0) & (F.col("pnp") > 0),
                F.round(
                    dot_expr(F.col("ep"), F.col("pep"))
                    / (F.col("np") * F.col("pnp")),
                    6,
                ),
            ).otherwise(F.lit(-2.0)).alias("s_pre"),
        )
    )
    w_full = W.partitionBy("probe_id").orderBy(
        F.desc("s_full"), F.asc("vec_id")
    )
    w_pre = W.partitionBy("probe_id").orderBy(
        F.desc("s_pre"), F.asc("vec_id")
    )
    ranked = pairs.select(
        "probe_id",
        "vec_id",
        F.row_number().over(w_full).alias("rn_full"),
        F.row_number().over(w_pre).alias("rn_pre"),
    )
    hit = (F.col("rn_full") <= MRL_K) & (F.col("rn_pre") <= MRL_K)
    return ranked.agg(
        F.countDistinct("probe_id").alias("n_probes"),
        F.lit(MRL_K).cast("long").alias("k"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_hit"),
        F.round(
            F.sum(F.when(hit, 1.0).otherwise(0.0))
            / (F.countDistinct("probe_id") * MRL_K),
            4,
        ).alias("recall_at_k"),
    )


# --- Binary-quantized Hamming retrieval: 1-bit sign quantization
# packs each 64-dim vector into TWO sign-safe 32-bit halves (the
# repo's 60-bit-simhash convention: never touch the int64 sign bit),
# so the corpus scans at 24 bytes/row — a 21x bandwidth cut vs the
# float64 dims — and distance is two XOR+popcounts, all integers.
HAM_K = 10

_PACK_LO = (
    "aggregate(transform(slice(e, 1, 32), (x, i) -> "
    "IF(x > 0, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), "
    "CAST(0 AS BIGINT), (a, b) -> a + b)"
)
_PACK_HI = (
    "aggregate(transform(slice(e, 33, 32), (x, i) -> "
    "IF(x > 0, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), "
    "CAST(0 AS BIGINT), (a, b) -> a + b)"
)

_LAST_HAM_SIGS = LastHandle(lambda dfs: [df.unpersist() for df in dfs])


@register(
    "q_sim_hamming_topk",
    oracle=f"""
    WITH sig AS (
        SELECT vec_id,
               sum(CASE WHEN e[i+1] > 0
                        THEN (CAST(1 AS BIGINT) << i)
                        ELSE 0 END) AS lo,
               sum(CASE WHEN e[i+33] > 0
                        THEN (CAST(1 AS BIGINT) << i)
                        ELSE 0 END) AS hi
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings)
        CROSS JOIN range(32) t(i)
        GROUP BY vec_id
    ),
    probes AS (
        SELECT vec_id AS probe_id, lo AS plo, hi AS phi
        FROM sig WHERE vec_id % {PROBE_MOD} = 0
    ),
    pairs AS (
        SELECT p.probe_id, s.vec_id,
               CAST(bit_count(xor(s.lo, p.plo))
                    + bit_count(xor(s.hi, p.phi)) AS BIGINT) AS hamming
        FROM sig s CROSS JOIN probes p
        WHERE s.vec_id <> p.probe_id
    )
    SELECT probe_id, vec_id, hamming
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                                       ORDER BY hamming, vec_id) AS rn
          FROM pairs)
    WHERE rn <= {HAM_K}
    """,
)
def q_sim_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch top-k retrieval over 1-bit sign-quantized embeddings
    (binary quantization — the coarsest, cheapest ANN tier, the
    64x-compression end of the PQ/IVF family): signature = the
    64-dim sign pattern packed into two 32-bit bigint halves,
    distance = XOR + popcount, every value an exact integer, so the
    whole operator is hash-exact cross-engine with no rounding
    convention needed.

    Plan shape — NO corpus-scale sort: Hamming distance lives on the
    discrete domain 0..64, so per-probe top-k decomposes into
      (1) one signature pass (24 B/row, persisted),
      (2) a (probe, distance) histogram — map-side-combinable count
          into at most 65 x n_probes rows,
      (3) the k-th-distance cutoff d* and the below-cutoff count per
          probe, computed on that tiny histogram (a 65-row window),
      (4) one filter pass emitting h < d* rows outright plus the
          h = d* ties ranked by vec_id up to the remaining budget —
          the tie window moves only the d*-bucket, never the corpus.
    At 100 TB the corpus is scanned twice as 24-byte signature rows
    (both scans from the persisted projection), shuffles carry the
    65-bucket census and the final <=k rows per probe, and nothing
    ever sorts corpus-scale data. The same two-pass
    histogram-threshold trick applies to any bounded integer score.
    Production funnel: Hamming shortlist -> exact re-rank, exactly
    like q_sim_ivfpq_refine's bounded-fetch stage.

    Probe fan-out is the q_sim_knn_batch broadcast contract (PROBE
    set small, shipped once); the BNLJ in the plan is that broadcast
    — whitelisted with the same argument as its siblings.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sigs = emb.select(
        "vec_id",
        F.expr(_PACK_LO).alias("lo"),
        F.expr(_PACK_HI).alias("hi"),
    ).persist()
    _LAST_HAM_SIGS.replace([sigs])
    probes = sigs.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("lo").alias("plo"),
        F.col("hi").alias("phi"),
    )
    pairs = (
        sigs.join(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("plo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("phi")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    hist = pairs.groupBy("probe_id", "hamming").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_cum = (
        W.partitionBy("probe_id")
        .orderBy("hamming")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("n").over(w_cum))
    # d* = smallest distance whose cumulative count reaches K; if the
    # corpus holds fewer than K candidates, take everything (max h).
    cuts = cum.groupBy("probe_id").agg(
        F.coalesce(
            F.min(F.when(F.col("cum") >= HAM_K, F.col("hamming"))),
            F.max("hamming"),
        ).alias("dstar")
    )
    budgets = (
        cum.join(F.broadcast(cuts), "probe_id")
        .groupBy("probe_id", "dstar")
        .agg(
            F.sum(
                F.when(F.col("hamming") < F.col("dstar"), F.col("n"))
                .otherwise(0)
            ).alias("n_below")
        )
    )
    scoped = pairs.join(F.broadcast(budgets), "probe_id")
    below = scoped.filter(F.col("hamming") < F.col("dstar")).select(
        "probe_id", "vec_id", "hamming"
    )
    w_tie = W.partitionBy("probe_id").orderBy("vec_id")
    at_cut = (
        scoped.filter(F.col("hamming") == F.col("dstar"))
        .withColumn("rn", F.row_number().over(w_tie))
        .filter(F.col("rn") <= HAM_K - F.col("n_below"))
        .select("probe_id", "vec_id", "hamming")
    )
    return below.unionByName(at_cut)
