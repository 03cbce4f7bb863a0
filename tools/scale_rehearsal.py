"""Scale rehearsal (VERDICT r07 item 7): measure the doubling curve
of the most expensive composites above the sf0.1 gate.

The 100 TB claims for the big composites are design-argued (banded /
bucketed / broadcast) and plan-audited; this tool adds MEASURED
evidence: a deterministic synthetic corpus with the same schemas and
statistical shape as /root/testdata (TESTDATA.md / FIXTURES.md —
31-word vocabulary, doc length U[10,100], 5% near-dup docs tagged
with a 'dup' suffix token, unit-norm isotropic 64-dim embeddings,
uniform 10-class labels) generated at x1 and x8 the sf0.1 row
counts, each composite timed at both, and the observed scaling
exponent alpha = ln(t8/t1) / ln(8) reported. alpha <= ~1 means the
operator scales linearly in rows; the single-JVM stage-latency floor
(~0.4 s/stage) biases alpha DOWN for short queries, so exponents are
upper-bounded evidence of superlinearity, not precise fits.

    python tools/scale_rehearsal.py [--mults 1,8] [--out .scale]

Corpora land in .scale/x{m}/ (gitignored). Results print as a
markdown table for PLANS.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DOCS = 5000     # sf0.1 documents rows
BASE_VECS = 2000     # sf0.1 embeddings rows
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
COMPOSITES = [
    "q_training_export",
    "q_sample_kfold",
    "q_dedup_pipeline",
    "q_corpus_funnel",
    "q_sim_ivfpq_recall",
]


def gen_corpus(out_dir: str, mult: int, seed: int = 8) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_docs = BASE_DOCS * mult
    texts, langs, sources = [], [], []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.05:
            # near-dup: copy an earlier doc, perturb with a tag token
            texts.append(texts[int(rng.integers(0, i))] + " dup")
        else:
            length = int(rng.integers(10, 101))
            words = rng.integers(0, len(VOCAB), size=length)
            texts.append(" ".join(VOCAB[w] for w in words))
        langs.append(LANGS[int(rng.choice(len(LANGS), p=LANG_P))])
        sources.append(f"src{int(rng.integers(0, 20))}")
    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    n_vecs = BASE_VECS * mult
    vecs = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(
            rng.integers(0, 10, size=n_vecs).astype(np.int32), pa.int32()
        ),
    })
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    # events: TESTDATA shape — users ~ 15 x docs/500, 5 types, ts
    # uniform over 30 days of 2024-01, props a one-key JSON blob.
    # Added round 10 so the streaming bounded-state composites
    # (s_novelty_*, s_minhash_dup_rate run on documents but the
    # novelty family needs events) can be rehearsed at x8/x27.
    n_events = 20 * n_docs
    n_users = max(1, (3 * n_docs) // 100)
    types = ["view", "click", "purchase", "error", "scroll"]
    day_us = 86_400_000_000
    ts0 = 1_704_067_200_000_000  # 2024-01-01 UTC in epoch micros
    ev = pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(
            (ts0 + rng.integers(0, 30 * day_us, size=n_events)),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(
            rng.integers(0, n_users, size=n_events), pa.int64()
        ),
        "event_type": pa.array(
            [types[i] for i in rng.integers(0, 5, size=n_events)],
            pa.string(),
        ),
        "value": pa.array(
            rng.exponential(10.0, size=n_events), pa.float64()
        ),
        "props": pa.array(
            [
                '{"k": %d}' % k
                for k in rng.integers(0, 100, size=n_events)
            ],
            pa.string(),
        ),
    })
    pq.write_table(ev, os.path.join(out_dir, "events.parquet"))


def _materialize(df) -> None:
    """Force FULL evaluation of every output column via the noop
    sink (the bench.py convention). The earlier `.count()` action let
    Catalyst column-prune aggregate/window expressions out of
    agg-ending composites without checkpoints — measured live:
    q_sim_matryoshka_recall 1.0 s under count() vs 2.9 s fully
    materialized at sf0.1 — silently flattering exactly the
    certificate tier the rehearsal exists to measure honestly."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mults", default="1,8")
    p.add_argument("--out", default=".scale")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument(
        "--composites",
        default=None,
        help="comma-separated query names (default: the standing list)",
    )
    args = p.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    global COMPOSITES
    if args.composites:
        COMPOSITES = args.composites.split(",")

    for m in mults:
        d = os.path.join(args.out, f"x{m}")
        if not all(
            os.path.exists(os.path.join(d, t))
            for t in ("embeddings.parquet", "events.parquet")
        ):
            t0 = time.time()
            gen_corpus(d, m)
            print(f"generated x{m} in {time.time() - t0:.1f}s", flush=True)

    from mrtweety_analytic_spark.queries import QUERIES
    from mrtweety_analytic_spark.session import get_spark

    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM, Python worker pool, shuffle machinery — same
    # rationale as bench.py's unmeasured warm-up.
    smallest = os.path.join(args.out, f"x{mults[0]}")
    for name in COMPOSITES:
        _materialize(QUERIES[name](spark, smallest))

    # min-of-N repeats: the first timed touch of a corpus pays scan /
    # codegen / block-manager noise that swamps the data-dependent
    # cost at these sizes; the min is the honest steady state.
    times: dict[str, dict[int, float]] = {}
    for rep in range(args.repeats):
        for m in mults:
            d = os.path.join(args.out, f"x{m}")
            for name in COMPOSITES:
                t0 = time.time()
                try:
                    _materialize(QUERIES[name](spark, d))
                except Exception as ex:  # noqa: BLE001 — keep sweeping
                    # Seen live: rep2 at x27 died with
                    # UNABLE_TO_ACQUIRE_MEMORY — accumulated
                    # localCheckpoint blocks from the two earlier
                    # reps of the same composites, not a per-query
                    # cost (reps 0-1 at the same scale passed).
                    print(
                        f"rep{rep} x{m} {name:24s} FAILED "
                        f"{str(ex)[:120]}",
                        flush=True,
                    )
                    continue
                dt = time.time() - t0
                cur = times.setdefault(name, {})
                cur[m] = min(cur.get(m, float("inf")), dt)
                print(
                    f"rep{rep} x{m} {name:24s} {dt:7.1f}s",
                    flush=True,
                )
        # Drop accumulated localCheckpoint blocks between reps: the
        # composites checkpoint per invocation and the blocks only
        # free on GC of the Python handles.
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # N-point summary: min time per scale, plus per-segment exponents
    # (alpha between consecutive scale points) and the end-to-end one.
    hdr = " | ".join(f"t(x{m}) s" for m in mults)
    segs = " | ".join(
        f"a[{mults[i]}-{mults[i + 1]}]" for i in range(len(mults) - 1)
    )
    # 1 name col + len(mults) time cols + len(mults)-1 segment cols
    # + 1 end-to-end alpha col. A composite that failed EVERY rep at
    # some scale has no times[name][m] — print '-' placeholders
    # instead of discarding the whole table on a KeyError.
    n_cols = 1 + len(mults) + (len(mults) - 1) + 1
    print(f"\n| composite | {hdr} | {segs} | alpha |")
    print("|" + "---|" * n_cols)
    lo, hi = mults[0], mults[-1]

    def _t(name, m):
        return times.get(name, {}).get(m)

    def _alpha(name, m0, m1):
        t0, t1 = _t(name, m0), _t(name, m1)
        if t0 is None or t1 is None or t0 <= 0:
            return "-"
        return f"{math.log(t1 / t0) / math.log(m1 / m0):.2f}"

    for name in COMPOSITES:
        ts = " | ".join(
            f"{_t(name, m):.1f}" if _t(name, m) is not None else "-"
            for m in mults
        )
        seg_a = " | ".join(
            _alpha(name, mults[i], mults[i + 1])
            for i in range(len(mults) - 1)
        )
        print(f"| {name} | {ts} | {seg_a} | {_alpha(name, lo, hi)} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
