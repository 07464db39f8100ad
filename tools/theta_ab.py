#!/usr/bin/env python
"""A/B for the early-θ first-batch cap in shard_topk (PLANS.md §3).

The round-3 verdict floated seeding θ across shards from block_max
metadata — UNSOUND for exactness (θ must be a score some doc actually
attains; a block upper bound need not be). The sound version of the same
intuition is purely local: while θ is still −inf, cap the decoded batch
width lower, so θ exists after less work and later batches can skip.

This is a UDF-level micro-bench (no Spark): one shard at the REAL
adaptive-sharding scale (2M docs = IndexConfig.target_docs_per_shard),
Zipf-ish postings, the same TermPosting objects the query path builds.
Reports wall time + decoded-block counts per first-batch cap, interleaved
rounds, min per variant. Run: python tools/theta_ab.py [n_docs] [rounds]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hora_spark.functions.wand import TermPosting, shard_topk
from hora_spark.operators.segments import encode_shard_rows

K1, B = 1.2, 0.75
BLOCK = 128


def build_shard(n_docs: int, seed: int = 7):
    """Synthetic single-shard postings: one hot term (df≈n), one mid
    (df≈n/20), one rare (df≈n/2000); dls Zipf-ish."""
    rng = np.random.default_rng(seed)
    dls = np.clip(rng.zipf(1.6, n_docs), 5, 400).astype(np.int64)
    rows = []
    for term, df_frac, tf_hi in (("hot", 1.0, 8), ("mid", 0.05, 5), ("rare", 0.0005, 3)):
        n = max(1, int(n_docs * df_frac))
        ids = np.sort(rng.choice(n_docs, size=n, replace=False))
        tfs = rng.integers(1, tf_hi + 1, size=n)
        rows.append(pd.DataFrame({
            "shard_id": np.zeros(n, np.int32), "doc_id": ids,
            "dl": dls[ids], "term": term, "tf": tfs,
        }))
    pdf = pd.concat(rows, ignore_index=True)
    enc = encode_shard_rows(pdf, BLOCK)
    avgdl = float(dls.mean())
    # idf values shaped like a real corpus (hot≈small, rare≈large)
    idf = {"hot": 0.12, "mid": 2.9, "rare": 7.6}
    postings = {}
    for r in enc.itertuples(index=False):
        if r.term not in idf:
            continue
        tf_max = np.asarray(r.block_tf_max, np.float64)
        dl_min = np.asarray(r.block_dl_min, np.float64)
        ub = idf[r.term] * tf_max / (tf_max + K1 * (1 - B + B * dl_min / avgdl))
        postings[r.term] = TermPosting(
            idf[r.term], [bytes(b) for b in r.doc_blocks],
            [bytes(b) for b in r.tf_blocks], [bytes(b) for b in r.dl_blocks],
            r.block_last, ub)
    return postings, avgdl


def run_query(postings, avgdl, terms, first_cap):
    tp = [TermPosting(p.idf, p.doc_blocks, p.tf_blocks, p.dl_blocks,
                      p.block_last, p.block_max)  # fresh: empty decode cache
          for p in (postings[t] for t in terms)]
    t0 = time.perf_counter()
    ids, scores = shard_topk(tp, 10, avgdl, K1, B, prune=True,
                             first_batch_docs=first_cap)
    wall = time.perf_counter() - t0
    decoded = sum(len(p._cache) for p in tp)
    return wall, decoded, (ids.tolist(), np.round(scores, 9).tolist())


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    postings, avgdl = build_shard(n_docs)
    queries = [["hot"], ["mid"], ["hot", "mid"], ["hot", "mid", "rare"], ["rare"]]
    caps = [None, 2048, 512, 256]
    walls = {c: [] for c in caps}
    decs = {c: None for c in caps}
    baseline = {}
    for r in range(rounds):
        for c in caps:  # interleaved
            tot_w, tot_d = 0.0, 0
            for q in queries:
                w, d, res = run_query(postings, avgdl, q, c)
                tot_w += w
                tot_d += d
                key = tuple(q)
                if c is None and key not in baseline:
                    baseline[key] = res
                else:
                    assert res == baseline.get(key, res), (q, c)  # exactness
            walls[c].append(tot_w)
            decs[c] = tot_d
    print(f"n_docs={n_docs} block={BLOCK} rounds={rounds} "
          f"(5 queries per round, min wall per variant)")
    base = min(walls[None])
    for c in caps:
        w = min(walls[c])
        print(f"first_batch_docs={str(c):>5}: wall {w*1000:8.1f} ms  "
              f"decoded_blocks {decs[c]:6d}  vs-default {w/base:5.2f}x")


if __name__ == "__main__":
    main()
