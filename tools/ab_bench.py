#!/usr/bin/env python
"""A/B attribution of the r1→r2 headline regression (VERDICT r2, task 1).

Two deliberate r2 features were the suspects:
- dl_blocks: final segment rows store per-posting doc lengths (a third
  block array packed at merge + written to parquet) — buys O(posting)
  rare-term query decode;
- the LSH star-pair skew guard: a bucket-stats window pass over band keys
  before the banded self-join — buys O(n) over-cap buckets.

This harness times each feature ON vs OFF, interleaved round-robin over
N rounds on the same JVM and the same inputs, and reports min + all walls
per variant so cross-VM host noise (±30% on this box) can be separated
from real code cost. Also reports index bytes (dl vs nodl) and batched
query latency on both layouts (what dl_blocks buys back).

Usage: python tools/ab_bench.py [rounds]   (env: SPARK_GRAFT_SF_DIR/CPUS)
Prints one JSON line; paste the table into BENCH.md §regression.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QUERY_SET = [
    "join hash row", "scan window spark", "dup", "dup join",
    "filter merge sort batch stream", "the fast key", "column vector",
    "big small slow", "query order group", "value data line",
]


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import dataclasses

    from hora_spark.config import EngineConfig, IndexConfig
    from hora_spark.engine import Engine
    from hora_spark.operators import dedup
    from hora_spark.session import get_spark

    spark = get_spark("ab_bench", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()

    cfg_dl = EngineConfig(index=IndexConfig(block_size=128, n_buckets=16))
    cfg_nodl = dataclasses.replace(
        cfg_dl, index=dataclasses.replace(cfg_dl.index, store_dl=False))

    walls: dict[str, list[float]] = {}
    keep: dict[str, str] = {}          # variant -> last index path

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        walls.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
        return out

    def build(cfg, tag):
        if tag in keep:
            shutil.rmtree(keep[tag], ignore_errors=True)
        path = tempfile.mkdtemp(prefix=f"ab_{tag}_")
        keep[tag] = path
        Engine(spark, path, cfg).build(docs, id_col="doc_id")

    # untimed warmup (JIT) once, mirroring bench.py methodology
    warm = tempfile.mkdtemp(prefix="ab_warm_")
    Engine(spark, warm, cfg_dl).build(docs.limit(5000), id_col="doc_id")
    shutil.rmtree(warm, ignore_errors=True)

    for r in range(rounds):
        timed("build_dl", lambda: build(cfg_dl, "dl"))
        timed("build_nodl", lambda: build(cfg_nodl, "nodl"))
        # the driver-entry LSH query's exact params, guard on vs off
        timed("lsh_guard", lambda: dedup.minhash_lsh_candidates(
            docs, n_hashes=8, bands=4, max_bucket=1000).collect())
        timed("lsh_noguard", lambda: dedup.minhash_lsh_candidates(
            docs, n_hashes=8, bands=4, max_bucket=None).collect())
        print(f"[ab] round {r + 1}/{rounds}: " +
              ", ".join(f"{k}={v[-1]}" for k, v in walls.items()),
              file=sys.stderr)

    # what dl_blocks buys: batched query latency + index size per layout
    sizes = {}
    for tag, cfg in (("dl", cfg_dl), ("nodl", cfg_nodl)):
        eng = Engine(spark, keep[tag], cfg)
        for _ in range(2):
            timed(f"search_batched_10_{tag}",
                  lambda e=eng: e.searches(QUERY_SET, k=10).collect())
        sizes[tag] = _du(os.path.join(keep[tag], "data"))
        shutil.rmtree(keep[tag], ignore_errors=True)

    out = {
        "sf": SF_DIR, "rounds": rounds,
        "min": {k: min(v) for k, v in walls.items()},
        "all": walls,
        "index_bytes": sizes,
        "dl_build_cost_s": round(min(walls["build_dl"]) - min(walls["build_nodl"]), 3),
        "lsh_guard_cost_s": round(min(walls["lsh_guard"]) - min(walls["lsh_noguard"]), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
