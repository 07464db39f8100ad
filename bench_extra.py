#!/usr/bin/env python
"""Extra benchmarks (guide §1.4): noop-sink isolation of the headline
operators, so each number times the COMPUTATION — scan, shuffle, UDF,
aggregation — and not the collect/driver transfer that bench.py's
(frozen) methodology includes.

Prints ONE JSON line {"noop": {key: min_sec, ...}, "collect": {...},
"reps": N}. bench.py remains the artifact of record; these numbers go to
OPTIMIZATION_r06.md to attribute how much of each key is compute vs
result transfer. Jobs are labeled (guide §1.5) for the UI.

Usage: SPARK_GRAFT_SF_DIR=... python bench_extra.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

QUERY_SET = [
    "join hash row", "scan window spark", "dup", "dup join",
    "filter merge sort batch stream", "the fast key", "column vector",
    "big small slow", "query order group", "value data line",
]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from hora_spark.config import EngineConfig, IndexConfig
    from hora_spark.engine import Engine
    from hora_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS)
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()

    # untimed warmup, same methodology as bench.py
    warm = tempfile.mkdtemp(prefix="bx_warm_")
    Engine(spark, warm, EngineConfig(index=IndexConfig(block_size=128, n_buckets=16))).build(
        docs.limit(5000), id_col="doc_id")
    shutil.rmtree(warm, ignore_errors=True)

    idx = tempfile.mkdtemp(prefix="bx_idx_")
    eng = Engine(spark, idx,
                 EngineConfig(index=IndexConfig(block_size=128, n_buckets=16)))
    eng.build(docs, id_col="doc_id")
    eng.search("join hash row", k=10).collect()  # seed idf cache + codegen

    qs = entrymod.queries()
    qs["bm25_topk_hot"] = entrymod._mk_bm25_query(entrymod.HOT_QUERY)
    qs["exact_dedup_count"] = entrymod._q_exact_dedup_count
    qs["knn_bruteforce"] = entrymod._q_knn_bruteforce

    def df_of(key: str):
        mk = {
            "search_single": lambda: eng.search("join hash row", k=10),
            "search_batched_100": lambda: eng.searches(QUERY_SET * 10, k=10),
            "bm25_topk_hot": lambda: qs["bm25_topk_hot"](spark, SF_DIR),
            "exact_dedup_count": lambda: qs["exact_dedup_count"](spark, SF_DIR),
            "minhash_lsh_pairs": lambda: qs["minhash_lsh_pairs"](spark, SF_DIR),
            "text_stats": lambda: qs["text_stats"](spark, SF_DIR),
            "knn_bruteforce": lambda: qs["knn_bruteforce"](spark, SF_DIR),
            "tpch_q1": lambda: qs["tpch_q1"](spark, SF_DIR),
            "events_sessions": lambda: qs["events_sessions"](spark, SF_DIR),
        }
        return mk[key]()

    keys = ["search_single", "search_batched_100", "bm25_topk_hot",
            "exact_dedup_count", "minhash_lsh_pairs", "text_stats",
            "knn_bruteforce", "tpch_q1", "events_sessions"]

    noop: dict[str, float] = {}
    coll: dict[str, float] = {}
    for key in keys:
        for sink, store in (("noop", noop), ("collect", coll)):
            walls = []
            for _ in range(REPS):
                sc.setJobDescription(f"bench_extra:{key}:{sink}")
                df = df_of(key)
                t0 = time.perf_counter()
                if sink == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                walls.append(time.perf_counter() - t0)
            sc.setJobDescription(None)
            store[key] = round(min(walls), 4)
        print(f"[bench_extra] {key}: noop {noop[key]} collect {coll[key]}",
              file=sys.stderr)

    shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps({"noop": noop, "collect": coll, "reps": REPS,
                      "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
