#!/usr/bin/env python
"""Phase breakdown of one warm single search (r6 session 2).

Splits eng.search(...).collect() into: plan construction (driver-side
DataFrame build), job submission+execution (collect), and counts the
Spark jobs each phase runs. Also times the sub-steps of search_topk by
monkey-free re-derivation: meta/read/broadcast/collect.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from hora_spark.config import EngineConfig, IndexConfig
    from hora_spark.engine import Engine
    from hora_spark.session import get_spark

    spark = get_spark("profile_search", cores=CPUS)
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()

    warm = tempfile.mkdtemp(prefix="p6_warm_")
    Engine(spark, warm, EngineConfig(index=IndexConfig(block_size=128, n_buckets=16))).build(
        docs.limit(5000), id_col="doc_id")
    shutil.rmtree(warm, ignore_errors=True)

    idx_path = tempfile.mkdtemp(prefix="p6_idx_")
    eng = Engine(spark, idx_path,
                 EngineConfig(index=IndexConfig(block_size=128, n_buckets=16)))
    eng.build(docs, id_col="doc_id")

    # warm everything once
    eng.search("join hash row", k=10).collect()

    tracker = sc.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or []) + len(
            tracker.getActiveJobsIds() or [])

    def job_count_before_after(fn):
        # use the JVM-side job id counter via a dummy: run and diff job ids
        ids0 = set(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
        out = fn()
        ids1 = set(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
        return out, len(ids1 - ids0)

    # phase A: plan construction only
    for _ in range(3):
        t0 = time.perf_counter()
        df = eng.search("join hash row", k=10)
        t1 = time.perf_counter()
        _, n_plan_jobs = job_count_before_after(lambda: None)
        rows, n_jobs = job_count_before_after(df.collect)
        t2 = time.perf_counter()
        print(f"plan_build {t1 - t0:.4f}s  collect {t2 - t1:.4f}s "
              f"jobs_in_collect {n_jobs}", file=sys.stderr)

    # phase B: how long is a trivial job on this session (floor)?
    for _ in range(3):
        t0 = time.perf_counter()
        sc.parallelize([1], 1).count()
        print(f"trivial_rdd_job {time.perf_counter() - t0:.4f}s",
              file=sys.stderr)
    from pyspark.sql import functions as F
    rng = spark.range(1)
    for _ in range(3):
        t0 = time.perf_counter()
        rng.collect()
        print(f"trivial_df_collect {time.perf_counter() - t0:.4f}s",
              file=sys.stderr)

    # phase C: timed sub-steps of the plan build
    from hora_spark.operators import query as q
    store = eng.store
    cfg = eng.cfg
    t0 = time.perf_counter()
    meta = store.meta(None)
    t1 = time.perf_counter()
    segs = store.read("segments", None)
    t2 = time.perf_counter()
    segs2 = segs.filter(F.col("term").isin(["join", "hash", "row"])).select(
        "shard_id", "term", "doc_blocks", "tf_blocks", "dl_blocks",
        "block_last", "block_tf_max", "block_dl_min")
    t3 = time.perf_counter()
    b = sc.broadcast({"a": 1.0})
    t4 = time.perf_counter()
    tb = store.table_bytes("segments", None)
    t5 = time.perf_counter()
    print(f"meta {t1-t0:.4f} read {t2-t1:.4f} filter+select {t3-t2:.4f} "
          f"broadcast {t4-t3:.4f} table_bytes {t5-t4:.4f}", file=sys.stderr)

    # phase D: full searches repeated, wall distribution
    import statistics
    walls = []
    for _ in range(10):
        t0 = time.perf_counter()
        eng.search("join hash row", k=10).collect()
        walls.append(time.perf_counter() - t0)
    print(f"warm search walls: min {min(walls):.4f} med "
          f"{statistics.median(walls):.4f} all "
          f"{[round(w, 3) for w in walls]}", file=sys.stderr)

    shutil.rmtree(idx_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
