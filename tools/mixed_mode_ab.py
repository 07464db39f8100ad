#!/usr/bin/env python
"""A/B: ONE mixed-mode batched search job vs TWO mode-segregated jobs
(the round-4 state of the engine: `searches` applied one mode to the
whole batch, so a mixed workload paid one Spark job per mode).

Method mirrors tools/search_lat_ab.py: one shared prebuilt POSITIONAL
index at sf0.1, warmed JVM, interleaved A/B/A/B reps, compare min —
cross-VM host noise on this box is ±30%, single runs prove nothing.

Usage:
    python tools/mixed_mode_ab.py --build /tmp/ab_mixed_idx
    python tools/mixed_mode_ab.py /tmp/ab_mixed_idx
"""

from __future__ import annotations

import json
import sys
import time

# batch-10 mixed workload: 6 bag-of-words + 2 conjunctive + 1 phrase +
# 1 near (the verdict's "normal shape of real traffic")
ANY_QS = ["join hash row", "scan window spark", "dup join", "the fast key",
          "column vector", "value data line"]
ALL_QS = ["query order group", "big small slow"]
PHRASE_QS = ["part filter"]
NEAR_QS = ["table hash"]

MIXED = ([(q, "any", None) for q in ANY_QS]
         + [(q, "all", None) for q in ALL_QS]
         + [(q, "phrase", None) for q in PHRASE_QS]
         + [(q, "near", 4) for q in NEAR_QS])


def main() -> None:
    sys.path.insert(0, ".")
    from hora_spark.config import EngineConfig, IndexConfig
    from hora_spark.engine import Engine
    from hora_spark.session import get_spark

    cfg = EngineConfig(index=IndexConfig(block_size=128, n_buckets=16,
                                         store_positions=True))
    if sys.argv[1] == "--build":
        spark = get_spark("ab_mixed_build", cores=32)
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        Engine(spark, sys.argv[2], cfg).build(docs, id_col="doc_id")
        print("built", sys.argv[2])
        spark.stop()
        return

    idx = sys.argv[1]
    spark = get_spark("ab_mixed", cores=32)
    eng = Engine(spark, idx, cfg)
    eng.search("warm up run", k=10).collect()
    eng.search("part filter", k=10, mode="phrase").collect()

    for rep in range(4):
        # A: one job, per-query modes
        t0 = time.perf_counter()
        one = eng.searches(MIXED, k=10).collect()
        a = time.perf_counter() - t0
        # B: one job per mode (the round-4 shape of the same workload)
        t0 = time.perf_counter()
        two = []
        two += eng.searches(ANY_QS, k=10, mode="any").collect()
        two += eng.searches(ALL_QS, k=10, mode="all").collect()
        two += eng.searches(PHRASE_QS, k=10, mode="phrase").collect()
        two += eng.searches(NEAR_QS, k=10, mode="near", near_window=4).collect()
        b = time.perf_counter() - t0
        assert len(one) == len(two), (len(one), len(two))
        print(json.dumps({"rep": rep, "one_job_s": round(a, 4),
                          "per_mode_jobs_s": round(b, 4),
                          "speedup": round(b / a, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
