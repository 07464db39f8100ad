#!/usr/bin/env python
"""Search-latency A/B between two checkouts of this repo over ONE shared
prebuilt index (PLANS.md §1 "measured and REJECTED" evidence).

Usage:
    # build the shared index once (either checkout)
    python tools/search_lat_ab.py --build /tmp/ab_search_idx
    # then alternate, pinning BOTH driver and worker code to the variant
    # (Python workers resolve hora_spark via PYTHONPATH, not driver
    # sys.path inserts — unpinned runs mix versions):
    PYTHONPATH=/repoA python tools/search_lat_ab.py /repoA /tmp/ab_search_idx
    PYTHONPATH=/repoB python tools/search_lat_ab.py /repoB /tmp/ab_search_idx

Interleave several rounds by hand (A B A B ...) and compare min/median;
cross-VM host noise on this box is ±30%, so single runs prove nothing.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

QS = [
    "join hash row", "scan window spark", "dup", "dup join",
    "filter merge sort batch stream", "the fast key", "column vector",
    "big small slow", "query order group", "value data line",
]


def main() -> None:
    if sys.argv[1] == "--build":
        sys.path.insert(0, ".")
        from hora_spark.config import EngineConfig, IndexConfig
        from hora_spark.engine import Engine
        from hora_spark.session import get_spark
        spark = get_spark("ab_build", cores=32)
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        Engine(spark, sys.argv[2], EngineConfig(index=IndexConfig(
            block_size=128, n_buckets=16))).build(docs, id_col="doc_id")
        print("built", sys.argv[2])
        spark.stop()
        return
    repo, idx = sys.argv[1], sys.argv[2]
    sys.path.insert(0, repo)
    from hora_spark.config import EngineConfig, IndexConfig
    from hora_spark.engine import Engine
    from hora_spark.session import get_spark
    spark = get_spark("ab_lat", cores=32)
    eng = Engine(spark, idx, EngineConfig(index=IndexConfig(block_size=128, n_buckets=16)))
    eng.search("warm up run", k=10).collect()
    for rep in range(3):
        lat = []
        for q in QS:
            t0 = time.perf_counter()
            eng.search(q, k=10).collect()
            lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        eng.searches(QS * 10, k=10).collect()
        print(json.dumps({"repo": repo, "rep": rep,
                          "p50": round(statistics.median(lat), 4),
                          "b100": round(time.perf_counter() - t0, 4)}))
    spark.stop()


if __name__ == "__main__":
    main()
