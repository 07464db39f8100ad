#!/usr/bin/env python
"""A/B: index-resident fielded filter (fields={'lang': 'en'} — the
'<field>:<token>' postings intersect inside the shard UDF) vs the
keep-list form of the SAME logical filter (filter_df = a documents-table
scan of lang='en' ids → size probe → broadcast or cogroup).

Method mirrors tools/mixed_mode_ab.py: one shared prebuilt fielded index
at sf0.1, warmed JVM, interleaved A/B/A/B reps, compare min — cross-VM
host noise on this box is ±30%, single runs prove nothing. Both paths
must return IDENTICAL rows (asserted every rep): fielded filtering is
exact, scores are the unchanged global-stats BM25 sums in both forms.

Usage:
    python tools/fielded_ab.py --build /tmp/ab_fielded_idx
    python tools/fielded_ab.py /tmp/ab_fielded_idx
"""

from __future__ import annotations

import json
import sys
import time

QUERY = "join hash row"
LANG = "en"


def main() -> None:
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from hora_spark.config import EngineConfig, IndexConfig
    from hora_spark.engine import Engine
    from hora_spark.session import get_spark

    cfg = EngineConfig(index=IndexConfig(block_size=128, n_buckets=16,
                                         field_cols=("lang", "source")))
    if sys.argv[1] == "--build":
        spark = get_spark("ab_fielded_build", cores=32)
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        Engine(spark, sys.argv[2], cfg).build(docs, id_col="doc_id")
        print("built", sys.argv[2])
        spark.stop()
        return

    idx = sys.argv[1]
    spark = get_spark("ab_fielded", cores=32)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    keep = docs.filter(F.col("lang") == LANG).select("doc_id")
    eng = Engine(spark, idx, cfg)
    eng.search("warm up run", k=10).collect()
    eng.search(QUERY, k=10, fields={"lang": LANG}).collect()

    for rep in range(4):
        t0 = time.perf_counter()
        a_rows = eng.search(QUERY, k=10, fields={"lang": LANG}).collect()
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        b_rows = eng.search_filtered(QUERY, keep, k=10).collect()
        b = time.perf_counter() - t0
        assert ([(r["doc_id"], round(r["score"], 9)) for r in a_rows]
                == [(r["doc_id"], round(r["score"], 9)) for r in b_rows])
        print(json.dumps({"rep": rep, "fielded_s": round(a, 4),
                          "keep_list_s": round(b, 4),
                          "speedup": round(b / a, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
