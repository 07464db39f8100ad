"""Index build: tf table → doc-range-sharded compressed segment table.

The `build()` analog (/root/reference/src/core/ann_index.rs:30). Where hora
freezes added rows into an in-memory graph/codebook under per-row locks
(HNSW batch_construct, /root/reference/src/index/hnsw_idx.rs:464-476), the
distributed build is a pure dataflow — posting merge is associative, so the
lock-protected shared mutation disappears entirely:

  tf (doc_id, term, tf, dl)  [materialized parquet, partitioned by shard]
  → per wave of shards: groupBy(shard) → applyInPandas encode:
        sort by (term, doc_id); per term: delta + byte-width blocks,
        block_max = max idf·tf_sat per block  (ADC-LUT analog,
        /root/reference/src/index/pq_idx.rs:170-179)
  → segments rows + per-shard lineage row (seg_id, term range, doc count,
        bytes, wall time) appended to the snapshot  [checkpoint]

Sharding: shard_id = doc_id // shard_size, n_shards fixed by config — NOT
by core count — so segment content is bit-identical at any parallelism
(the determinism property §4 row 10 of SURVEY.md). Doc-range sharding is
simultaneously the skew treatment: a hot term's posting list is split
across all shards, which is the salting of
BASELINE.json:north_star expressed as ranges (and what makes shard-local
DAAT possible). It is the same shape as IVFPQ's inverted lists with
local→global id remapping (/root/reference/src/index/pq_idx.rs:357-437).

Resume (north_rule): the build processes shards in waves; each wave commit
appends segments + lineage. A restarted build reads lineage at the current
snapshot and skips completed seg_ids — the partial, idempotent upgrade of
hora's monolithic dump/load (/root/reference/src/index/hnsw_idx.rs:647-719).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig
from hora_spark.functions.codec import encode_block, encode_posting
from hora_spark.operators.corpus import Corpus
from hora_spark.sources.storage import SnapshotStore

SEGMENT_SCHEMA = (
    "shard_id int, term string, df_local long, "
    "doc_blocks array<binary>, tf_blocks array<binary>, "
    "block_last array<long>, block_n array<int>, block_max array<double>, "
    "encode_us long"
)
NORMS_SCHEMA = "shard_id int, doc_ids binary, dls array<int>"
LINEAGE_COLS = [
    "build_id", "seg_id", "term_lo", "term_hi", "n_terms",
    "doc_count", "bytes", "wall_time_s",
]


def _encode_shard(pdf: pd.DataFrame, block_size: int, k1: float, b: float, avgdl: float) -> pd.DataFrame:
    """One shard's tf rows → one segment row per term. Pure numpy."""
    t0 = time.perf_counter()
    pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
    terms = pdf["term"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    dls = pdf["dl"].to_numpy(np.float64)
    idfs = pdf["idf"].to_numpy(np.float64)
    # per-posting exact contribution (for block_max)
    sat = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
    contrib = idfs * sat

    uniq, starts = np.unique(terms, return_index=True)
    ends = np.append(starts[1:], len(terms))
    out = {c: [] for c in (
        "shard_id", "term", "df_local", "doc_blocks", "tf_blocks",
        "block_last", "block_n", "block_max", "encode_us",
    )}
    shard_id = int(pdf["shard_id"].iloc[0]) if len(pdf) else -1
    for term, s, e in zip(uniq, starts, ends):
        d_blocks, t_blocks, last, ns = encode_posting(doc_ids[s:e], tfs[s:e], block_size)
        # block_max over the same block slicing
        bmax = [float(contrib[s + i: s + min(i + block_size, e - s)].max())
                for i in range(0, e - s, block_size)]
        out["shard_id"].append(shard_id)
        out["term"].append(term)
        out["df_local"].append(int(e - s))
        out["doc_blocks"].append(list(d_blocks))
        out["tf_blocks"].append(list(t_blocks))
        out["block_last"].append(last.tolist())
        out["block_n"].append(ns.astype(np.int32).tolist())
        out["block_max"].append(bmax)
        out["encode_us"].append(0)
    us = int((time.perf_counter() - t0) * 1e6)
    if out["encode_us"]:
        out["encode_us"][0] = us  # one timing row per shard-group call
    return pd.DataFrame(out)


def _encode_norms(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-shard doc-length sidecar: sorted doc_ids (delta+width packed) +
    dl array. The query maps posting doc_ids → dl via searchsorted."""
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    ids = pdf["doc_id"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "shard_id": [int(pdf["shard_id"].iloc[0])],
            "doc_ids": [encode_block(ids, base=0, delta=True)],
            "dls": [pdf["dl"].to_numpy(np.int32).tolist()],
        }
    )


def build_index(
    spark: SparkSession,
    corpus: Corpus,
    store: SnapshotStore,
    cfg: EngineConfig | None = None,
    build_id: str = "build-0",
    waves: int = 1,
    resume: bool = False,
    fail_after_wave: int | None = None,
) -> dict:
    """Full index build with wave-granular checkpoint/resume.

    fail_after_wave: test hook — raise after committing that many waves,
    simulating a mid-build crash (resume fixture, FIXTURES.md §5).
    """
    cfg = cfg or EngineConfig()
    n_shards = cfg.index.n_buckets
    k1, b = cfg.bm25.k1, cfg.bm25.b

    done_segs: set[int] = set()
    if resume and store.exists("lineage"):
        done_segs = {
            int(r["seg_id"]) for r in store.read("lineage").select("seg_id").distinct().collect()
        }

    if resume and store.exists("tf_staged"):
        meta = store.meta()
        shard_size = int(meta["shard_size"])
        tf_staged = store.read("tf_staged")
    else:
        # ---- stage 1: stats + staged tf, partitioned by shard -------------
        max_id = corpus.docs.agg(F.max("doc_id")).collect()[0][0]
        shard_size = max(1, (int(max_id) + n_shards) // n_shards)
        # term_stats is vocab-sized: NOT broadcast by hand — AQE picks
        # broadcast when it is small, sort-merge when it is not
        tf_enriched = (
            corpus.tf.join(corpus.term_stats.select("term", "idf"), "term", "inner")
            .withColumn("shard_id", (F.col("doc_id") / F.lit(shard_size)).cast("int"))
        )
        d_tf = store.write_table("tf_staged", tf_enriched, partition_by=["shard_id"])
        d_stats = store.write_table("stats", corpus.term_stats)
        store.commit(
            {"tf_staged": [d_tf], "stats": [d_stats]},
            meta={
                "n_docs": corpus.n_docs,
                "avgdl": corpus.avgdl,
                "shard_size": shard_size,
                "n_shards": n_shards,
                "build_id": build_id,
                "bm25": {"k1": k1, "b": b},
            },
        )
        tf_staged = store.read("tf_staged")

    avgdl = float(store.meta()["avgdl"])

    # ---- stage 2: norms (once; idempotent overwrite) -----------------------
    if not store.exists("norms"):
        docs_sharded = corpus.docs.withColumn(
            "shard_id", (F.col("doc_id") / F.lit(shard_size)).cast("int")
        )
        norms = docs_sharded.groupBy("shard_id").applyInPandas(_encode_norms, NORMS_SCHEMA)
        d_norms = store.write_table("norms", norms)
        store.commit({"norms": [d_norms]})

    # ---- stage 3: segments in waves ----------------------------------------
    all_shards = [s for s in range(n_shards) if s not in done_segs]
    wave_size = max(1, -(-len(all_shards) // max(waves, 1)))
    waves_done = 0
    for w0 in range(0, len(all_shards), wave_size):
        wave_shards = all_shards[w0: w0 + wave_size]
        t0 = time.perf_counter()
        part = tf_staged.filter(F.col("shard_id").isin(wave_shards))
        segs = part.groupBy("shard_id").applyInPandas(
            lambda pdf: _encode_shard(pdf, cfg.index.block_size, k1, b, avgdl),
            SEGMENT_SCHEMA,
        )
        d_seg = store.stage_dir("segments")
        segs.write.mode("overwrite").partitionBy("shard_id").parquet(d_seg)
        wall = time.perf_counter() - t0
        # lineage from the committed files themselves (exact byte counts)
        seg_back = spark.read.parquet(d_seg)
        lineage = (
            seg_back.groupBy("shard_id")
            .agg(
                F.min("term").alias("term_lo"),
                F.max("term").alias("term_hi"),
                F.count(F.lit(1)).alias("n_terms"),
                F.sum("df_local").alias("doc_count"),
                F.sum(
                    F.aggregate(F.transform("doc_blocks", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
                    + F.aggregate(F.transform("tf_blocks", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
                ).alias("bytes"),
            )
            .withColumn("build_id", F.lit(build_id))
            .withColumn("seg_id", F.col("shard_id"))
            .withColumn("wall_time_s", F.lit(float(wall)))
            .select(*LINEAGE_COLS)
        )
        d_lin = store.stage_dir("lineage")
        lineage.write.mode("overwrite").parquet(d_lin)
        store.commit({"segments": [d_seg], "lineage": [d_lin]}, replace=False)
        waves_done += 1
        if fail_after_wave is not None and waves_done >= fail_after_wave:
            raise RuntimeError(f"injected failure after wave {waves_done}")

    return {
        "build_id": build_id,
        "version": store.current_version(),
        "n_shards": n_shards,
        "shards_built": len(all_shards),
        "shards_skipped": len(done_segs),
    }
