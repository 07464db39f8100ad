"""Index build: tf table → doc-range-sharded compressed segment table.

The `build()` analog (/root/reference/src/core/ann_index.rs:30). Where hora
freezes added rows into an in-memory graph/codebook under per-row locks
(HNSW batch_construct, /root/reference/src/index/hnsw_idx.rs:464-476), the
distributed build is a pure dataflow — posting merge is associative, so the
lock-protected shared mutation disappears entirely:

  ONE Arrow tokenize pass (map-side tf, no explode shuffle)
  → tf_staged parquet, hive-partitioned by shard   [checkpoint]
  → stats (term df/idf) + norms derived FROM the staged columns
  → per wave of shards: groupBy(shard) → vectorized encode:
        per-term delta gaps with reduceat block maxima — one numpy pass
        over the whole shard, the per-block loop is 3 cheap ops
  → segments rows + per-shard lineage row appended to the snapshot

Design notes for 10^12 turns:
- segments store per-block max TF-SATURATION (idf-free); the query side
  multiplies by idf. This removes the vocabulary-sized idf join from the
  build entirely (the ADC-LUT analog /root/reference/src/index/
  pq_idx.rs:170-179 moves to query setup, where it is query-sized).
- shard_id = doc_id // shard_size with n_shards fixed by CONFIG, not core
  count → segment bytes identical at any parallelism (SURVEY §4 row 10).
  Doc-range sharding is simultaneously the hot-term salting: a hot term's
  postings split across all shards (the range form of
  BASELINE.json:north_star's salted repartition-by-term), and the same
  shape as IVFPQ's inverted lists (/root/reference/src/index/
  pq_idx.rs:357-437).
- resume (north_rule): waves commit segments + lineage; a restarted build
  anti-joins completed seg_ids — the partial, idempotent upgrade of hora's
  monolithic dump/load (/root/reference/src/index/hnsw_idx.rs:647-719).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig
from hora_spark.functions.codec import encode_block
from hora_spark.operators.corpus import Corpus
from hora_spark.sources.storage import SnapshotStore

SEGMENT_SCHEMA = (
    "shard_id int, term string, df_local long, "
    "doc_blocks array<binary>, tf_blocks array<binary>, "
    "block_last array<long>, block_n array<int>, block_max array<double>, "
    "encode_us long"
)
# the per-shard doc-length sidecar rides INSIDE the segments table as one
# reserved-term row per shard (doc ids delta-packed in doc_blocks[0], dls
# fixed-width packed in tf_blocks[0]). \x00 cannot appear in a real token
# ([a-z0-9]+), the row sorts first, and queries add it to the term filter —
# one scan serves postings AND norms, no extra table, no cogroup shuffle.
NORMS_TERM = "\x00norms"
NORMS_SCHEMA = "shard_id int, doc_ids binary, dls array<int>"  # legacy (merge path)
LINEAGE_COLS = [
    "build_id", "seg_id", "term_lo", "term_hi", "n_terms",
    "doc_count", "bytes", "wall_time_s",
]

_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _pack_blocks(values: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                 widths: np.ndarray) -> list[bytes]:
    """Per-block fixed-width packing; the only per-block Python is slicing
    + tobytes (C calls)."""
    return [
        bytes([w]) + values[s:e].astype(_DTYPES[w]).tobytes()
        for s, e, w in zip(starts, ends, widths)
    ]


def _width_of(maxvals: np.ndarray) -> np.ndarray:
    return np.select(
        [maxvals < (1 << 8), maxvals < (1 << 16), maxvals < (1 << 32)],
        [1, 2, 4], default=8,
    ).astype(np.int64)


def _encode_shard(pdf: pd.DataFrame, block_size: int, k1: float, b: float, avgdl: float) -> pd.DataFrame:
    """One shard's tf rows → one segment row per term. Single numpy pass:
    gaps/widths/block-maxima via sort + reduceat; per-block loop is 3 ops."""
    t0 = time.perf_counter()
    if not len(pdf):
        return pd.DataFrame({c: [] for c in (
            "shard_id", "term", "df_local", "doc_blocks", "tf_blocks",
            "block_last", "block_n", "block_max", "encode_us")})
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["term"].to_numpy()))
    terms = pdf["term"].to_numpy()[order]
    doc_ids = pdf["doc_id"].to_numpy(np.int64)[order]
    tfs = pdf["tf"].to_numpy(np.int64)[order]
    dls = pdf["dl"].to_numpy(np.float64)[order]
    n = len(terms)
    # idf-free per-posting saturation (block_max stores its per-block max)
    sat = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))

    uniq, t_starts = np.unique(terms, return_index=True)
    t_ends = np.append(t_starts[1:], n)
    # delta gaps with per-term reset; block bases = previous block's last
    # doc, so the plain diff IS the first gap of every non-first block
    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[t_starts] = doc_ids[t_starts]

    # block boundaries: every block_size-th posting within each term
    term_of_row = np.repeat(np.arange(len(uniq)), t_ends - t_starts)
    pos_in_term = np.arange(n) - t_starts[term_of_row]
    b_starts = np.flatnonzero(pos_in_term % block_size == 0)
    b_ends = np.append(b_starts[1:], n)
    b_term = term_of_row[b_starts]

    gap_max = np.maximum.reduceat(gaps, b_starts)
    tf_max = np.maximum.reduceat(tfs, b_starts)
    sat_max = np.maximum.reduceat(sat, b_starts)
    gw = _width_of(gap_max)
    tw = _width_of(tf_max)
    doc_blocks = _pack_blocks(gaps, b_starts, b_ends, gw)
    tf_blocks = _pack_blocks(tfs, b_starts, b_ends, tw)
    block_last = doc_ids[b_ends - 1]
    block_n = (b_ends - b_starts).astype(np.int32)

    # assemble one row per term: blocks of term i are the contiguous run
    # of block indices whose b_term == i
    tb_starts = np.searchsorted(b_term, np.arange(len(uniq)), side="left")
    tb_ends = np.searchsorted(b_term, np.arange(len(uniq)), side="right")
    shard_id = int(pdf["shard_id"].iloc[0])
    rows = {
        "shard_id": np.full(len(uniq), shard_id, np.int32),
        "term": uniq,
        "df_local": (t_ends - t_starts).astype(np.int64),
        "doc_blocks": [doc_blocks[s:e] for s, e in zip(tb_starts, tb_ends)],
        "tf_blocks": [tf_blocks[s:e] for s, e in zip(tb_starts, tb_ends)],
        "block_last": [block_last[s:e].tolist() for s, e in zip(tb_starts, tb_ends)],
        "block_n": [block_n[s:e].tolist() for s, e in zip(tb_starts, tb_ends)],
        "block_max": [sat_max[s:e].tolist() for s, e in zip(tb_starts, tb_ends)],
        "encode_us": np.zeros(len(uniq), np.int64),
    }
    out = pd.DataFrame(rows)

    # norms row: unique (doc_id, dl) of this shard, sorted by doc_id
    nd = pdf.drop_duplicates("doc_id").sort_values("doc_id", kind="mergesort")
    nids = nd["doc_id"].to_numpy(np.int64)
    ndls = nd["dl"].to_numpy(np.int64)
    norms_row = pd.DataFrame({
        "shard_id": [np.int32(shard_id)],
        "term": [NORMS_TERM],
        "df_local": [len(nids)],
        "doc_blocks": [[encode_block(nids, base=0, delta=True)]],
        "tf_blocks": [[encode_block(ndls, delta=False)]],
        "block_last": [[]],
        "block_n": [[len(nids)]],
        "block_max": [[]],
        "encode_us": [0],
    })
    out = pd.concat([norms_row, out], ignore_index=True)
    out.loc[0, "encode_us"] = int((time.perf_counter() - t0) * 1e6)
    return out


def _encode_norms(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-shard doc-length sidecar: sorted doc_ids (delta packed) + dl
    array. Input rows are (shard_id, doc_id, dl), possibly duplicated per
    term — dedup here (cheaper than a distinct shuffle upstream)."""
    pdf = pdf.drop_duplicates("doc_id").sort_values("doc_id", kind="mergesort")
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

    stage_tf = waves > 1  # single-wave builds skip the tf materialization:
    # their resume is a clean rebuild anyway (nothing partial to save), so
    # the big staged write is pure overhead for them

    if resume and store.exists("tf_staged"):
        meta = store.meta()
        shard_size = int(meta["shard_size"])
        tf_staged = store.read("tf_staged")
    else:
        # ---- stage 1: ONE tokenize pass → sharded tf (staged on disk for
        # multi-wave builds; kept as the persisted DataFrame otherwise) ----
        max_id = int(corpus.tf.agg(F.max("doc_id")).collect()[0][0])
        shard_size = max(1, (max_id + n_shards) // n_shards)
        tf_sharded = corpus.tf.withColumn(
            "shard_id", (F.col("doc_id") / F.lit(shard_size)).cast("int")
        )
        updates = {}
        if stage_tf:
            updates["tf_staged"] = [
                store.write_table("tf_staged", tf_sharded, partition_by=["shard_id"])
            ]
        updates["stats"] = [store.write_table("stats", corpus.term_stats)]
        store.commit(
            updates,
            meta={
                "n_docs": corpus.n_docs,
                "avgdl": corpus.avgdl,
                "shard_size": shard_size,
                "n_shards": n_shards,
                "build_id": build_id,
                "next_doc_id": max_id + 1,
                "bm25": {"k1": k1, "b": b},
            },
        )
        tf_staged = store.read("tf_staged") if stage_tf else tf_sharded

    avgdl = float(store.meta()["avgdl"])

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
        # lineage from the committed files themselves (exact byte counts);
        # the inline norms rows are bookkeeping, not index content
        seg_back = spark.read.parquet(d_seg).filter(F.col("term") != NORMS_TERM)
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
