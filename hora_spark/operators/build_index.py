"""Index build: transcripts/text table → doc-range-sharded compressed
segment table, in ONE data pass.

The `build()` analog (/root/reference/src/core/ann_index.rs:30). Where hora
freezes added rows into an in-memory graph/codebook under per-row locks
(HNSW batch_construct, /root/reference/src/index/hnsw_idx.rs:464-476), the
distributed build is a pure dataflow — posting merge is associative, so the
lock-protected shared mutation disappears entirely.

Hot-path shape (single-wave default; NO persist/cache anywhere — local-mode
cache builds were measured to cost more than the compute they save, and on
a real cluster they'd pressure executor storage memory for no reuse):

  assign doc ids (range shuffle, parquet-staged once)
  → Arrow tokenize+tf pass (map-side tf, no explode shuffle)
  → groupBy(shard) [the ONE heavy shuffle] → vectorized encode → write
  → metadata jobs over the WRITTEN segment parquet with the blob columns
    pruned: corpus stats (N, avgdl from the inline norms rows), term df/idf
    table, per-shard lineage — then one snapshot commit.

The block bounds stored are avgdl-FREE: per block, max tf and min dl. The
query-time upper bound idf·sat(tf_max, dl_min) dominates idf·sat(tf, dl)
for every doc in the block (sat rises with tf, falls with dl), so WAND
pruning stays exact while the build needs NO global statistic — that is
what collapses the build to one pass. (The reference's analogous move is
PQ precomputing LUT pieces that combine at query time,
/root/reference/src/index/pq_idx.rs:165-194.)

Sharding: shard_id = doc_id // shard_size with n_shards fixed by CONFIG,
not core count → segment bytes identical at any parallelism (SURVEY §4 row
10). Doc-range sharding is simultaneously the hot-term salting: a hot
term's postings split across all shards (the range form of the north_star's
salted repartition-by-term), the same shape as IVFPQ's inverted lists
(/root/reference/src/index/pq_idx.rs:357-437).

Resume (north_rule): multi-wave builds stage the tf table as parquet and
commit segments + lineage per wave; a restarted build anti-joins completed
seg_ids — the partial, idempotent upgrade of hora's monolithic dump/load
(/root/reference/src/index/hnsw_idx.rs:647-719).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig
from hora_spark.functions.bm25 import idf_col
from hora_spark.functions.codec import encode_block
from hora_spark.operators.corpus import assign_doc_ids, tf_map_side
from hora_spark.sources.storage import SnapshotStore

SEGMENT_SCHEMA = (
    "shard_id int, term string, df_local long, "
    "doc_blocks array<binary>, tf_blocks array<binary>, "
    "block_last array<long>, block_n array<int>, "
    "block_tf_max array<long>, block_dl_min array<int>, "
    "encode_us long"
)
# the per-shard doc-length sidecar rides INSIDE the segments table as one
# reserved-term row per shard (doc ids delta-packed in doc_blocks[0], dls
# fixed-width packed in tf_blocks[0], Σdl in block_tf_max[0]). \x00 cannot
# appear in a real token ([a-z0-9]+), and queries add it to the term filter
# — one scan serves postings AND norms; corpus stats (N, avgdl) aggregate
# from these rows with the blob columns pruned.
NORMS_TERM = "\x00norms"
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


def _encode_shard(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """One shard's tf rows → one segment row per term (+ the norms row).
    Single numpy pass: gaps/widths/block bounds via lexsort + reduceat;
    the per-block loop is slice+tobytes."""
    t0 = time.perf_counter()
    cols = ("shard_id", "term", "df_local", "doc_blocks", "tf_blocks",
            "block_last", "block_n", "block_tf_max", "block_dl_min", "encode_us")
    if not len(pdf):
        return pd.DataFrame({c: [] for c in cols})
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["term"].to_numpy()))
    terms = pdf["term"].to_numpy()[order]
    doc_ids = pdf["doc_id"].to_numpy(np.int64)[order]
    tfs = pdf["tf"].to_numpy(np.int64)[order]
    dls = pdf["dl"].to_numpy(np.int64)[order]
    n = len(terms)

    uniq, t_starts = np.unique(terms, return_index=True)
    t_ends = np.append(t_starts[1:], n)
    # delta gaps with per-term reset; block bases = previous block's last
    # doc, so the plain diff IS the first gap of every non-first block
    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[t_starts] = doc_ids[t_starts]

    term_of_row = np.repeat(np.arange(len(uniq)), t_ends - t_starts)
    pos_in_term = np.arange(n) - t_starts[term_of_row]
    b_starts = np.flatnonzero(pos_in_term % block_size == 0)
    b_ends = np.append(b_starts[1:], n)
    b_term = term_of_row[b_starts]

    gap_max = np.maximum.reduceat(gaps, b_starts)
    tf_max = np.maximum.reduceat(tfs, b_starts)
    dl_min = np.minimum.reduceat(dls, b_starts)
    doc_blocks = _pack_blocks(gaps, b_starts, b_ends, _width_of(gap_max))
    tf_blocks = _pack_blocks(tfs, b_starts, b_ends, _width_of(tf_max))
    block_last = doc_ids[b_ends - 1]
    block_n = (b_ends - b_starts).astype(np.int32)

    tb_starts = np.searchsorted(b_term, np.arange(len(uniq)), side="left")
    tb_ends = np.searchsorted(b_term, np.arange(len(uniq)), side="right")
    shard_id = int(pdf["shard_id"].iloc[0])
    out = pd.DataFrame({
        "shard_id": np.full(len(uniq), shard_id, np.int32),
        "term": uniq,
        "df_local": (t_ends - t_starts).astype(np.int64),
        "doc_blocks": [doc_blocks[s:e] for s, e in zip(tb_starts, tb_ends)],
        "tf_blocks": [tf_blocks[s:e] for s, e in zip(tb_starts, tb_ends)],
        "block_last": [block_last[s:e].tolist() for s, e in zip(tb_starts, tb_ends)],
        "block_n": [block_n[s:e].tolist() for s, e in zip(tb_starts, tb_ends)],
        "block_tf_max": [tf_max[s:e].tolist() for s, e in zip(tb_starts, tb_ends)],
        "block_dl_min": [dl_min[s:e].astype(np.int32).tolist() for s, e in zip(tb_starts, tb_ends)],
        "encode_us": np.zeros(len(uniq), np.int64),
    })

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
        "block_tf_max": [[int(ndls.sum())]],   # Σdl → avgdl aggregates free
        "block_dl_min": [[]],
        "encode_us": [0],
    })
    out = pd.concat([norms_row, out], ignore_index=True)
    out.loc[0, "encode_us"] = int((time.perf_counter() - t0) * 1e6)
    return out


def _commit_stats_and_lineage(
    spark: SparkSession,
    store: SnapshotStore,
    seg_dirs: list[str],
    cfg: EngineConfig,
    build_id: str,
    wall_by_dir: dict[str, float],
    extra_meta: dict,
) -> None:
    """Metadata pass over the written segment parquet (blob columns pruned
    by column projection): corpus stats + term idf table + lineage."""
    seg_meta = None
    for d in seg_dirs:
        part = spark.read.parquet(d).select(
            "shard_id", "term", "df_local", "block_tf_max",
            "doc_blocks", "tf_blocks",
        ).withColumn("_dir", F.lit(d))
        seg_meta = part if seg_meta is None else seg_meta.unionByName(part)

    norms = seg_meta.filter(F.col("term") == NORMS_TERM)
    row = norms.agg(
        F.sum("df_local").alias("n_docs"),
        F.sum(F.element_at("block_tf_max", 1)).alias("sum_dl"),
    ).collect()[0]
    n_docs = int(row["n_docs"] or 0)
    avgdl = float(row["sum_dl"]) / n_docs if n_docs else 1.0

    terms = seg_meta.filter(F.col("term") != NORMS_TERM)
    term_stats = (
        terms.groupBy("term")
        .agg(F.sum("df_local").alias("df"))
        .withColumn("idf", idf_col(F.lit(n_docs), F.col("df"), cfg.bm25))
    )
    d_stats = store.write_table("stats", term_stats.sortWithinPartitions("term"))

    blob_len = (
        F.aggregate(F.transform("doc_blocks", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
        + F.aggregate(F.transform("tf_blocks", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
    )
    lineage = (
        terms.groupBy("shard_id", "_dir")
        .agg(
            F.min("term").alias("term_lo"),
            F.max("term").alias("term_hi"),
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df_local").alias("doc_count"),
            F.sum(blob_len).alias("bytes"),
        )
        .withColumn("build_id", F.lit(build_id))
        .withColumn("seg_id", F.col("shard_id"))
        .withColumn("wall_time_s", F.udf(lambda d: wall_by_dir.get(d, 0.0), "double")("_dir"))
        .select(*LINEAGE_COLS)
    )
    d_lin = store.stage_dir("lineage")
    lineage.write.mode("overwrite").parquet(d_lin)
    # replace: stats and lineage are recomputed in full from the final
    # segment set (mid-build wave commits only carried resume stubs)
    store.commit(
        {"stats": [d_stats], "lineage": [d_lin]},
        replace=True,
        meta={"n_docs": n_docs, "avgdl": avgdl, "build_id": build_id, **extra_meta},
    )


def build_index(
    spark: SparkSession,
    df: DataFrame,
    store: SnapshotStore,
    text_col: str = "text",
    id_col: str | None = None,
    order_cols: list[str] | None = None,
    cfg: EngineConfig | None = None,
    build_id: str = "build-0",
    waves: int = 1,
    resume: bool = False,
    fail_after_wave: int | None = None,
) -> dict:
    """Full index build. waves>1 stages the tf table and commits segments +
    lineage per wave (crash-resumable); waves=1 is the one-pass hot path.

    fail_after_wave: test hook — raise after committing that many waves,
    simulating a mid-build crash (resume fixture, FIXTURES.md §5).
    """
    cfg = cfg or EngineConfig()
    n_shards = cfg.index.n_buckets

    done_segs: set[int] = set()
    if resume and store.exists("lineage"):
        done_segs = {
            int(r["seg_id"]) for r in store.read("lineage").select("seg_id").distinct().collect()
        }

    if resume and store.exists("tf_staged"):
        meta = store.meta()
        shard_size = int(meta["shard_size"])
        max_id = int(meta["max_doc_id"])
        tf_sharded = store.read("tf_staged")
        staged = True
    else:
        # ---- ids + shard size (no tokenize needed) ------------------------
        if id_col is None:
            df, n_raw = assign_doc_ids(
                df, order_cols or ["conv_id", "turn_idx"], with_count=True,
                staging_dir=store.stage_dir("ingest"),
            )
            id_col = "doc_id"
            max_id = n_raw - 1
        else:
            max_id = int(df.agg(F.max(id_col)).collect()[0][0])
        shard_size = max(1, (max_id + n_shards) // n_shards)

        # ---- ONE tokenize pass → sharded tf -------------------------------
        tf = tf_map_side(df, text_col, id_col).withColumnRenamed(id_col, "doc_id")
        tf_sharded = tf.withColumn(
            "shard_id", (F.col("doc_id") / F.lit(shard_size)).cast("int")
        )
        staged = waves > 1
        if staged:
            d_tf = store.write_table("tf_staged", tf_sharded, partition_by=["shard_id"])
            store.commit({"tf_staged": [d_tf]},
                         meta={"shard_size": shard_size, "max_doc_id": max_id})
            tf_sharded = store.read("tf_staged")

    # ---- encode waves -------------------------------------------------------
    all_shards = [s for s in range(n_shards) if s not in done_segs]
    wave_size = max(1, -(-len(all_shards) // max(waves, 1)))
    block_size = cfg.index.block_size
    seg_dirs: list[str] = []
    wall_by_dir: dict[str, float] = {}
    waves_done = 0
    for w0 in range(0, len(all_shards), wave_size):
        wave_shards = all_shards[w0: w0 + wave_size]
        t0 = time.perf_counter()
        part = tf_sharded
        if len(wave_shards) < n_shards:
            part = part.filter(F.col("shard_id").isin(wave_shards))
        segs = part.groupBy("shard_id").applyInPandas(
            lambda pdf: _encode_shard(pdf, block_size), SEGMENT_SCHEMA
        )
        d_seg = store.stage_dir("segments")
        segs.write.mode("overwrite").partitionBy("shard_id").parquet(d_seg)
        wall_by_dir[d_seg] = time.perf_counter() - t0
        seg_dirs.append(d_seg)
        if staged:  # per-wave checkpoint only matters when tf is reusable
            lineage_stub = spark.createDataFrame(
                [(build_id, int(s), "", "", 0, 0, 0, wall_by_dir[d_seg]) for s in wave_shards],
                "build_id string, seg_id int, term_lo string, term_hi string, "
                "n_terms long, doc_count long, bytes long, wall_time_s double",
            )
            d_lin = store.stage_dir("lineage")
            lineage_stub.write.mode("overwrite").parquet(d_lin)
            store.commit({"segments": [d_seg], "lineage": [d_lin]}, replace=False)
        waves_done += 1
        if fail_after_wave is not None and waves_done >= fail_after_wave:
            raise RuntimeError(f"injected failure after wave {waves_done}")

    if not staged and seg_dirs:
        store.commit({"segments": seg_dirs}, replace=False)

    # ---- metadata: stats + real lineage + meta (one pruned read) -----------
    all_seg_dirs = store.tables().get("segments", [])
    _commit_stats_and_lineage(
        spark, store, all_seg_dirs, cfg, build_id, wall_by_dir,
        extra_meta={
            "shard_size": shard_size,
            "n_shards": n_shards,
            "max_doc_id": max_id,
            "next_doc_id": max_id + 1,
            "bm25": {"k1": cfg.bm25.k1, "b": cfg.bm25.b},
        },
    )
    return {
        "build_id": build_id,
        "version": store.current_version(),
        "n_shards": n_shards,
        "shards_built": len(all_shards),
        "shards_skipped": len(done_segs),
    }
