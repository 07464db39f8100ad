"""Score explanation — the Lucene `Explanation` / Elasticsearch
`_explain` analog for the BM25 engine: for a query and a set of doc
ids, return every per-(doc, term) scoring component (tf, dl, idf, the
saturated contribution) plus the doc's total score, straight from the
SAME stored postings the search path decodes (hora exposes per-node
distances on request, e.g. `node_search_k_with_distance`; this is the
decomposed-score equivalent for the BM25 recast).

Plan shape (audited in PLANS.md):
  stats lookup (pushed-down term IN, query-sized collect — shared idf
  cache with search)
  → ONE segment scan WHERE term IN (query terms) AND shard_id IN
    (requested docs' shards): both predicates reach the parquet scan,
    so a 5-doc explain on a 500k-shard index touches ≤ 5 shards' files
    regardless of corpus size
  → per shard: binary-search each requested doc's block (block_last is
    the per-block doc-id fence), decode ONLY those blocks, emit the
    matched (doc_id, term, tf, dl) rows
  → JVM side: contribution = idf · tf/(tf + k1·(1−b + b·dl/avgdl)),
    total per doc via a window sum — all built-in Column expressions.

Explain reads the stored postings as-is: tombstoned docs still explain
(it is a debugging view of index content); callers normally pass doc
ids that came out of `search`, which already excludes them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig
from hora_spark.functions.codec import decode_block
from hora_spark.functions.tokenize import tokenize_py
from hora_spark.functions.wand import TermPosting
from hora_spark.operators.segments import NORMS_TERM
from hora_spark.sources.storage import SnapshotStore

_DETAIL_SCHEMA = "doc_id long, term string, tf long, dl long"

_EMPTY_DETAIL = pd.DataFrame(
    {"doc_id": pd.Series([], dtype=np.int64),
     "term": pd.Series([], dtype=object),
     "tf": pd.Series([], dtype=np.int64),
     "dl": pd.Series([], dtype=np.int64)}
)


def _shard_explain(seg_pdf: pd.DataFrame, targets: np.ndarray,
                   terms: set) -> pd.DataFrame:
    """One shard's segment rows for the query terms → the requested
    docs' (doc_id, term, tf, dl) rows. Only blocks whose doc-id fence
    brackets a requested id are decoded (searchsorted over block_last);
    merge-on-read append deltas are extra independent sources — each doc
    lives in exactly one, so no dedup is needed."""
    is_norms = seg_pdf["term"] == NORMS_TERM
    norms_pdf = seg_pdf[is_norms]
    seg_pdf = seg_pdf[~is_norms]
    if len(seg_pdf) == 0:
        return _EMPTY_DETAIL
    dl_lookup = None
    if any(len(r) == 0 for r in seg_pdf["dl_blocks"]):
        ids_all, dls_all = [], []
        for row in norms_pdf.itertuples(index=False):
            ids_all.append(decode_block(bytes(row.doc_blocks[0]), base=0,
                                        delta=True))
            dls_all.append(decode_block(bytes(row.tf_blocks[0]), delta=False))
        nids = np.concatenate(ids_all)
        ndls = np.concatenate(dls_all).astype(np.float64)
        order = np.argsort(nids, kind="mergesort")
        dl_lookup = (nids[order], ndls[order])

    out_d, out_t, out_tf, out_dl = [], [], [], []
    for row in seg_pdf.itertuples(index=False):
        if row.term not in terms:
            continue
        tp = TermPosting(0.0, row.doc_blocks, row.tf_blocks, row.dl_blocks,
                         row.block_last, np.zeros(len(row.block_last)),
                         dl_lookup=dl_lookup)
        if not len(tp.block_last):
            continue
        # block j holds ids in [block_start[j], block_last[j]]
        j_of = np.searchsorted(tp.block_last, targets)
        ok = j_of < len(tp.block_last)
        for j in np.unique(j_of[ok]):
            want = targets[ok & (j_of == j)]
            ids, tfs, dls = tp.decode(int(j))
            pos = np.searchsorted(ids, want)
            hit = pos < len(ids)
            hit[hit] &= ids[np.minimum(pos, len(ids) - 1)][hit] == want[hit]
            if not hit.any():
                continue
            sel = pos[hit]
            out_d.append(ids[sel])
            out_t.extend([row.term] * int(hit.sum()))
            out_tf.append(tfs[sel])
            out_dl.append(dls[sel])
    if not out_d:
        return _EMPTY_DETAIL
    return pd.DataFrame({
        "doc_id": np.concatenate(out_d).astype(np.int64),
        "term": out_t,
        "tf": np.concatenate(out_tf).astype(np.int64),
        "dl": np.concatenate(out_dl).astype(np.int64),
    })


def explain_scores(
    spark: SparkSession,
    store: SnapshotStore,
    query: str,
    doc_ids,
    cfg: EngineConfig | None = None,
    version: int | None = None,
    idf_cache: dict | None = None,
) -> DataFrame:
    """DataFrame(doc_id, term, tf, dl, idf, contrib, score): one row per
    (requested doc, matched query term), contrib = that term's BM25
    summand, score = the doc's total (= `search`'s score for the same
    snapshot), idf/contrib/score rounded to 6dp; ordered
    (doc_id, contrib DESC, term). Docs matching no query term emit no
    rows (a matched-nothing explain is empty, like Lucene's
    `NON-MATCH` explanation carrying no clauses)."""
    cfg = cfg or EngineConfig()
    meta = store.meta(version)
    if "avgdl" not in meta:
        raise FileNotFoundError(
            f"no built index at {store.root!r}: run build first")
    avgdl = float(meta["avgdl"])
    k1, b = cfg.bm25.k1, cfg.bm25.b
    shard_size = int(meta["shard_size"])
    uni = bool(meta.get("unicode", False))

    targets = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    terms = sorted(set(tokenize_py(query, unicode=uni)))
    if len(targets) == 0 or not terms:
        return spark.createDataFrame([], _DETAIL_SCHEMA + ", idf double, "
                                         "contrib double, score double")

    cache = idf_cache if idf_cache is not None else {}
    missing = [t for t in terms if t not in cache]
    if missing:
        from hora_spark.operators.query import _idf_lookup

        _idf_lookup(store, version, cache, cfg, missing)
    idf_map = {t: cache[t] for t in terms if cache[t] is not None}
    if not idf_map:
        return spark.createDataFrame([], _DETAIL_SCHEMA + ", idf double, "
                                         "contrib double, score double")
    live = sorted(idf_map)

    shards = sorted({int(d) for d in targets // shard_size})
    scan_terms = list(live)
    if not bool(meta.get("store_dl", True)):
        scan_terms.append(NORMS_TERM)
    segs = (
        store.read("segments", version)
        .filter(F.col("term").isin(scan_terms)
                & F.col("shard_id").isin(shards))
        .select("shard_id", "term", "doc_blocks", "tf_blocks", "dl_blocks",
                "block_last")
    )
    b_targets = spark.sparkContext.broadcast(targets)
    live_set = set(live)

    def run(seg_pdf: pd.DataFrame) -> pd.DataFrame:
        return _shard_explain(seg_pdf, b_targets.value, live_set)

    detail = segs.groupBy("shard_id").applyInPandas(run, _DETAIL_SCHEMA)

    idf_col = F.lit(None).cast("double")
    for t in live:  # ≤ |query terms| chained branches — query-sized
        idf_col = F.when(F.col("term") == t, F.lit(idf_map[t])).otherwise(idf_col)
    sat = F.col("tf") / (F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    w = Window.partitionBy("doc_id")
    return (
        detail.withColumn("idf", idf_col)
        .withColumn("_c", F.col("idf") * sat)
        .withColumn("score", F.round(F.sum("_c").over(w), 6))
        .withColumn("contrib", F.round("_c", 6))
        .withColumn("idf", F.round("idf", 6))
        .select("doc_id", "term", "tf", "dl", "idf", "contrib", "score")
        .orderBy("doc_id", F.desc("contrib"), "term")
    )
