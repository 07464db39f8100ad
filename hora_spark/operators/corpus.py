"""Corpus preparation: text table → docs / tf / stats DataFrames.

The analog of hora's add/madd ingestion (/root/reference/src/core/
ann_index.rs:36-59): rows are buffered (here: a DataFrame of raw text) and
`build` freezes them into searchable structures. `init_item` there assigns
the internal id as insertion order (/root/reference/src/index/
hnsw_idx.rs:441-462); here doc_id is a dense rank over the stable sort key
(conv_id, turn_idx) — computed WITHOUT a single-partition window:

    repartitionByRange(key) → sortWithinPartitions(key)
    → count rows per partition (one cheap pass)
    → broadcast cumulative offsets → mapInPandas adds offset + local index

This is order-deterministic regardless of the sampled range boundaries
(ranges are disjoint and each partition is sorted, so the global order —
and therefore every doc_id — is the same at any parallelism), which is the
"doc_id stable across runs and across parallelism levels" invariant.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hora_spark.config import BM25Config, EngineConfig
from hora_spark.functions.bm25 import idf_col
from hora_spark.functions.tokenize import tokenize_udf, tokens_col


def assign_doc_ids(df: DataFrame, order_cols: list[str], partitions: int | None = None) -> DataFrame:
    """Add a dense, 0-based `doc_id` following the global order of
    `order_cols`. Scalable two-pass zip-with-index (no global window)."""
    sc_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(sc_parts, *cols).sortWithinPartitions(*cols)

    # pass 1: rows per physical partition (cheap: count only)
    counts = ranged.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(1 for _ in it))]
    ).collect()
    offsets = {}
    acc = 0
    for i, n in sorted(counts):
        offsets[i] = acc
        acc += n
    b_offsets = df.sparkSession.sparkContext.broadcast(offsets)

    def zip_index(pidx, it):
        off = b_offsets.value.get(pidx, 0)
        for j, row in enumerate(it):
            yield (*row, off + j)

    schema = ranged.schema.add("doc_id", "long", False)
    return ranged.sparkSession.createDataFrame(
        ranged.rdd.mapPartitionsWithIndex(zip_index), schema
    )


@dataclass
class Corpus:
    """Frozen corpus tables. docs/tf are DataFrames; n_docs/avgdl are the
    broadcast-sized stats (hora analog: nodes_size/dimension metadata,
    /root/reference/src/core/ann_index.rs:105,118-120)."""

    docs: DataFrame        # doc_id, dl (+ passthrough id cols)
    tf: DataFrame          # doc_id, term, tf, dl
    term_stats: DataFrame  # term, df, idf
    n_docs: int
    avgdl: float


def prepare(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    order_cols: list[str] | None = None,
    cfg: EngineConfig | None = None,
    use_pandas_udf: bool = True,
) -> Corpus:
    """text table → Corpus. If id_col is None, assigns doc_id by dense rank
    over order_cols. Rows with NULL/empty text are dropped (counted policy —
    the non-panicking version of /root/reference/src/core/node.rs:158-166)."""
    cfg = cfg or EngineConfig()
    tok: Column = tokenize_udf(F.col(text_col)) if use_pandas_udf else tokens_col(F.col(text_col))

    if id_col is None:
        df = assign_doc_ids(df, order_cols or ["conv_id", "turn_idx"])
        id_col = "doc_id"
    base = df.withColumn("terms", tok).withColumn("dl", F.size("terms"))
    base = base.filter(F.col("dl") > 0)

    docs = base.select(F.col(id_col).alias("doc_id"), "dl")
    tf = (
        base.select(F.col(id_col).alias("doc_id"), "dl", F.explode("terms").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats_row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n"]), float(stats_row["avgdl"])

    term_stats = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))  # tf rows are unique per (doc, term)
        .withColumn("idf", idf_col(F.lit(n_docs), F.col("df"), cfg.bm25))
    )
    return Corpus(docs=docs, tf=tf, term_stats=term_stats, n_docs=n_docs, avgdl=avgdl)
