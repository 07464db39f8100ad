"""Reverse search / routing: standing queries score ARRIVING documents
(the Percolator pattern — alerting, feed routing, topic tagging). The
inverse of the index path: the query set is fixed and tiny, the doc
stream is unbounded, and no index over the stream is needed — each
micro-batch is scored against broadcast query-term stats and matches
above a threshold go to the sink exactly once.

Scoring convention: BM25 with FROZEN reference statistics (idf/avgdl
from a built index snapshot, or any corpus the caller derives them
from); an arriving doc's dl is its own token count. All JVM-side
built-ins — tokenize → explode → broadcast join → groupBy — under
whole-stage codegen; no state store is needed because routing is a pure
per-doc function (the stateful tier is sessions.py).

`route_docs` is the batch twin (same function object the stream uses),
so streaming output == batch output over the same rows by construction,
and the DuckDB oracle re-derives it in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hora_spark.config import BM25Config
from hora_spark.functions.tokenize import tokenize_py, tokens_col


def route_docs(
    df: DataFrame,
    queries: list[str],
    term_idf: dict[str, float],
    avgdl: float,
    min_score: float,
    id_cols: list[str] | None = None,
    text_col: str = "text",
    bm25: BM25Config | None = None,
    unicode: bool = False,
    sort: bool = True,
) -> DataFrame:
    """Score every row of df against every standing query; keep matches
    with score ≥ min_score. Returns id_cols + (query_id, score), score
    rounded to 6dp, ordered (query_id, score DESC, ids) unless sort=False
    (the streaming sink skips the per-batch global sort — parquet appends
    are unordered anyway).

    term_idf: frozen idf per term (union over all queries' terms is
    enough); terms missing from it contribute nothing — the same
    frozen-stats convention as post-append search."""
    bm25 = bm25 or BM25Config()
    id_cols = id_cols or ["doc_id"]
    q_terms = [sorted(set(tokenize_py(q, unicode=unicode))) for q in queries]
    rows = [(qi, t, float(term_idf[t]))
            for qi, ts in enumerate(q_terms) for t in ts if t in term_idf]
    spark = df.sparkSession
    if not rows:
        # empty result with the REAL id-column types (hardcoding long
        # would poison an append-mode sink's schema for string ids)
        from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                       StructType)

        id_fields = [df.schema[c] for c in id_cols]
        schema = StructType(id_fields + [StructField("query_id", IntegerType()),
                                         StructField("score", DoubleType())])
        return spark.createDataFrame([], schema)
    qdf = spark.createDataFrame(rows, "query_id int, term string, idf double")

    toks = tokens_col(F.col(text_col), unicode=unicode)
    base = df.select(*id_cols, toks.alias("_toks")).withColumn(
        "_dl", F.size("_toks"))
    # only standing-query terms can ever contribute (the qdf join drops
    # the rest anyway), so filter the exploded tokens BEFORE the groupBy
    # exchange: the shuffle then carries matched tokens only, not the
    # whole token stream (guide §2.3 — project/filter before the
    # exchange). _dl is the FULL token count, computed above the filter.
    live_terms = sorted({t for _, t, _ in rows})
    tf = (
        base.filter(F.col("_dl") > 0)
        .select(*id_cols, "_dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(live_terms))
        .groupBy(*id_cols, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    sat = (F.col("tf") / (F.col("tf") + bm25.k1 * (
        1.0 - bm25.b + bm25.b * F.col("_dl") / F.lit(float(avgdl)))))
    out = (
        tf.join(F.broadcast(qdf), "term")
        .withColumn("_contrib", F.col("idf") * sat)
        .groupBy(*id_cols, "query_id")
        .agg(F.round(F.sum("_contrib"), 6).alias("score"))
        .filter(F.col("score") >= min_score)
    )
    if sort:
        out = out.orderBy("query_id", F.desc("score"), *id_cols)
    return out


def stream_route(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
    queries: list[str],
    term_idf: dict[str, float],
    avgdl: float,
    min_score: float,
    schema: str,
    id_cols: list[str] | None = None,
    text_col: str = "text",
    bm25: BM25Config | None = None,
    unicode: bool = False,
):
    """readStream over document parquet → route_docs per micro-batch →
    parquet sink, written IDEMPOTENTLY: each batch lands in its own
    hive-style `batch_id=<n>` subdirectory with mode('overwrite'), so a
    replayed batch (failure between the data write and the checkpoint's
    offset commit — foreachBatch alone is only at-least-once) rewrites
    the same directory instead of appending duplicates. Checkpointed
    offsets + deterministic per-batch overwrite = exactly-once sink
    contents; `spark.read.parquet(sink_dir)` sees batch_id as a
    discovered partition column. Returns the streaming query."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = route_docs(batch_df, queries, term_idf, avgdl, min_score,
                         id_cols=id_cols, text_col=text_col, bm25=bm25,
                         unicode=unicode, sort=False)
        out.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={int(batch_id)}")

    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
