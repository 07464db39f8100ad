"""Structured Streaming windowed aggregations over the events stream.

The reference is batch-only (closest is post-build incremental add,
/root/reference/src/index/hnsw_idx.rs:498-521 — covered by
streaming/incremental.py); these operators are the engine's stream-side
surface for the training-data pipeline: event-time windowed counts with
watermarked late-data handling, expressed entirely in built-in functions
so the stateful aggregation runs in the JVM state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_batch(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of the streaming aggregation — same expressions, used as
    the oracle in tests (and by the driver contract)."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    schema: str = EVENT_SCHEMA,
    query_name: str = "windowed_counts",
    sink_dir: str | None = None,
):
    """readStream over a directory of event parquet → watermarked windowed
    counts, availableNow trigger.

    sink_dir given (the PRODUCTION shape): UPDATE output mode through
    foreachBatch into parquet — each micro-batch appends only the rows it
    changed, stamped with the batch id; `read_windowed_counts` resolves
    the latest row per window key. In update mode the watermark actually
    drops late events and EVICTS finalized windows from the state store,
    which is what makes an unbounded stream runnable with bounded state.

    sink_dir=None (TEST/interactive only): memory sink in complete mode.
    Complete mode re-emits the whole result every batch and keeps ALL
    window state — the watermark does not evict and the driver-side memory
    sink grows with the result; never use it on an unbounded stream.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )
    if sink_dir is None:
        return (
            stream.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def emit(batch_df, batch_id: int) -> None:
        (batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
         .write.mode("append").parquet(sink_dir))

    return (
        stream.writeStream.outputMode("update")
        .foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_windowed_counts(spark: SparkSession, sink_dir: str):
    """Current value per (w_start, event_type) from the update-mode sink:
    the row written by the LATEST batch wins."""
    from pyspark.sql import Window as W

    df = spark.read.parquet(sink_dir)
    w = W.partitionBy("w_start", "event_type").orderBy(F.desc("_batch_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_batch_id")
    )
