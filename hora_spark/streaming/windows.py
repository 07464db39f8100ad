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
):
    """readStream over a directory of event parquet → watermarked windowed
    counts → in-memory sink (complete mode), availableNow trigger.

    Watermark semantics: events later than `watermark` behind the max seen
    ts are dropped from their window — the state store stays bounded, the
    requirement for running this over an unbounded 100 TB event stream.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
