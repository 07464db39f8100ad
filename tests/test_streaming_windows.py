"""Streaming windowed aggregation == its batch twin on the same data."""

import pytest
from pyspark.sql import functions as F

from hora_spark.streaming.windows import stream_windowed_counts, windowed_counts_batch


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "ev")
    events.write.mode("overwrite").parquet(src)

    q = stream_windowed_counts(spark, src, str(tmp_path / "ck"),
                               query_name="wc_test")
    q.awaitTermination(180)
    got = {
        (r["w_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM wc_test").collect()
    }
    want = {
        (r["w_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_counts_batch(events).collect()
    }
    assert got == want
    assert len(want) > 0
