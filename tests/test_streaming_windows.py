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


def test_update_mode_durable_sink_with_watermark_eviction(spark, tmp_path):
    """The production (update-mode, foreachBatch-parquet) path: a second
    micro-batch updates an open window, opens a new one, and its
    watermark-late event is DROPPED — the state-bounding behavior complete
    mode cannot provide."""
    from datetime import datetime

    from hora_spark.streaming.windows import read_windowed_counts

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    sink = str(tmp_path / "sink")
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")

    def ev(eid, ts, typ, val):
        return (eid, datetime.fromisoformat(ts), 1, typ, val, None)

    batch1 = spark.createDataFrame([
        ev(1, "2024-01-01 10:05:00", "click", 1.0),
        ev(2, "2024-01-01 10:20:00", "click", 2.0),
        ev(3, "2024-01-01 23:50:00", "view", 5.0),   # advances the watermark
    ], schema)
    batch1.write.mode("overwrite").parquet(src)
    q = stream_windowed_counts(spark, src, ck, sink_dir=sink)
    q.awaitTermination(120)
    # watermark after batch 1 = 23:50 - 2h = 21:50

    batch2 = spark.createDataFrame([
        ev(4, "2024-01-01 23:55:00", "view", 7.0),   # updates the open window
        ev(5, "2024-01-02 00:10:00", "click", 9.0),  # new window
        ev(6, "2024-01-01 10:30:00", "click", 99.0), # window end 11:00 < 21:50 → DROPPED
    ], schema).coalesce(1)
    batch2.write.mode("append").parquet(src)
    q2 = stream_windowed_counts(spark, src, ck, sink_dir=sink)
    q2.awaitTermination(120)

    got = {
        (str(r["w_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in read_windowed_counts(spark, sink).collect()
    }
    assert got == {
        ("2024-01-01 10:00:00", "click"): (2, 3.0),   # late event 6 dropped
        ("2024-01-01 23:00:00", "view"): (2, 12.0),   # updated in batch 2
        ("2024-01-02 00:00:00", "click"): (1, 9.0),
    }
