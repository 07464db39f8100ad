"""Stateful streaming sessionizer (applyInPandasWithState) == its batch
twin: within-batch splits emit immediately, open sessions close via
event-time timeout once the watermark passes, and state survives across
restarts (checkpointed), merging later events into the open session."""

from datetime import datetime

from hora_spark.streaming.sessions import sessionize_batch, stream_sessionize

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")


def _ev(eid, ts, uid, val):
    return (eid, datetime.fromisoformat(ts), uid, "e", val, None)


def _read(spark, sink):
    return {(r["user_id"], str(r["session_start"])): (str(r["session_end"]),
            r["n_events"], r["total_value"])
            for r in spark.read.parquet(sink).collect()}


def test_stateful_sessions_match_batch_twin(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    sink = str(tmp_path / "sink")

    batch1 = spark.createDataFrame([
        _ev(1, "2024-01-01 10:00:00", 1, 1.0),
        _ev(2, "2024-01-01 10:10:00", 1, 2.0),
        _ev(3, "2024-01-01 12:00:00", 1, 4.0),   # gap 110min > 30 → splits
        _ev(4, "2024-01-01 10:05:00", 2, 8.0),
        _ev(5, "2024-01-01 23:00:00", 99, 0.5),  # advances the watermark
    ], SCHEMA)
    batch1.write.mode("overwrite").parquet(src)
    q = stream_sessionize(spark, src, ck, sink, gap_minutes=30)
    q.awaitTermination(120)
    # user 1's first session closes within the batch; the availableNow
    # drain then advances the watermark to 21:00 (23:00 − 2h), firing the
    # event-time timeouts of user 1's second session and user 2's; only
    # user 99 (timeout 23:30 > watermark) stays open in state
    assert _read(spark, sink) == {
        (1, "2024-01-01 10:00:00"): ("2024-01-01 10:10:00", 2, 3.0),
        (1, "2024-01-01 12:00:00"): ("2024-01-01 12:00:00", 1, 4.0),
        (2, "2024-01-01 10:05:00"): ("2024-01-01 10:05:00", 1, 8.0),
    }

    # restart the stream: checkpointed state must merge a later event into
    # user 99's still-open session (20min gap ≤ 30 → same session)
    batch2 = spark.createDataFrame([_ev(6, "2024-01-01 23:20:00", 99, 0.25)],
                                   SCHEMA).coalesce(1)
    batch2.write.mode("append").parquet(src)
    q2 = stream_sessionize(spark, src, ck, sink, gap_minutes=30)
    q2.awaitTermination(120)
    assert (99, "2024-01-01 23:00:00") not in _read(spark, sink)  # still open

    # a far-future event pushes the watermark past 23:50 → user 99's
    # session closes with BOTH events (cross-restart state merge)
    batch3 = spark.createDataFrame([_ev(7, "2024-01-02 03:00:00", 50, 0.0)],
                                   SCHEMA).coalesce(1)
    batch3.write.mode("append").parquet(src)
    q3 = stream_sessionize(spark, src, ck, sink, gap_minutes=30)
    q3.awaitTermination(120)
    got = _read(spark, sink)
    assert got[(99, "2024-01-01 23:00:00")] == ("2024-01-01 23:20:00", 2, 0.75)

    # batch-twin oracle: every emitted session matches the batch
    # computation over the full event set exactly (user 50's session is
    # still open in the stream, hence subset)
    all_events = batch1.unionByName(batch2).unionByName(batch3)
    want = {(r["user_id"], str(r["session_start"])): (str(r["session_end"]),
            r["n_events"], r["total_value"])
            for r in sessionize_batch(all_events, gap_minutes=30).collect()}
    for key, v in got.items():
        assert want[key] == v, key
    assert len(got) == len(want) - 1            # only user 50 still open


def test_late_cross_batch_event_does_not_rewind_session(spark, tmp_path):
    """An out-of-order event (late but above the watermark) arriving in a
    LATER micro-batch with ts < the checkpointed last_ms must join the open
    session without rewinding it: last_ms only grows (so the next in-order
    event sees the true gap, no spurious split) and session_start extends
    backward to min(ts), matching the batch twin."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    sink = str(tmp_path / "sink")

    batch1 = spark.createDataFrame([
        _ev(1, "2024-01-01 10:00:00", 7, 1.0),
        _ev(2, "2024-01-01 10:10:00", 7, 2.0),
        _ev(3, "2024-01-01 11:00:00", 99, 0.0),  # watermark → 09:00
    ], SCHEMA)
    batch1.write.mode("overwrite").parquet(src)
    stream_sessionize(spark, src, ck, sink, gap_minutes=30).awaitTermination(120)
    assert _read(spark, sink) == {}              # everything still open

    # late event 09:45 (< checkpointed last_ms 10:10, above watermark 09:00)
    # + in-order event 10:20. The pre-fix code rewound last_ms to 09:45,
    # making 10:20 look 35min away → spurious split at a 10-min true gap.
    batch2 = spark.createDataFrame([
        _ev(4, "2024-01-01 09:45:00", 7, 4.0),
        _ev(5, "2024-01-01 10:20:00", 7, 8.0),
    ], SCHEMA).coalesce(1)
    batch2.write.mode("append").parquet(src)
    stream_sessionize(spark, src, ck, sink, gap_minutes=30).awaitTermination(120)
    assert _read(spark, sink) == {}              # one merged session, open

    # far-future event closes user 7 via event-time timeout
    batch3 = spark.createDataFrame([_ev(6, "2024-01-01 16:00:00", 50, 0.0)],
                                   SCHEMA).coalesce(1)
    batch3.write.mode("append").parquet(src)
    stream_sessionize(spark, src, ck, sink, gap_minutes=30).awaitTermination(120)
    got = _read(spark, sink)
    assert got[(7, "2024-01-01 09:45:00")] == ("2024-01-01 10:20:00", 4, 15.0)

    # exact batch-twin agreement on the closed session
    all_events = batch1.unionByName(batch2).unionByName(batch3)
    want = {(r["user_id"], str(r["session_start"])): (str(r["session_end"]),
            r["n_events"], r["total_value"])
            for r in sessionize_batch(all_events, gap_minutes=30).collect()}
    assert want[(7, "2024-01-01 09:45:00")] == got[(7, "2024-01-01 09:45:00")]
