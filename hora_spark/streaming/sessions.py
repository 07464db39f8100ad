"""Custom stateful streaming operator: per-user session aggregation with a
gap timeout, via `applyInPandasWithState` (Arrow-batched state, JVM state
store, event-time timeouts).

The reference is batch-only; this is the streaming tier of the
`events_sessions` batch query (same gap semantics), the canonical "custom
stateful operator the built-ins can't express": a session closes when no
event arrives within `gap` of its last event, which needs cross-batch
per-key state plus a timeout to flush sessions whose user went quiet.

Semantics:
- events of one user are merged with the open-session state, time-sorted;
  every within-batch gap > `gap` closes a session (emitted immediately);
- the trailing open session is kept in state with an EVENT-TIME timeout at
  last_ts + gap: when the watermark passes that point the session is
  emitted and the state evicted — state is bounded by |active users|;
- output is append-mode (sessions are emitted exactly once, when closed),
  so any durable sink works.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)

from hora_spark.streaming.windows import EVENT_SCHEMA

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])
_STATE_SCHEMA = StructType([
    StructField("start_ms", LongType()),
    StructField("last_ms", LongType()),
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _sessions_df(user_id: int, rows: list[tuple[int, int, int, float]]) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([user_id] * len(rows), dtype="int64"),
        "session_start": pd.to_datetime([r[0] for r in rows], unit="ms"),
        "session_end": pd.to_datetime([r[1] for r in rows], unit="ms"),
        "n_events": pd.Series([r[2] for r in rows], dtype="int64"),
        # round ONCE at emit (matching the batch twin's single round) —
        # rounding the running total per micro-batch would accumulate error
        # on sessions spanning many batches
        "total_value": pd.Series([round(r[3], 6) for r in rows], dtype="float64"),
    })


def _make_fn(gap_ms: int):
    def fn(key: Tuple[Any], pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.hasTimedOut:
            start_ms, last_ms, n, total = state.get
            state.remove()
            yield _sessions_df(user_id, [(start_ms, last_ms, n, total)])
            return

        import numpy as np

        ts_list, val_list = [], []
        for pdf in pdfs:
            if len(pdf):
                ts_list.append(pdf["ts"].to_numpy("datetime64[ms]").astype("int64"))
                val_list.append(pdf["value"].to_numpy("float64"))
        if not ts_list:
            return
        ts = np.concatenate(ts_list)
        val = np.concatenate(val_list)
        order = np.argsort(ts, kind="mergesort")
        ts, val = ts[order], val[order]

        if state.exists:
            start_ms, last_ms, n, total = state.get
        else:
            start_ms, last_ms, n, total = 0, 0, 0, 0.0

        closed: list[tuple[int, int, int, float]] = []
        for t, v in zip(ts.tolist(), val.tolist()):
            if n == 0:
                start_ms, last_ms = t, t
            elif t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n, total))
                start_ms, last_ms, n, total = t, t, 0, 0.0
            elif start_ms - t > gap_ms:
                # VERY-late event, more than gap earlier than the open
                # session's start: per the gap semantics it cannot belong
                # to this session (the batch twin puts it in its own
                # earlier session), so emit it as a closed singleton.
                # Residual divergence vs batch, accepted: (a) two very-late
                # events within gap of EACH OTHER become two singletons
                # here but one session in batch; (b) a very-late event
                # adjacent to an already-EMITTED session can never be
                # merged into it (append mode can't retract). Both are
                # bounded by the watermark delay.
                closed.append((t, t, 1, v))
                continue
            else:
                # out-of-order events (late but above the watermark) may
                # arrive in a later micro-batch with t < the checkpointed
                # last_ms: they join the open session but must never REWIND
                # it — last_ms only grows (keeps the event-time timeout and
                # subsequent gap checks monotone) and session_start only
                # shrinks (matching the batch twin's min(ts) for late
                # events within gap of the session span)
                start_ms = min(start_ms, t)
                last_ms = max(last_ms, t)
            n += 1
            total += v
        state.update((start_ms, last_ms, n, total))
        # event-time timeout: fires when the WATERMARK passes the point at
        # which the open session can no longer be extended
        state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield _sessions_df(user_id, closed)

    return fn


def stream_sessionize(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    schema: str = EVENT_SCHEMA,
):
    """readStream over event parquet → per-user gap sessions → parquet
    (append mode: each closed session is written exactly once)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_fn(gap_minutes * 60_000),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def sessionize_batch(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin (oracle): the same gap-session semantics over a static
    DataFrame — lag over (user_id, ts) marks session starts, a running sum
    numbers them, one groupBy aggregates."""
    from pyspark.sql import Window

    gap_ms = gap_minutes * 60_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap = ms - F.lag(ms).over(w)
    sess = (
        df.withColumn("new_session",
                      F.when(gap.isNull() | (gap > gap_ms), F.lit(1)).otherwise(F.lit(0)))
        .withColumn("session_no", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("total_value"))
        .drop("session_no")
    )
