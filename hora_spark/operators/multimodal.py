"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched mapInPandas stages.

The Spark-side contract (schema, partitioning, UDF signature, batch shape)
is real and tested; the actual media decode is STUBBED behind
`decode_available()` because the sandbox has no image/audio libraries —
`_fake_decode` is a deterministic stand-in so the pipeline is exercisable
end-to-end. Swapping in PIL/torchaudio at deploy time changes ONE function.

Design for 100 TB: binary payloads never go through a shuffle — feature
extraction is a narrow mapInPandas over the scan, and only the (small)
feature/metadata columns continue downstream. Batch size is controlled by
spark.sql.execution.arrow.maxRecordsPerBatch to bound executor memory at
payload_size × batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("payload", T.BinaryType(), True),       # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),        # typed metadata
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_DIM = 16


def decode_available() -> bool:
    """True when a real decoder (PIL / soundfile / av) is importable."""
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _real_decode(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "media decode requires PIL/soundfile/av — not present in this "
        "environment; the deterministic fake below exercises the plumbing"
    )


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in 'decoded features': sha256 of the payload
    expanded to FEATURE_DIM floats in [0,1). Same bytes → same features."""
    if payload is None:
        return np.zeros(FEATURE_DIM)
    d = hashlib.sha256(bytes(payload) + kind.encode()).digest()
    raw = np.frombuffer((d * ((FEATURE_DIM * 4) // len(d) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float64) / 10_000.0


def extract_features(df: DataFrame, use_real_decoder: bool | None = None) -> DataFrame:
    """media table → (media_id, kind, n_bytes, features array<double>).

    Narrow op (no shuffle): payload is consumed inside the batch iterator
    and dropped before anything wide happens."""
    decode = _real_decode if (use_real_decoder or (use_real_decoder is None and decode_available())) else _fake_decode
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                "features": [f.tolist() for f in feats],
            })

    return df.select("media_id", "kind", "payload").mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (media_id,
    frame_idx, ts_ms) — pure built-ins (sequence/explode), no decode. The
    decode of each planned frame is then an extract_features-shaped pass."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                                 F.lit(every_ms))),
        )
        .withColumn("frame_idx", (F.col("ts_ms") / every_ms).cast("int"))
        .select("media_id", "frame_idx", "ts_ms")
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=32 + (i % 5) * 16, dtype=np.uint8).tobytes()
        rows.append((
            i, kind, bytearray(payload), f"x/{kind}",
            64 if kind == "image" else None, 64 if kind == "image" else None,
            3000 if kind != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
