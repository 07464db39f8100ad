"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, processed in Arrow-batched mapInPandas stages.

The decode step is REAL (round 2): pure-numpy parsers for formats that
need no external libraries —

- image: binary PPM (P6) — header parse + raw RGB plane;
- audio: RIFF/WAVE PCM16 — chunk walk + int16 samples;
- video: a length-prefixed container of PPM frames (``VID0`` magic +
  frame count + per-frame byte lengths) — the frame-sampling path decodes
  only every k-th frame.

`synth_media` emits REAL encodings of all three (deterministic, seeded),
so decode → feature-extract → resize → frame-sample run end to end in the
sandbox. Swapping in PIL/soundfile/av for JPEG/FLAC/MP4 at deploy time
replaces only the per-format parser functions; the Spark plumbing (schema,
batch shape, narrow-op placement) is format-agnostic.

Design for 100 TB: binary payloads never go through a shuffle — feature
extraction is a narrow mapInPandas over the scan, and only the (small)
feature/metadata columns continue downstream. Batch size is controlled by
spark.sql.execution.arrow.maxRecordsPerBatch to bound executor memory at
payload_size × batch.
"""

from __future__ import annotations

import struct

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


# ------------------------------------------------------------- image (PPM) --

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Raises ValueError on junk."""
    buf = bytes(payload)
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts, pos = [], 2
    while len(parts) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":            # comment line
            pos = buf.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(buf) and not buf[end : end + 1].isspace():
            end += 1
        parts.append(int(buf[pos:end]))
        pos = end
    pos += 1                                      # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(buf, dtype=np.uint8, offset=pos, count=w * h * 3)
    return data.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure indexing (the transform primitive)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


def _image_features(px: np.ndarray) -> np.ndarray:
    f = np.zeros(FEATURE_DIM)
    h, w = px.shape[:2]
    p = px.astype(np.float64)
    f[0], f[1] = w, h
    f[2:5] = p.mean(axis=(0, 1))                  # per-channel mean
    f[5:8] = p.std(axis=(0, 1))                   # per-channel std
    f[8] = p.mean()                               # brightness
    if w > 1:
        f[9] = np.abs(np.diff(p, axis=1)).mean()  # horizontal gradient energy
    if h > 1:
        f[10] = np.abs(np.diff(p, axis=0)).mean()
    return f


# ------------------------------------------------------------- audio (WAV) --

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (float64 mono samples in [-1, 1], sample_rate).
    Walks chunks properly (tolerates extra chunks before data). Multi-
    channel input is downmixed by mean; non-16-bit or non-PCM raises
    (→ decode_ok=False) instead of silently mis-reading the frames."""
    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_ch, data_raw = 12, None, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_ch, rate, _brate, _align, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1:
                raise ValueError("only PCM wav supported")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported (got {bits})")
            if n_ch < 1:
                raise ValueError("invalid channel count")
        elif cid == b"data":
            data_raw = body
        pos += 8 + size + (size & 1)
    if rate is None or data_raw is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data_raw, dtype="<i2").astype(np.float64) / 32768.0
    if n_ch > 1:
        n_frames = len(samples) // n_ch
        samples = samples[: n_frames * n_ch].reshape(n_frames, n_ch).mean(axis=1)
    return samples, rate


def _audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    f = np.zeros(FEATURE_DIM)
    n = len(samples)
    f[0], f[1] = n, rate
    if n == 0:
        return f
    f[2] = np.sqrt((samples ** 2).mean())                       # RMS
    f[3] = (np.diff(np.signbit(samples)) != 0).mean() if n > 1 else 0.0  # ZCR
    f[4] = np.abs(samples).mean()
    f[5] = np.abs(samples).max()
    n8 = (n // 8) * 8                                            # 8 coarse bands
    if n8:
        f[6:14] = np.abs(samples[:n8].reshape(8, -1)).mean(axis=1)
    return f


# ------------------------------------------------- video (PPM-frame stack) --

VIDEO_MAGIC = b"VID0"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """List of (h, w, 3) uint8 frames → VID0 container (magic + frame count
    + length-prefixed PPM frames)."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        ppm = encode_ppm(fr)
        out.append(struct.pack("<I", len(ppm)))
        out.append(ppm)
    return b"".join(out)


def decode_video_frames(payload: bytes, every: int = 1):
    """Yield (frame_idx, pixels) for every `every`-th frame WITHOUT
    materializing the skipped frames (the frame-sampling decode)."""
    buf = bytes(payload)
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID0 payload")
    n = struct.unpack("<I", buf[4:8])[0]
    pos = 8
    for i in range(n):
        size = struct.unpack("<I", buf[pos : pos + 4])[0]
        if i % every == 0:
            yield i, decode_ppm(buf[pos + 4 : pos + 4 + size])
        pos += 4 + size


# ------------------------------------------------------------ Spark stages --

def decode_available() -> bool:
    """The builtin PPM/WAV/VID0 decoders need no external libraries."""
    return True


def _decode_features(payload, kind: str) -> tuple[np.ndarray, bool]:
    """payload → (FEATURE_DIM features, ok). Corrupt payloads yield zeros
    with ok=False (counted, never crash the pipeline — the error policy a
    100 TB ingest needs)."""
    if payload is None:
        return np.zeros(FEATURE_DIM), False
    try:
        if kind == "image":
            return _image_features(decode_ppm(payload)), True
        if kind == "audio":
            return _audio_features(*decode_wav(payload)), True
        if kind == "video":
            feats, n = np.zeros(FEATURE_DIM), 0
            for _idx, px in decode_video_frames(payload, every=1):
                feats += _image_features(px)
                n += 1
            if n:
                feats /= n
            feats[15] = n                       # frame count rides along
            return feats, True
        return np.zeros(FEATURE_DIM), False
    except (ValueError, struct.error, IndexError):
        return np.zeros(FEATURE_DIM), False


def extract_features(df: DataFrame) -> DataFrame:
    """media table → (media_id, kind, n_bytes, decode_ok, features).

    Narrow op (no shuffle): payload is consumed inside the batch iterator
    and dropped before anything wide happens. Features are rounded to 6dp
    (cross-engine comparability pin used repo-wide)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            feats, oks = [], []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                v, ok = _decode_features(p, k)
                feats.append(np.round(v, 6).tolist())
                oks.append(ok)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                "decode_ok": oks,
                "features": feats,
            })

    return df.select("media_id", "kind", "payload").mapInPandas(run, out_schema)


def resize_images(df: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Image transform stage: decode → nearest-neighbor resize → re-encode.
    Narrow (payload in, payload out, same row count)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for p in pdf["payload"]:
                try:
                    out.append(bytearray(encode_ppm(resize_nearest(decode_ppm(p), out_w, out_h))))
                except (ValueError, struct.error, IndexError):
                    out.append(None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out,
                "width": np.int32(out_w),
                "height": np.int32(out_h),
            })

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, out_schema)
    )


def frame_sample_features(df: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: one FEATURE row per sampled frame, decoding
    ONLY the sampled frames (length-prefixed container → skipped frames are
    never parsed)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mids, idxs, feats = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                # buffer per video: a mid-stream parse failure drops the
                # WHOLE video's rows — partial frame sets would look like a
                # complete sample of a shorter video
                v_idx, v_feat = [], []
                try:
                    for idx, px in decode_video_frames(p, every=every):
                        v_idx.append(idx)
                        v_feat.append(np.round(_image_features(px), 6).tolist())
                except (ValueError, struct.error, IndexError):
                    continue
                mids.extend([mid] * len(v_idx))
                idxs.extend(v_idx)
                feats.extend(v_feat)
            if not mids:  # all-corrupt batch: an empty float64 column
                continue  # would fail the Arrow list<double> conversion
            yield pd.DataFrame({
                "media_id": pd.Series(mids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "features": feats,
            })

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, out_schema)
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Metadata-only frame-sampling plan: one row per planned frame
    (media_id, frame_idx, ts_ms) — pure built-ins (sequence/explode), no
    decode; used to size a sampling job before running it."""
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


def synth_media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    """The deterministic row set behind synth_media, Spark-free — shared by
    the Spark table below and the local oracle twin (expected_features_local),
    so both sides decode byte-identical payloads."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 8 + (i % 4) * 4, 8 + (i % 3) * 4
            payload = encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
            rows.append((i, kind, bytearray(payload), "image/x-portable-pixmap",
                         w, h, None))
        elif kind == "audio":
            rate, dur_ms = 8000, 250 + (i % 4) * 125
            t = np.arange(int(rate * dur_ms / 1000)) / rate
            wave = (0.5 * np.sin(2 * np.pi * (220 + 20 * (i % 7)) * t)
                    + 0.1 * rng.standard_normal(len(t)))
            payload = encode_wav((wave * 20000).clip(-32768, 32767).astype(np.int16), rate)
            rows.append((i, kind, bytearray(payload), "audio/wav", None, None, dur_ms))
        else:
            n_frames = 2 + (i % 3)
            frames = [rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
                      for _ in range(n_frames)]
            payload = encode_video(frames)
            rows.append((i, kind, bytearray(payload), "video/x-vid0",
                         8, 6, n_frames * 1000))
    return rows


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL encodings: PPM images, PCM16
    WAVs (two-tone sine + noise), VID0 frame stacks."""
    return spark.createDataFrame(synth_media_rows(n, seed), MEDIA_SCHEMA)


def expected_features_local(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Local (no-Spark) twin of extract_features ∘ synth_media plus the
    driver query's feature_sum: runs the same decoders over the same
    deterministic payloads in one process. Staged as a parquet fixture
    (tests/fixtures/) it gives DuckDB an oracle for the Spark-distributed
    decode — checking the mapInPandas/Arrow plumbing end to end, while the
    decoder MATH is pinned by hand-valued pytest cases. feature_sum is a
    strict left-fold like Spark's F.aggregate, so the IEEE sums agree
    bit for bit."""
    rows = []
    for (mid, kind, payload, _mime, _w, _h, _d) in synth_media_rows(n, seed):
        v, ok = _decode_features(payload, kind)
        feats = np.round(v, 6).tolist()
        acc = 0.0
        for x in feats:
            acc += x
        rows.append((mid, kind, 0 if payload is None else len(payload),
                     ok, round(acc, 6)))
    return pd.DataFrame(
        rows, columns=["media_id", "kind", "n_bytes", "decode_ok", "feature_sum"],
    ).astype({"media_id": "int64", "n_bytes": "int64",
              "decode_ok": "bool", "feature_sum": "float64"})
