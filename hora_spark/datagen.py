"""Deterministic synthetic transcripts generator (the engine's fixture data).

Mirrors the reference's seeded cluster generator
`make_normal_distribution_clustering` (/root/reference/src/lib.rs:15-51):
fully parameterized, seeded, no wall-clock. Schema is the authoritative
input_hint schema:

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Properties the tests rely on:
- token frequencies are Zipf(s≈1.1) over a 50k-word vocab → a few hot head
  terms dominate, forcing the skew/salting path (the analog of the
  imbalance hora guards with split_imbalance,
  /root/reference/src/core/calc.rs:31-40);
- every conversation's rows are reproducible in isolation: one
  counter-based Philox stream keyed by (seed, conv index), so regenerating
  any conv yields identical rows regardless of partitioning;
- generation is distributed: spark.range(n_convs) → mapInPandas, no
  driver-side materialization — the generator itself scales with the
  cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 50_000
ZIPF_S = 1.1
ROLES = ["user", "assistant", "tool"]
TOOLS = [f"tool_{name}" for name in (
    "search", "bash", "edit", "read", "write", "fetch", "sql",
    "plot", "diff", "lint", "test", "deploy",
)]
EPOCH = np.datetime64("2026-01-01T00:00:00")

_COMMON = (
    "the of and to a in that is for it with as on be at by this have from "
    "or one had not but what all were when we there can an your which their "
    "said if do will each about how up out them then she many some so these "
    "would other into has more her two like him see time could no make than "
    "first been its who now people my made over did down only way find use "
    "may water long little very after words called just where most know"
).split()


def vocab() -> np.ndarray:
    """50k deterministic words; Zipf head = common English words so hot
    terms look like real stopwords."""
    v = list(_COMMON)
    v += [f"w{i:05d}" for i in range(VOCAB_SIZE - len(v))]
    return np.array(v)


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    p /= p.sum()
    return np.cumsum(p)


def _conv_pdf(conv_ids: np.ndarray, seed: int, voc: np.ndarray, cdf: np.ndarray) -> pd.DataFrame:
    """Generate all turns for a vector of conv indices. One Philox stream
    per conv (counter-based → order/partition independent)."""
    rows_conv, rows_turn, rows_role, rows_text, rows_tool, rows_ts = [], [], [], [], [], []
    for ci in conv_ids:
        rng = np.random.Generator(np.random.Philox(key=[seed, int(ci)]))
        n_turns = 2 + int(rng.integers(0, 23))  # [2, 24]
        lens = 5 + rng.integers(0, 116, size=n_turns)  # 5..120 tokens
        total = int(lens.sum())
        tok_ids = np.searchsorted(cdf, rng.random(total), side="right")
        offs = np.concatenate(([0], np.cumsum(lens)))
        role_shift = int(rng.integers(0, 3))
        tool_draw = rng.integers(0, len(TOOLS), size=n_turns)
        ts_offsets = np.cumsum(1 + rng.integers(0, 90, size=n_turns))
        for t in range(n_turns):
            role = ROLES[(t + role_shift) % 3]
            rows_conv.append(f"conv{ci:08d}")
            rows_turn.append(t)
            rows_role.append(role)
            rows_text.append(" ".join(voc[tok_ids[offs[t]:offs[t + 1]]]))
            rows_tool.append(TOOLS[tool_draw[t]] if role == "tool" else None)
            rows_ts.append(EPOCH + np.timedelta64(int(ts_offsets[t]), "s"))
    return pd.DataFrame(
        {
            "conv_id": rows_conv,
            "turn_idx": np.array(rows_turn, dtype=np.int32),
            "role": rows_role,
            "text": rows_text,
            "tool": rows_tool,
            "ts": np.array(rows_ts, dtype="datetime64[us]"),
        }
    )


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def generate_transcripts(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generation: spark.range over conv indices →
    mapInPandas. ~13 turns/conv on average."""
    voc = vocab()
    cdf = _zipf_cdf(VOCAB_SIZE, ZIPF_S)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _conv_pdf(pdf["id"].to_numpy(), seed, voc, cdf)

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def write_transcripts(spark: SparkSession, path: str, n_convs: int, seed: int = 42) -> None:
    generate_transcripts(spark, n_convs, seed).write.mode("overwrite").parquet(path)
