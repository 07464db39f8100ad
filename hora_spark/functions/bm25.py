"""BM25 math — numpy kernels + Spark Column expressions, one definition.

This is the engine's single "metric" (hora dispatches Metric enum → kernel
at /root/reference/src/core/metrics.rs:22-34; convention pinned there is
"smaller means closer" with negated dot products, metrics.rs:55 — our pinned
convention is the inverse: larger score = better, ordering always
(score DESC, doc_id ASC)).

All floats are float64 and the summation order over query terms is pinned
(sorted term order) so scores are bit-identical across partitionings — the
property that makes rank-identity at two cluster sizes achievable, which the
reference's order-dependent HNSW build does not have
(/root/reference/src/index/hnsw_idx.rs:464-476).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from hora_spark.config import BM25Config


def idf_np(n_docs: int, df: np.ndarray, cfg: BM25Config) -> np.ndarray:
    df = np.asarray(df, dtype=np.float64)
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def tf_sat_np(tf: np.ndarray, dl: np.ndarray, avgdl: float, cfg: BM25Config) -> np.ndarray:
    """Per-(term,doc) saturation factor tf / (tf + k1*(1-b+b*dl/avgdl))."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dl / avgdl))


def score_np(
    tf: np.ndarray, dl: np.ndarray, idf: np.ndarray, avgdl: float, cfg: BM25Config
) -> np.ndarray:
    return idf * tf_sat_np(tf, dl, avgdl, cfg)


def idf_col(n_docs: Column, df: Column, cfg: BM25Config) -> Column:
    """idf as a Spark Column — same formula, JVM-side (codegen)."""
    return F.log((n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))


def score_col(tf: Column, dl: Column, idf: Column, avgdl: Column, cfg: BM25Config) -> Column:
    """Per-(term,doc) BM25 contribution as a Spark Column."""
    tfd = tf.cast("double")
    denom = tfd + F.lit(cfg.k1) * (
        F.lit(1.0 - cfg.b) + F.lit(cfg.b) * dl.cast("double") / avgdl.cast("double")
    )
    return idf * tfd / denom


def score_sql(cfg: BM25Config) -> str:
    """The per-(term,doc) score as a SQL fragment over columns
    (tf, dl, idf, avgdl) — shared verbatim by Spark SQL and DuckDB."""
    return (
        f"idf * tf / (tf + {cfg.k1} * (1.0 - {cfg.b} + {cfg.b} * dl / avgdl))"
    )
