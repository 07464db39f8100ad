"""Similarity search over an embedding column (array<float>).

This is the 1:1 capability mirror of the reference's actual domain
(dense-vector top-k, /root/reference/src/core/ann_index.rs:74-97):

- bruteforce_knn:  exact top-k cosine — the BruteForceIndex analog
  (/root/reference/src/index/bruteforce_idx.rs:47-73). Query side is tiny
  → broadcast; corpus side streams through an Arrow pandas UDF doing a
  numpy matmul per batch (the SIMD-kernel analog,
  /root/reference/src/core/simd_metrics.rs:14-34).
- lsh_knn:  random-hyperplane LSH bucketing — the scale path, shaped like
  IVFPQ's coarse-probe (/root/reference/src/index/pq_idx.rs:408-439):
  candidates come only from matching buckets (multi-probe), then exact
  re-rank. Recall<1 by construction; tested against brute force with a
  recall floor like the reference's accuracy harness
  (/root/reference/src/lib.rs:97-111).

Scores are float64 and rounded to 6dp at the boundary for cross-engine
comparability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_matrix(series: pd.Series) -> np.ndarray:
    return np.array([np.asarray(v, dtype=np.float64) for v in series])


def bruteforce_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k per query → (query_id, vec_id, sim) ordered
    (query_id, sim DESC, vec_id ASC). queries: (query_id, embedding).

    Metrics mirror /root/reference/src/core/metrics.rs (sign-inverted to a
    larger-is-closer `sim`): cosine, dot (:56), euclidean (squared, :66),
    manhattan (:59, Σ|a−b|), angular (:88-103, 2−2·cos).

    Each Arrow batch keeps only its per-query top-k BEFORE the exchange
    (np.argpartition), so the window shuffle carries ≤ k·n_q rows per batch
    instead of batch·n_q — the map-side-combine of top-k."""
    q_rows = queries.select("query_id", vec_col).collect()
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    if metric in ("cosine", "angular"):
        q_norm = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-30)
    else:
        q_norm = q_mat
    spark = corpus.sparkSession
    b_q = spark.sparkContext.broadcast((q_ids, q_norm))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ])

    def score(batches):
        ids_q, qn = b_q.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = _as_matrix(pdf[vec_col])
            if metric in ("cosine", "angular"):
                mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
                cos = mn @ qn.T                   # (batch, n_q)
                sims = cos if metric == "cosine" else 2.0 * cos - 2.0
            elif metric == "dot":
                sims = m @ qn.T
            elif metric == "manhattan":
                sims = -np.abs(m[:, None, :] - qn[None, :, :]).sum(-1)
            else:  # euclidean: negated squared distance (larger = closer)
                sims = -((m[:, None, :] - qn[None, :, :]) ** 2).sum(-1)
            n_b, n_q = sims.shape
            # map-side top-k: per query, keep this batch's k best under the
            # FULL tie-break (sim DESC, vec_id ASC) so the global window
            # sees every row it could possibly rank — exactness preserved
            vids = pdf[id_col].to_numpy(np.int64)
            if n_b > k:
                out_q, out_v, out_s = [], [], []
                for qi in range(n_q):
                    order = np.lexsort((vids, -sims[:, qi]))[:k]
                    out_q.append(np.full(k, ids_q[qi], np.int64))
                    out_v.append(vids[order])
                    out_s.append(sims[order, qi])
                yield pd.DataFrame({
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "sim": np.concatenate(out_s),
                })
            else:
                yield pd.DataFrame({
                    "query_id": np.repeat(ids_q, n_b),
                    "vec_id": np.tile(vids, n_q),
                    "sim": sims.T.ravel(),
                })

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        # + 0.0 canonicalizes IEEE −0.0 (self-distance under manhattan/
        # angular) so both engines render "0.000000"
        .select("query_id", "vec_id", (F.round("sim", 6) + F.lit(0.0)).alias("sim"))
        .orderBy("query_id", F.desc("sim"), F.asc("vec_id"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: each of n_tables hash tables buckets vectors
    by the sign pattern against n_planes hyperplanes; candidates = union of
    the query's buckets across tables; exact cosine re-rank. Approximate —
    the IVF 'probe only matching lists' shape at cluster scale."""
    spark = corpus.sparkSession
    dim = len(corpus.select(vec_col).first()[0])
    planes = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    b_planes = spark.sparkContext.broadcast(planes)

    sig_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ])

    def bucketize(batches):
        pls = b_planes.value
        pows = (1 << np.arange(n_planes)).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = _as_matrix(pdf[vec_col])
            ids = pdf[id_col].to_numpy(np.int64)
            for t, P in enumerate(pls):
                bits = (m @ P.T) > 0
                buckets = (bits @ pows).astype(np.int64)
                yield pd.DataFrame({"vec_id": ids, "table": t, "bucket": buckets})

    corpus_buckets = corpus.select(id_col, vec_col).mapInPandas(bucketize, sig_schema)
    q_buckets = (
        queries.withColumnRenamed("query_id", id_col)
        .select(id_col, vec_col)
        .mapInPandas(bucketize, sig_schema)
        .withColumnRenamed("vec_id", "query_id")
    )
    cands = (
        corpus_buckets.join(F.broadcast(q_buckets), ["table", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
    )
    # exact re-rank on the candidate set only
    qv = queries.select(F.col("query_id"), F.col(vec_col).alias("qvec"))
    cv = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    pairs = cands.join(F.broadcast(qv), "query_id").join(cv, "vec_id")

    @F.pandas_udf(T.DoubleType())
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma, mb = _as_matrix(a), _as_matrix(b)
        ma = ma / np.maximum(np.linalg.norm(ma, axis=1, keepdims=True), 1e-30)
        mb = mb / np.maximum(np.linalg.norm(mb, axis=1, keepdims=True), 1e-30)
        return pd.Series((ma * mb).sum(axis=1))

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("sim", cos(F.col("qvec"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", F.desc("sim"), F.asc("vec_id"))
    )
