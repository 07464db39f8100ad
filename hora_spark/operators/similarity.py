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

    scan = corpus.select(id_col, vec_col)
    scored = scan.mapInPandas(score, out_schema)
    # each scan task emits ≤ k rows per query (map-side top-k above), so
    # the merge input is bounded by tasks·|queries|·k. When that bound is
    # provably small, finish in one single-partition sort (one exchange,
    # no range sampling) — the same adaptive merge as search_topk; fall
    # back to the two-exchange window plan when the bound is unknowable
    # (exotic plans) or large.
    try:
        n_parts = scan.rdd.getNumPartitions()
    except Exception:
        n_parts = None
    if n_parts is not None and n_parts * len(q_ids) * k <= 2_000_000:
        scored = scored.repartition(1)
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
        # + 0.0 canonicalizes IEEE −0.0 like the other kNN paths
        .select("query_id", "vec_id", (F.round("sim", 6) + F.lit(0.0)).alias("sim"))
        .orderBy("query_id", F.desc("sim"), F.asc("vec_id"))
    )


def _cos_pairs_expr(a: str, b: str):
    """Built-in-only cosine between two array<double> columns (JVM-side,
    whole-stage codegen — keeps the verify join off the Python path)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / F.greatest(na * nb, F.lit(1e-30))


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 12,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket: int = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) —
    the dense-vector tier of the dedup family.

    method='bruteforce': exact all-pairs — O(n²), the oracle/test path.
    method='lsh': random-hyperplane band buckets → candidate pairs → exact
    cosine verify — the scale path (recall < 1 by construction; floor
    asserted in tests, mirroring the reference's recall harness
    /root/reference/src/lib.rs:97-111). Over-cap buckets emit O(n) star
    pairs against the bucket-min id, same skew guard as the text dedup.
    """
    e = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    if method == "bruteforce":
        a, b = e.alias("a"), e.alias("b")
        joined = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        sim = _cos_pairs_expr("a.v", "b.v")
        return (
            joined.select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.round(sim, 6).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    # LSH candidates: same random-hyperplane tables as lsh_knn, self-joined
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
            m = _as_matrix(pdf["v"])
            ids = pdf["vec_id"].to_numpy(np.int64)
            for t, P in enumerate(pls):
                bits = (m @ P.T) > 0
                yield pd.DataFrame({"vec_id": ids, "table": t,
                                    "bucket": (bits @ pows).astype(np.int64)})

    buckets = e.mapInPandas(bucketize, sig_schema)
    sized = buckets.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("table", "bucket"))
    ).withColumn(
        "bucket_min", F.min("vec_id").over(Window.partitionBy("table", "bucket"))
    )
    small = sized.filter(F.col("bucket_n") <= max_bucket)
    a, b = small.alias("a"), small.alias("b")
    cand = (
        a.join(b, (F.col("a.table") == F.col("b.table"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )
    star = (
        sized.filter((F.col("bucket_n") > max_bucket)
                     & (F.col("vec_id") != F.col("bucket_min")))
        .select(F.col("bucket_min").alias("vec_a"), F.col("vec_id").alias("vec_b"))
    )
    cand = cand.unionByName(star).distinct()
    # exact verify on the candidate set only
    av = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    bv = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        cand.join(av, "vec_a").join(bv, "vec_b")
        .select("vec_a", "vec_b",
                F.round(_cos_pairs_expr("va", "vb"), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _kmeans_centroids(sample: np.ndarray, n_lists: int, seed: int,
                      n_iter: int = 8) -> np.ndarray:
    """Tiny seeded Lloyd's k-means on a driver-side sample — the coarse
    quantizer of IVF (hora's k-means trainer,
    /root/reference/src/index/pq_idx.rs:208-312, shrunk to the coarse
    layer: the fine PQ codes are replaced by exact re-rank)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(n_lists, n)
    cents = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            m = assign == j
            if m.any():
                cents[j] = sample[m].mean(0)
    return cents


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_size: int = 2048,
) -> DataFrame:
    """IVF approximate kNN — the coarse-probe shape of hora's IVFPQ
    (/root/reference/src/index/pq_idx.rs:357-439): k-means lists trained on
    a deterministic sample, every vector assigned to its nearest centroid,
    queries probe the n_probe nearest lists, exact cosine re-rank on the
    candidates. Recall < 1 by construction; floor asserted in tests."""
    spark = corpus.sparkSession
    samp_rows = (corpus.select(id_col, vec_col).orderBy(id_col)
                 .limit(sample_size).collect())
    samp = np.array([np.asarray(r[vec_col], np.float64) for r in samp_rows])
    samp = samp / np.maximum(np.linalg.norm(samp, axis=1, keepdims=True), 1e-30)
    cents = _kmeans_centroids(samp, n_lists, seed)
    b_c = spark.sparkContext.broadcast(cents)

    assign_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("list_id", T.IntegerType()),
    ])

    def assign(batches):
        C = b_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = _as_matrix(pdf[vec_col])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            d = ((m[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(np.int64),
                "list_id": d.argmin(1).astype(np.int32),
            })

    lists = corpus.select(id_col, vec_col).mapInPandas(assign, assign_schema)

    # query → its n_probe nearest lists (driver-side: queries are few)
    q_rows = queries.select("query_id", vec_col).collect()
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[vec_col], np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-30)
        d = ((cents - qv) ** 2).sum(1)
        for lid in np.argsort(d)[:n_probe]:
            probe_rows.append((int(r["query_id"]), int(lid)))
    probes = spark.createDataFrame(probe_rows, "query_id long, list_id int")

    cands = (
        lists.join(F.broadcast(probes), "list_id")
        .select("query_id", "vec_id")
        .distinct()
    )
    qv_df = queries.select("query_id", F.col(vec_col).alias("qvec"))
    cv = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    pairs = cands.join(F.broadcast(qv_df), "query_id").join(cv, "vec_id")

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
        .select("query_id", "vec_id", (F.round("sim", 6) + F.lit(0.0)).alias("sim"))
        .orderBy("query_id", F.desc("sim"), F.asc("vec_id"))
    )
