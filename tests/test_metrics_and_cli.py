"""Dense-vector metric kernels (1:1 mirror of hora's metric unit tests —
manhattan==2 at /root/reference/src/core/node.rs:177-186, dot==-14 sign pin
at src/core/calc.rs:42-51 / metrics.rs:55; our pin is larger-is-closer) and
the CLI entry point."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hora_spark.operators import similarity


@pytest.fixture(scope="module")
def tiny_vecs(spark):
    rows = [
        (0, [1.0, 2.0, 3.0], 0),
        (1, [1.0, 2.0, 3.0], 0),
        (2, [-1.0, -2.0, -3.0], 1),
        (3, [3.0, 0.0, 4.0], 1),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_dot_metric_pinned(spark, tiny_vecs):
    """dot([1,2,3],[1,2,3]) = 14 — the reference asserts −14 because its
    convention is smaller-is-closer (metrics.rs:55); ours is DESC order."""
    q = tiny_vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    res = similarity.bruteforce_knn(tiny_vecs, q, k=4, metric="dot").collect()
    sims = {r["vec_id"]: r["sim"] for r in res}
    assert sims[0] == pytest.approx(14.0, abs=1e-6)
    assert sims[1] == pytest.approx(14.0, abs=1e-6)
    assert sims[2] == pytest.approx(-14.0, abs=1e-6)
    assert sims[3] == pytest.approx(15.0, abs=1e-6)  # 3+0+12
    # ranking: 15 > 14 == 14 (tie broken by vec_id asc) > -14
    assert [r["vec_id"] for r in res] == [3, 0, 1, 2]


def test_euclidean_metric(spark, tiny_vecs):
    """negated SQUARED distance (the reference's euclidean is also squared,
    /root/reference/src/core/metrics.rs:66-71)."""
    q = tiny_vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    res = similarity.bruteforce_knn(tiny_vecs, q, k=4, metric="euclidean").collect()
    sims = {r["vec_id"]: r["sim"] for r in res}
    assert sims[0] == 0.0
    assert sims[2] == pytest.approx(-(4 + 16 + 36), abs=1e-6)
    assert sims[3] == pytest.approx(-(4 + 4 + 1), abs=1e-6)


def test_cosine_identical_is_one(spark, tiny_vecs):
    q = tiny_vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    res = similarity.bruteforce_knn(tiny_vecs, q, k=4, metric="cosine").collect()
    sims = {r["vec_id"]: r["sim"] for r in res}
    assert sims[0] == pytest.approx(1.0, abs=1e-6)
    assert sims[2] == pytest.approx(-1.0, abs=1e-6)


def test_cli_roundtrip(spark, tmp_path):
    """datagen → build → search → info through the CLI code path."""
    from hora_spark import cli
    out = str(tmp_path / "tx")
    idx = str(tmp_path / "idx")
    assert cli.main(["datagen", "--out", out, "--convs", "40"]) == 0
    assert cli.main(["build", "--input", out, "--index", idx]) == 0
    assert cli.main(["search", "--index", idx, "-q", "the of", "-k", "5"]) == 0
    assert cli.main(["info", "--index", idx]) == 0
    # space-lean layout end to end (norms-sidecar dl at query time)
    idx2 = str(tmp_path / "idx_nodl")
    assert cli.main(["build", "--input", out, "--index", idx2,
                     "--no-store-dl"]) == 0
    assert cli.main(["search", "--index", idx2, "-q", "the of", "-k", "5"]) == 0
    # filtered search through the CLI (keep-list parquet)
    filt = str(tmp_path / "keep")
    spark.range(0, 1000, 2).withColumnRenamed("id", "doc_id").write.parquet(filt)
    assert cli.main(["search", "--index", idx, "-q", "the of", "-k", "5",
                     "--filter", filt]) == 0
    # unicode mode end to end
    idx3 = str(tmp_path / "idx_uni")
    assert cli.main(["build", "--input", out, "--index", idx3,
                     "--unicode"]) == 0
    assert cli.main(["search", "--index", idx3, "-q", "the of", "-k", "5"]) == 0
    # positional layout: phrase + near + conjunctive through the CLI
    idx4 = str(tmp_path / "idx_pos")
    assert cli.main(["build", "--input", out, "--index", idx4,
                     "--store-positions"]) == 0
    assert cli.main(["search", "--index", idx4, "-q", "the of", "-k", "5",
                     "--mode", "phrase"]) == 0
    assert cli.main(["search", "--index", idx4, "-q", "the of", "-k", "5",
                     "--mode", "near", "--near-window", "3"]) == 0
    assert cli.main(["search", "--index", idx4, "-q", "the of", "-k", "5",
                     "--mode", "all"]) == 0
    # NOT / minimum_should_match / prefix / facets through the CLI
    assert cli.main(["search", "--index", idx, "-q", "the of", "-k", "5",
                     "--not", "water"]) == 0
    assert cli.main(["search", "--index", idx, "-q", "the of water",
                     "-k", "5", "--min-match", "2"]) == 0
    assert cli.main(["search", "--index", idx, "-q", "wat* the", "-k", "5",
                     "--prefix"]) == 0
    assert cli.main(["search", "--index", idx, "-q", "*er t?me", "-k", "5",
                     "--prefix"]) == 0
    docs_pq = str(tmp_path / "docs_facets")
    spark.read.parquet(out).selectExpr(
        "cast(turn_idx as long) as doc_id", "role").write.parquet(docs_pq)
    assert cli.main(["search", "--index", idx, "-q", "the of",
                     "--facet-by", f"{docs_pq}:role"]) == 0
    assert cli.main(["search", "--index", idx, "-q", "the of",
                     "--facet-by", f"{docs_pq}:role",
                     "--facet-metric", "score=avg,max"]) == 0
    # reverse search through the CLI (route the corpus against a query)
    assert cli.main(["route", "--index", idx4, "--input", out,
                     "-q", "the of", "--min-score", "1.0",
                     "--id-cols", "conv_id,turn_idx"]) == 0
    # more-like-this: raw text source, then a doc-id source with exclusion
    assert cli.main(["mlt", "--index", idx, "--text", "the of water table",
                     "-k", "5"]) == 0
    mlt_docs = str(tmp_path / "docs_mlt")
    spark.read.parquet(out).selectExpr(
        "cast(turn_idx as long) as doc_id", "text").write.parquet(mlt_docs)
    assert cli.main(["mlt", "--index", idx, "--doc-id", "1",
                     "--input", mlt_docs, "-k", "5"]) == 0
    # score explanation: top-k form, then explicit ids
    assert cli.main(["explain", "--index", idx, "-q", "the of",
                     "-k", "3"]) == 0
    assert cli.main(["explain", "--index", idx, "-q", "the of",
                     "--ids", "0,1,2"]) == 0
    # spell suggestion: missing-mode default, then always-mode
    assert cli.main(["suggest", "--index", idx, "-q", "watr thhe"]) == 0
    assert cli.main(["suggest", "--index", idx, "-q", "the",
                     "--mode", "always", "-n", "2"]) == 0
    # two-pass rescoring over the positional index
    assert cli.main(["rescore", "--index", idx4, "-q", "the of",
                     "-k", "5", "--window", "20",
                     "--rescore-weight", "0.5"]) == 0
    # query-time synonyms (repeatable table entries; non-matching ignored)
    assert cli.main(["search", "--index", idx, "-q", "water", "-k", "5",
                     "--synonym", "water=people,time",
                     "--synonym", "zzz=the"]) == 0


def test_idf_cache_identical_results(spark, tmp_path):
    from hora_spark.datagen import generate_transcripts
    from hora_spark.engine import Engine
    df = generate_transcripts(spark, 30, seed=4)
    eng = Engine(spark, str(tmp_path / "c"))
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    a = [(r["doc_id"], r["score"]) for r in eng.search("the of and", k=10).collect()]
    # second call hits the idf cache — results must be identical
    b = [(r["doc_id"], r["score"]) for r in eng.search("the of and", k=10).collect()]
    assert a == b
    assert len(eng._idf_caches) == 1
    # absent terms cached as None, still absent on the cached path
    assert eng.search("zzzqqqxx", k=5).count() == 0
    assert eng.search("zzzqqqxx", k=5).count() == 0


def test_manhattan_metric_pinned(spark):
    """manhattan((1,1),(2,2)) == 2 — the reference's pin at
    /root/reference/src/core/node.rs:177-186 (ours sign-inverted)."""
    rows = [(0, [1.0, 1.0], 0), (1, [2.0, 2.0], 0), (2, [5.0, -1.0], 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = df.filter(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    res = similarity.bruteforce_knn(df, q, k=3, metric="manhattan").collect()
    sims = {r["vec_id"]: r["sim"] for r in res}
    assert sims[0] == 0.0
    assert sims[1] == pytest.approx(-2.0, abs=1e-9)
    assert sims[2] == pytest.approx(-6.0, abs=1e-9)   # |1-5| + |1-(-1)|


def test_angular_metric_pinned(spark, tiny_vecs):
    """angular = 2 − 2·cos (/root/reference/src/core/metrics.rs:88-103),
    sign-inverted: identical → 0, opposite → −4."""
    q = tiny_vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    res = similarity.bruteforce_knn(tiny_vecs, q, k=4, metric="angular").collect()
    sims = {r["vec_id"]: r["sim"] for r in res}
    assert sims[0] == pytest.approx(0.0, abs=1e-6)
    assert sims[1] == pytest.approx(0.0, abs=1e-6)
    assert sims[2] == pytest.approx(-4.0, abs=1e-6)


def test_partial_topk_matches_unbatched(spark):
    """The map-side top-k (per-Arrow-batch pruning before the exchange)
    must not change results, including ties at the k-th score."""
    n = 500
    rows = [(i, [float(i % 7), 1.0], 0) for i in range(n)]  # heavy ties
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").repartition(8)
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, embedding array<float>")
    got = similarity.bruteforce_knn(df, q, k=12, metric="dot").collect()
    # dot = i%7 → scores 6,6,... ties broken by vec_id asc: 6,13,20,...
    want_ids = [6 + 7 * j for j in range(12)]
    assert [r["vec_id"] for r in got] == want_ids
    assert all(r["sim"] == 6.0 for r in got)


def _clustered_vectors(spark, n_clusters=25, per_cluster=8, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + rng.standard_normal(dim) * 0.05
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_embedding_near_dup_bruteforce_and_lsh(spark):
    """Planted near-identical vectors: the exact path finds every planted
    pair; the LSH scale path reaches a recall floor against it (the dense
    tier of the dedup family)."""
    df = _clustered_vectors(spark, n_clusters=20, per_cluster=2)
    exact = similarity.embedding_near_dup_pairs(df, threshold=0.999, method="bruteforce")
    exact_pairs = {(r["vec_a"], r["vec_b"]) for r in exact.collect()}
    # every planted twin pair is found (cos of center±tiny noise ≈ 1)
    assert exact_pairs == {(2 * c, 2 * c + 1) for c in range(20)}

    lsh = similarity.embedding_near_dup_pairs(
        df, threshold=0.999, method="lsh", n_planes=8, n_tables=8)
    lsh_pairs = {(r["vec_a"], r["vec_b"]) for r in lsh.collect()}
    assert lsh_pairs <= exact_pairs          # verify step: no false positives
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"LSH near-dup recall {recall}"


def test_embedding_near_dup_overcap_star(spark):
    """An over-cap bucket (one big identical class) emits O(n) star pairs."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0], 0) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = similarity.embedding_near_dup_pairs(
        df, threshold=0.99, method="lsh", max_bucket=50).collect()
    assert len(pairs) == 199
    assert {r["vec_a"] for r in pairs} == {0}


def test_ivf_knn_recall_floor(spark):
    """IVF coarse-probe recall vs exact brute force (the asserted version
    of the reference's recall harness, lib.rs:53-113, for the IVFPQ shape
    pq_idx.rs:357-439)."""
    df = _clustered_vectors(spark, n_clusters=25, per_cluster=8)
    queries = df.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.bruteforce_knn(df, queries, k=5)
    approx = similarity.ivf_knn(df, queries, k=5, n_lists=25, n_probe=5)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    total = sum(len(v) for v in ex.values())
    assert hits / total >= 0.8, f"IVF recall {hits}/{total}"


def test_cli_round5_flags(spark, tmp_path):
    """CLI parity for the round-5 surface: --field-cols at build;
    --field/--not-field, --score-mode/--tie-breaker,
    --negative/--negative-boost, --collapse-by/--per-group at search."""
    from hora_spark import cli

    out = str(tmp_path / "tx")
    idx = str(tmp_path / "fidx")
    assert cli.main(["datagen", "--out", out, "--convs", "40"]) == 0
    assert cli.main(["build", "--input", out, "--index", idx,
                     "--field-cols", "role"]) == 0
    assert cli.main(["search", "--index", idx, "-q", "the of", "-k", "5",
                     "--field", "role=user"]) == 0
    assert cli.main(["search", "--index", idx, "-q", "the of", "-k", "5",
                     "--field", "role=user,assistant",
                     "--not-field", "role=tool"]) == 0
    assert cli.main(["search", "--index", idx, "-q", "the of", "-k", "5",
                     "--score-mode", "dismax", "--tie-breaker", "0.3"]) == 0
    assert cli.main(["search", "--index", idx, "-q", "the of", "-k", "5",
                     "--negative", "water", "--negative-boost", "0.5"]) == 0
    # field clause through the query-string path
    assert cli.main(["search", "--index", idx, "-q", "the of role:user",
                     "-k", "5", "--query-string"]) == 0
    docs_pq = str(tmp_path / "docs_clp")
    spark.read.parquet(out).selectExpr(
        "cast(turn_idx as long) as doc_id", "conv_id").write.parquet(docs_pq)
    assert cli.main(["search", "--index", idx, "-q", "the of", "-k", "5",
                     "--collapse-by", f"{docs_pq}:conv_id",
                     "--per-group", "2"]) == 0
