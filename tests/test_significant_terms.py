"""Significant-terms aggregation (ES significant_terms, JLH): terms
concentrated in the match set must outrank corpus-uniform terms; the
score is the rounded JLH rate contrast against the index's background
df, and every matches() option composes."""

import shutil

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.engine import Engine

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=4))
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"

ROWS = [
    ("c0", 0, "u", "alpha beta zeta", None),     # 0  match
    ("c0", 1, "u", "alpha beta zeta", None),     # 1  match
    ("c0", 2, "u", "alpha beta zeta", None),     # 2  match
    ("c0", 3, "u", "gamma zeta", None),          # 3
    ("c0", 4, "u", "gamma zeta beta", None),     # 4  beta once outside
    ("c0", 5, "u", "gamma zeta", None),          # 5
]


@pytest.fixture(scope="module")
def eng_docs(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path_factory.mktemp("sigidx"))
    e = Engine(spark, path, CFG)
    e.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    docs = df.selectExpr(
        "cast(row_number() over (order by conv_id, turn_idx) - 1 as long) as doc_id",
        "text")
    yield e, docs
    shutil.rmtree(path, ignore_errors=True)


def test_concentrated_term_outranks_uniform(spark, eng_docs):
    eng, docs = eng_docs
    res = eng.significant_terms(["alpha"], docs, k_terms=10,
                                min_doc_count=2).collect()
    by_term = {r["term"]: r for r in res}
    # alpha: fg 3/3 vs bg 3/6 → the query's own term tops (like ES)
    # beta:  fg 3/3 vs bg 4/6 → concentrated, high JLH
    # zeta:  fg 3/3 vs bg 6/6 → rate contrast 0 → score 0
    assert by_term["alpha"]["rnk"] == 1
    assert by_term["beta"]["score"] > by_term["zeta"]["score"]
    assert by_term["zeta"]["score"] == 0.0
    # JLH of beta: fg_rate=1, bg_rate=4/6 → (1-2/3)*(1/(2/3)) = 0.5
    assert by_term["beta"]["score"] == 0.5
    assert by_term["beta"]["fg_count"] == 3 and by_term["beta"]["bg_count"] == 4
    # ranks are (score DESC, term ASC), dense from 1
    assert sorted(r["rnk"] for r in res) == list(range(1, len(res) + 1))


def test_min_doc_count_and_compose_with_exclude(spark, eng_docs):
    eng, docs = eng_docs
    # min_doc_count above the match size drops everything
    assert eng.significant_terms(["alpha"], docs, min_doc_count=4).count() == 0
    # exclude shrinks the match set through the same matches() machinery:
    # excluding beta leaves no alpha docs (all contain beta) → empty
    assert eng.significant_terms(["alpha"], docs,
                                 exclude="beta").count() == 0
    # gamma matches docs 3-5; beta appears once there → filtered at 2
    res = eng.significant_terms(["gamma"], docs, min_doc_count=2).collect()
    assert {r["term"] for r in res} == {"gamma", "zeta"}
