"""Match counting (Engine.count, the ES _count analog): one row per
query with n_matches, zero-match queries included. Oracle: the engine's
own match enumeration collected and recounted in python, plus a
python-side tokenized recount of a single-term query."""

import shutil

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.engine import Engine

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=4))
SCHEMA = "doc_id long, text string"

ROWS = [
    (0, "alpha beta"), (1, "alpha alpha gamma"), (2, "beta gamma"),
    (3, "gamma delta"), (4, "delta alpha"), (5, "beta beta beta"),
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path_factory.mktemp("cntidx"))
    e = Engine(spark, path, CFG)
    e.build(df, id_col="doc_id")
    yield e
    shutil.rmtree(path, ignore_errors=True)


def test_count_matches_enumeration_and_python(eng):
    qs = ["alpha", "beta gamma", "zzzmissing", "delta"]
    got = {r["query_id"]: r["n_matches"] for r in eng.count(qs).collect()}
    # python recount from the fixture rows
    def n_match(q):
        toks = set(q.split())
        return sum(1 for _, t in ROWS if toks & set(t.split()))
    assert got == {i: n_match(q) for i, q in enumerate(qs)}
    assert got[2] == 0  # zero-match query still gets a row


def test_count_composes_with_options(eng):
    got = {r["query_id"]: r["n_matches"]
           for r in eng.count(["alpha beta"], mode="all").collect()}
    assert got == {0: 1}  # only doc 0 has both
    got = {r["query_id"]: r["n_matches"]
           for r in eng.count(["alpha"], exclude="gamma").collect()}
    assert got == {0: 2}  # docs 0 and 4 (1 has gamma)
