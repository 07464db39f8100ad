"""Field collapsing: top-k with at most per_group docs per collapse key.
Oracle: brute-force recomputation from the engine's own exhaustive match
set (collect + python reduce) — collapse is a deterministic pure function
of (score DESC, doc_id ASC) order and the doc→key map."""

import shutil

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.engine import Engine

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=4))
SCHEMA = "doc_id long, text string, src string"

ROWS = [
    (0, "alpha beta beta", "a"),
    (1, "alpha alpha", "a"),
    (2, "alpha beta gamma", "b"),
    (3, "beta beta", "b"),
    (4, "alpha beta", None),      # NULL key: its own (shared) group
    (5, "alpha", None),
    (6, "beta gamma alpha", "c"),
    (7, "alpha alpha beta", "a"),
]


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path_factory.mktemp("clpidx"))
    e = Engine(spark, path, CFG)
    e.build(df, id_col="doc_id")
    yield e, df
    shutil.rmtree(path, ignore_errors=True)


def _brute(rows, key_of, k, per_group):
    """rows: [(doc_id, score)] of the FULL match set."""
    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    out, seen = [], {}
    for d, s in rows:
        g = key_of[d]
        if seen.get(g, 0) < per_group:
            seen[g] = seen.get(g, 0) + 1
            out.append((d, s))
        if len(out) == k:
            break
    return out


@pytest.mark.parametrize("q", ["alpha beta", "beta gamma"])
@pytest.mark.parametrize("k,per_group", [(3, 1), (5, 1), (4, 2), (20, 1)])
def test_collapse_equals_brute(env, q, k, per_group):
    e, df = env
    full = [(r["doc_id"], r["score"])
            for r in e.matches([q]).select("doc_id", "score").collect()]
    key_of = {r[0]: r[2] for r in ROWS}
    want = _brute(full, key_of, k, per_group)
    got = e.collapse([q], df, "src", k=k, per_group=per_group).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == want
    assert all(r["src"] == key_of[r["doc_id"]] for r in got)


def test_collapse_composes_with_search_options(env):
    e, df = env
    full = [(r["doc_id"], r["score"]) for r in
            e.matches([{"text": "alpha beta", "exclude": "gamma"}])
            .select("doc_id", "score").collect()]
    key_of = {r[0]: r[2] for r in ROWS}
    want = _brute(full, key_of, 3, 1)
    got = e.collapse([{"text": "alpha beta", "exclude": "gamma"}],
                     df, "src", k=3).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == want


def test_collapse_batched_and_validation(env):
    e, df = env
    out = e.collapse(["alpha", "beta"], df, "src", k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert set(by_q) == {0, 1}
    assert all(len(v) <= 2 for v in by_q.values())
    with pytest.raises(ValueError, match=">= 1"):
        e.collapse(["alpha"], df, "src", k=0).collect()
