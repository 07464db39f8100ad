"""Spell suggestion (ES term suggester analog): mode semantics, ranking
contract, and edit-distance bounds against a pure-Python recount of the
index dictionary."""

import shutil

import pytest
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.datagen import generate_transcripts
from hora_spark.engine import Engine

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=8))


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = generate_transcripts(spark, 120, seed=7)
    path = str(tmp_path_factory.mktemp("suggidx"))
    e = Engine(spark, path, CFG)
    e.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    yield e
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def dictionary(eng):
    return {r["term"]: r["df"] for r in
            eng.store.read("stats").select("term", "df").collect()}


def test_missing_mode_matches_python_recount(eng, dictionary):
    rows = eng.suggest("watr zzzqqq the", n=3, mode="missing").collect()
    # 'the' is in the dictionary → no rows for it
    assert all(r["input"] != "the" for r in rows)
    by_input = {}
    for r in rows:
        by_input.setdefault(r["input"], []).append(r)
    # per input: ranked (distance, df DESC, term), df/distance exact
    for inp, rs in by_input.items():
        assert inp not in dictionary
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        for r in rs:
            assert r["distance"] == _lev(inp, r["suggestion"]) <= 2
            assert r["df"] == dictionary[r["suggestion"]]
        keys = [(r["distance"], -r["df"], r["suggestion"]) for r in rs]
        assert keys == sorted(keys)
    # the python-recount top-3 for 'watr' is exactly what came back
    cand = sorted(
        ((_lev("watr", t), -df, t) for t, df in dictionary.items()
         if _lev("watr", t) <= 2),
    )[:3]
    got = [(r["distance"], -r["df"], r["suggestion"])
           for r in by_input.get("watr", [])]
    assert got == cand
    # a token with no near dictionary term yields nothing
    assert all(r["input"] != "zzzqqq" for r in rows) or all(
        r["distance"] <= 2 for r in rows)


def test_always_and_popular_modes(eng, dictionary):
    # always: present tokens get corrections too, never themselves
    rows = eng.suggest("the", n=5, mode="always").collect()
    assert rows and all(r["suggestion"] != "the" for r in rows)
    # popular: every correction strictly more frequent than the input
    pop = eng.suggest("the of water", n=5, mode="popular").collect()
    for r in pop:
        assert r["df"] > dictionary[r["input"]]


def test_max_distance_and_errors(eng):
    d1 = {(r["input"], r["suggestion"])
          for r in eng.suggest("watr", n=50, max_distance=1,
                               mode="missing").collect()}
    d2 = {(r["input"], r["suggestion"])
          for r in eng.suggest("watr", n=50, max_distance=2,
                               mode="missing").collect()}
    assert d1 <= d2
    assert eng.suggest("", n=3).count() == 0
    with pytest.raises(ValueError):
        eng.suggest("x", mode="sometimes")
    with pytest.raises(ValueError):
        eng.suggest("x", max_distance=3)


def test_no_index_raises(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "nothing"), CFG)
    with pytest.raises(FileNotFoundError):
        e.suggest("watr")
