"""Disjunction-max scoring (Lucene DisjunctionMaxQuery / ES dis_max):
score = max_contrib + tie_breaker·(sum − max_contrib). Oracles are
compositions: tb=1 must equal the plain sum, tb=0 must equal the best
single-term score (verified per doc against single-term searches), and
the pruned path must equal the exhaustive path with θ tracking dismax."""

import shutil

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.engine import Engine

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=4))
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"

ROWS = [
    ("c0", 0, "u", "alpha alpha alpha", None),
    ("c0", 1, "u", "alpha beta", None),
    ("c0", 2, "u", "beta beta gamma", None),
    ("c0", 3, "u", "gamma delta alpha", None),
    ("c0", 4, "u", "delta delta delta beta", None),
    ("c0", 5, "u", "alpha beta gamma delta", None),
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path_factory.mktemp("dmidx"))
    e = Engine(spark, path, CFG)
    e.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    yield e
    shutil.rmtree(path, ignore_errors=True)


def _score_map(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def test_tb_one_equals_sum(spark, eng):
    q = "alpha beta gamma"
    sum_ = _score_map(eng.search(q, k=10))
    dm1 = _score_map(eng.search(q, k=10, score_mode="dismax",
                                tie_breaker=1.0))
    assert dm1 == sum_


def test_tb_zero_is_best_clause(spark, eng):
    """tb=0: every doc's score equals its best single-term score —
    verified against the single-term searches (independent jobs)."""
    terms = ["alpha", "beta", "gamma"]
    singles = [_score_map(eng.search(t, k=10)) for t in terms]
    dm0 = _score_map(eng.search(" ".join(terms), k=10,
                                score_mode="dismax", tie_breaker=0.0))
    for d, s in dm0.items():
        best = max(m[d] for m in singles if d in m)
        assert s == best
    # every doc matching any term appears (qualification unchanged)
    assert set(dm0) == {d for m in singles for d in m}


def test_interpolation_and_ordering(spark, eng):
    """0 < tb < 1 sits strictly between best-clause and sum for docs
    with 2+ matched terms, and equals both for single-term docs."""
    q = "alpha delta"
    sum_ = _score_map(eng.search(q, k=10))
    dm0 = _score_map(eng.search(q, k=10, score_mode="dismax", tie_breaker=0.0))
    dm5 = _score_map(eng.search(q, k=10, score_mode="dismax", tie_breaker=0.5))
    multi = [d for d in sum_ if sum_[d] != dm0[d]]  # matched both terms
    assert multi, "fixture must contain multi-term docs"
    for d in multi:
        assert dm0[d] < dm5[d] < sum_[d]
        assert dm5[d] == pytest.approx(dm0[d] + 0.5 * (sum_[d] - dm0[d]))
    # doc 0 matches only alpha: all combiners agree
    assert dm0[0] == dm5[0] == sum_[0]


def test_pruned_equals_exhaustive_dismax(spark, eng):
    q = "alpha beta gamma delta"
    for tb in (0.0, 0.3):
        p = eng.search(q, k=3, prune=True, score_mode="dismax", tie_breaker=tb)
        e = eng.search(q, k=3, prune=False, score_mode="dismax", tie_breaker=tb)
        assert ([(r["doc_id"], r["score"]) for r in p.collect()]
                == [(r["doc_id"], r["score"]) for r in e.collect()])


def test_dismax_composes_with_synonyms_and_boolean(spark, eng):
    """The classic use: synonym expansion scored best-variant; and the
    combiner rides boolean specs (required term unaffected by combiner
    qualification)."""
    syn = _score_map(eng.search("alpha", k=10,
                                synonyms={"alpha": ["beta"]},
                                score_mode="dismax", tie_breaker=0.0))
    singles = [_score_map(eng.search(t, k=10)) for t in ("alpha", "beta")]
    for d, s in syn.items():
        assert s == max(m[d] for m in singles if d in m)
    # boolean + dismax: required gamma, should alpha/delta, best-clause
    got = eng.searches([{"text": "alpha delta", "required": ["gamma"],
                         "score_mode": "dismax", "tie_breaker": 0.0}],
                       k=10)
    ids = sorted(r["doc_id"] for r in got.collect())
    assert ids == [2, 3, 5]  # gamma docs only


def test_dismax_validation(spark, eng):
    with pytest.raises(ValueError, match="tie_breaker"):
        eng.search("alpha", k=5, score_mode="dismax", tie_breaker=1.5)
    with pytest.raises(ValueError, match="score_mode"):
        eng.search("alpha", k=5, score_mode="best")
