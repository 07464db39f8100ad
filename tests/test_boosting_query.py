"""Boosting query (ES `boosting`: positive query + negative query +
negative_boost): docs matching any negative token keep their rank
eligibility but their score is DEMOTED by the factor — exclusion's softer
sibling. Oracles are compositions: nb=1 ≡ plain search; every demoted
doc's score == plain score × nb exactly (one multiply on the raw double);
pruned ≡ exhaustive; composes with modes and fielded filters."""

import shutil

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.engine import Engine

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=4))
SCHEMA = "doc_id long, text string"

ROWS = [
    (0, "alpha beta gamma"),
    (1, "alpha alpha beta"),
    (2, "beta gamma delta"),
    (3, "gamma delta alpha noisy"),
    (4, "delta alpha beta gamma noisy noisy"),
    (5, "alpha beta"),
    (6, "beta beta gamma alpha"),
    (7, "gamma gamma delta beta noisy"),
]
NOISY = {3, 4, 7}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path_factory.mktemp("bqidx"))
    e = Engine(spark, path, CFG)
    e.build(df, id_col="doc_id")
    yield e
    shutil.rmtree(path, ignore_errors=True)


def _rows(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


@pytest.mark.parametrize("q", ["alpha beta", "gamma delta"])
@pytest.mark.parametrize("nb", [0.2, 0.5])
def test_demoted_scores_are_exact_multiples(eng, q, nb):
    plain = _rows(eng.search(q, k=20))
    got = _rows(eng.search(q, k=20, negative="noisy", negative_boost=nb))
    assert set(got) == set(plain)  # demotion never drops a doc
    for d, s in got.items():
        want = plain[d] * nb if d in NOISY else plain[d]
        assert s == want  # one raw-double multiply, bit-exact


def test_nb_one_is_identity_and_ranks_change(eng):
    q = "alpha gamma"
    plain = eng.search(q, k=20).collect()
    same = eng.search(q, k=20, negative="noisy", negative_boost=1.0).collect()
    assert [(r["doc_id"], r["score"]) for r in plain] == \
           [(r["doc_id"], r["score"]) for r in same]
    # with a strong demotion, every noisy doc ranks below every clean one
    got = [r["doc_id"] for r in
           eng.search(q, k=20, negative="noisy",
                      negative_boost=0.01).collect()]
    clean = [d for d in got if d not in NOISY]
    assert got[:len(clean)] == clean


def test_pruned_equals_exhaustive_and_topk_cut(eng):
    q = "alpha beta gamma"
    a = eng.search(q, k=3, prune=True, negative="noisy",
                   negative_boost=0.3).collect()
    b = eng.search(q, k=3, prune=False, negative="noisy",
                   negative_boost=0.3).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]
    # the top-k cut happens AFTER demotion
    full = _rows(eng.search(q, k=20, negative="noisy", negative_boost=0.3))
    want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["doc_id"], r["score"]) for r in a] == want


def test_composes_with_modes_and_batch(eng):
    all_plain = _rows(eng.search("alpha beta", k=20, mode="all"))
    got = _rows(eng.search("alpha beta", k=20, mode="all",
                           negative="noisy", negative_boost=0.5))
    assert got == {d: (s * 0.5 if d in NOISY else s)
                   for d, s in all_plain.items()}
    out = eng.searches([
        {"text": "alpha beta"},
        {"text": "alpha beta", "negative": "noisy", "negative_boost": 0.5},
    ], k=20).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    assert by_q[1] == {d: (s * 0.5 if d in NOISY else s)
                       for d, s in by_q[0].items()}


def test_validation(eng):
    with pytest.raises(ValueError, match="negative_boost"):
        eng.search("alpha", negative="noisy", negative_boost=0.0).collect()
    with pytest.raises(ValueError, match="negative_boost"):
        eng.search("alpha", negative="noisy", negative_boost=1.5).collect()
    # negative terms absent from the corpus are a no-op, not an error
    plain = _rows(eng.search("alpha", k=20))
    got = _rows(eng.search("alpha", k=20, negative="zzzmissing",
                           negative_boost=0.5))
    assert got == plain
