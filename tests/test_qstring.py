"""Boolean queries (query_string): '+must' terms, must_not, boosts,
multiple phrase/proximity clauses, and should-only minimum_should_match —
the Lucene classic-QueryParser subset, compiled onto the WAND kernel's
required-slot-groups + positional-chains machinery.

Semantics oracles are COMPOSITIONS through independent code paths: a
boolean query with required terms / phrase clauses must equal the plain
bag-of-words search over the same term set restricted (filter_df) to the
ids that independently match each clause — the filter path and the
required/chain path share no kernel code beyond scoring.
"""

import shutil

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.engine import Engine
from hora_spark.functions.qstring import parse_query_string

PCFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=4,
                                      store_positions=True))
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"

ROWS = [
    ("c0", 0, "u", "alpha beta gamma delta", None),            # 0
    ("c0", 1, "u", "beta alpha delta", None),                  # 1
    ("c0", 2, "u", "alpha x beta gamma", None),                # 2 gapped
    ("c0", 3, "u", "gamma delta epsilon", None),               # 3 no alpha
    ("c0", 4, "u", "alpha beta epsilon zeta", None),           # 4
    ("c0", 5, "u", "zeta alpha", None),                        # 5
    ("c0", 6, "u", "delta gamma alpha beta zeta epsilon", None),  # 6
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path_factory.mktemp("qsidx"))
    e = Engine(spark, path, PCFG)
    e.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    yield e
    shutil.rmtree(path, ignore_errors=True)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def _rows(df):
    return sorted((r["doc_id"], round(r["score"], 9)) for r in df.collect())


# ------------------------------------------------------------- parser ----

def test_parser_clauses():
    spec = parse_query_string('+spark "hash join"~3 scan^2 -old pre* fuz~1')
    assert spec["required"] == ["spark"]
    assert spec["phrases"] == [("hash join", 3, True)]
    assert spec["boosts"] == {"scan": 2.0}
    assert spec["exclude"] == "old"
    assert spec["prefix"] is True
    assert spec["text"] == "scan pre* fuz~1"


def test_parser_exact_phrase_and_required_boost():
    spec = parse_query_string('"a b" +key^1.5 plain')
    assert spec["phrases"] == [("a b", None, False)]
    assert spec["required"] == ["key"]
    assert spec["boosts"] == {"key": 1.5}
    assert spec["text"] == "plain"
    # '+"phrase"' accepted: phrases are must clauses already
    assert parse_query_string('+"a b"')["phrases"] == [("a b", None, False)]


@pytest.mark.parametrize("bad", [
    '-"a b" x',          # must_not phrase
    '"a b', 'a " b',     # unbalanced / stray quote
    '+pre* x',           # required expansion
    '-fuz~1 x',          # excluded expansion
    'w^0 x',             # non-positive boost
    '+ x', '- x',        # bare sign
    '-only',             # pure negative
    '""',                # empty phrase
])
def test_parser_errors(bad):
    with pytest.raises(ValueError):
        parse_query_string(bad)


# -------------------------------------------------- boolean semantics ----

def test_required_equals_filtered_composition(spark, eng):
    """{text, required} == the same-term-set plain search restricted to
    the docs that match the required term (independent filter_df path)."""
    boolq = eng.searches([{"text": "gamma delta", "required": ["alpha"]}],
                         k=10)
    keep = eng.matches(["alpha"]).select("doc_id")
    plain = eng.searches(["gamma delta alpha"], k=10, filter_df=keep)
    assert _rows(boolq) == _rows(plain)
    assert _ids(boolq) != []  # non-vacuous


def test_phrase_clause_equals_filtered_composition(spark, eng):
    """{text, phrases:[exact]} == same-term-set plain search restricted
    to the whole-query phrase-mode match ids."""
    boolq = eng.searches(
        [{"text": "gamma delta", "phrases": ["alpha beta"]}], k=10)
    keep = eng.matches([("alpha beta", "phrase", None)]).select("doc_id")
    plain = eng.searches(["gamma delta alpha beta"], k=10, filter_df=keep)
    assert _rows(boolq) == _rows(plain)
    assert _ids(boolq) == [0, 4, 6]


def test_windowed_clause_equals_near_unordered(spark, eng):
    """A windowed phrase clause with no loose terms == the whole-query
    near_unordered mode (same window, same terms)."""
    boolq = eng.searches(
        [{"text": "", "phrases": [("gamma zeta", 3, True)]}], k=10)
    whole = eng.searches([("gamma zeta", "near_unordered", 3)], k=10)
    assert _rows(boolq) == _rows(whole)
    # doc 6 toks: delta gamma alpha beta zeta epsilon → |4 − 1| = 3 ≤ 3;
    # no other doc contains both terms
    assert _ids(boolq) == [6]
    # window 2 excludes it (distance 3)
    assert eng.searches(
        [{"text": "", "phrases": [("gamma zeta", 2, True)]}],
        k=10).count() == 0


def test_min_match_counts_should_only(spark, eng):
    """min_match counts SHOULD terms only when must clauses are present:
    required 'alpha' + should 'gamma delta' with min_match=2 keeps only
    docs containing alpha AND both should terms."""
    got = eng.searches([{"text": "gamma delta", "required": ["alpha"],
                         "min_match": 2}], k=10)
    # alpha docs: 0,1,2,4,5,6; with both gamma and delta: 0, 6
    assert _ids(got) == [0, 6]
    # min_match=1: needs at least one should term
    got1 = eng.searches([{"text": "gamma delta", "required": ["alpha"],
                          "min_match": 1}], k=10)
    assert _ids(got1) == [0, 1, 2, 6]


def test_two_chains_and_exclude(spark, eng):
    """Two positional clauses AND a must_not term compose: docs matching
    both phrases minus the excluded term's docs."""
    both = eng.searches(
        [{"text": "", "phrases": ["alpha beta", "gamma delta"]}], k=10)
    # 'alpha beta' ∈ {0,4,6}; 'gamma delta' ∈ {0,3}ish — doc 0 has both
    assert _ids(both) == [0]
    minus = eng.searches(
        [{"text": "", "phrases": ["alpha beta"], "exclude": "epsilon"}],
        k=10)
    assert _ids(minus) == [0]  # 4 and 6 contain epsilon


def test_required_only_and_boost_on_required(spark, eng):
    """A query of ONLY must clauses scores them (Lucene scores must);
    boosting a required term scales its contribution."""
    req = eng.searches([{"text": "", "required": ["zeta", "alpha"]}], k=10)
    assert _ids(req) == [4, 5, 6]
    # equal to conjunctive mode over the same terms
    conj = eng.searches([("alpha zeta", "all", None)], k=10)
    assert _rows(req) == _rows(conj)
    boosted = eng.searches([{"text": "", "required": ["zeta", "alpha"],
                             "boosts": {"zeta": 2.0}}], k=10)
    assert _ids(boosted) == [4, 5, 6]
    assert _rows(boosted) != _rows(req)


def test_absent_required_term_empties(spark, eng):
    assert eng.searches([{"text": "alpha", "required": ["zzz"]}],
                        k=10).count() == 0


def test_pruned_equals_exhaustive_boolean(spark, eng):
    spec = {"text": "gamma delta", "required": ["alpha"],
            "phrases": [("alpha beta", None, False)], "min_match": 1}
    p = eng.searches([spec], k=5, prune=True)
    e = eng.searches([spec], k=5, prune=False)
    assert _rows(p) == _rows(e)


def test_engine_query_string_end_to_end(spark, eng):
    """The full string syntax through Engine.query_string equals the
    hand-built spec through searches."""
    via_qs = eng.query_string('+alpha "gamma delta" beta^2 -zeta', k=10)
    via_spec = eng.searches(
        [{"text": "beta", "required": ["alpha"],
          "phrases": [("gamma delta", None, False)],
          "boosts": {"beta": 2.0}, "exclude": "zeta"}], k=10)
    assert _rows(via_qs) == _rows(via_spec.drop("query_id"))
    assert _ids(via_qs) == [0]


def test_boolean_in_mixed_batch(spark, eng):
    """A boolean spec rides the SAME job as plain/phrase specs — the
    per-query results equal their solo runs."""
    batch = eng.searches([
        "gamma delta",
        {"text": "gamma delta", "required": ["alpha"]},
        ("alpha beta", "phrase", None),
    ], k=10)
    solo0 = eng.searches(["gamma delta"], k=10)
    solo1 = eng.searches([{"text": "gamma delta", "required": ["alpha"]}],
                         k=10)
    solo2 = eng.searches([("alpha beta", "phrase", None)], k=10)
    for qid, solo in enumerate((solo0, solo1, solo2)):
        got = batch.filter(batch.query_id == qid).drop("query_id")
        assert _rows(got) == _rows(solo.drop("query_id"))


def test_boolean_validations(spark, eng):
    with pytest.raises(ValueError, match="boolean-query parts"):
        eng.searches([{"text": "alpha beta", "mode": "phrase",
                       "required": ["gamma"]}], k=5)
    with pytest.raises(ValueError, match="at least two tokens"):
        eng.searches([{"text": "alpha", "phrases": ["beta"]}], k=5)
    with pytest.raises(ValueError, match="synonyms cannot compose"):
        eng.searches([{"text": "alpha", "required": ["beta"],
                       "synonyms": {"alpha": ["gamma"]}}], k=5)
