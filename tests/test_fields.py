"""Index-resident fielded filters (ES filter context / Lucene
TermQuery-in-filter): '<field>:<token>' postings built from
IndexConfig.field_cols, queried as zero-score must clauses.

Oracles are compositions over the SAME engine:
  - fields={'lang': v} must equal brute doc-set filtering of the
    unfiltered search (scores unchanged — filter clauses score 0);
  - multi-value = OR, multi-field = AND;
  - fields_not = complement;
  - pruned path ≡ exhaustive path;
  - an index built WITHOUT fields is byte-identical in stats and text
    scoring to one built WITH fields (fields must not perturb BM25).
"""

import shutil

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.engine import Engine

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=4,
                                     field_cols=("lang", "source")))
SCHEMA = ("doc_id long, text string, lang string, source string")

ROWS = [
    (0, "alpha beta gamma", "en", "web"),
    (1, "alpha alpha beta", "en", "book"),
    (2, "beta gamma delta", "de", "web"),
    (3, "gamma delta alpha", "de", "book"),
    (4, "delta alpha beta gamma", "fr", "web"),
    (5, "alpha beta", None, "book"),        # NULL field value
    (6, "beta beta gamma alpha", "en", "web"),
    (7, "gamma gamma delta beta", "fr", "book"),
]
LANG = {r[0]: r[2] for r in ROWS}
SOURCE = {r[0]: r[3] for r in ROWS}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path_factory.mktemp("fldidx"))
    e = Engine(spark, path, CFG)
    e.build(df, id_col="doc_id")
    yield e
    shutil.rmtree(path, ignore_errors=True)


def _rows(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


@pytest.mark.parametrize("q", ["alpha beta", "gamma", "delta beta gamma"])
@pytest.mark.parametrize("lang", ["en", "de", "fr"])
def test_field_filter_equals_brute_subset(eng, q, lang):
    """fields={'lang': v} = unfiltered search restricted to docs with
    that lang, scores unchanged (filter clauses contribute 0)."""
    full = _rows(eng.search(q, k=20))
    flt = _rows(eng.search(q, k=20, fields={"lang": lang}))
    want = {d: s for d, s in full.items() if LANG[d] == lang}
    assert flt == want


def test_multi_value_is_or_multi_field_is_and(eng):
    q = "alpha beta gamma delta"
    full = _rows(eng.search(q, k=20))
    or_ = _rows(eng.search(q, k=20, fields={"lang": ["en", "fr"]}))
    assert or_ == {d: s for d, s in full.items() if LANG[d] in ("en", "fr")}
    and_ = _rows(eng.search(q, k=20,
                            fields={"lang": "en", "source": "web"}))
    assert and_ == {d: s for d, s in full.items()
                    if LANG[d] == "en" and SOURCE[d] == "web"}


def test_fields_not_is_complement(eng):
    q = "alpha beta gamma delta"
    full = _rows(eng.search(q, k=20))
    neg = _rows(eng.search(q, k=20, fields_not={"lang": "en"}))
    # NULL lang docs are NOT excluded (they carry no lang posting)
    assert neg == {d: s for d, s in full.items() if LANG[d] != "en"}
    both = _rows(eng.search(q, k=20, fields={"source": "book"},
                            fields_not={"lang": "de"}))
    assert both == {d: s for d, s in full.items()
                    if SOURCE[d] == "book" and LANG[d] != "de"}


def test_null_field_value_matches_nothing(eng):
    """Doc 5 has NULL lang → no lang posting → excluded by every
    positive lang filter, kept by every lang fields_not."""
    full = _rows(eng.search("alpha beta", k=20))
    assert 5 in full
    for lang in ("en", "de", "fr"):
        assert 5 not in _rows(eng.search("alpha beta", k=20,
                                         fields={"lang": lang}))
    assert 5 in _rows(eng.search("alpha beta", k=20,
                                 fields_not={"lang": "en"}))


def test_pruned_equals_exhaustive(eng):
    q = "alpha gamma"
    flt = {"lang": ["en", "de"], "source": "web"}
    a = eng.search(q, k=3, prune=True, fields=flt).collect()
    b = eng.search(q, k=3, prune=False, fields=flt).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]


def test_composes_with_modes_min_match_dismax(eng):
    full_all = _rows(eng.search("alpha beta", k=20, mode="all"))
    got = _rows(eng.search("alpha beta", k=20, mode="all",
                           fields={"source": "web"}))
    assert got == {d: s for d, s in full_all.items() if SOURCE[d] == "web"}

    full_mm = _rows(eng.search("alpha beta delta", k=20, min_match=2))
    got = _rows(eng.search("alpha beta delta", k=20, min_match=2,
                           fields={"lang": "fr"}))
    assert got == {d: s for d, s in full_mm.items() if LANG[d] == "fr"}

    full_dm = _rows(eng.search("alpha beta", k=20, score_mode="dismax",
                               tie_breaker=0.3))
    got = _rows(eng.search("alpha beta", k=20, score_mode="dismax",
                           tie_breaker=0.3, fields={"lang": "en"}))
    assert got == {d: s for d, s in full_dm.items() if LANG[d] == "en"}


def test_mixed_batch_per_query_fields(eng):
    """fields ride per query through a mixed batch — one Spark job."""
    out = eng.searches([
        {"text": "alpha beta"},
        {"text": "alpha beta", "fields": {"lang": "en"}},
        {"text": "alpha beta", "fields_not": {"source": "web"}},
    ], k=20).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    full = by_q[0]
    assert by_q[1] == {d: s for d, s in full.items() if LANG[d] == "en"}
    assert by_q[2] == {d: s for d, s in full.items() if SOURCE[d] != "web"}


def test_filter_alone_never_surfaces_a_doc(eng):
    """A doc matching the filter but NO scoring term must not appear
    with score 0 (ES: should clauses present → at least one must
    match)."""
    # 'delta' misses docs 0, 1, 5, 6; all-en filter would otherwise
    # admit 0/1/6 as score-0 rows
    got = _rows(eng.search("delta", k=20, fields={"lang": "en"}))
    assert got == {}  # no en doc contains delta... verify:
    full = _rows(eng.search("delta", k=20))
    assert {d for d in full if LANG[d] == "en"} == set()


def test_unknown_field_and_multitoken_value_raise(eng):
    with pytest.raises(ValueError, match="not\\s+built with"):
        eng.search("alpha", fields={"role": "user"}).collect()
    with pytest.raises(ValueError, match="exactly one token"):
        eng.search("alpha", fields={"lang": "en us"}).collect()
    with pytest.raises(ValueError, match="non-empty dict"):
        eng.search("alpha", fields={}).collect()


def test_query_string_field_clauses(eng):
    got = _rows(eng.query_string("alpha beta lang:en source:web", k=20))
    full = _rows(eng.search("alpha beta", k=20))
    assert got == {d: s for d, s in full.items()
                   if LANG[d] == "en" and SOURCE[d] == "web"}
    # repeated field = OR; -field:value excludes
    got = _rows(eng.query_string("alpha lang:en lang:de -source:web", k=20))
    full = _rows(eng.search("alpha", k=20))
    assert got == {d: s for d, s in full.items()
                   if LANG[d] in ("en", "de") and SOURCE[d] != "web"}


def test_query_string_field_syntax_errors(eng):
    from hora_spark.functions.qstring import parse_query_string
    for bad in ("alpha lang:", "alpha :en", "alpha lang:en^2",
                "alpha lang:e*"):
        with pytest.raises(ValueError):
            parse_query_string(bad)


def test_fields_do_not_perturb_scoring_or_stats(spark, eng, tmp_path):
    """The same corpus indexed WITHOUT field_cols: identical stats meta
    (N, avgdl) and identical text-search results — field postings are
    invisible to BM25."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plain = Engine(spark, str(tmp_path / "plain"),
                   EngineConfig(index=IndexConfig(block_size=16, n_buckets=4)))
    plain.build(df, id_col="doc_id")
    m_f, m_p = eng.store.meta(), plain.store.meta()
    assert (m_f["n_docs"], m_f["avgdl"]) == (m_p["n_docs"], m_p["avgdl"])
    for q in ("alpha beta", "gamma delta", "delta"):
        assert _rows(eng.search(q, k=20)) == _rows(plain.search(q, k=20))


def test_dictionary_surfaces_skip_field_terms(eng):
    """Prefix/wildcard expansion and spell suggestion never surface
    '<field>:<token>' terms."""
    # 'lang:en'/'source:web' exist as postings; stem 'lang'/'sourc'
    # and wildcard '*e*' must not expand into them
    out = eng.search("alpha lang* sourc* w?b", k=20,
                     expand_prefixes=True).collect()
    full = _rows(eng.search("alpha", k=20))
    assert {r["doc_id"]: r["score"] for r in out} == full
    sug = eng.suggest("lang:en sourc", n=5, max_distance=2,
                      mode="missing").collect()
    assert all(":" not in r["suggestion"] for r in sug)


def test_append_and_rebuild_carry_field_postings(spark, tmp_path):
    """Appended docs get field postings from the snapshot meta; rebuild
    keeps the field schema; filters see appended docs."""
    cfg = EngineConfig(index=IndexConfig(block_size=16, n_buckets=4,
                                         field_cols=("lang",)))
    df = spark.createDataFrame(ROWS, SCHEMA)
    e = Engine(spark, str(tmp_path / "appidx"), cfg)
    e.build(df, id_col="doc_id")
    from hora_spark.streaming.incremental import append_build

    new = spark.createDataFrame(
        [("c9", 0, "alpha beta beta", "en", "web"),
         ("c9", 1, "alpha gamma", "de", "web")],
        "conv_id string, turn_idx int, text string, lang string, source string")
    append_build(spark, e.store, new, order_cols=["conv_id", "turn_idx"],
                 cfg=cfg)
    got = _rows(e.search("alpha beta", k=20, fields={"lang": "en"}))
    assert 8 in got  # first appended doc (ids continue at 8)
    assert 9 not in got
    e.rebuild()
    got2 = _rows(e.search("alpha beta", k=20, fields={"lang": "en"}))
    assert 8 in got2 and 9 not in got2
