"""Snippet extraction: Spark Column expression ≡ the DuckDB twin on a
shared fixture, plus pinned window/anchor/highlight semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hora_spark.functions.snippets import snippet_col, snippet_sql, with_snippets

TEXTS = [
    "The quick brown fox jumps over the lazy dog near the fox den",
    "no match here at all",
    "fox",
    "a b c d e f fox g h i j k l",
    None,
    "dog fox dog",
    "Dog! dog?? DOG... other words trailing here",
    "",
]
TERMS = ["fox", "dog"]


def test_snippet_spark_equals_duckdb(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "i int, text string")
    got = {r["i"]: r["s"] for r in df.select(
        "i", snippet_col(F.col("text"), TERMS, 3).alias("s")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, x VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(TEXTS)])
    want = dict(con.execute(
        "SELECT i, " + snippet_sql("x", TERMS, 3) + " FROM t").fetchall())
    assert got == want


def test_snippet_pinned_semantics(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    out = [r["snippet"] for r in with_snippets(df, TERMS, window=3).collect()]
    # anchor = the 2-hit cluster (dog@9, fox@12), not the lone fox@4;
    # earliest hit of the best cluster (dog@9) centers the window
    assert out[0] == "over the lazy [dog] near the [fox]"
    assert out[1] is None                       # no query term
    assert out[2] == "[fox]"                    # doc shorter than window
    assert out[3] == "d e f [fox] g h i"        # centered window
    assert out[4] is None                       # null text
    assert out[5] == "[dog] [fox] [dog]"        # every hit highlighted
    # all three hits tie at score 3 → earliest anchors (dog at pos 1)
    assert out[6] == "[dog] [dog] [dog] other"
    assert out[7] is None                       # empty text


def test_snippet_anchor_ties_break_earliest(spark):
    # two isolated single hits (score 1 each) → the EARLIEST one anchors
    df = spark.createDataFrame([("zz yy dog xx ww vv uu tt ss fox",)],
                               "text string")
    s = df.select(snippet_col(F.col("text"), ["fox", "dog"], 2).alias("s")
                  ).collect()[0]["s"]
    assert s == "zz yy [dog] xx ww"


def test_snippet_anchors_mid_document_cluster(spark):
    """The round-4 gap this closes: a weak first hit must lose to a
    stronger cluster later in the doc."""
    text = ("fox a1 a2 a3 a4 a5 a6 a7 a8 a9 b1 b2 "
            "dog fox dog b3 b4 b5 b6 b7 fox b8 b9")
    df = spark.createDataFrame([(text,)], "text string")
    s = df.select(snippet_col(F.col("text"), ["fox", "dog"], 3).alias("s")
                  ).collect()[0]["s"]
    # hits: fox@1 (score 1), dog@13/fox@14/dog@15 (score 3 each), fox@21
    # (score 1) → anchor = 13, window [10, 16]
    assert s == "a9 b1 b2 [dog] [fox] [dog] b3"
    # and the twin agrees on the same case
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x VARCHAR)")
    con.execute("INSERT INTO t VALUES (?)", [text])
    want = con.execute(
        "SELECT " + snippet_sql("x", ["fox", "dog"], 3) + " FROM t"
    ).fetchone()[0]
    assert want == s


# ---- multi-fragment highlighting (ES number_of_fragments) -------------------


def _py_fragments(text, terms, window, n):
    """Python recount of snippets_col's pinned semantics."""
    import re
    toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
    hits = [i + 1 for i, t in enumerate(toks) if t in terms]
    if not hits:
        return None
    scores = {p: sum(1 for q in hits if abs(q - p) <= window) for p in hits}
    ranked = sorted(hits, key=lambda p: (-scores[p], p))
    sel = []
    for p in ranked:
        if len(sel) >= n:
            break
        if all(abs(p - a) > 2 * window for a in sel):
            sel.append(p)
    out = []
    for a in sorted(sel):
        lo = max(1, a - window)
        win = toks[lo - 1: a + window]
        out.append(" ".join(f"[{t}]" if t in terms else t for t in win))
    return out


@pytest.mark.parametrize("n", [1, 2, 3])
@pytest.mark.parametrize("window", [2, 3])
def test_multi_fragments_equal_python_recount(spark, n, window):
    from hora_spark.functions.snippets import snippets_col

    rows = TEXTS + [
        "fox one two three four five six seven eight nine ten fox and a "
        "dog dog dog cluster sits here while a lone fox trails the end fox",
        "dog " + "filler " * 20 + "fox fox fox " + "pad " * 20 + "dog dog",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               "i int, text string")
    got = {r["i"]: r["s"] for r in df.select(
        "i", snippets_col(F.col("text"), TERMS, window, n).alias("s"))
        .collect()}
    for i, t in enumerate(rows):
        want = _py_fragments(t, TERMS, window, n)
        assert got[i] == want, (i, t, got[i], want)


def test_multi_fragments_never_overlap_and_doc_order(spark):
    from hora_spark.functions.snippets import snippets_col

    text = ("fox a b dog c d fox " + "x " * 30
            + "dog dog fox " + "y " * 30 + "fox end dog")
    df = spark.createDataFrame([(text,)], "text string")
    frags = df.select(
        snippets_col(F.col("text"), TERMS, 3, 3).alias("s")
    ).collect()[0]["s"]
    assert 1 <= len(frags) <= 3
    # fragments appear in document order: their first highlighted token's
    # position is increasing (reconstruct by locating each fragment's
    # plain text in the token stream)
    plain = [f.replace("[", "").replace("]", "") for f in frags]
    toks = " ".join(
        t for t in text.lower().split())
    idx = [toks.find(p.split()[0] + " ") for p in plain]
    assert all(i >= 0 for i in idx)
