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
