"""Edge cases: null/empty/punct-only text through the full engine (the
counted-drop policy vs the reference's NaN panic, /root/reference/src/core/
node.rs:158-166), shard balance under Zipf skew, and degenerate corpora."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.datagen import generate_transcripts
from hora_spark.engine import Engine
from hora_spark.operators.corpus import prepare
from hora_spark.operators.oracle import bruteforce_topk

CFG = EngineConfig(index=IndexConfig(block_size=8, n_buckets=4))


def test_nulls_and_empty_text_through_engine(spark, tmp_path):
    rows = [
        ("c0", 0, "user", "spark index spark", None),
        ("c0", 1, "assistant", None, None),          # null text
        ("c0", 2, "user", "", None),                 # empty
        ("c0", 3, "tool", "!!! ...", "tool_x"),      # punct-only → 0 tokens
        ("c1", 0, "user", "index merge", None),
        ("c1", 1, "assistant", "spark", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    eng = Engine(spark, str(tmp_path / "e"), CFG)
    info = eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    # only 3 docs have tokens
    assert eng.nodes_size() == 3
    res = eng.search("spark", k=10).collect()
    # doc ids follow the FULL ordering (empty rows consume ids): c0t0=0,
    # c1t0=4, c1t1=5
    assert [r["doc_id"] for r in res] == [5, 0]
    # micro-corpus hand numbers (FIXTURES.md §3): doc "spark" (dl=1)
    # outranks "spark index spark" (tf=2, dl=3)
    assert res[0]["score"] > res[1]["score"]


def test_single_doc_corpus(spark, tmp_path):
    df = spark.createDataFrame([("c", 0, "u", "hello world", None)],
                               "conv_id string, turn_idx int, role string, text string, tool string")
    eng = Engine(spark, str(tmp_path / "s"), CFG)
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    res = eng.search("hello", k=5).collect()
    assert len(res) == 1 and res[0]["doc_id"] == 0


def test_shard_balance_under_zipf(spark, tmp_path):
    """Doc-range sharding must spread hot Zipf terms: lineage byte sizes
    across shards stay within a small factor (the skew the reference
    guards with split_imbalance, /root/reference/src/core/calc.rs:31-40)."""
    df = generate_transcripts(spark, 80, seed=13)
    eng = Engine(spark, str(tmp_path / "z"), EngineConfig(index=IndexConfig(n_buckets=8)))
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    lin = eng.idx_info().collect()
    sizes = [r["bytes"] for r in lin]
    assert len(sizes) == 8
    assert max(sizes) / max(min(sizes), 1) < 2.0, f"shard skew: {sizes}"
    # every shard contains the hot head term's postings (salting-by-range)
    segs = eng.store.read("segments").filter(F.col("term") == "the")
    assert segs.select("shard_id").distinct().count() == 8


def test_oracle_on_degenerate_identical_docs(spark, tmp_path):
    """All docs identical → all scores tie → order must be doc_id asc,
    identical between oracle and indexed path."""
    rows = [(f"c{i:03d}", 0, "u", "same text here", None) for i in range(40)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    eng = Engine(spark, str(tmp_path / "d"), CFG)
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    got = eng.search("same text", k=7).collect()
    assert [r["doc_id"] for r in got] == list(range(7))
    c = prepare(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    want = bruteforce_topk(spark, c, "same text", k=7).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_very_long_document(spark, tmp_path):
    """One pathological doc (50k tokens) among normal ones — block codec
    and WAND must handle tf ≫ block widths."""
    big = " ".join(["word"] * 50_000) + " needle"
    rows = [("a", 0, "u", big, None), ("b", 0, "u", "needle in short doc", None)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    eng = Engine(spark, str(tmp_path / "l"), CFG)
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    res = eng.search("needle", k=2).collect()
    assert len(res) == 2
    # short doc wins on length normalization
    assert res[0]["doc_id"] == 1
    res2 = eng.search("word", k=2).collect()
    assert [r["doc_id"] for r in res2] == [0]


def test_empty_corpus_build(spark, tmp_path):
    """Zero input rows → a well-formed EMPTY index (search returns 0 rows),
    not an AttributeError (regression: _commit_stats_and_lineage on None)."""
    df = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, tool string"
    )
    eng = Engine(spark, str(tmp_path / "empty"), CFG)
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    assert eng.nodes_size() == 0
    assert eng.search("anything", k=5).count() == 0


def test_all_empty_text_corpus_build(spark, tmp_path):
    """Rows exist but none tokenize → same empty-index contract."""
    rows = [("c0", 0, "u", "", None), ("c0", 1, "u", "!!!", None),
            ("c1", 0, "u", None, None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    eng = Engine(spark, str(tmp_path / "allempty"), CFG)
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    assert eng.nodes_size() == 0
    assert eng.search("anything", k=5).count() == 0
