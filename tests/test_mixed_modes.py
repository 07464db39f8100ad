"""Per-query mode in batched search: a mixed workload (bag-of-words +
conjunctive + phrase + near) runs as ONE Spark job, and every query's
slice equals the corresponding single-mode search exactly (ranks, scores,
tie-breaks). The shard UDF loops per query, so the mode rides per query;
the scan reads pos_blocks only when some query in the batch needs it."""

import shutil

import pytest
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.datagen import generate_transcripts
from hora_spark.engine import Engine

PCFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=8,
                                      store_positions=True))


@pytest.fixture(scope="module")
def pos_eng(spark, tmp_path_factory):
    df = generate_transcripts(spark, 70, seed=23).cache()
    df.count()
    path = str(tmp_path_factory.mktemp("mixidx"))
    eng = Engine(spark, path, PCFG)
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    yield eng
    df.unpersist()
    shutil.rmtree(path, ignore_errors=True)


MIXED = [
    ("water people", "any", None),
    ("the of", "phrase", None),
    ("water people", "all", None),
    ("the same", "near", 3),
    "of the",                      # plain string → call-level default mode
]


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_mixed_batch_equals_single_mode_runs(spark, pos_eng):
    got = pos_eng.searches(MIXED, k=12).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    singles = [
        _rows(pos_eng.search("water people", k=12, mode="any")),
        _rows(pos_eng.search("the of", k=12, mode="phrase")),
        _rows(pos_eng.search("water people", k=12, mode="all")),
        _rows(pos_eng.search("the same", k=12, mode="near", near_window=3)),
        _rows(pos_eng.search("of the", k=12, mode="any")),
    ]
    for qid, want in enumerate(singles):
        assert by_q.get(qid, []) == want, qid


def test_mixed_batch_pruned_equals_exhaustive(spark, pos_eng):
    a = pos_eng.searches(MIXED, k=12, prune=True).collect()
    b = pos_eng.searches(MIXED, k=12, prune=False).collect()
    assert [(r["query_id"], r["doc_id"], round(r["score"], 9)) for r in a] \
        == [(r["query_id"], r["doc_id"], round(r["score"], 9)) for r in b]


def test_two_element_tuples_and_defaults(spark, pos_eng):
    # (text, mode) tuples; None mode slot falls back to the call default
    got = pos_eng.searches([("water people", "all"), ("the of", None)],
                           k=8, mode="phrase").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    assert by_q.get(0, []) == _rows(pos_eng.search("water people", k=8, mode="all"))
    assert by_q.get(1, []) == _rows(pos_eng.search("the of", k=8, mode="phrase"))


def test_positional_scan_only_when_needed(spark, pos_eng):
    """A batch with no positional query must not read pos_blocks even on
    a positional index (narrow scan schema preserved)."""
    def read_schema(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return "\n".join(l for l in plan.splitlines() if "ReadSchema" in l)

    df = pos_eng.searches([("water people", "any"), ("the of", "all")], k=5)
    assert "pos_blocks" not in read_schema(df)
    # sanity: the mixed positional batch DOES read pos_blocks
    df2 = pos_eng.searches([("water people", "any"), ("the of", "phrase")], k=5)
    assert "pos_blocks" in read_schema(df2)


def test_mode_validation(spark, pos_eng, tmp_path):
    with pytest.raises(ValueError, match="unknown search mode"):
        pos_eng.searches([("water people", "fuzzy")], k=5).collect()
    # positional query against a position-less index still raises
    rows = [("c0", 0, "u", "alpha beta", None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string")
    eng = Engine(spark, str(tmp_path / "nopos"),
                 EngineConfig(index=IndexConfig(block_size=8, n_buckets=2)))
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    with pytest.raises(ValueError, match="store_positions"):
        eng.searches([("alpha", "any"), ("alpha beta", "phrase")], k=5)
