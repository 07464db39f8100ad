"""Composed training-corpus pipeline: quality gate → exact dedup →
near-dup removal, end to end with planted duplicates."""

import pytest
from pyspark.sql import functions as F

from hora_spark.operators.pipeline import prepare_training_corpus

BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away to the old house by the river where it can rest")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),        # near dup of 0
        (3, "!!! ??? !!!"),                         # fails quality (0 tokens)
        (4, "a b"),                                 # fails min_tokens
        (5, "completely different and quite long text about the spark "
            "engine that should survive all of the filters because it "
            "is a normal document with normal words in it"),
        (6, BASE.upper()),                          # exact dup (case-insensitive)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pipeline_end_to_end(spark, corpus):
    cleaned, rep = prepare_training_corpus(corpus, near_dup_jaccard=0.5)
    ids = sorted(r["doc_id"] for r in cleaned.collect())
    # 0 survives (min id of the exact class {0,1,6}); 2 dropped as near dup
    # of 0; 3,4 fail quality; 5 survives
    assert ids == [0, 5]
    assert rep.n_input == 7
    assert rep.n_after_quality == 5          # 3,4 gone
    assert rep.n_after_exact_dedup == 3      # {0,1,6}→0, plus 2, 5
    assert rep.n_after_near_dedup == 2
    assert len(rep.stages) == 3


def test_pipeline_no_counts_mode(spark, corpus):
    cleaned, rep = prepare_training_corpus(corpus, near_dup_jaccard=0.5,
                                           count_stages=False)
    assert sorted(r["doc_id"] for r in cleaned.collect()) == [0, 5]
    assert rep.n_input == 0  # no actions were triggered for counting


def test_pipeline_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cleaned, rep = prepare_training_corpus(docs, min_quality=0.0, min_tokens=1)
    assert rep.n_after_near_dedup <= rep.n_after_exact_dedup <= rep.n_after_quality
    assert rep.n_after_near_dedup > 0
