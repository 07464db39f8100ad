"""Hand-computed BM25 on the 3-doc micro corpus (FIXTURES.md §3) — the
exact-value kernel test, mirror of hora pinning dot([1,2,3],[1,2,3]) == -14
(/root/reference/src/core/calc.rs:42-51, sign convention metrics.rs:55).

Corpus:
    doc 0: "spark index spark"     dl=3
    doc 1: "index merge"           dl=2
    doc 2: "spark"                 dl=1
N=3, avgdl=2. k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1).
"""

import math

import numpy as np
import pytest

from hora_spark.config import BM25Config
from hora_spark.functions.bm25 import idf_np, score_np
from hora_spark.functions.tokenize import tokenize_py

CFG = BM25Config()
N, AVGDL = 3, 2.0


def hand_score(tf, dl, df):
    idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / AVGDL))


def test_tokenizer_pinned():
    assert tokenize_py("Spark  INDEX, merge!") == ["spark", "index", "merge"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("a1-b2_c3") == ["a1", "b2", "c3"]
    assert tokenize_py("ÜBER café") == ["ber", "caf"]  # pinned ascii classes


def test_idf_exact():
    # df(spark)=2: ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    assert idf_np(N, np.array([2]), CFG)[0] == pytest.approx(math.log(1.6), abs=1e-12)
    # df(merge)=1: ln((3-1+0.5)/(1+0.5)+1) = ln(8/3)
    assert idf_np(N, np.array([1]), CFG)[0] == pytest.approx(math.log(8 / 3), abs=1e-12)


def test_idf_monotone_nonnegative():
    idfs = idf_np(1000, np.arange(1, 1000), CFG)
    assert (np.diff(idfs) < 0).all()
    assert (idfs >= 0).all()


def test_score_exact_values():
    # doc0, term spark: tf=2, dl=3, df=2
    got = score_np(np.array([2]), np.array([3]), idf_np(N, np.array([2]), CFG), AVGDL, CFG)[0]
    want = math.log(1.6) * 2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2))
    assert got == pytest.approx(want, abs=1e-12)
    # doc2, term spark: tf=1, dl=1, df=2
    got2 = score_np(np.array([1]), np.array([1]), idf_np(N, np.array([2]), CFG), AVGDL, CFG)[0]
    want2 = math.log(1.6) * 1 / (1 + 1.2 * (0.25 + 0.75 * 1 / 2))
    assert got2 == pytest.approx(want2, abs=1e-12)
    assert got2 == pytest.approx(hand_score(1, 1, 2), abs=1e-12)


def test_ranking_micro_query_spark():
    """query 'spark': doc2 (short, tf=1) must outrank doc0? compute both —
    rank order asserted from the hand numbers, not from the engine."""
    s0 = hand_score(2, 3, 2)  # doc0
    s2 = hand_score(1, 1, 2)  # doc2
    # doc0: 2/(2+1.2*1.375)=0.5479.. ; doc2: 1/(1+1.2*0.625)=0.5714..
    assert s2 > s0
    assert s0 == pytest.approx(math.log(1.6) * 2 / (2 + 1.65), abs=1e-12)
    assert s2 == pytest.approx(math.log(1.6) * 1 / (1 + 0.75), abs=1e-12)
