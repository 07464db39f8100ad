"""search_after deep paging: page N via a (score, doc_id) cursor must
equal the corresponding slice of the full (score DESC, doc_id ASC)
ranking — for the pruned AND exhaustive paths, across modes, composed
with NOT terms and deletes, and mixed per-query inside one batch.

The contract mirrors Lucene/Elasticsearch searchAfter (constant cost
per page) rather than OFFSET (page N costs N·k per shard). Cursor
equality is exact-float sound because cursors come from the engine's
own previous page: the pinned summation order makes the recomputed
score bit-identical (same argument as the pruned≡exhaustive identity,
/root/reference/src/lib.rs:89-111 recast)."""

import shutil

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.datagen import generate_transcripts
from hora_spark.engine import Engine

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=8,
                                     store_positions=True))
K = 7  # small pages over a tie-heavy corpus → cursors land on ties


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    df = generate_transcripts(spark, 150, seed=11).cache()
    df.count()
    path = str(tmp_path_factory.mktemp("afteridx"))
    e = Engine(spark, path, CFG)
    e.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    yield e
    df.unpersist()
    shutil.rmtree(path, ignore_errors=True)


def rows(d):
    return [(r["doc_id"], r["score"]) for r in d.collect()]


def paged(eng, text, k, n_pages, **kw):
    """Collect n_pages pages of size k by threading the cursor."""
    out, cursor = [], None
    for _ in range(n_pages):
        page = rows(eng.search(text, k=k, after=cursor, **kw))
        out.extend(page)
        if len(page) < k:
            break
        cursor = (page[-1][1], page[-1][0])  # (score, doc_id) of last row
    return out


@pytest.mark.parametrize("prune", [True, False])
@pytest.mark.parametrize("q", ["the water people", "time of day"])
def test_pages_reconstruct_full_ranking(eng, q, prune):
    full = rows(eng.search(q, k=4 * K, prune=prune))
    assert paged(eng, q, K, 4, prune=prune) == full


@pytest.mark.parametrize("mode,kw", [
    ("all", {}),
    ("near", {"near_window": 6}),
])
def test_after_composes_with_modes(eng, mode, kw):
    q = "the water"
    full = rows(eng.search(q, k=3 * K, mode=mode, **kw))
    assert paged(eng, q, K, 3, mode=mode, **kw) == full


def test_after_composes_with_not_terms(eng):
    q, ex = "the water people", "time"
    full = rows(eng.search(q, k=3 * K, exclude=ex))
    assert paged(eng, q, K, 3, exclude=ex) == full


def test_pruned_page_equals_exhaustive_page(eng):
    q = "the water people time"
    p1 = rows(eng.search(q, k=K))
    cursor = (p1[-1][1], p1[-1][0])
    page_pruned = rows(eng.search(q, k=K, after=cursor, prune=True))
    page_exh = rows(eng.search(q, k=K, after=cursor, prune=False))
    assert page_pruned == page_exh
    assert p1 and page_pruned and not (set(p1) & set(page_pruned))


def test_mixed_batch_with_per_query_cursors(eng):
    """One Spark job where some queries page and some don't."""
    q = "the water people"
    full = rows(eng.search(q, k=2 * K))
    cursor = (full[K - 1][1], full[K - 1][0])
    res = eng.searches([
        {"text": q},                      # page 1
        {"text": q, "after": cursor},     # page 2
        {"text": "time day", "mode": "all"},
    ], k=K)
    got = {qid: [] for qid in range(3)}
    for r in res.collect():
        got[r["query_id"]].append((r["doc_id"], r["score"]))
    assert got[0] == full[:K]
    assert got[1] == full[K:2 * K]
    assert got[2] == rows(eng.search("time day", k=K, mode="all"))


def test_cursor_past_end_returns_empty(eng):
    q = "the water"
    assert rows(eng.search(q, k=K, after=(-1e18, 2**62))) == []
