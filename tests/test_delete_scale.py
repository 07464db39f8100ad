"""Scale guard on the tombstone set: large delete sets must never be
collected to the driver.

The broadcast path collects the deletes table to one sorted array — fine
for the documented "tiny relative to corpus" contract, but a bulk purge
(say 1% of 10^12 docs) would OOM the driver. Above
EngineConfig.max_broadcast_deletes the query and compaction paths switch
to a shard-aligned cogroup (doc-range sharding: doc_id // shard_size IS
the shard key), which this file pins to (a) produce identical results to
the broadcast path and (b) perform NO driver materialization of the ids.
"""

import dataclasses

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.datagen import generate_transcripts
from hora_spark.engine import Engine
from hora_spark.streaming.incremental import merge_segments

CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=8))
# threshold 0 → EVERY non-empty delete set takes the cogroup path
CFG_JOIN = dataclasses.replace(CFG, max_broadcast_deletes=0)

QUERIES = ["water people time", "the of and", "zebra water"]


def _results(eng, k=12):
    return [
        (r["query_id"], r["doc_id"], r["score"])
        for r in eng.searches(QUERIES, k=k).collect()
    ]


@pytest.fixture(scope="module")
def deleted_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("delscale") / "idx")
    df = generate_transcripts(spark, 60, seed=13)
    eng = Engine(spark, root, CFG)
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    # a delete set spanning many shards, including some top-ranked docs
    top = eng.search(QUERIES[0], k=6).collect()
    victims = sorted({r["doc_id"] for r in top[:3]} | set(range(0, 900, 7)))
    out = eng.delete(victims)
    assert out["n_deletes"] == len(victims)  # meta tracks the volume
    return root, victims


def _no_driver_collect(store):
    """Poison deleted_ids: the over-threshold path must never call it."""

    def boom(version=None):  # pragma: no cover - the assert is the point
        raise AssertionError("deleted_ids() collected ids on the driver "
                             "despite n_deletes > max_broadcast_deletes")

    store.deleted_ids = boom


def test_cogroup_deletes_match_broadcast_and_skip_driver(spark, deleted_index):
    root, victims = deleted_index
    expect = _results(Engine(spark, root, CFG))          # broadcast path
    eng_join = Engine(spark, root, CFG_JOIN)             # forced cogroup
    _no_driver_collect(eng_join.store)
    got = _results(eng_join)
    assert got == expect
    assert not {d for _, d, _ in got} & set(victims)


def test_cogroup_compaction_matches_broadcast(spark, deleted_index, tmp_path):
    import shutil

    root, victims = deleted_index
    a, b = str(tmp_path / "bc"), str(tmp_path / "cg")
    shutil.copytree(root, a)
    shutil.copytree(root, b)
    merge_segments(spark, Engine(spark, a, CFG).store, CFG)
    eng_cg = Engine(spark, b, CFG_JOIN)
    _no_driver_collect(eng_cg.store)
    merge_segments(spark, eng_cg.store, CFG_JOIN)
    for root2 in (a, b):
        eng2 = Engine(spark, root2, CFG)
        assert not eng2.store.exists("deletes")          # tombstones cleared
        assert int(eng2.store.meta().get("n_deletes", 0)) == 0
    assert _results(Engine(spark, a, CFG)) == _results(Engine(spark, b, CFG))


def test_threshold_boundary_uses_broadcast(spark, deleted_index):
    """At exactly n_deletes == threshold the cheap broadcast path is used
    (guard is strict >): deleted_ids IS called, results unchanged."""
    root, victims = deleted_index
    cfg_eq = dataclasses.replace(CFG, max_broadcast_deletes=len(victims))
    eng = Engine(spark, root, cfg_eq)
    called = {}
    orig = eng.store.deleted_ids
    eng.store.deleted_ids = lambda v=None: called.setdefault("x", orig(v))
    got = _results(eng)
    assert called and got == _results(Engine(spark, root, CFG))
