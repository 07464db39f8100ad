"""IndexConfig.store_dl — the per-posting-dl space/time trade.

store_dl=True (default): dl_blocks ride with every posting; queries decode
O(posting) bytes. store_dl=False: the round-1 layout — no dl_blocks, every
query also scans+decodes the shard's norms sidecar. The two layouts MUST
return byte-identical scores (same avgdl-free block bounds, same WAND
pruning), differ in index bytes, and keep their mode across append and
compaction (mode follows the snapshot meta, not the caller's cfg).
"""

import dataclasses

import pytest

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.datagen import generate_transcripts
from hora_spark.engine import Engine
from hora_spark.operators.segments import NORMS_TERM
from hora_spark.streaming.incremental import append_build, merge_segments

CFG_DL = EngineConfig(index=IndexConfig(block_size=16, n_buckets=8))
CFG_NODL = EngineConfig(index=IndexConfig(block_size=16, n_buckets=8, store_dl=False))

QUERIES = ["water people time", "the of and", "zebra", "join hash row"]


def _results(eng, k=10):
    return [(r["query_id"], r["doc_id"], r["score"])
            for r in eng.searches(QUERIES, k=k).collect()]


@pytest.fixture(scope="module")
def both(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("storedl")
    df = generate_transcripts(spark, 50, seed=21)
    engs = {}
    for name, cfg in (("dl", CFG_DL), ("nodl", CFG_NODL)):
        eng = Engine(spark, str(root / name), cfg)
        eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
        engs[name] = eng
    return engs


def test_layouts_differ_but_scores_identical(spark, both):
    rows_dl = both["dl"].store.read("segments").collect()
    rows_nodl = both["nodl"].store.read("segments").collect()
    assert all(len(r["dl_blocks"]) > 0 for r in rows_dl if r["term"] != NORMS_TERM)
    assert all(len(r["dl_blocks"]) == 0 for r in rows_nodl)
    assert both["nodl"].store.meta()["store_dl"] is False
    # pruned AND exhaustive paths agree across layouts
    assert _results(both["dl"]) == _results(both["nodl"])
    a = both["dl"].searches(QUERIES, k=10, prune=False).collect()
    b = both["nodl"].searches(QUERIES, k=10, prune=False).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_nodl_layout_with_cogroup_deletes(spark, both, tmp_path):
    """The two orthogonal modes compose: store_dl=False (norms rows ride
    the scan) + over-threshold deletes (tombstones cogrouped per shard,
    never collected) must equal the broadcast-delete path exactly."""
    import shutil

    root = str(tmp_path / "nodl_del")
    shutil.copytree(both["nodl"].store.root, root)
    eng_bc = Engine(spark, root, CFG_NODL)
    victims = [r["doc_id"] for r in eng_bc.search(QUERIES[0], k=4).collect()][:2]
    eng_bc.delete(victims)
    expect = _results(eng_bc)                     # broadcast path
    cfg_join = dataclasses.replace(CFG_NODL, max_broadcast_deletes=0)
    eng_cg = Engine(spark, root, cfg_join)        # forced cogroup
    orig = eng_cg.store.deleted_ids
    eng_cg.store.deleted_ids = lambda v=None: (_ for _ in ()).throw(
        AssertionError("driver collect on the cogroup path"))
    got = _results(eng_cg)
    assert got == expect
    assert not {d for _, d, _ in got} & set(victims)


def test_mode_sticks_through_append_and_compact(spark, both, tmp_path):
    delta = generate_transcripts(spark, 8, seed=5)
    for name in ("dl", "nodl"):
        eng = both[name]
        # append with the DEFAULT cfg (store_dl=True): the index's own mode
        # must win, not the caller's
        append_build(spark, eng.store, delta, cfg=EngineConfig(
            index=IndexConfig(block_size=16, n_buckets=8)))
    assert _results(both["dl"]) == _results(both["nodl"])
    for name, want_dl in (("dl", True), ("nodl", False)):
        merge_segments(spark, both[name].store,
                       EngineConfig(index=IndexConfig(block_size=16, n_buckets=8)))
        rows = both[name].store.read("segments").collect()
        for r in rows:
            if r["term"] == NORMS_TERM:
                continue
            assert (len(r["dl_blocks"]) > 0) == want_dl
    assert _results(both["dl"]) == _results(both["nodl"])
