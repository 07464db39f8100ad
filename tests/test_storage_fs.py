"""SnapshotStore manifest layer through the Hadoop FileSystem API: the
same store contract must hold against an explicit `file:/` scheme root
(the stand-in for HDFS/S3A — every manifest read/write, the CURRENT
pointer, commit atomicity, and expire-GC go through the FS API, closing
the r3 'manifests are local-FS-only' caveat)."""

import pytest

from hora_spark.sources.storage import SnapshotStore


@pytest.fixture
def store(spark, tmp_path):
    # explicit scheme → resolved through the Hadoop FS layer, not os/json
    return SnapshotStore(spark, f"file:{tmp_path}/store")


def _df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "x long")


def test_commit_read_time_travel_meta(spark, store):
    d1 = store.write_table("t", _df(spark, [1, 2, 3]))
    v1 = store.commit({"t": [d1]}, meta={"n": 3})
    assert v1 == 1
    d2 = store.write_table("t", _df(spark, [4]))
    v2 = store.commit({"t": [d2]}, replace=False, meta={"extra": True})
    assert v2 == 2
    # head = union of appended dirs; time travel sees the old snapshot
    assert {r["x"] for r in store.read("t").collect()} == {1, 2, 3, 4}
    assert {r["x"] for r in store.read("t", version=1).collect()} == {1, 2, 3}
    # meta merges across commits
    assert store.meta() == {"n": 3, "extra": True}
    assert store.meta(version=1) == {"n": 3}
    # replace swaps the dir list
    d3 = store.write_table("t", _df(spark, [9]))
    store.commit({"t": [d3]}, replace=True)
    assert {r["x"] for r in store.read("t").collect()} == {9}


def test_current_version_from_listing_not_pointer(spark, store):
    """The CURRENT pointer is advisory: corrupting it must not change
    version resolution (the manifest listing is the source of truth)."""
    d = store.write_table("t", _df(spark, [1]))
    store.commit({"t": [d]})
    store._write_text(f"{store.root}/snapshots/CURRENT", "garbage")
    assert store.current_version() == 1
    assert {r["x"] for r in store.read("t").collect()} == {1}


def test_concurrent_commit_detected(spark, store):
    """True race: two writers read the same base version and both try to
    publish v2 — the second rename refuses the existing destination.
    (A writer that lists AFTER the other's publish simply commits v3; the
    guard exists for the read-compute-publish window.)"""
    from unittest import mock

    d = store.write_table("t", _df(spark, [1]))
    store.commit({"t": [d]})
    stale = store.current_version()                 # this writer read v1…
    store._write_text(f"{store.root}/snapshots/v{2:08d}.json",
                      '{"version": 2, "parent": 1, "tables": {}, "meta": {}}')
    d2 = store.write_table("t", _df(spark, [2]))    # …then the other lands v2
    with mock.patch.object(store, "current_version", return_value=stale):
        with pytest.raises(RuntimeError, match="concurrent commit"):
            store.commit({"t": [d2]})
    # the loser's tmp file was cleaned up; the winner's manifest survives
    assert store.current_version() == 2


def test_expire_gc_and_drop_through_fs(spark, store):
    vs = []
    for i in range(4):
        d = store.write_table("t", _df(spark, [i]))
        vs.append(store.commit({"t": [d]}, replace=True))
    out = store.expire_snapshots(keep_last=2)
    assert out["kept_versions"] == [3, 4]
    assert out["removed_manifests"] == 2
    assert out["removed_dirs"] == 2           # v1's and v2's data dirs
    # expired versions are gone; kept ones still read
    with pytest.raises(FileNotFoundError):
        store.read("t", version=1)
    assert {r["x"] for r in store.read("t", version=3).collect()} == {2}
    assert {r["x"] for r in store.read("t").collect()} == {3}
    store.drop()
    assert store.current_version() == 0


def test_engine_build_search_on_file_scheme_root(spark, tmp_path):
    """Whole-engine smoke on a scheme-qualified root: build + search work
    when every store path carries the file: scheme."""
    from hora_spark.config import EngineConfig, IndexConfig
    from hora_spark.engine import Engine

    rows = [("c0", 0, "u", "spark index merge", None),
            ("c0", 1, "u", "index scan", None),
            ("c1", 0, "u", "merge sort", None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string")
    eng = Engine(spark, f"file:{tmp_path}/idx",
                 EngineConfig(index=IndexConfig(block_size=8, n_buckets=2)))
    eng.build(df, id_col=None, order_cols=["conv_id", "turn_idx"])
    got = eng.search("index", k=5).collect()
    assert [r["doc_id"] for r in got] == [1, 0]


def test_s3a_root_warns_nonatomic_rename(spark, monkeypatch):
    """An object-store root (s3a) must emit the best-effort-race-guard
    warning at construction. The sandbox has no s3a jars, so FS
    resolution is stubbed — the warning fires BEFORE resolution either
    way (it keys off the root's scheme string alone)."""
    from hora_spark.sources.storage import SnapshotStore

    class _FakeFS:
        def mkdirs(self, path):
            return True

    monkeypatch.setattr(SnapshotStore, "_resolve_fs",
                        lambda self, sc: _FakeFS())
    with pytest.warns(RuntimeWarning, match="BEST-EFFORT"):
        SnapshotStore(spark, "s3a://bucket/index")


def test_local_root_does_not_warn(spark, tmp_path):
    import warnings as _w

    from hora_spark.sources.storage import SnapshotStore

    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        SnapshotStore(spark, f"file:{tmp_path}/idx_nowarn")
