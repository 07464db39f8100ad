"""Engine invariants (SURVEY.md §5.2 layers 3-5):

- per-turn text equality under stable (conv_id, turn_idx) ordering after a
  pipeline round-trip (BASELINE.json input_hint invariant);
- doc_id assignment identical across runs AND parallelism levels;
- partition independence: segments built at different shuffle widths are
  logically identical, and query results match (the property hora's
  order-dependent HNSW build lacks, /root/reference/src/index/
  hnsw_idx.rs:464-476 — BM25 postings are build-order-free);
- resume: a build crashed mid-wave and resumed equals an uninterrupted
  build (the partial-progress upgrade of dump/load,
  /root/reference/src/index/hnsw_idx.rs:647-719).
"""

import shutil

import pytest
from pyspark.sql import functions as F

from hora_spark.config import EngineConfig, IndexConfig
from hora_spark.datagen import generate_transcripts
from hora_spark.engine import Engine
from hora_spark.operators.corpus import assign_doc_ids

N_CONVS = 60
CFG = EngineConfig(index=IndexConfig(block_size=16, n_buckets=8))
QUERIES = ["the of and", "w00123 w00456", "water people time the"]


@pytest.fixture(scope="module")
def transcripts(spark):
    df = generate_transcripts(spark, N_CONVS, seed=11).cache()
    df.count()
    yield df
    df.unpersist()


def _segment_fingerprint(eng):
    """Logical content of the segment table, order-insensitive."""
    rows = (
        eng.store.read("segments")
        .select("shard_id", "term", "df_local", "doc_blocks", "tf_blocks",
                "dl_blocks", "block_last", "block_tf_max", "block_dl_min")
        .collect()
    )
    return sorted(
        (
            r["shard_id"], r["term"], r["df_local"],
            tuple(bytes(b) for b in r["doc_blocks"]),
            tuple(bytes(b) for b in r["tf_blocks"]),
            tuple(bytes(b) for b in r["dl_blocks"]),
            tuple(r["block_last"]), tuple(r["block_tf_max"]), tuple(r["block_dl_min"]),
        )
        for r in rows
    )


def test_text_equality_roundtrip(spark, transcripts, tmp_path):
    """Write → read → stable order: every turn's text must be unchanged."""
    p = str(tmp_path / "rt")
    transcripts.repartition(7).write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    a = transcripts.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    b = back.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    assert a == b


def test_doc_id_stable_across_parallelism(spark, transcripts):
    a = assign_doc_ids(transcripts, ["conv_id", "turn_idx"], partitions=2)
    b = assign_doc_ids(transcripts, ["conv_id", "turn_idx"], partitions=16)
    ka = {(r["conv_id"], r["turn_idx"]): r["doc_id"]
          for r in a.select("conv_id", "turn_idx", "doc_id").collect()}
    kb = {(r["conv_id"], r["turn_idx"]): r["doc_id"]
          for r in b.select("conv_id", "turn_idx", "doc_id").collect()}
    assert ka == kb
    # dense 0..N-1 following the sort order
    ids = sorted(ka.values())
    assert ids == list(range(len(ids)))
    assert ka[min(ka)] == 0


def test_partition_independence(spark, transcripts, tmp_path):
    """Same input, different shuffle widths → identical segment bytes and
    identical query results."""
    results = []
    for parts in (3, 13):
        path = str(tmp_path / f"idx{parts}")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            eng = Engine(spark, path, CFG)
            eng.build(transcripts.repartition(parts), id_col=None,
                      order_cols=["conv_id", "turn_idx"])
            fp = _segment_fingerprint(eng)
            res = [
                [(r["doc_id"], round(r["score"], 9)) for r in eng.search(q, k=10).collect()]
                for q in QUERIES
            ]
            results.append((fp, res))
        finally:
            spark.conf.unset("spark.sql.shuffle.partitions")
            shutil.rmtree(path, ignore_errors=True)
    assert results[0][0] == results[1][0], "segment content differs across parallelism"
    assert results[0][1] == results[1][1], "query results differ across parallelism"


def test_resume_equals_uninterrupted(spark, transcripts, tmp_path):
    p_full = str(tmp_path / "full")
    p_part = str(tmp_path / "part")
    eng_full = Engine(spark, p_full, CFG)
    eng_full.build(transcripts, id_col=None, order_cols=["conv_id", "turn_idx"], waves=4)

    eng_part = Engine(spark, p_part, CFG)
    with pytest.raises(RuntimeError, match="injected failure"):
        eng_part.build(transcripts, id_col=None, order_cols=["conv_id", "turn_idx"],
                       waves=4, fail_after_wave=2)
    # crashed mid-build: lineage shows partial progress
    partial_segs = {r["seg_id"] for r in eng_part.store.read("lineage").collect()}
    assert 0 < len(partial_segs) < CFG.index.n_buckets

    info = eng_part.build(transcripts, id_col=None, order_cols=["conv_id", "turn_idx"],
                          waves=4, resume=True)
    assert info["shards_skipped"] == len(partial_segs)
    assert _segment_fingerprint(eng_part) == _segment_fingerprint(eng_full)
    for q in QUERIES:
        a = [(r["doc_id"], r["score"]) for r in eng_part.search(q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in eng_full.search(q, k=10).collect()]
        assert a == b
    shutil.rmtree(p_full, ignore_errors=True)
    shutil.rmtree(p_part, ignore_errors=True)


def test_resume_of_complete_index_is_noop(spark, transcripts, tmp_path):
    """A --resume over an ALREADY COMPLETE index must not commit: the
    final stats recommit would recompute corpus stats over the full
    current segment set, silently absorbing any append deltas into the
    frozen stats (a rebuild in disguise). Pin: version unchanged, avgdl
    unchanged, scores unchanged — with an append delta present."""
    from hora_spark.streaming.incremental import append_build

    p = str(tmp_path / "noopres")
    eng = Engine(spark, p, CFG)
    half = transcripts.filter(F.col("turn_idx") % 2 == 0)
    eng.build(half, id_col=None, order_cols=["conv_id", "turn_idx"])
    append_build(spark, eng.store, transcripts.filter(F.col("turn_idx") % 2 == 1),
                 order_cols=["conv_id", "turn_idx"], cfg=eng.cfg,
                 batch_id="delta-odd")
    v0 = eng.store.current_version()
    avgdl0 = float(eng.store.meta()["avgdl"])
    before = [(r["doc_id"], r["score"])
              for r in eng.search(QUERIES[0], k=10).collect()]
    info = eng.build(half, id_col=None, order_cols=["conv_id", "turn_idx"],
                     resume=True)
    assert info["shards_built"] == 0
    assert eng.store.current_version() == v0, "no-op resume must not commit"
    assert float(eng.store.meta()["avgdl"]) == avgdl0, "stats must stay frozen"
    after = [(r["doc_id"], r["score"])
             for r in eng.search(QUERIES[0], k=10).collect()]
    assert before == after
    shutil.rmtree(p, ignore_errors=True)


def test_time_travel_versions(spark, transcripts, tmp_path):
    """Snapshot versions are immutable: a query at an old version still
    runs after later commits (VERSION AS OF semantics)."""
    p = str(tmp_path / "tt")
    eng = Engine(spark, p, CFG)
    eng.build(transcripts, id_col=None, order_cols=["conv_id", "turn_idx"])
    v1 = eng.store.current_version()
    before = [(r["doc_id"], r["score"]) for r in eng.search(QUERIES[0], k=5).collect()]
    # a later commit (e.g. stats rewrite) must not disturb v1 reads
    eng.store.commit({"junk": [eng.store.write_table("junk", transcripts.limit(1))]})
    after = [
        (r["doc_id"], r["score"])
        for r in eng.searches([QUERIES[0]], k=5, version=v1).drop("query_id").collect()
    ]
    assert before == after
    shutil.rmtree(p, ignore_errors=True)


def test_expire_snapshots_gc(spark, transcripts, tmp_path):
    """expire_snapshots removes unreferenced data dirs and old manifests;
    the current snapshot keeps answering queries identically."""
    import os

    p = str(tmp_path / "gc")
    eng = Engine(spark, p, CFG)
    eng.build(transcripts, id_col=None, order_cols=["conv_id", "turn_idx"])
    before = [(r["doc_id"], r["score"]) for r in eng.search(QUERIES[0], k=10).collect()]
    # several extra versions → garbage from replaced tables
    eng.rebuild(build_id="r1")
    eng.rebuild(build_id="r2")
    after_rebuilds = [(r["doc_id"], r["score"]) for r in eng.search(QUERIES[0], k=10).collect()]

    out = eng.store.expire_snapshots(keep_last=2)
    assert out["removed_dirs"] > 0 and out["removed_manifests"] > 0
    got = [(r["doc_id"], r["score"]) for r in eng.search(QUERIES[0], k=10).collect()]
    assert got == after_rebuilds == before
    # expired version unreadable (like Iceberg time travel past expiry)
    with pytest.raises(FileNotFoundError):
        eng.store._manifest(1)
    # no orphan data dirs left: every remaining dir is referenced
    data_root = os.path.join(p, "data")
    referenced = set()
    for v in out["kept_versions"]:
        for dirs in eng.store._manifest(v)["tables"].values():
            referenced.update(dirs)
    for table in os.listdir(data_root):
        for d in os.listdir(os.path.join(data_root, table)):
            assert os.path.join(data_root, table, d) in referenced
    # re-expire with a LARGER window than manifests remaining must not
    # crash (regression: keep window assumed every version still on disk)
    out2 = eng.store.expire_snapshots(keep_last=10)
    assert out2["removed_dirs"] == 0
    assert eng.search(QUERIES[0], k=10).count() == 10
    shutil.rmtree(p, ignore_errors=True)
