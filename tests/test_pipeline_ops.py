"""Training-data pipeline operators: dedup (exact/minhash/simhash/jaccard),
similarity search (brute force + LSH, recall floor mirroring the
reference's accuracy harness /root/reference/src/lib.rs:97-111), text
analysis, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hora_spark.operators import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


# ------------------------------------------------------------------ dedup --

def test_exact_dedup_synthetic(spark):
    rows = [(0, "Hello world!"), (1, "hello, WORLD"), (2, "different text"),
            (3, "hello world"), (4, None), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = dedup.exact_duplicates(df).collect()
    # 0,1,3 normalize to "hello world"; 4 and 5 normalize to "" (dup pair)
    by_keep = {r["keep_doc_id"]: r["n_docs"] for r in groups}
    assert by_keep == {0: 3, 4: 2}
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(df).collect())
    assert kept == [0, 2, 4]


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated words about spark segments postings compression blocks"
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far), (3, base + " extra")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_candidates(df, n_hashes=16, bands=8).collect()}
    assert (0, 1) in pairs
    assert (0, 3) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs
    # verify stage: exact jaccard on candidates
    ver = dedup.jaccard_pairs(df, spark.createDataFrame(sorted(pairs), "doc_a long, doc_b long"))
    for r in ver.collect():
        assert 0.0 <= r["jaccard"] <= 1.0
        if (r["doc_a"], r["doc_b"]) == (0, 1):
            assert r["jaccard"] > 0.5


def test_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e"), (2, "x y z w")], "doc_id long, text string"
    )
    # shingles w=3: doc0 {abc,bcd}, doc1 {abc,bce} → J = 1/3
    res = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup.jaccard_pairs(df).collect()}
    assert res[(0, 1)] == pytest.approx(1 / 3, abs=1e-6)
    assert res[(0, 2)] == 0.0


def test_simhash_identical_and_near(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta"),
         (1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different content here nothing shared at all")],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in dedup.simhash_near_pairs(df).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs or pairs[(0, 2)] > 0


def test_exact_dedup_on_documents(docs):
    n = docs.count()
    assert dedup.exact_dedup(docs).count() <= n


# ------------------------------------------------------------- similarity --

@pytest.fixture(scope="module")
def knn_truth(embeddings):
    """numpy ground truth (the hdf5 `neighbors` analog,
    /root/reference/examples/src/ann_bench.rs:37-44)."""
    rows = embeddings.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = mn @ mn.T
    return ids, sims


def test_bruteforce_knn_exact(spark, embeddings, knn_truth):
    ids, sims = knn_truth
    k = 10
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.bruteforce_knn(embeddings, queries, k=k).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["sim"]))
    for q in range(3):
        order = np.lexsort((ids, -sims[q]))[:k]
        want = [(int(ids[i]), round(float(sims[q][i]), 6)) for i in order]
        assert by_q[q] == want


def test_lsh_knn_recall_floor(spark, embeddings):
    """LSH recall vs brute force ≥ 0.3 at k=10 (multi-probe, 4 tables) —
    the recall-harness assertion the reference only prints."""
    k = 10
    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = similarity.bruteforce_knn(embeddings, queries, k=k).collect()
    ls = similarity.lsh_knn(embeddings, queries, k=k, n_planes=6, n_tables=6).collect()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for r in ls:
        total += 1
        if r["vec_id"] in bf_sets[r["query_id"]]:
            hits += 1
    assert total > 0
    assert hits / (len(bf_sets) * k) >= 0.3


# --------------------------------------------------------------- textstats --

def test_textstats_values(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog"), (1, "!!! ??? ..."), (2, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.analyze(df).collect()}
    assert rows[0]["n_tokens"] == 5
    assert rows[0]["stopword_ratio"] == pytest.approx(0.6, abs=1e-6)  # the, and, the
    assert rows[0]["punct_ratio"] == 0.0
    assert rows[0]["is_english"] is True
    assert rows[1]["n_tokens"] == 0
    assert rows[1]["punct_ratio"] > 0.5
    assert rows[2]["n_tokens"] == 0
    assert rows[0]["quality"] > rows[1]["quality"]


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "a b c d f")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", textstats.fingerprint_col(F.col("text")).alias("fp")).collect()}
    assert fps[0] == fps[1]
    assert len(fps[0]) == 32  # md5 hex


# --------------------------------------------------------------- multimodal --

def test_multimodal_real_decode(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 30
    assert all(r["decode_ok"] for r in feats)      # every payload parses
    for r in feats:
        assert len(r["features"]) == multimodal.FEATURE_DIM
    # determinism: same payload → same features
    feats2 = multimodal.extract_features(multimodal.synth_media(spark, n=30)).collect()
    assert sorted((r["media_id"], tuple(r["features"])) for r in feats) == \
           sorted((r["media_id"], tuple(r["features"])) for r in feats2)
    plan = multimodal.frame_sample_plan(multimodal.synth_media(spark, n=30)).collect()
    assert all(r["ts_ms"] % 1000 == 0 for r in plan)
    assert len({r["media_id"] for r in plan}) == 10  # every 3rd is video


def test_codec_pins():
    """Hand-computed decode values: a 2×1 PPM and a constant WAV."""
    import numpy as np

    px = np.array([[[10, 20, 30], [50, 60, 70]]], dtype=np.uint8)  # (1,2,3)
    back = multimodal.decode_ppm(multimodal.encode_ppm(px))
    assert (back == px).all()
    f = multimodal._image_features(back)
    assert (f[0], f[1]) == (2, 1)
    assert tuple(f[2:5]) == (30.0, 40.0, 50.0)     # per-channel means
    assert f[9] == 40.0                            # |Δ| horizontal = 40 each ch

    samples = np.full(8000, 16384, dtype=np.int16)  # constant 0.5 amplitude
    dec, rate = multimodal.decode_wav(multimodal.encode_wav(samples, 8000))
    assert rate == 8000 and len(dec) == 8000
    af = multimodal._audio_features(dec, rate)
    assert abs(af[2] - 0.5) < 1e-9                 # RMS of a constant 0.5
    assert af[3] == 0.0                            # no zero crossings

    frames = [px, px * 2]
    vid = multimodal.encode_video(frames)
    got = list(multimodal.decode_video_frames(vid, every=2))
    assert len(got) == 1 and got[0][0] == 0        # only frame 0 decoded


def test_multimodal_corrupt_payload_counted_not_fatal(spark):
    rows = [(0, "image", bytearray(b"junk bytes"), "image/x", 1, 1, None),
            (1, "audio", bytearray(b"RIFFxxxx"), "audio/wav", None, None, 10)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["decode_ok"] for r in multimodal.extract_features(df).collect()}
    assert got == {0: False, 1: False}


def test_multimodal_resize_and_frame_sampling(spark):
    media = multimodal.synth_media(spark, n=30)
    resized = multimodal.resize_images(media, out_w=4, out_h=4).collect()
    assert len(resized) == 10                      # every 3rd is an image
    for r in resized:
        px = multimodal.decode_ppm(bytes(r["payload"]))
        assert px.shape == (4, 4, 3)
    fs = multimodal.frame_sample_features(media, every=2).collect()
    assert len(fs) > 0
    assert all(r["frame_idx"] % 2 == 0 for r in fs)  # only sampled frames


def test_lsh_overcap_buckets_become_star_pairs(spark):
    """A boilerplate class of b identical docs must NOT be dropped by the
    bucket cap (round-1 bug) and must NOT blow up to b² pairs: over-cap
    buckets emit b−1 star pairs against the min doc_id, and the composed
    pipeline removes every copy but one."""
    from hora_spark.operators import dedup
    from hora_spark.operators.pipeline import prepare_training_corpus

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    uniq = [
        f"completely different document number {i} with distinct words "
        f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        for i in range(5)
    ]
    rows = [(i, boiler) for i in range(1000)] + [
        (1000 + i, t) for i, t in enumerate(uniq)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = dedup.minhash_lsh_candidates(df, n_hashes=8, bands=4, max_bucket=64)
    got = pairs.collect()
    # exactly the star: (0, b) for every other boilerplate member, per band
    # deduped → 999 pairs, O(b) not O(b²)
    assert len(got) == 999
    assert {r["doc_a"] for r in got} == {0}
    assert {r["doc_b"] for r in got} == set(range(1, 1000))

    cleaned, rep = prepare_training_corpus(df, min_tokens=5, min_quality=0.0)
    kept = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert 0 in kept
    assert not kept & set(range(1, 1000)), "boilerplate copies survived dedup"
    assert kept >= {1000 + i for i in range(5)}


def test_simhash_overcap_star_pairs(spark):
    from hora_spark.operators import dedup

    rows = [(i, "same boilerplate text repeated everywhere") for i in range(300)]
    rows += [(900, "an entirely different document about other topics")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.simhash_near_pairs(df, max_bucket=64).collect()
    # identical fingerprints → star per band, distinct → 299 rows, hamming 0
    star = [r for r in pairs if r["doc_a"] == 0]
    assert len(star) == 299
    assert all(r["hamming"] == 0 for r in star)
    assert len(pairs) == len(star)  # the unique doc pairs with nobody


def test_wav_stereo_and_bit_depth_handling():
    """Stereo PCM16 downmixes to mono (mean); non-16-bit raises (→ counted
    as decode failure) instead of silently mis-reading frames."""
    import struct

    import numpy as np

    # hand-built stereo WAV: L = +0.5, R = -0.5 → downmix exactly 0
    l = np.full(100, 16384, dtype="<i2")
    r = np.full(100, -16384, dtype="<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = l, r
    data = inter.tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
                      b"fmt ", 16, 1, 2, 8000, 8000 * 4, 4, 16,
                      b"data", len(data))
    samples, rate = multimodal.decode_wav(hdr + data)
    assert rate == 8000 and len(samples) == 100
    assert np.abs(samples).max() == 0.0            # perfect cancellation

    # 8-bit PCM → ValueError (decode_ok=False path), never garbage features
    hdr8 = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + 4, b"WAVE",
                       b"fmt ", 16, 1, 1, 8000, 8000, 1, 8, b"data", 4)
    with pytest.raises(ValueError):
        multimodal.decode_wav(hdr8 + b"\x00\x01\x02\x03")


def test_frame_sampling_drops_whole_corrupt_video(spark):
    """A truncated mid-stream frame drops the WHOLE video's rows — partial
    frame sets must not masquerade as a complete sample."""
    import struct

    import numpy as np

    good = [np.full((2, 2, 3), 9, dtype=np.uint8) for _ in range(3)]
    ok_payload = multimodal.encode_video(good)
    bad_payload = bytearray(ok_payload)
    # truncate the last frame's bytes: frame 0 would decode fine
    bad_payload = bytes(bad_payload[:-10])
    rows = [(0, "video", bytearray(ok_payload), "video/x-vid0", 2, 2, 3000),
            (1, "video", bytearray(bad_payload), "video/x-vid0", 2, 2, 3000)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    fs = multimodal.frame_sample_features(df, every=2).collect()
    assert {r["media_id"] for r in fs} == {0}


def test_multimodal_fixture_is_current():
    """The committed oracle fixture (tests/fixtures/multimodal_expected.
    parquet) must match what the CURRENT decoders produce — if a decoder or
    synth_media changes, rerun tools/make_multimodal_fixture.py."""
    import os

    import pandas as pd

    fx = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "multimodal_expected.parquet")
    want = multimodal.expected_features_local(n=60, seed=42)
    got = pd.read_parquet(fx)
    pd.testing.assert_frame_equal(got, want)


def test_connected_components_transitive_closure(spark):
    """a~b, b~c collapse into one cluster with the min id as representative;
    separate components stay separate; a 30-long chain converges well inside
    the iteration cap (pointer doubling => O(log diameter) rounds)."""
    from hora_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(100, 130)]           # diameter 30
    pairs = [(1, 2), (2, 3), (10, 11)] + chain
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(df).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert all(got[i] == 100 for i in range(100, 131))
    # order of the pair columns must not matter (undirected)
    rev = spark.createDataFrame([(b, a) for a, b in pairs], "doc_a long, doc_b long")
    got_rev = {r["doc_id"]: r["cluster_id"]
               for r in connected_components(rev).collect()}
    assert got_rev == got


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """With a SparkContext checkpoint dir configured, _cut_lineage must
    take the RELIABLE checkpoint path (files land in the dir — the
    cluster-durable mode the r3 verdict asked for) and results must be
    identical to the localCheckpoint fallback."""
    import os

    from hora_spark.operators.dedup import connected_components

    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (30, 31)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    baseline = {r["doc_id"]: r["cluster_id"]
                for r in connected_components(df).collect()}

    sc = spark.sparkContext
    ckdir = str(tmp_path / "cc_ck")
    sc.setCheckpointDir(ckdir)
    try:
        got = {r["doc_id"]: r["cluster_id"]
               for r in connected_components(df).collect()}
        # the reliable path actually wrote checkpoint files
        written = [os.path.join(dp, f)
                   for dp, _, fs in os.walk(ckdir) for f in fs]
        assert written, "no reliable-checkpoint files written"
    finally:
        # reset so the session-scoped context goes back to the
        # localCheckpoint fallback for every other test
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert sc.getCheckpointDir() is None
    assert got == baseline
    assert got[1] == got[2] == got[3] == 1 and got[30] == got[31] == 30
