"""Codec round-trips (mirror of the reference's exact-value kernel unit
tests, /root/reference/src/core/node.rs:177-186, calc.rs:42-51)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hora_spark.functions.codec import (
    decode_block,
    decode_posting,
    encode_block,
    encode_posting,
    varint_decode,
    varint_encode,
)


def test_block_roundtrip_known():
    ids = np.array([3, 7, 8, 300, 70000, 2**40], dtype=np.int64)
    buf = encode_block(ids, base=0, delta=True)
    out = decode_block(buf, base=0, delta=True)
    assert (out == ids).all()
    # gaps max is 2**40-70000 → width 8
    assert buf[0] == 8


def test_block_width_selection():
    assert encode_block(np.arange(10), delta=False)[0] == 1
    assert encode_block(np.array([70000]), delta=False)[0] == 4
    assert encode_block(np.array([255]), delta=False)[0] == 1
    assert encode_block(np.array([256]), delta=False)[0] == 2


def test_empty_block():
    assert len(decode_block(b"", 0, True)) == 0
    assert encode_block(np.array([], dtype=np.int64)) == bytes([1])


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=500))
@settings(max_examples=50, deadline=None)
def test_block_roundtrip_property(vals):
    ids = np.unique(np.array(sorted(vals), dtype=np.int64))
    buf = encode_block(ids, base=0, delta=True)
    assert (decode_block(buf, base=0, delta=True) == ids).all()


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=50, deadline=None)
def test_posting_roundtrip_property(vals, block_size):
    ids = np.unique(np.array(vals, dtype=np.int64))
    tfs = (ids % 7) + 1
    db, tb, last, ns = encode_posting(ids, tfs, block_size)
    out_ids, out_tfs = decode_posting(db, tb)
    assert (out_ids == ids).all()
    assert (out_tfs == tfs).all()
    assert int(ns.sum()) == len(ids)
    if len(ids):
        assert last[-1] == ids[-1]


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=300))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(v)) == v).all()


def test_varint_known_bytes():
    # LEB128: 300 = 0xAC 0x02
    assert varint_encode(np.array([300], np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([0], np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], np.uint64)) == b"\x80\x01"


def test_merge_with_deletes_equals_filtered_encode():
    """Property: merge_shard_rows(rows, deleted=D) must equal
    encode_shard_rows over the tuples with D's docs removed — physical
    delete-at-compaction is just a filter on the logical content."""
    import numpy as np
    import pandas as pd

    from hora_spark.operators.segments import encode_shard_rows, merge_shard_rows

    rng = np.random.default_rng(7)
    for trial in range(5):
        n_docs = int(rng.integers(20, 120))
        doc_dl = {d: int(rng.integers(1, 40)) for d in range(n_docs)}
        rows = []
        for t in range(int(rng.integers(3, 12))):
            docs = np.sort(rng.choice(n_docs, size=int(rng.integers(1, n_docs)), replace=False))
            for d in docs:
                rows.append((0, int(d), doc_dl[d], f"t{t}", int(rng.integers(1, 9))))
        pdf = pd.DataFrame(rows, columns=["shard_id", "doc_id", "dl", "term", "tf"])
        full = encode_shard_rows(pdf, block_size=8)

        deleted = np.unique(rng.choice(n_docs, size=max(1, n_docs // 4), replace=False)).astype(np.int64)
        merged = merge_shard_rows(full, block_size=8, deleted=deleted)
        want = encode_shard_rows(pdf[~pdf["doc_id"].isin(deleted)].copy(), block_size=8)

        def canon(df):
            df = df.drop(columns=["encode_us"])
            return sorted(
                (r.term,
                 tuple(bytes(b) for b in r.doc_blocks),
                 tuple(bytes(b) for b in r.tf_blocks),
                 tuple(bytes(b) for b in r.dl_blocks),
                 tuple(r.block_last), tuple(r.block_n),
                 tuple(r.block_tf_max), tuple(r.block_dl_min))
                for r in df.itertuples(index=False)
            )

        assert canon(merged) == canon(want), f"trial {trial}"
