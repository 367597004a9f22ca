"""Property tests for the varint/delta posting codec (FIXTURES.md §F4:
decode(encode(x)) == x, plus golden byte checks)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mecab_ko_lucene_analyzer_spark.index.codec import (
    decode_block,
    decode_varints,
    encode_block,
    encode_varints,
)


def test_varint_golden_bytes():
    # LEB128 spot checks
    assert encode_varints(np.array([0])) == b"\x00"
    assert encode_varints(np.array([1])) == b"\x01"
    assert encode_varints(np.array([127])) == b"\x7f"
    assert encode_varints(np.array([128])) == b"\x80\x01"
    assert encode_varints(np.array([300])) == b"\xac\x02"
    assert encode_varints(np.array([])) == b""
    assert list(decode_varints(b"\xac\x02\x7f\x00")) == [300, 127, 0]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=500)
)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(decode_varints(encode_varints(arr))) == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),  # doc gap seed
            st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=20),
        ),
        min_size=1,
        max_size=128,
    )
)
def test_block_roundtrip(rows):
    doc_ids = np.cumsum([r[0] + 1 for r in rows]).astype(np.uint64)
    positions = [np.cumsum(np.array(r[1], dtype=np.uint64) + 1) for r in rows]
    tfs = np.array([len(p) for p in positions], dtype=np.uint64)
    enc = encode_block(doc_ids, tfs, positions)
    docs2, tfs2, pos2 = decode_block(*enc)
    assert list(docs2) == list(doc_ids)
    assert list(tfs2) == list(tfs)
    assert len(pos2) == len(positions)
    for a, b in zip(pos2, positions):
        assert list(a) == list(b)


def test_compression_is_effective():
    # dense doc ids → ~1 byte per doc
    docs = np.arange(0, 128, dtype=np.uint64) + 10**9
    tfs = np.ones(128, dtype=np.uint64)
    pos = [np.array([5], dtype=np.uint64)] * 128
    dd, tt, pp = encode_block(docs, tfs, pos)
    assert len(dd) <= 128 + 5  # first doc absolute, then 1-byte deltas
    assert len(tt) == 128
    assert len(pp) == 128
