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


def test_binary_row_slices_respects_byte_budget():
    """Emitters must chunk Arrow binary output so no slice's payload
    exceeds the budget (the int32-offset ceiling guard at scale)."""
    from mecab_ko_lucene_analyzer_spark.index.blocks import (
        _binary_row_slices,
        _pa_binary,
    )

    # 6 rows with payload sizes 4,4,4,4,4,4 → budget 10 forces ≤2 rows
    bounds = np.arange(0, 28, 4, dtype=np.int64)
    slices = list(_binary_row_slices((bounds,), 6, max_bytes=10))
    assert slices == [(0, 2), (2, 4), (4, 6)]
    # a second, tighter column dominates the split
    tight = np.arange(0, 70, 10, dtype=np.int64)
    slices = list(_binary_row_slices((bounds, tight), 6, max_bytes=20))
    assert all(hi - lo <= 2 for lo, hi in slices)
    assert [lo for lo, _ in slices] + [slices[-1][1]] == sorted(
        {lo for lo, _ in slices} | {hi for _, hi in slices}
    )
    # single oversize row never stalls (advances one row; _pa_binary
    # raises loudly for it rather than wrapping offsets)
    big = np.array([0, 50], dtype=np.int64)
    assert list(_binary_row_slices((big,), 1, max_bytes=10)) == [(0, 1)]
    # fast path: everything under budget → one full range
    assert list(_binary_row_slices((bounds,), 6, max_bytes=1 << 30)) == [(0, 6)]
    # empty input → no slices
    assert list(_binary_row_slices((np.zeros(1, dtype=np.int64),), 0)) == []

    # rebased slice construction: bytes round-trip per slice
    data = np.frombuffer(b"aaaabbbbccccddddeeeeffff", dtype=np.uint8)
    arr = _pa_binary(data, bounds[2:5])  # rows 2..3 of the original
    assert arr.to_pylist() == [b"cccc", b"dddd"]

    # the int32 ceiling raises instead of silently wrapping
    import pytest

    huge = np.array([0, 2**31], dtype=np.int64)
    with pytest.raises(ValueError, match="2 GiB"):
        _pa_binary(np.empty(0, dtype=np.uint8), huge)


def test_pack_stage_multi_slice_emission_direct(monkeypatch):
    """Driver-side (no Spark) check that the pack stage REALLY splits
    its output under a small byte budget and that the union of slices
    decodes identically to the single-batch emission."""
    import pyarrow as pa

    import mecab_ko_lucene_analyzer_spark.index.blocks as blocks_mod
    from mecab_ko_lucene_analyzer_spark.index.blocks import _pack_stage_arrow

    n = 200
    batch = pa.RecordBatch.from_pydict(
        {
            "term": [f"t{i % 7}" for i in range(n)],
            "doc_id": list(range(n)),
            "tf": [1 + i % 3 for i in range(n)],
            "doc_len": [10] * n,
            "positions": [bytes([i % 120]) for i in range(n)],
        },
        schema=pa.schema(
            [
                ("term", pa.string()),
                ("doc_id", pa.int64()),
                ("tf", pa.int64()),
                ("doc_len", pa.int64()),
                ("positions", pa.binary()),
            ]
        ),
    )
    pack = _pack_stage_arrow(frozenset(), 16, 128)
    single = list(pack(iter([batch])))
    assert len(single) == 1

    orig = blocks_mod._binary_row_slices
    monkeypatch.setattr(
        blocks_mod,
        "_binary_row_slices",
        lambda b, r, max_bytes=1 << 30: orig(b, r, max_bytes=16),
    )
    sliced = list(pack(iter([batch])))
    assert len(sliced) > 1  # the budget genuinely engaged
    merged = pa.Table.from_batches(sliced)
    base = pa.Table.from_batches(single)
    assert merged.to_pylist() == base.to_pylist()
