from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from contextinator_spark.operators.compress import (
    block_max,
    decode_postings,
    encode_postings,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = vb_encode(arr)
    dec, off = vb_decode(enc, 0, len(vals))
    assert off == enc.size
    assert np.array_equal(dec, arr)


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(doc_ids, data):
    doc_ids = np.array(sorted(doc_ids), dtype=np.int64)
    n = doc_ids.size
    tfs = np.array(data.draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n)), dtype=np.int32)
    dls = np.array(data.draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n)), dtype=np.int32)
    blob = encode_postings(doc_ids, tfs, dls)
    d, t, l = decode_postings(blob)
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)


def test_empty_postings():
    blob = encode_postings(np.array([], dtype=np.int64), np.array([]), np.array([]))
    d, t, l = decode_postings(blob)
    assert d.size == 0 and t.size == 0 and l.size == 0


def test_block_max():
    ids = np.arange(1, 301, dtype=np.int64)
    tfs = np.ones(300, dtype=np.int32)
    tfs[150] = 9
    dls = np.full(300, 5, dtype=np.int32)
    dls[10] = 2
    bm = block_max(ids, tfs, dls, block_size=128)
    assert [b["upper_doc"] for b in bm] == [128, 256, 300]
    assert [b["max_tf"] for b in bm] == [1, 9, 1]
    assert bm[0]["min_dl"] == 2


def test_compression_ratio_dense():
    # dense small deltas should compress far below 8 bytes/posting
    ids = np.cumsum(np.random.default_rng(0).integers(1, 20, 10000))
    tfs = np.random.default_rng(1).integers(1, 5, 10000)
    dls = np.random.default_rng(2).integers(50, 500, 10000)
    blob = encode_postings(ids.astype(np.int64), tfs, dls)
    assert len(blob) < 10000 * 5


def test_encode_posting_groups_matches_per_group_encode():
    """Fused multi-group encoder == per-group encode_postings, byte-identical
    (LEB128 is per-value, so group slicing of the fused stream is exact)."""
    import numpy as np

    from contextinator_spark.operators.compress import (
        decode_postings,
        encode_posting_groups,
        encode_postings,
    )

    rng = np.random.default_rng(11)
    groups = []
    for _ in range(60):
        c = int(rng.integers(1, 300))
        d = np.sort(rng.choice(2**55, size=c, replace=False)).astype(np.int64)
        t = rng.integers(1, 1000, c).astype(np.int64)
        l = rng.integers(1, 100000, c).astype(np.int64)
        groups.append((d, t, l))
    D = np.concatenate([g[0] for g in groups])
    T_ = np.concatenate([g[1] for g in groups])
    L = np.concatenate([g[2] for g in groups])
    counts = np.array([g[0].size for g in groups])
    ends = np.cumsum(counts)
    starts = ends - counts
    blobs = encode_posting_groups(D, T_, L, starts, ends)
    for b, (d, t, l) in zip(blobs, groups):
        assert b == encode_postings(d, t, l)
        dd, tt, ll = decode_postings(b)
        assert np.array_equal(dd, d)
        assert np.array_equal(tt, t.astype(np.int32))
        assert np.array_equal(ll, l.astype(np.int32))
