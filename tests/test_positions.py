"""Positions-aware posting blobs (forward-looking, SURVEY §1.4 optional
`positions`): round-trip property tests + compatibility with the
positions-less decoder (same prefix layout, so readers that don't know
about positions still decode docIDs/tfs/doc_lens correctly)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from contextinator_spark.operators.compress import decode_postings, encode_postings
from contextinator_spark.operators.positions import (
    decode_postings_with_positions,
    encode_postings_with_positions,
)


@st.composite
def postings_with_positions(draw):
    df = draw(st.integers(min_value=1, max_value=40))
    gaps = draw(
        st.lists(st.integers(min_value=1, max_value=10_000), min_size=df, max_size=df)
    )
    doc_ids = np.cumsum(np.array(gaps, dtype=np.int64))
    tfs = np.array(
        draw(st.lists(st.integers(min_value=1, max_value=12), min_size=df, max_size=df)),
        dtype=np.int64,
    )
    dls = np.array(
        draw(st.lists(st.integers(min_value=1, max_value=5_000), min_size=df, max_size=df)),
        dtype=np.int64,
    )
    # per-doc strictly increasing positions, one per occurrence (len == tf)
    pos = []
    for tf in tfs:
        g = draw(
            st.lists(st.integers(min_value=1, max_value=500), min_size=int(tf), max_size=int(tf))
        )
        pos.append(np.cumsum(np.array(g, dtype=np.int64)) - 1)
    return doc_ids, tfs, dls, pos


@settings(max_examples=60, deadline=None)
@given(postings_with_positions())
def test_positions_round_trip(data):
    doc_ids, tfs, dls, pos = data
    blob = encode_postings_with_positions(doc_ids, tfs, dls, pos)
    d2, t2, l2, p2 = decode_postings_with_positions(blob)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs.astype(np.int32))
    assert np.array_equal(l2, dls.astype(np.int32))
    assert len(p2) == len(pos)
    for a, b in zip(p2, pos):
        assert np.array_equal(a, b)


@settings(max_examples=30, deadline=None)
@given(postings_with_positions())
def test_positions_blob_back_compatible(data):
    """A positions blob shares the positions-less prefix: the old decoder
    reads docIDs/tfs/doc_lens from it unchanged (no format break)."""
    doc_ids, tfs, dls, pos = data
    blob = encode_postings_with_positions(doc_ids, tfs, dls, pos)
    d2, t2, l2 = decode_postings(blob)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs.astype(np.int32))
    assert np.array_equal(l2, dls.astype(np.int32))
    # and a positions-less blob is exactly the prefix of the positions blob
    base = encode_postings(doc_ids, tfs, dls)
    assert blob[: len(base)] == base


def test_positions_decoder_rejects_missing_section():
    doc_ids = np.array([3, 7], dtype=np.int64)
    tfs = np.array([2, 1], dtype=np.int64)
    dls = np.array([10, 20], dtype=np.int64)
    base = encode_postings(doc_ids, tfs, dls)
    try:
        decode_postings_with_positions(base)
        raised = False
    except ValueError:
        raised = True
    assert raised, "positions decoder must refuse a blob without positions"
