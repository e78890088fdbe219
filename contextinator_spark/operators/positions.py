"""Positions-aware posting blobs (optional format extension, SURVEY §1.4's
optional `positions` column; forward-looking — neither the reference nor
the current query set does phrase/proximity search, but the format leaves
room for it without a break).

Layout = the standard blob (compress.py: [df][deltas][tfs][doc_lens], all
LEB128) followed by one extra section:

    [sum(tf) positions, delta-encoded WITHIN each doc, +1 offset so the
     first position of each doc is (pos0 + 1) > 0]

Compatibility both ways, by construction:
  * old reader, new blob — decode_postings reads its sections by count and
    never looks past doc_lens, so the trailing positions bytes are ignored;
  * the positions section length is implied by sum(tf), so no header
    change; a format stamp (`posting_format: 2`) in stats.json records
    which writer produced an index.

decode_postings_with_positions REFUSES a blob without the section (the
stream ends early) rather than inventing empty positions.
"""

from __future__ import annotations

import numpy as np

from .compress import encode_postings, vb_decode, vb_encode

# stats.json stamp values (segments.write_index): 1 = positions-less blobs,
# 2 = blobs carry the positions section
POSTING_FORMAT_BASE = 1
POSTING_FORMAT_POSITIONS = 2


def encode_postings_with_positions_flat(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    flat_positions: np.ndarray,
) -> bytes:
    """Standard blob + positions from ONE flat array (the concatenation of
    each posting's ascending position list, in posting order — exactly the
    shape the fused build kernel produces). Fully vectorized: the per-doc
    delta(+1) encoding is a global diff with the doc-initial elements
    overwritten at the tf-boundary offsets."""
    base = encode_postings(doc_ids, tfs, doc_lens)
    tfs_i = np.asarray(tfs, dtype=np.int64)
    p = np.asarray(flat_positions, dtype=np.int64)
    assert int(tfs_i.sum()) == p.size, "flat positions length must equal sum(tf)"
    if p.size == 0:
        return base
    deltas = np.empty(p.size, dtype=np.int64)
    deltas[0] = p[0] + 1
    deltas[1:] = p[1:] - p[:-1]
    starts = np.concatenate(([0], np.cumsum(tfs_i)[:-1]))
    deltas[starts] = p[starts] + 1  # doc-initial delta = pos0 + 1 (> 0)
    assert bool((deltas > 0).all()), "positions must be strictly increasing and non-negative"
    return base + vb_encode(deltas.astype(np.uint64)).tobytes()


def encode_postings_with_positions(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    positions: list[np.ndarray],
) -> bytes:
    """List-of-arrays convenience form of encode_postings_with_positions_flat
    (len(positions[i]) must be tfs[i]; each list strictly increasing,
    0-based)."""
    tfs_i = np.asarray(tfs, dtype=np.int64)
    assert len(positions) == tfs_i.size, "one positions list per posting"
    for tf, pos in zip(tfs_i, positions):
        assert np.asarray(pos).size == int(tf), "positions length must equal tf"
    flat = (
        np.concatenate([np.asarray(p, dtype=np.int64) for p in positions])
        if positions
        else np.empty(0, dtype=np.int64)
    )
    return encode_postings_with_positions_flat(doc_ids, tfs_i, doc_lens, flat)


def decode_postings_with_positions_flat(
    blob: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """blob → (doc_ids, tfs, doc_lens, flat positions aligned to postings).

    The per-doc cumsum is computed with ONE global cumsum over the delta
    stream: within doc i the absolute positions are the global running sum
    minus the running sum accumulated before doc i's segment (then the -1
    offset) — no per-posting Python loop anywhere in the probe's hot path.

    Raises ValueError if the blob has no positions section (written by a
    posting_format=1 writer)."""
    data = np.frombuffer(blob, dtype=np.uint8)
    hdr, off = vb_decode(data, 0, 1)
    df = int(hdr[0])
    deltas, off = vb_decode(data, off, df)
    tfs, off = vb_decode(data, off, df)
    dls, off = vb_decode(data, off, df)
    total = int(tfs.sum())
    if off >= data.size and total > 0:
        raise ValueError("blob carries no positions section (posting_format=1)")
    pos_deltas, off = vb_decode(data, off, total)
    pd_i = pos_deltas.astype(np.int64)
    flat = np.cumsum(pd_i)
    if total:
        tf64 = tfs.astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(tf64)[:-1]))
        nz = tf64 > 0  # zero-tf postings can't occur, but keep the math total
        base = np.repeat(flat[starts[nz]] - pd_i[starts[nz]], tf64[nz])
        flat -= base
        flat -= 1
    return (
        np.cumsum(deltas.astype(np.int64)),
        tfs.astype(np.int32),
        dls.astype(np.int32),
        flat,
    )


def decode_postings_with_positions(
    blob: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[np.ndarray]]:
    """blob → (doc_ids, tfs, doc_lens, [positions per posting]) — list form
    of decode_postings_with_positions_flat."""
    docs, tfs, dls, flat = decode_postings_with_positions_flat(blob)
    bounds = np.cumsum(tfs.astype(np.int64))[:-1]
    return docs, tfs, dls, list(np.split(flat, bounds))
