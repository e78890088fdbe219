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


def encode_postings_with_positions(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    positions: list[np.ndarray],
) -> bytes:
    """Standard blob + per-occurrence positions (len(positions[i]) must be
    tfs[i]; each list strictly increasing, 0-based)."""
    base = encode_postings(doc_ids, tfs, doc_lens)
    tfs_i = np.asarray(tfs, dtype=np.int64)
    assert len(positions) == tfs_i.size, "one positions list per posting"
    if tfs_i.size == 0:
        return base
    flat = []
    for tf, pos in zip(tfs_i, positions):
        p = np.asarray(pos, dtype=np.int64)
        assert p.size == int(tf), "positions length must equal tf"
        assert p.size == 0 or (
            int(p[0]) >= 0 and bool(np.all(np.diff(p) > 0))
        ), "positions must be strictly increasing and non-negative"
        # delta within the doc; +1 so every varbyte value is > 0 and the
        # first delta of a doc is distinguishable from a continuation
        flat.append(np.diff(p, prepend=np.int64(-1)).astype(np.uint64))
    return base + vb_encode(np.concatenate(flat)).tobytes()


def decode_postings_with_positions(
    blob: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[np.ndarray]]:
    """blob → (doc_ids, tfs, doc_lens, [positions per posting]).

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
    # undo the per-doc delta(+1) encoding: split at tf boundaries
    bounds = np.cumsum(tfs.astype(np.int64))[:-1]
    out: list[np.ndarray] = []
    for seg in np.split(pos_deltas.astype(np.int64), bounds):
        out.append(np.cumsum(seg) - 1)
    return (
        np.cumsum(deltas.astype(np.int64)),
        tfs.astype(np.int32),
        dls.astype(np.int32),
        out,
    )
