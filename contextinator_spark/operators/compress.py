"""Posting-list compression kernels (SURVEY.md F17/U6, §4 item 4).

Pure numpy, vectorized — these run inside Arrow UDFs (applyInPandas) on
executors; no per-row Python loops.

Blob layout per term (LEB128 varbyte streams, little-endian 7-bit groups,
high bit = continuation):

    [df][delta-encoded docIDs ×df][tfs ×df][doc_lens ×df]

doc_lens ride in the blob (like Lucene norms) so the query executor scores
without a doc_meta join — at 10^12 docs doc_meta is not broadcastable and
a per-query shuffle join would dominate latency.

Block-max metadata: per block of BLOCK_SIZE postings, (upper_doc = last
docID, max_tf, min_dl) — enough to compute a tight BM25 upper bound per
block at query time for MaxScore/WAND pruning (bm25_segments.py).
"""

from __future__ import annotations

import numpy as np

from ..config import BLOCK_SIZE

_THRESHOLDS = [1 << (7 * i) for i in range(1, 10)]  # 2^7 .. 2^63


def vb_encode(values: np.ndarray) -> np.ndarray:
    """LEB128-encode a uint64 array → uint8 array. Fully vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    nb = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += (v >= np.uint64(t)).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(nb)[:-1]))
    total = int(nb.sum())
    pos = np.arange(total, dtype=np.int64)
    owner_offs = np.repeat(offs, nb)
    k = pos - owner_offs                       # byte index within each value
    vals = np.repeat(v, nb)
    owner_nb = np.repeat(nb, nb)
    b = (vals >> (7 * k).astype(np.uint64)) & np.uint64(0x7F)
    cont = (k < owner_nb - 1).astype(np.uint64) << np.uint64(7)
    return (b | cont).astype(np.uint8)


def vb_decode(data: np.ndarray, offset: int = 0, count: int | None = None) -> tuple[np.ndarray, int]:
    """Decode `count` LEB128 values starting at byte `offset`.

    Returns (values uint64, next_offset). count=None decodes to end.
    Vectorized: terminator bytes (high bit 0) delimit values; contributions
    are scattered with np.add.at.
    """
    d = data[offset:]
    term_mask = (d & 0x80) == 0
    if count is not None:
        ends = np.nonzero(term_mask)[0][:count]
        if ends.size < count:
            raise ValueError("varbyte stream truncated")
        d = d[: ends[-1] + 1] if ends.size else d[:0]
        term_mask = term_mask[: d.size]
    n_vals = int(term_mask.sum())
    if n_vals == 0:
        return np.empty(0, dtype=np.uint64), offset
    vidx = np.concatenate(([0], np.cumsum(term_mask[:-1])))  # value index per byte
    starts = np.zeros(n_vals, dtype=np.int64)
    ends_idx = np.nonzero(term_mask)[0]
    starts[1:] = ends_idx[:-1] + 1
    k = np.arange(d.size, dtype=np.int64) - starts[vidx]
    contrib = (d & 0x7F).astype(np.uint64) << (7 * k).astype(np.uint64)
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, vidx, contrib)
    return out, offset + int(ends_idx[-1]) + 1


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray) -> bytes:
    """Sorted docIDs + tfs + doc_lens → compressed blob."""
    doc_ids_i = np.asarray(doc_ids, dtype=np.int64)
    assert doc_ids_i.size == 0 or int(doc_ids_i[0]) >= 0, "docIDs must be non-negative"
    assert doc_ids_i.size == 0 or bool(np.all(np.diff(doc_ids_i) > 0)), "docIDs must be strictly increasing"
    doc_ids = doc_ids_i.astype(np.uint64)
    deltas = np.diff(doc_ids, prepend=np.uint64(0))
    parts = [
        vb_encode(np.array([doc_ids.size], dtype=np.uint64)),
        vb_encode(deltas),
        vb_encode(np.asarray(tfs, dtype=np.uint64)),
        vb_encode(np.asarray(doc_lens, dtype=np.uint64)),
    ]
    return np.concatenate(parts).tobytes()


def decode_postings(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """blob → (doc_ids int64, tfs int32, doc_lens int32)."""
    data = np.frombuffer(blob, dtype=np.uint8)
    hdr, off = vb_decode(data, 0, 1)
    df = int(hdr[0])
    deltas, off = vb_decode(data, off, df)
    tfs, off = vb_decode(data, off, df)
    dls, off = vb_decode(data, off, df)
    return (
        np.cumsum(deltas.astype(np.int64)),
        tfs.astype(np.int32),
        dls.astype(np.int32),
    )


def block_max(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray,
              block_size: int = BLOCK_SIZE) -> list[dict]:
    """Per-block (upper_doc, max_tf, min_dl) for WAND/MaxScore bounds."""
    n = doc_ids.size
    out = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        out.append(
            {
                "upper_doc": int(doc_ids[e - 1]),
                "max_tf": int(tfs[s:e].max()),
                "min_dl": int(doc_lens[s:e].min()),
            }
        )
    return out
