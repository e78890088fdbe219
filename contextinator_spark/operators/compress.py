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


def _vb_encode_with_offsets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array → (uint8 array, per-value byte offsets).

    Instead of materializing per-BYTE owner arrays with np.repeat (3 full
    passes over the expanded byte stream), loop over byte POSITION j
    (bounded by the widest value, 2-3 iterations for typical
    delta/tf/doc_len magnitudes) with shrinking masks — ~4× faster."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    nb = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:  # thresholds ascend → short-circuit when none left
        ge = v >= np.uint64(t)
        if not ge.any():
            break
        nb += ge
    offs = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.empty(int(nb.sum()), dtype=np.uint8)
    if int(nb.max()) == 1:  # all values < 128: bytes are the values
        out[:] = v
        return out, offs
    for j in range(int(nb.max())):
        m = nb > j
        vm = v[m] >> np.uint64(7 * j)
        byte = (vm & np.uint64(0x7F)).astype(np.uint8)
        byte |= ((nb[m] - 1 > j).astype(np.uint8)) << 7  # continuation bit
        out[offs[m] + j] = byte
    return out, offs


def vb_encode(values: np.ndarray) -> np.ndarray:
    """LEB128-encode a uint64 array → uint8 array. Fully vectorized."""
    return _vb_encode_with_offsets(values)[0]


def encode_posting_groups(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> list[bytes]:
    """Encode MANY posting groups in one fused vb_encode pass.

    Input arrays hold the concatenated groups; (starts[g], ends[g]) bound
    group g, whose docIDs must be strictly increasing. Output blob g is
    byte-identical to ``encode_postings`` of that group (LEB128 is
    per-value, so slicing the fused byte stream at group boundaries equals
    encoding each group separately) — one kernel call for ~10^4 groups per
    Arrow batch instead of ~10^4 Python-level calls."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    counts = (ends - starts).astype(np.int64)
    n_g, n_p = starts.size, d.size
    if n_g == 0:
        return []
    deltas = d.copy()
    deltas[1:] -= d[:-1]
    deltas[starts] = d[starts]  # group-initial delta is the absolute docID
    gid = np.repeat(np.arange(n_g), counts)
    base = 3 * starts.astype(np.int64) + np.arange(n_g)  # value idx of df_g
    vals = np.empty(n_g + 3 * n_p, dtype=np.uint64)
    vals[base] = counts.astype(np.uint64)
    pd_idx = base[gid] + 1 + (np.arange(n_p) - starts[gid])
    vals[pd_idx] = deltas
    vals[pd_idx + counts[gid]] = np.ascontiguousarray(tfs, dtype=np.uint64)
    vals[pd_idx + 2 * counts[gid]] = np.ascontiguousarray(doc_lens, dtype=np.uint64)
    data, offs = _vb_encode_with_offsets(vals)
    b_starts = offs[base]
    b_ends = np.concatenate((offs[base[1:]], [data.size])).astype(np.int64)
    raw = data.tobytes()
    return [raw[s:e] for s, e in zip(b_starts, b_ends)]


def vb_decode(data: np.ndarray, offset: int = 0, count: int | None = None) -> tuple[np.ndarray, int]:
    """Decode `count` LEB128 values starting at byte `offset`.

    Returns (values uint64, next_offset). count=None decodes to end.

    Hot path of every query (three sections per posting blob), so the
    kernel's memory traffic is sized to the VALUE count, not the byte
    count: single-byte values (the overwhelming majority in delta/tf/dl
    data) are one gather; multi-byte values get a masked shift-or loop
    bounded by the widest value (≤10 iterations over only the multi-byte
    subset). The earlier form materialized three word-sized arrays PER
    BYTE and np.add.at-scattered them — ~25× more DRAM traffic plus an
    unbuffered scatter, which made the 8-core batch phase bandwidth-bound
    (BENCH/BASELINE.md round-3 scaling notes)."""
    d = data[offset:]
    term_mask = (d & 0x80) == 0
    ends_idx = np.nonzero(term_mask)[0]
    if count is not None:
        if ends_idx.size < count:
            raise ValueError("varbyte stream truncated")
        ends_idx = ends_idx[:count]
    n_vals = ends_idx.size
    if n_vals == 0:
        return np.empty(0, dtype=np.uint64), offset
    starts = np.empty(n_vals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends_idx[:-1] + 1
    nb = ends_idx - starts + 1  # bytes per value
    out = np.zeros(n_vals, dtype=np.uint64)
    single = nb == 1
    out[single] = d[ends_idx[single]]  # terminator byte < 0x80, no mask needed
    if not single.all():
        multi = ~single
        sm = starts[multi]
        nbm = nb[multi]
        acc = np.zeros(sm.size, dtype=np.uint64)
        for j in range(int(nbm.max())):
            m = nbm > j
            acc[m] |= (d[sm[m] + j] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(
                7 * j
            )
        out[multi] = acc
    return out, offset + int(ends_idx[-1]) + 1


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray) -> bytes:
    """Sorted docIDs + tfs + doc_lens → compressed blob."""
    doc_ids_i = np.asarray(doc_ids, dtype=np.int64)
    assert doc_ids_i.size == 0 or int(doc_ids_i[0]) >= 0, "docIDs must be non-negative"
    assert doc_ids_i.size == 0 or bool(np.all(np.diff(doc_ids_i) > 0)), "docIDs must be strictly increasing"
    doc_ids = doc_ids_i.astype(np.uint64)
    deltas = np.diff(doc_ids, prepend=np.uint64(0))
    # ONE fused vb_encode call: LEB128 is per-value, so encoding the
    # concatenated value stream is byte-identical to concatenating
    # per-section encodings — same blob layout, 1/4 the fixed overhead
    fused = np.concatenate(
        (
            np.array([doc_ids.size], dtype=np.uint64),
            deltas,
            np.asarray(tfs, dtype=np.uint64),
            np.asarray(doc_lens, dtype=np.uint64),
        )
    )
    return vb_encode(fused).tobytes()


def decode_postings(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """blob → (doc_ids int64, tfs int32, doc_lens int32)."""
    data = np.frombuffer(blob, dtype=np.uint8)
    hdr, off = vb_decode(data, 0, 1)
    df = int(hdr[0])
    deltas, off = vb_decode(data, off, df)
    tfs, off = vb_decode(data, off, df)
    dls, off = vb_decode(data, off, df)
    return (
        np.cumsum(deltas, dtype=np.int64),
        tfs.astype(np.int32),
        dls.astype(np.int32),
    )


def block_max(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray,
              block_size: int = BLOCK_SIZE) -> list[dict]:
    """Per-block (upper_doc, max_tf, min_dl) for WAND/MaxScore bounds."""
    n = doc_ids.size
    if n == 0:
        return []
    starts = np.arange(0, n, block_size)
    ends = np.minimum(starts + block_size, n)
    upper = np.asarray(doc_ids)[ends - 1]
    max_tf = np.maximum.reduceat(np.asarray(tfs), starts)
    min_dl = np.minimum.reduceat(np.asarray(doc_lens), starts)
    return [
        {"upper_doc": int(u), "max_tf": int(mt), "min_dl": int(md)}
        for u, mt, md in zip(upper, max_tf, min_dl)
    ]
