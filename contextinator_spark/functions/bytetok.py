"""Byte-level vectorized tokenizer kernels.

PRODUCTION surface: ``batch_token_counts`` (doc_len in write_index pass A,
via tokenize.token_count_udf). ``batch_token_runs`` / ``batch_termfreq``
are EXPERIMENTAL alternatives to the fused combine kernel's str.findall
(segments._make_fused_combine) — A/B-profiled on this VM the findall path
won end-to-end, but the byte kernels are kept (and property-tested) as the
candidate for corpora where findall's per-token Python-string boxing
dominates.

Semantics are EXACTLY the pinned BM25 token policy (config.TOKEN_PATTERN:
lowercase, maximal [a-z0-9_] runs) — but computed with numpy byte ops
instead of per-row regex:

    ascii bytes → LUT lowercase → LUT token-char classify → run boundaries
    → zero-padded fixed-width token matrix → np.void view → pd.factorize

Why: ``Series.str.findall`` materializes EVERY token instance as a Python
string — ~10^8 allocations per 2M-doc build — and that allocation churn is
memory-bandwidth-bound, the part of the build profiling showed scales worst
across cores. Here only the UNIQUE terms of a batch (a few thousand) ever
become Python strings; everything else stays in flat uint8/int64 arrays.

Correctness boundary: the byte kernel assumes ASCII input. Non-ASCII rows
(``str.isascii()`` is C-speed) fall back to the regex tokenizer, whose
Unicode ``lower()`` handles locale edge cases (e.g. U+0130 lowercasing
into an ASCII 'i' + combining dot). A property test pins byte-kernel ==
regex-kernel on ASCII and mixed batches.

Reference: this replaces the per-file tokenize loops of the reference's
chunking/token counting (token_counter.py:42-74, ast_parser.py:486-631)
with a batch-vectorized kernel per BASELINE.json's A-axis (no per-row
Python).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..config import TOKEN_PATTERN

_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[ord("A") : ord("Z") + 1] += 32
_ISTOK = np.zeros(256, dtype=bool)
for _c in b"abcdefghijklmnopqrstuvwxyz0123456789_":
    _ISTOK[_c] = True
_RX = re.compile(TOKEN_PATTERN)

# long-token guard: the padded token matrix is n_tokens × max_len bytes, so
# one pathological 10 KB identifier would inflate it 100×. Tokens longer
# than this are factorized separately as Python strings (rare in code).
_MAX_FAST_LEN = 64


def _regex_tokens(texts) -> list[list[str]]:
    return [_RX.findall(t.lower()) if isinstance(t, str) else [] for t in texts]


def batch_token_runs(contents: pd.Series):
    """Tokenize a batch → (token_doc int64, codes int64, uniq object[str]).

    token_doc[i] = row index of token instance i (instances in document
    order within each row, rows in batch order — same order the regex path
    yields); codes[i] = index into uniq. Mixed ASCII/non-ASCII batches are
    handled by splitting rows and re-merging with a joint factorize over
    the (small) union of unique terms.
    """
    texts = contents.to_numpy(dtype=object)
    n = len(texts)
    is_str = np.fromiter(
        (isinstance(t, str) for t in texts), dtype=bool, count=n
    )
    ascii_ok = np.fromiter(
        (bool(is_str[i]) and texts[i].isascii() for i in range(n)),
        dtype=bool,
        count=n,
    )
    if ascii_ok.all():
        return _ascii_runs(texts, np.arange(n, dtype=np.int64))

    fast_rows = np.flatnonzero(ascii_ok)
    slow_rows = np.flatnonzero(~ascii_ok)
    td_f, codes_f, uniq_f = _ascii_runs(texts[fast_rows], fast_rows)
    slow_tok = _regex_tokens(texts[slow_rows])
    lens_s = np.fromiter((len(t) for t in slow_tok), dtype=np.int64, count=len(slow_tok))
    td_s = np.repeat(slow_rows, lens_s)
    flat_s = (
        np.concatenate([np.asarray(t, dtype=object) for t in slow_tok if t])
        if lens_s.sum()
        else np.empty(0, dtype=object)
    )
    codes_s, uniq_s = pd.factorize(flat_s)
    # joint vocabulary: factorize the two (small) unique sets together
    joint_codes, uniq = pd.factorize(np.concatenate((uniq_f, uniq_s)))
    map_f, map_s = joint_codes[: len(uniq_f)], joint_codes[len(uniq_f) :]
    token_doc = np.concatenate((td_f, td_s))
    codes = np.concatenate(
        (
            map_f[codes_f] if codes_f.size else codes_f,
            map_s[codes_s] if codes_s.size else codes_s,
        )
    )
    # restore document order (stable: instances within a row keep order)
    order = np.argsort(token_doc, kind="stable")
    return token_doc[order], codes[order], uniq


def _ascii_runs(texts: np.ndarray, row_ids: np.ndarray):
    """ASCII fast path over a row subset. Returns (token_doc, codes, uniq)."""
    if len(texts) == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
        )
    # one separator byte between rows keeps runs from bridging documents
    joined = "\x00".join([t if isinstance(t, str) else "" for t in texts])
    buf = _LOWER[np.frombuffer(joined.encode("ascii"), dtype=np.uint8)]
    ok = _ISTOK[buf]
    if not ok.any():
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
        )
    prev = np.empty_like(ok)
    prev[0] = False
    prev[1:] = ok[:-1]
    starts = np.flatnonzero(ok & ~prev)
    nxt = np.empty_like(ok)
    nxt[-1] = False
    nxt[:-1] = ok[1:]
    ends = np.flatnonzero(ok & ~nxt) + 1
    # row assignment: separator positions delimit rows
    row_lens = np.fromiter(
        (len(t) if isinstance(t, str) else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    row_starts = np.concatenate(([0], np.cumsum(row_lens[:-1] + 1)))
    tok_row = np.searchsorted(row_starts, starts, side="right") - 1
    token_doc = row_ids[tok_row]

    lens = ends - starts
    max_len = int(lens.max())
    long_mask = lens > _MAX_FAST_LEN
    if long_mask.any():
        short = ~long_mask
        td_s, codes_s, uniq_s = _fixed_width_factorize(
            buf, starts[short], lens[short], token_doc[short]
        )
        long_toks = np.array(
            [
                buf[s : s + l].tobytes().decode("ascii")
                for s, l in zip(starts[long_mask], lens[long_mask])
            ],
            dtype=object,
        )
        codes_l, uniq_l = pd.factorize(long_toks)
        joint, uniq = pd.factorize(np.concatenate((uniq_s, uniq_l)))
        map_s, map_l = joint[: len(uniq_s)], joint[len(uniq_s) :]
        token_doc2 = np.concatenate((td_s, token_doc[long_mask]))
        codes = np.concatenate(
            (
                map_s[codes_s] if codes_s.size else codes_s,
                map_l[codes_l] if codes_l.size else codes_l,
            )
        )
        order = np.argsort(token_doc2, kind="stable")
        return token_doc2[order], codes[order], uniq
    return _fixed_width_factorize(buf, starts, lens, token_doc, max_len)


def _fixed_width_factorize(buf, starts, lens, token_doc, max_len: int | None = None):
    """Zero-padded fixed-width matrix → np.void view → one factorize.

    Tokens are [a-z0-9_] only, so \\x00 padding is unambiguous. Only the
    per-batch UNIQUE rows are decoded back to Python strings.
    """
    if starts.size == 0:
        return (
            np.asarray(token_doc, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
        )
    if max_len is None:
        max_len = int(lens.max())
    idx = starts[:, None] + np.arange(max_len, dtype=np.int64)[None, :]
    mask = np.arange(max_len, dtype=np.int64)[None, :] < lens[:, None]
    mat = buf[np.minimum(idx, buf.size - 1)] * mask
    mat = np.ascontiguousarray(mat)
    void = mat.view(np.dtype((np.void, max_len))).ravel()
    # np.unique on the void view = C-speed fixed-width row dedup (memcmp
    # sort); pd.factorize would box each row back into Python objects
    uniq_void, codes = np.unique(void, return_inverse=True)
    uniq = np.array(
        [bytes(u).rstrip(b"\x00").decode("ascii") for u in uniq_void], dtype=object
    )
    return np.asarray(token_doc, dtype=np.int64), codes.astype(np.int64), uniq


def batch_termfreq(contents: pd.Series):
    """EXPERIMENTAL — not wired into the production build (the fused
    combine kernel in segments.py tokenizes with pandas str.findall, which
    A/B-profiled faster end-to-end on this VM; this byte-level variant is
    kept as the candidate for corpora where findall's per-row list boxing
    dominates). Only batch_token_counts below is production (doc_len).

    Batch → (dl int64[n_rows], doc_idx, codes, tfs, uniq) with per-row
    (term, tf) pairs sorted by (doc_idx, code). tf via np.unique over the
    compound key (row, code) — cost scales with TOKEN COUNT (T log T).
    (A dense np.bincount(minlength=rows·vocab) variant was dropped: it
    allocates O(rows × batch_vocab) int64 — multiple GB per 8192-row Arrow
    batch on code corpora.)
    """
    n = len(contents)
    token_doc, codes, uniq = batch_token_runs(contents)
    dl = np.bincount(token_doc, minlength=n).astype(np.int64)
    nu = max(1, len(uniq))
    key = token_doc * nu + codes
    uk, tfs = np.unique(key, return_counts=True)
    return dl, uk // nu, uk % nu, tfs.astype(np.int64), uniq


def batch_token_counts(contents: pd.Series) -> np.ndarray:
    """Per-row token count (doc_len) — run detection only, no factorize."""
    texts = contents.to_numpy(dtype=object)
    n = len(texts)
    ascii_ok = np.fromiter(
        (isinstance(t, str) and t.isascii() for t in texts), dtype=bool, count=n
    )
    out = np.zeros(n, dtype=np.int64)
    fast = np.flatnonzero(ascii_ok)
    if fast.size:
        sub = texts[fast]
        joined = "\x00".join([t for t in sub])
        buf = _LOWER[np.frombuffer(joined.encode("ascii"), dtype=np.uint8)]
        ok = _ISTOK[buf]
        if ok.any():
            prev = np.empty_like(ok)
            prev[0] = False
            prev[1:] = ok[:-1]
            starts = np.flatnonzero(ok & ~prev)
            row_lens = np.fromiter((len(t) for t in sub), dtype=np.int64, count=len(sub))
            row_starts = np.concatenate(([0], np.cumsum(row_lens[:-1] + 1)))
            tok_row = np.searchsorted(row_starts, starts, side="right") - 1
            out[fast] = np.bincount(tok_row, minlength=len(sub))
    slow = np.flatnonzero(~ascii_ok)
    for i in slow:
        t = texts[i]
        out[i] = len(_RX.findall(t.lower())) if isinstance(t, str) else 0
    return out
