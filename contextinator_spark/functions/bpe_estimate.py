"""Approximate-BPE token counting for chunk budgeting (F2).

The reference budgets chunks by tiktoken cl100k counts
(rag/utils/token_counter.py:15-74, 512/50 — settings.py:19-20). tiktoken
and its vocabulary file are not available in this container, so this module
implements a deterministic CHAR-CLASS COST MODEL of cl100k's behavior on
code, built from its published/observable segmentation rules:

  * an English-ish word of ≤7 letters is one token (leading single space
    merges into it — " return" is one token), longer identifiers split
    roughly every 7 letters;
  * `_` between letters behaves as a joiner ("_name" merges) — snake_case
    costs ~one token per component, not per underscore;
  * digit runs split into groups of ≤3 ("12345" → "123","45");
  * each newline is a token; an indentation run of ≥2 spaces is one token
    (cl100k has dedicated multi-space tokens); a single space folds into
    the following token;
  * any other punctuation char costs one token (slight overcount for
    merged operators like `):`, slight undercount for rare unicode).

The model lands in cl100k's published ballpark of ~3-4 chars/token on
source code and ~4-5 on English prose (pinned by test within tolerance).
It is an APPROXIMATION: split boundaries near the 512 budget may differ
from real tiktoken by a few lines — the documented fidelity ceiling
without the vocabulary file.

Exact-BPE probe (round-5 VERDICT item 8, closing as container-infeasible):
no network access, and the container holds neither a BPE package
(`import tiktoken|tokenizers|transformers` all fail; pip list shows none)
nor any vendorable vocabulary file (filesystem scans for `*cl100k*`,
`*.tiktoken`, BPE/vocab json under /usr, /opt, site-packages come up
empty). Real cl100k requires its ~1.7 MB mergeable-ranks file — not
reconstructible from rules. SUBSTITUTION POINT: drop a real encoder in by
replacing `approx_bpe_len` below with `len(enc.encode(text))`; callers
flow through this one function and pin the interface, with value tests
holding only the chars/token ballpark.
"""

from __future__ import annotations

import re

_RUNS = re.compile(r"[A-Za-z]+|[0-9]{1,3}|\s+|[^\sA-Za-z0-9]")


def approx_bpe_len(text: str) -> int:
    """Deterministic cl100k-style token-count estimate (see module doc)."""
    n = 0
    prev_alpha = False
    pending_joiner = False
    for m in _RUNS.finditer(text):
        t = m.group(0)
        c = t[0]
        if c.isspace():
            if pending_joiner:
                n += 1
                pending_joiner = False
            nl = t.count("\n")
            if nl:
                n += nl
                # indentation after the last newline is one token
                if len(t) - t.rfind("\n") - 1 >= 2:
                    n += 1
            elif len(t) >= 2:
                n += 1
            # a single space folds into the following token
            prev_alpha = False
        elif c.isalpha():
            n += 1 + (len(t) - 1) // 7
            prev_alpha = True
            pending_joiner = False
        elif c == "_" and prev_alpha:
            # joiner between identifier components: cost deferred — free if
            # followed by letters, else one token
            pending_joiner = True
        else:
            if pending_joiner:
                n += 1
                pending_joiner = False
            n += 1
            prev_alpha = False
    if pending_joiner:
        n += 1
    return n
