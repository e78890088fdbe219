"""Index aliases: atomic pointers to segment stores (ES alias API analog).

An alias directory holds one file, ``alias.json`` → {"target": <store>}.
Resolution happens at the API/CLI boundary (cli.main resolves --index;
library callers use resolve_index explicitly) — executors keep taking a
concrete store path, so the pointer never leaks into plan caches.

The operational pattern this enables is the ES blue/green reindex:

    build the new store under a fresh directory        (write_index)
    verify it                                          (any executor)
    swap_alias(alias, new_store)                       (atomic os.replace)

Readers that resolved before the swap finish against the old store
(parquet files are immutable and still on disk); readers that resolve
after see the new one — zero-downtime cutover, no reader coordination.
On a shared filesystem/object store the same contract holds wherever
rename-into-place is atomic (HDFS rename; on S3 the swap point is a
conditional-PUT pointer object — documented).

Crash safety: the pointer is written to ``alias.json.tmp`` then
os.replace'd, so a crash leaves either the old pointer or the new one,
never a torn file; a stale .tmp is ignored and overwritten by the next
swap.
"""

from __future__ import annotations

import json
import os

_ALIAS_FILE = "alias.json"
_MAX_HOPS = 4  # alias→alias chains are legal but bounded (loop guard)


def is_alias(path: str) -> bool:
    return os.path.exists(os.path.join(path, _ALIAS_FILE))


def create_alias(alias_dir: str, target: str) -> None:
    """Point alias_dir at target (a store dir or another alias dir).
    The target must already look like a store or an alias — a typo'd
    pointer would otherwise surface later as a confusing read error."""
    if not (
        os.path.exists(os.path.join(target, "stats.json"))
        or is_alias(target)
    ):
        raise ValueError(f"alias target is neither a store nor an alias: {target}")
    os.makedirs(alias_dir, exist_ok=True)
    tmp = os.path.join(alias_dir, _ALIAS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"target": os.path.abspath(target)}, f)
    os.replace(tmp, os.path.join(alias_dir, _ALIAS_FILE))


def swap_alias(alias_dir: str, new_target: str) -> str:
    """Atomically repoint an existing alias; returns the OLD target (for
    the caller to retire/delete once drained). Same write-then-replace
    protocol as create_alias."""
    old = read_alias(alias_dir)
    create_alias(alias_dir, new_target)
    return old


def read_alias(alias_dir: str) -> str:
    p = os.path.join(alias_dir, _ALIAS_FILE)
    if not os.path.exists(p):
        raise FileNotFoundError(f"not an alias (no {_ALIAS_FILE}): {alias_dir}")
    with open(p) as f:
        return json.load(f)["target"]


def resolve_index(path: str) -> str:
    """Follow alias pointers to the concrete store directory (≤ _MAX_HOPS,
    cycle-safe). A non-alias path resolves to itself, so callers can
    resolve unconditionally."""
    seen = []
    cur = path
    for _ in range(_MAX_HOPS + 1):
        if not is_alias(cur):
            return cur
        if cur in seen:
            break
        seen.append(cur)
        cur = read_alias(cur)
    raise ValueError(f"alias chain too deep or cyclic from {path}: {seen}")
