"""Minimal TOON (Token-Oriented Object Notation) encoder.

The reference CLI exports search results as JSON or TOON
(output_formatter.py:140-191 via toon_encoder.py:18-43, which wraps the
public ``toon-format`` library). That library is not in this container, so
this module implements the subset of the PUBLIC TOON spec
(https://toonformat.dev — indentation-based, tabular arrays) that the CLI
result shapes need:

  scalar field            key: value
  primitive array         key[N]: a,b,c
  uniform object array    key[N]{f1,f2}:   then one indented CSV row each
  nested object           key:             then indented fields
  non-uniform array       key[N]:          then one indented "- item" each
  key folding (opt-in)    a: {b: {c: 1}} → a.b.c: 1 when every segment is
                          a bare identifier (the spec's keyFolding option)

Strings are quoted only when they would be ambiguous (contain the
delimiter, a colon, quotes, newlines, look numeric/boolean, or carry
leading/trailing whitespace) — that sparse quoting is where the 40-60%
token saving over JSON comes from.
"""

from __future__ import annotations

import json
import re
from typing import Any

_INDENT = "  "
_SAFE_KEY = re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")


def _needs_quotes(s: str) -> bool:
    if s == "" or s != s.strip():
        return True
    if any(c in s for c in (",", ":", '"', "\n", "\r", "{", "}", "[", "]", "#")):
        return True
    if s in ("true", "false", "null"):
        return True
    try:  # a string that parses as a number must stay distinguishable
        float(s)
        return True
    except ValueError:
        return False


def _scalar(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return json.dumps(v)
    s = str(v)
    return json.dumps(s, ensure_ascii=False) if _needs_quotes(s) else s


def _is_scalar(v: Any) -> bool:
    return v is None or isinstance(v, (bool, int, float, str))


def _uniform_keys(items: list) -> list[str] | None:
    """Field list when every element is a dict of scalars with identical
    keys (the tabular fast path); None otherwise."""
    if not items or not all(isinstance(x, dict) for x in items):
        return None
    keys = list(items[0].keys())
    for x in items:
        if list(x.keys()) != keys or not all(_is_scalar(v) for v in x.values()):
            return None
    return keys


def _encode_list(key: str, items: list, depth: int, out: list[str],
                 fold: bool = False) -> None:
    pad = _INDENT * depth
    keys = _uniform_keys(items)
    if keys is not None:
        out.append(f"{pad}{key}[{len(items)}]{{{','.join(keys)}}}:")
        for x in items:
            out.append(pad + _INDENT + ",".join(_scalar(x[k]) for k in keys))
        return
    if all(_is_scalar(v) for v in items):
        out.append(f"{pad}{key}[{len(items)}]: " + ",".join(_scalar(v) for v in items))
        return
    out.append(f"{pad}{key}[{len(items)}]:")
    for x in items:
        if isinstance(x, dict):
            out.append(pad + _INDENT + "-")
            _encode_dict(x, depth + 2, out, fold)
        elif isinstance(x, list):
            _encode_list("-", x, depth + 1, out, fold)
        else:
            out.append(pad + _INDENT + "- " + _scalar(x))


def _encode_dict(d: dict, depth: int, out: list[str], fold: bool = False) -> None:
    pad = _INDENT * depth
    for k, v in d.items():
        k = str(k)
        if fold and isinstance(v, dict) and _SAFE_KEY.match(k):
            # fold chains of single-key objects into a dotted path
            while (
                isinstance(v, dict)
                and len(v) == 1
                and _SAFE_KEY.match(next(iter(v)))
            ):
                nk, v = next(iter(v.items()))
                k = f"{k}.{nk}"
        if isinstance(v, dict):
            out.append(f"{pad}{k}:")
            _encode_dict(v, depth + 1, out, fold)
        elif isinstance(v, list):
            _encode_list(k, v, depth, out, fold)
        else:
            out.append(f"{pad}{k}: {_scalar(v)}")


def toon_encode(data: Any, fold_keys: bool = False) -> str:
    """Encode dict / list / scalar to a TOON string (no trailing newline).
    `fold_keys` enables the spec's keyFolding option (off by default, same
    as the reference's toon-format library)."""
    out: list[str] = []
    if isinstance(data, dict):
        _encode_dict(data, 0, out, fold_keys)
    elif isinstance(data, list):
        keys = _uniform_keys(data)
        if keys is not None:
            out.append(f"[{len(data)}]{{{','.join(keys)}}}:")
            for x in data:
                out.append(_INDENT + ",".join(_scalar(x[k]) for k in keys))
        else:
            _encode_list("", data, 0, out, fold_keys)
    else:
        out.append(_scalar(data))
    return "\n".join(out)
