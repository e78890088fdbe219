"""Name / path scalar helpers (SURVEY.md §2.8 F5, F6, F13).

Each has a pure-Python twin and a Column form so driver-side catalog code
and distributed plans share one definition.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_collection_name(name: str, max_len: int = 63) -> str:
    """Catalog-safe collection name (reference settings.py:244-273):
    [^a-zA-Z0-9._-] → _, first/last char forced alphanumeric, length capped
    at 63 (ChromaDB's constraint, kept as the catalog-naming contract)."""
    s = re.sub(r"[^a-zA-Z0-9._-]", "_", name or "")
    s = s[:max_len]
    if not s or not s[0].isalnum():
        s = "c" + s[: max_len - 1]
    if not s[-1].isalnum():
        s = s[: max_len - 1] + "0" if len(s) >= max_len else s + "0"
    return s


def sanitize_collection_name_expr(col) -> Column:
    """Column form of sanitize_collection_name (regexp_replace chain)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.substring(F.regexp_replace(c, r"[^a-zA-Z0-9._-]", "_"), 1, 63)
    s = F.when(s.rlike("^[a-zA-Z0-9]"), s).otherwise(
        F.substring(F.concat(F.lit("c"), s), 1, 63)
    )
    return F.when(s.rlike("[a-zA-Z0-9]$"), s).otherwise(
        F.concat(F.substring(s, 1, 62), F.lit("0"))
    )


def repo_name_from_url(url: str) -> str:
    """user/repo collection id from a git URL (reference
    repo_utils.py:133-172): strip .git, take the last two path segments,
    join with '_', map '.'/'-' → '_'."""
    u = re.sub(r"\.git$", "", (url or "").rstrip("/"))
    u = re.sub(r"^[a-z+]+://", "", u)
    u = u.split("@")[-1].replace(":", "/")
    parts = [p for p in u.split("/") if p]
    tail = "_".join(parts[-2:]) if len(parts) >= 2 else (parts[-1] if parts else "repo")
    return re.sub(r"[.-]", "_", tail)


def repo_name_from_url_expr(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.regexp_replace(c, r"\.git$", ""), r"^[a-z+]+://", "")
    u = F.element_at(F.split(u, "@"), -1)
    u = F.regexp_replace(u, ":", "/")
    parts = F.filter(F.split(u, "/"), lambda x: x != F.lit(""))
    tail = F.when(
        F.size(parts) >= 2,
        F.concat_ws("_", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(F.coalesce(F.element_at(parts, -1), F.lit("repo")))
    return F.regexp_replace(tail, r"[.-]", "_")


def mtime_epoch_expr(col) -> Column:
    """File mtime → unix seconds (F13, reference directory.rs:55-59):
    timestamp columns cast to long; string timestamps via unix_timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.cast("timestamp").isNotNull(), c.cast("timestamp").cast("long")
    ).otherwise(F.unix_timestamp(c))
