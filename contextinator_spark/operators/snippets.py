"""Snippet / highlight generation — the result-page surface every fulltext
engine pairs with top-k (Lucene's Highlighter/UnifiedHighlighter; the
reference renders hit context the same way its grep does, search.rs:95-117
context lines around a match).

Contract (best_line_snippets): for each hit in a (rank, doc_id, score)
result frame, return the BEST LINE of the document — the line containing
the most query-term token occurrences, earliest line on ties — as
(rank, doc_id, score, line_no, n_hits, snippet). Line granularity is the
right fragment unit for source code (the corpus here), mirroring how the
reference presents grep hits; `highlight()` optionally wraps matched
tokens in markers for terminal rendering.

Scale shape: the corpus scan this operator adds reads ONLY the k hit
documents — the hit doc_ids are collected (bounded by k, the same driver
round-trip every top-k already does) and pushed into the parquet scan as
an `isin` predicate, so Catalyst prunes row groups by the doc_id
column statistics instead of reading the corpus. Everything after the
pruned scan is builtin expressions (split / posexplode /
regexp_extract_all / filter / window) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import TOKEN_PATTERN


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def term_hits_expr(line_col: str, terms: list[str]) -> F.Column:
    """Count of query-term token occurrences in a line — tokenization
    IDENTICAL to the index writer's (lowercase, TOKEN_PATTERN runs), so a
    hit line always exists for a scoring doc."""
    arr = ", ".join(_sql_quote(t.lower()) for t in sorted(set(terms)))
    return F.expr(
        f"size(filter(regexp_extract_all(lower({line_col}), "
        f"'{TOKEN_PATTERN}', 0), t -> array_contains(array({arr}), t)))"
    )


def best_line_snippets(
    docs: DataFrame,
    hits: DataFrame,
    terms: list[str],
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(rank, doc_id, score, line_no, n_hits, snippet) — one row per hit,
    snippet = the doc's highest-term-density line (ties → earliest line).

    `hits` must carry (rank, doc_id, score) and be small (a top-k result);
    its doc_ids are collected and pushed down into the corpus scan."""
    hit_rows = hits.select("rank", "doc_id", "score").collect()
    ids = [r["doc_id"] for r in hit_rows]
    if not ids:
        return hits.sparkSession.createDataFrame(
            [],
            "rank int, doc_id long, score double, line_no int, "
            "n_hits int, snippet string",
        )
    hits_small = hits.sparkSession.createDataFrame(
        [(r["rank"], r["doc_id"], r["score"]) for r in hit_rows],
        "rank int, doc_id long, score double",
    )
    lines = (
        docs.filter(F.col(id_col).isin(ids))  # row-group pruned scan
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(content_col), "\n")).alias("pos", "line"),
        )
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("int").alias("line_no"),
            "line",
            term_hits_expr("line", terms).cast("int").alias("n_hits"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_hits"), F.asc("line_no")
    )
    best = (
        lines.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        F.broadcast(hits_small)
        .join(best, "doc_id")
        .select(
            "rank", "doc_id", "score", "line_no", "n_hits",
            F.col("line").alias("snippet"),
        )
        .orderBy("rank")
    )


def highlight(
    col: F.Column | str,
    terms: list[str],
    pre: str = "«",
    post: str = "»",
) -> F.Column:
    """Wrap every whole-token occurrence of any query term in pre/post
    markers, case-insensitively — Lucene Highlighter's tag-injection step
    as one builtin regexp_replace (JVM regex; terms are TOKEN_PATTERN
    tokens so alternation needs no escaping beyond a sanity check)."""
    toks = sorted({t.lower() for t in terms})
    import re as _re

    for t in toks:
        if not _re.fullmatch(TOKEN_PATTERN, t):
            raise ValueError(f"not an indexable token: {t!r}")
    # token boundary = not-[a-z0-9_] on either side (\b would treat '_'
    # as a word char too, but stay explicit about the engine's alphabet)
    rx = "(?i)(?<![a-z0-9_])(" + "|".join(toks) + ")(?![a-z0-9_])"
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, rx, pre + "$1" + post)
