"""fs-core query modes rebuilt relationally (SURVEY.md §2.1/2.5/2.6).

- grep_lines / grep_with_context — recursive regex scan with ±N context
  lines (reference `src/search.rs:8-93`, `grep_search.py:30-122`)
- grep_by_file — matches grouped per file with counts (A7,
  `grep_search.py:108-115`)
- line_range — 1-based inclusive line slice with negative-from-EOF
  indexing (reference `src/line.rs:6-86`)
- symbol_filter — metadata-equality + substring symbol lookup (T4/P3/P4,
  `symbol_search.py:29-79`)
- facets — distinct sorted result facets (A6, `semantic_search.py:123-144`)
- listing — dirs-first sorted listing analog (T5, `repo_structure.py:43`)

All pure DataFrame ops; the line explosion is `posexplode(split(…))` and
context lines are window collect_lists — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lines_view(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, line_no 1-based, line)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(content_col), "\n")).alias("pos", "line"),
    ).select("doc_id", (F.col("pos") + 1).cast("int").alias("line_no"), "line")


def grep_lines(df: DataFrame, pattern: str, content_col: str = "content",
               id_col: str = "doc_id", whole_word: bool = False,
               case_insensitive: bool = False) -> DataFrame:
    """(doc_id, line_no, line) for lines matching the regex.

    whole_word wraps in \\b (reference grep_search.py:95), case folding via
    lower() (grep_search.py:90-93).
    """
    pat = f"\\b{pattern}\\b" if whole_word else pattern
    lv = lines_view(df, content_col, id_col)
    target = F.lower(F.col("line")) if case_insensitive else F.col("line")
    return lv.filter(target.rlike(pat.lower() if case_insensitive else pat))


def grep_with_context(df: DataFrame, pattern: str, n_context: int = 2,
                      content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Matches + context_before/context_after line arrays (W1,
    search.rs:85-93 — default 2 lines, types.rs:24-26)."""
    lv = lines_view(df, content_col, id_col)
    w = Window.partitionBy("doc_id").orderBy("line_no")
    before = F.collect_list("line").over(w.rowsBetween(-n_context, -1))
    after = F.collect_list("line").over(w.rowsBetween(1, n_context))
    return (
        lv.withColumn("context_before", before)
        .withColumn("context_after", after)
        .filter(F.col("line").rlike(pattern))
        .select("doc_id", "line_no", "line", "context_before", "context_after")
    )


def grep_by_file(df: DataFrame, pattern: str, content_col: str = "content",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_matches, lines sorted) — per-file grouping (A7)."""
    return (
        grep_lines(df, pattern, content_col, id_col)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sort_array(F.collect_list(F.struct("line_no", "line"))).alias("matches"),
        )
    )


def line_range(df: DataFrame, start: int | None, end: int | None,
               content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, content, total_lines, lines_returned) — reference
    resolve_line_range semantics (line.rs:42-86): 1-based inclusive,
    negative indexes from EOF, clamped to bounds; None start→1, None
    end→EOF."""
    lines = F.split(F.col(content_col), "\n")
    n = F.size(lines)

    def resolve(v: int | None, default):
        if v is None:
            return default
        lit = F.lit(v)
        return F.when(lit < 0, F.greatest(n + lit + 1, F.lit(1))).otherwise(
            F.least(lit, n)
        )

    s = resolve(start, F.lit(1))
    e = resolve(end, n)
    length = F.greatest(e - s + 1, F.lit(0))
    sel = F.slice(lines, s, length)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.concat_ws("\n", sel).alias("content"),
        n.cast("int").alias("total_lines"),
        F.size(sel).cast("int").alias("lines_returned"),
    )


def symbol_filter(df: DataFrame, contains: str | None = None,
                  equals: dict | None = None) -> DataFrame:
    """Metadata-equality filters (P3) + substring post-filter (P4), the
    symbol_search.py:41-67 flow. Catalyst pushes the equality filters to
    the parquet scan (PushedFilters)."""
    out = df
    for k, v in (equals or {}).items():
        out = out.filter(F.col(k) == v)
    if contains:
        out = out.filter(F.col("content").contains(contains))
    return out


def facets(df: DataFrame, cols: list[str]) -> DataFrame:
    """Distinct sorted facet arrays over a result set (A6)."""
    return df.agg(
        *[F.sort_array(F.collect_set(c)).alias(f"{c}s") for c in cols],
        F.count(F.lit(1)).alias("n_results"),
    )


def listing(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Dirs-first, then name (T5): treat the first path segment as the
    directory entry, like the reference's tree view."""
    seg = F.split(F.col(path_col), "/")
    return (
        df.select(
            F.element_at(seg, 1).alias("name"),
            (F.size(seg) > 1).alias("is_dir"),
        )
        .groupBy("name", "is_dir")
        .agg(F.count(F.lit(1)).alias("n_entries"))
        .orderBy(F.desc("is_dir"), F.asc("name"))
    )
