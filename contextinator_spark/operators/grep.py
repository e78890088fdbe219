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

import re as _re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The whole-content (?m) prefilter is implied by a line-level match ONLY for
# patterns whose assertions never cross a line boundary. Three classes can
# cross one: \A/\z/\Z anchors and explicit \n/\r escapes (foo(?!\nbar));
# (?s)/(?m) inline flags (dotall '.' spans lines; an embedded (?m) can
# re-anchor ^/$ mid-pattern); and ANY lookaround — inside (?=…)/(?!…)/
# (?<=…)/(?<!…) even innocuous atoms like \s, \W, \D or a negated class
# [^x] match '\n', so e.g. foo(?!\sbar) matches the exploded line 'foo'
# but fails the doc-level prefilter on 'foo\nbar'. For all of these, skip
# the prefilter and pay the full explode rather than silently drop matches.
_PREFILTER_UNSAFE = _re.compile(
    r"\\[AzZnr]"  # line-crossing anchors / literal newline escapes
    r"|\(\?[a-zA-Z-]*[sm][a-zA-Z-]*[):]"  # inline (?s)/(?m) flags (incl. (?s:...))
    r"|\(\?<?[=!]"  # any lookahead / lookbehind
)


def _prefilter_safe(pattern: str) -> bool:
    return not _PREFILTER_UNSAFE.search(pattern)


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
    lower() (grep_search.py:90-93). Documents are prefiltered on the
    (?m)-mode whole-content regex before the line explode (O2 — see
    grep_with_context); the line-level filter stays authoritative.
    """
    pat = f"\\b{pattern}\\b" if whole_word else pattern
    if case_insensitive:
        pat = pat.lower()
        doc_target = F.lower(F.col(content_col))
    else:
        doc_target = F.col(content_col)
    pre = df.filter(doc_target.rlike(f"(?m){pat}")) if _prefilter_safe(pat) else df
    lv = lines_view(pre, content_col, id_col)
    target = F.lower(F.col("line")) if case_insensitive else F.col("line")
    return lv.filter(target.rlike(pat))


def grep_with_context(df: DataFrame, pattern: str, n_context: int = 2,
                      content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Matches + context_before/context_after line arrays (W1,
    search.rs:85-93 — default 2 lines, types.rs:24-26).

    Documents are PREFILTERED on the whole-content regex before the line
    explode + window (the reference's $contains prefilter, O2,
    grep_search.py:58-63): a line match implies a (?m)-mode whole-content
    match ((?m) keeps ^/$ anchored patterns line-relative), so results are
    identical — but non-matching documents (the vast majority at corpus
    scale) never pay the posexplode + collect_list window. Catalyst can't
    infer this from the post-explode line filter. Patterns with
    line-crossing assertions skip the prefilter (see _prefilter_safe)."""
    pre = (
        df.filter(F.col(content_col).rlike(f"(?m){pattern}"))
        if _prefilter_safe(pattern)
        else df
    )
    lv = lines_view(pre, content_col, id_col)
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
    """Dirs-first, then name (T5): the first path segment as the directory
    entry — the one-level view (cli `list` default)."""
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


def tree_listing(df: DataFrame, path_col: str = "path",
                 max_depth: int | None = None) -> DataFrame:
    """Recursive tree view (reference repo_structure.py:25-90): one row per
    directory/file node, emitted in depth-first order with DIRS-FIRST then
    name at every level (repo_structure.py:43), with per-subtree file
    counts.

    Relational form of the recursive walk: every path explodes into its
    prefixes (one row per ancestor + the file itself); the DFS-with-
    dirs-first ordering is a SORT KEY — each path component is tagged
    '0'/name for directories and '1'/name for files, so lexicographic
    order of the tagged component sequence IS the reference's traversal
    order. One explode + one groupBy; no driver recursion."""
    lvl = (
        df.select(F.split(F.col(path_col), "/").alias("parts"))
        .select(F.explode(F.sequence(F.lit(1), F.size("parts"))).alias("depth"), "parts")
    )
    if max_depth is not None:
        lvl = lvl.filter(F.col("depth") <= max_depth)
    is_dir = F.col("depth") < F.size("parts")
    node = F.slice(F.col("parts"), F.lit(1), F.col("depth"))
    # tagged component c_i: '0<name>' while descending dirs, '1<name>' for
    # the terminal file component — chr(0x01) separator sorts below any
    # path character so shorter prefixes (parent dirs) come first
    tag = F.transform(
        node,
        lambda x, i: F.concat(
            F.when((i < F.col("depth") - 1) | is_dir, F.lit("0")).otherwise(F.lit("1")),
            x,
        ),
    )
    return (
        lvl.select(
            F.concat_ws("/", node).alias("node_path"),
            F.element_at("parts", F.col("depth")).alias("name"),
            F.col("depth"),
            is_dir.alias("is_dir"),
            F.array_join(tag, "\x01").alias("_sort"),
        )
        .groupBy("node_path", "name", "depth", "is_dir", "_sort")
        .agg(F.count(F.lit(1)).alias("n_files"))
        .orderBy("_sort")
        .drop("_sort")
    )
