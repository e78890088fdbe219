"""Language-aware chunker (reference chunking subsystem, SURVEY.md §7.2
phase 3; semantics from ast_parser.py:486-806, splitter.py:16-99,
node_collector.py:29-119 — re-implemented, not ported).

The container has no tree-sitter, so structure detection is an
indentation/heading parser with the same OUTPUT contract as the reference's
AST walk: function/class nodes with names, line ranges, parent-child
hierarchy, fallback whole-file chunk for unparseable content
(ast_parser.py:634-675), token-budget splitting (512/50 —
settings.py:19-20).

Engineering contract (stronger than the reference, needed for exact
reconstruction — cat_file.py:70-107):
  * top-level nodes PARTITION the file's lines (interstitial text becomes
    `code` nodes) — concatenating top-level chunks reproduces the file;
  * class parents carry their full line range; their children are
    contained within it (reconstruction drops contained chunks, W2);
  * splits partition their node's lines exactly; budget overlap appears
    only in `enriched` context, never in raw content (divergence from the
    reference noted: its token-overlap splits can't reproduce the file).

Determinism (SURVEY.md §1.2): chunk ids are
pmod(xxhash64(repo, path, ordinal), 2^61) — content-addressable across
partitionings and reruns; the reference's uuid4 would break replays.

Vectorization: one pandas UDF over Arrow batches of files; per-file line
scan is the U1 kernel (same role as the reference's per-file tree-sitter
parse), with all downstream ops columnar.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# CHUNK_TOKEN_OVERLAP (config.py) is deliberately NOT applied to raw
# content: overlapping splits can't reproduce the file byte-exactly (see
# module docstring's engineering contract / reconstruction divergence note)
from ..config import CHUNK_TOKEN_BUDGET
from .. import schemas

_TOKEN_RE = re.compile("[a-z0-9_]+")

_PY_DEF = re.compile(r"^(\s*)(?:async\s+)?def\s+([A-Za-z_]\w*)")
_PY_CLASS = re.compile(r"^(\s*)class\s+([A-Za-z_]\w*)")
_JS_FUNC = re.compile(r"^(\s*)(?:export\s+)?(?:async\s+)?function\s*\*?\s*([A-Za-z_$][\w$]*)?")
_JS_CONST_FN = re.compile(r"^(\s*)(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=\s*(?:async\s*)?(?:\(|function)")
_JS_CLASS = re.compile(r"^(\s*)(?:export\s+)?class\s+([A-Za-z_$][\w$]*)")
_RS_FN = re.compile(r"^(\s*)(?:pub\s+)?(?:async\s+)?fn\s+([A-Za-z_]\w*)")
_RS_TYPE = re.compile(r"^(\s*)(?:pub\s+)?(?:struct|enum|trait|impl)\s+([A-Za-z_]\w*)")
_MD_HEADING = re.compile(r"^(#{1,6})\s+(.*)")


def _token_count(text: str) -> int:
    return len(_TOKEN_RE.findall(text.lower()))


def _is_probably_binary(content: str) -> bool:
    return "\x00" in content or "\x01" in content


def _declarations(lines: list[str], lang: str):
    """[(line_idx, indent, kind, name)] of structure starts."""
    decls = []
    if lang == "markdown":
        for i, ln in enumerate(lines):
            m = _MD_HEADING.match(ln)
            if m:
                # heading level 1 → indent 0 (top level)
                decls.append((i, len(m.group(1)) - 1, "section", m.group(2).strip()))
        return decls
    if lang == "python":
        pats = [(_PY_CLASS, "class"), (_PY_DEF, "function")]
    elif lang in ("javascript", "typescript"):
        pats = [(_JS_CLASS, "class"), (_JS_FUNC, "function"), (_JS_CONST_FN, "function")]
    elif lang == "rust":
        pats = [(_RS_TYPE, "class"), (_RS_FN, "function")]
    else:
        return []
    for i, ln in enumerate(lines):
        for pat, kind in pats:
            m = pat.match(ln)
            if m:
                name = m.group(2) if m.lastindex and m.lastindex >= 2 and m.group(2) else None
                decls.append((i, len(m.group(1)), kind, name))
                break
    return decls


def _node_end(lines: list[str], start: int, indent: int) -> int:
    """Last line (inclusive) of a block starting at `start` with `indent`:
    runs until the next non-blank line at indent ≤ indent."""
    end = start
    for j in range(start + 1, len(lines)):
        ln = lines[j]
        if not ln.strip():
            end = j
            continue
        cur = len(ln) - len(ln.lstrip())
        if cur <= indent:
            break
        end = j
    return end


def chunk_file(content: str, lang: str) -> list[dict]:
    """File → list of chunk-node dicts (schemas.CHUNK_NODE fields)."""
    lines = content.split("\n")
    n = len(lines)

    def node(kind, name, s, e, parent=None, is_parent=False):
        text = "\n".join(lines[s : e + 1])
        return {
            "node_type": kind,
            "node_name": name or f"anonymous_{kind}_line_{s + 1}",
            "start_line": s + 1,
            "end_line": e + 1,
            "parent_index": parent,
            "is_parent": is_parent,
            "is_split": False,
            "split_index": 0,
            "token_count": _token_count(text),
            "content": text,
        }

    if _is_probably_binary(content) or not content.strip():
        # fallback whole-file chunk (ast_parser.py:634-675)
        return _split_over_budget([node("file", None, 0, n - 1)])

    decls = _declarations(lines, lang)
    top = [(i, ind, k, nm) for (i, ind, k, nm) in decls if ind == 0]
    if not top:
        return _split_over_budget([node("file", None, 0, n - 1)])

    out: list[dict] = []
    cursor = 0
    for idx, (i, _ind, kind, name) in enumerate(top):
        if i > cursor:
            out.append(node("code", None, cursor, i - 1))
        if lang == "markdown":
            nxt = top[idx + 1][0] if idx + 1 < len(top) else n
            end = nxt - 1
        else:
            end = _node_end(lines, i, 0)
        is_cls = kind in ("class", "section")
        parent_pos = len(out)
        out.append(node(kind, name, i, end, is_parent=is_cls))
        if is_cls and lang != "markdown":
            # children: nested declarations inside the class body (J1)
            for (ci, cind, ck, cn) in decls:
                if i < ci <= end and cind > 0:
                    cend = _node_end(lines, ci, cind)
                    out.append(node(ck, cn, ci, min(cend, end), parent=parent_pos))
        cursor = end + 1
    if cursor < n:
        out.append(node("code", None, cursor, n - 1))
    return _split_over_budget(out)


def _split_over_budget(nodes: list[dict], budget: int = CHUNK_TOKEN_BUDGET) -> list[dict]:
    """Leaf nodes over the token budget become line-partitioned splits
    (splitter.py:16-99 semantics; raw content partitions exactly so
    reconstruction stays lossless — overlap lives in `enriched` only)."""
    out: list[dict] = []
    index_map: dict[int, int] = {}
    for old_idx, nd in enumerate(nodes):
        index_map[old_idx] = len(out)
        if nd["is_parent"] or nd["token_count"] <= budget:
            out.append(nd)
            continue
        lines = nd["content"].split("\n")
        parts: list[tuple[int, int]] = []
        s = 0
        tok = 0
        for j, ln in enumerate(lines):
            tok += _token_count(ln)
            if tok >= budget and j >= s:
                parts.append((s, j))
                s, tok = j + 1, 0
        if s < len(lines):
            parts.append((s, len(lines) - 1))
        for si, (a, b) in enumerate(parts):
            text = "\n".join(lines[a : b + 1])
            out.append(
                {
                    **nd,
                    "start_line": nd["start_line"] + a,
                    "end_line": nd["start_line"] + b,
                    "is_split": True,
                    "split_index": si,
                    "token_count": _token_count(text),
                    "content": text,
                }
            )
            if si == 0:
                index_map[old_idx] = len(out) - 1
    for nd in out:
        if nd["parent_index"] is not None:
            nd["parent_index"] = index_map.get(nd["parent_index"], nd["parent_index"])
    return out


@pandas_udf(T.ArrayType(schemas.CHUNK_NODE))
def chunk_udf(content: pd.Series, lang: pd.Series) -> pd.Series:
    return pd.Series([chunk_file(c, l) for c, l in zip(content, lang)])


def chunk_corpus(corpus: DataFrame) -> DataFrame:
    """corpus → chunks DataFrame (schemas.CHUNKS), deterministic ids."""
    exploded = (
        corpus.withColumn("_nodes", chunk_udf(F.col("content"), F.col("lang")))
        .select("repo", "path", "commit", "lang", F.posexplode("_nodes").alias("ordinal", "nd"))
    )
    cid = F.pmod(F.xxhash64("repo", "path", F.col("ordinal")), F.lit(2**61))
    pid = F.when(
        F.col("nd.parent_index").isNotNull(),
        F.pmod(F.xxhash64("repo", "path", F.col("nd.parent_index").cast("int")), F.lit(2**61)),
    )
    return exploded.select(
        cid.alias("doc_id"),
        "repo",
        "path",
        "commit",
        "lang",
        F.col("nd.node_type").alias("node_type"),
        F.col("nd.node_name").alias("node_name"),
        F.col("nd.start_line").alias("start_line"),
        F.col("nd.end_line").alias("end_line"),
        pid.alias("parent_doc_id"),
        F.col("nd.is_parent").alias("is_parent"),
        F.col("nd.is_split").alias("is_split"),
        F.col("nd.split_index").alias("split_index"),
        F.col("nd.token_count").alias("token_count"),
        F.col("nd.content").alias("content"),
        F.sha2(F.col("nd.content"), 256).alias("content_sha256"),
    )


def children_index(chunks: DataFrame) -> DataFrame:
    """(doc_id, children_ids sorted) — replaces the reference's O(n²)
    backfill (ast_parser.py:799-805) with one aggregation (J1)."""
    return (
        chunks.filter(F.col("parent_doc_id").isNotNull())
        .groupBy(F.col("parent_doc_id").alias("doc_id"))
        .agg(F.sort_array(F.collect_list("doc_id")).alias("children_ids"))
    )


def enriched_content(chunks: DataFrame) -> DataFrame:
    """Prepend the retrieval header (context_builder.py:11-118, F8):
    Parent/File/Language/Type/Symbol/Lines — pure columnar concat."""
    parents = chunks.select(
        F.col("doc_id").alias("parent_doc_id"), F.col("node_name").alias("_parent_name")
    )
    return (
        chunks.join(F.broadcast(parents), "parent_doc_id", "left")
        .withColumn(
            "enriched",
            F.concat(
                F.when(
                    F.col("_parent_name").isNotNull(),
                    F.concat(F.lit("Parent: "), F.col("_parent_name"), F.lit("\n")),
                ).otherwise(F.lit("")),
                F.lit("File: "), F.col("path"),
                F.lit("\nLanguage: "), F.col("lang"),
                F.lit("\nType: "), F.col("node_type"),
                F.lit("\nSymbol: "), F.col("node_name"),
                F.lit("\nLines: "),
                F.col("start_line").cast("string"), F.lit("-"), F.col("end_line").cast("string"),
                F.lit("\n\n"), F.col("content"),
            ),
        )
        .drop("_parent_name")
    )


def reconstruct_files(chunks: DataFrame) -> DataFrame:
    """(repo, path, content) — reassemble originals from chunks
    (cat_file.py:70-107 / W2): order by (start_line, split_index), drop
    chunks fully contained in an already-covered range, concatenate."""
    ordered = F.sort_array(
        F.collect_list(F.struct("start_line", "split_index", "end_line", "content"))
    )
    return (
        chunks.groupBy("repo", "path")
        .agg(ordered.alias("cs"))
        .withColumn(
            # running containment filter via aggregate: keep chunk if its
            # end extends past the max end seen so far AND starts after it
            "content",
            F.aggregate(
                F.col("cs"),
                F.struct(F.lit(0).alias("maxend"), F.lit("").alias("acc")),
                lambda st, c: F.struct(
                    F.greatest(st["maxend"], c["end_line"]).alias("maxend"),
                    F.when(
                        c["start_line"] > st["maxend"],
                        F.when(st["acc"] == "", c["content"]).otherwise(
                            F.concat(st["acc"], F.lit("\n"), c["content"])
                        ),
                    ).otherwise(st["acc"]).alias("acc"),
                ),
                lambda st: st["acc"],
            ),
        )
        .select("repo", "path", "content")
    )
