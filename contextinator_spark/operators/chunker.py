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
from ..functions.bpe_estimate import approx_bpe_len
from .. import schemas

_PY_DEF = re.compile(r"^(\s*)(?:async\s+)?def\s+([A-Za-z_]\w*)")
_PY_CLASS = re.compile(r"^(\s*)class\s+([A-Za-z_]\w*)")
_JS_FUNC = re.compile(r"^(\s*)(?:export\s+)?(?:async\s+)?function\s*\*?\s*([A-Za-z_$][\w$]*)?")
_JS_CONST_FN = re.compile(r"^(\s*)(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=\s*(?:async\s*)?(?:\(|function)")
_JS_CLASS = re.compile(r"^(\s*)(?:export\s+)?class\s+([A-Za-z_$][\w$]*)")
_RS_FN = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?(?:async\s+)?fn\s+([A-Za-z_]\w*)")
_RS_TYPE = re.compile(r"^(\s*)(?:pub(?:\([^)]*\))?\s+)?(?:struct|enum|trait|impl)\s+([A-Za-z_]\w*)")
_MD_HEADING = re.compile(r"^(#{1,6})\s+(.*)")
# go / java / c / cpp / ruby declaration patterns — same node-type intent as
# the reference's tree-sitter NODE_TYPES table (ast_parser.py:230-421),
# re-expressed as line heuristics (container has no tree-sitter)
_GO_FUNC = re.compile(r"^(\s*)func\s+(?:\([^)]*\)\s*)?([A-Za-z_]\w*)")
_GO_TYPE = re.compile(r"^(\s*)type\s+([A-Za-z_]\w*)\s+(?:struct|interface)\b")
_JAVA_CLASS = re.compile(
    r"^(\s*)(?:(?:public|private|protected|static|final|abstract|sealed)\s+)*"
    r"(?:class|interface|enum|record)\s+([A-Za-z_]\w*)"
)
_JAVA_METHOD = re.compile(
    r"^(\s*)(?:(?:public|private|protected|static|final|synchronized|abstract|native|default)\s+)+"
    r"[\w<>\[\],.\s]+?\s+([A-Za-z_]\w*)\s*\("
)
_C_TYPE = re.compile(
    r"^(\s*)(?:typedef\s+)?(?:struct|class|enum|union|namespace)\s+([A-Za-z_]\w*)"
)
_C_FN_CALLish = re.compile(r"\b([A-Za-z_]\w*)\s*\(")
_C_KEYWORDS = {"if", "else", "for", "while", "switch", "return", "case", "do",
               "break", "continue", "sizeof", "goto"}
_RB_DEF = re.compile(r"^(\s*)def\s+(?:self\.)?([A-Za-z_]\w*[?!=]?)")
_RB_CLASS = re.compile(r"^(\s*)(?:class|module)\s+([A-Z]\w*)")
# php / kotlin / swift / scala — next tier of the reference NODE_TYPES table
# (ast_parser.py:230-421, settings.py:23-120), round-3 VERDICT item 6
_PHP_FUNC = re.compile(
    r"^(\s*)(?:(?:public|private|protected|static|final|abstract)\s+)*function\s+&?([A-Za-z_]\w*)"
)
_PHP_CLASS = re.compile(
    r"^(\s*)(?:(?:final|abstract|readonly)\s+)*(?:class|interface|trait|enum)\s+([A-Za-z_]\w*)"
)
_KT_FUN = re.compile(
    r"^(\s*)(?:(?:public|private|protected|internal|open|override|suspend|inline|operator|infix|tailrec|external|actual|expect)\s+)*"
    r"fun\s+(?:<[^>]*>\s+)?(?:[\w.<>?]+\.)?([A-Za-z_]\w*)"
)
_KT_CLASS = re.compile(
    r"^(\s*)(?:(?:public|private|protected|internal|open|abstract|final|sealed|data|inner|annotation|enum|value)\s+)*"
    r"(?:class|interface|object)\s+([A-Za-z_]\w*)"
)
_SWIFT_FUNC = re.compile(
    r"^(\s*)(?:(?:public|private|fileprivate|internal|open|static|final|override|mutating|nonmutating|class)\s+)*"
    r"func\s+([A-Za-z_]\w*)"
)
_SWIFT_TYPE = re.compile(
    r"^(\s*)(?:(?:public|private|fileprivate|internal|open|final|indirect)\s+)*"
    r"(?:class|struct|enum|protocol|extension|actor)\s+([A-Za-z_][\w.]*)"
)
_SCALA_DEF = re.compile(
    r"^(\s*)(?:(?:private|protected|final|override|implicit|lazy)\s+)*def\s+([A-Za-z_]\w*)"
)
_SCALA_CLASS = re.compile(
    r"^(\s*)(?:(?:private|protected|final|abstract|sealed|implicit|case)\s+)*"
    r"(?:class|object|trait)\s+([A-Za-z_]\w*)"
)
# bash / lua / sql / elixir / solidity — round-4 second tier of the
# reference NODE_TYPES table (ast_parser.py:336-413: bash
# function_definition, sql create_*, lua function_definition/
# local_function, elixir defmodule/def/defp, solidity contract/function
# declarations), re-expressed as line heuristics
_SH_FUNC = re.compile(r"^(\s*)(?:function\s+)?([A-Za-z_][\w-]*)\s*\(\s*\)\s*\{?\s*$")
_SH_FUNC_KW = re.compile(r"^(\s*)function\s+([A-Za-z_][\w-]*)\s*\{?\s*$")
_LUA_FUNC = re.compile(r"^(\s*)(?:local\s+)?function\s+([A-Za-z_][\w.:]*)")
_LUA_ASSIGN_FN = re.compile(r"^(\s*)(?:local\s+)?([A-Za-z_][\w.]*)\s*=\s*function\b")
_EX_MODULE = re.compile(r"^(\s*)defmodule\s+([A-Z][\w.]*)")
_EX_DEF = re.compile(r"^(\s*)(?:defp?|defmacrop?)\s+([a-z_]\w*[?!]?)")
_SOL_TYPE = re.compile(r"^(\s*)(?:abstract\s+)?(?:contract|interface|library)\s+([A-Za-z_]\w*)")
_SOL_FUNC = re.compile(r"^(\s*)(?:function|modifier|event)\s+([A-Za-z_]\w*)")
_SOL_SPECIAL = re.compile(r"^(\s*)(constructor|receive|fallback)\s*\(")
_SQL_CREATE = re.compile(
    r"^(\s*)create\s+(?:or\s+replace\s+)?(?:temp(?:orary)?\s+)?(?:unique\s+)?"
    r"(table|view|materialized\s+view|function|procedure|trigger|index)\s+"
    r"(?:if\s+not\s+exists\s+)?[`\"]?([A-Za-z_][\w.]*)",
    re.IGNORECASE,
)
# yaml / toml / json / dockerfile — the config-format tail of the reference
# NODE_TYPES table (ast_parser.py:361-367: yaml block_mapping/block_sequence,
# toml table/key_value, json object/array, dockerfile instruction), as line
# heuristics. Node types reuse the reference's tree-sitter node names.
_YAML_KEY = re.compile(r"^([A-Za-z_\"'][\w./\"' -]*?)\s*:(?:\s|$)")
_YAML_SEQ = re.compile(r"^-(?:\s|$)")
_TOML_TABLE = re.compile(r"^\[(\[)?\s*([^]]+?)\s*\]?\]")
_DOCKER_INSTR = re.compile(
    r"^(FROM|RUN|CMD|LABEL|EXPOSE|ENV|ADD|COPY|ENTRYPOINT|VOLUME|USER|WORKDIR"
    r"|ARG|ONBUILD|STOPSIGNAL|HEALTHCHECK|SHELL|MAINTAINER)\b",
    re.IGNORECASE,
)
# a key opening a container — `"key": {` / `"key": [` — the object/array
# nodes the reference chunks json on; scalar keys stay inside their parent
_JSON_CONTAINER_KEY = re.compile(r"^(\s*)\"((?:[^\"\\]|\\.)+)\"\s*:\s*([\[{])\s*$")
_JSON_CLOSERS = ("}", "},", "]", "],")
# zig / prisma / haskell / ocaml / html / xml / css — the last tier of the
# reference NODE_TYPES table (ast_parser.py:388-420: zig
# function/struct/enum_declaration, prisma model/generator/datasource/enum,
# haskell function/type/data_declaration, ocaml value/type/module_definition,
# html element/script_element/style_element, xml element, css rule_set/
# media_statement/keyframes_statement), as line heuristics
_ZIG_FN = re.compile(r"^(\s*)(?:pub\s+)?(?:export\s+|extern\s+|inline\s+|noinline\s+)*fn\s+([A-Za-z_]\w*)")
_ZIG_TYPE = re.compile(
    r"^(\s*)(?:pub\s+)?const\s+([A-Za-z_]\w*)\s*=\s*(?:packed\s+|extern\s+)?(?:struct|enum|union|opaque)\b"
)
_PRISMA_BLOCK = re.compile(r"^(model|enum|generator|datasource|type|view)\s+([A-Za-z_]\w*)\s*\{")
_HS_DATA = re.compile(r"^(data|newtype|type)\s+([A-Z][\w']*)")
_HS_CLASSY = re.compile(r"^(?:class|instance)\s+(?:.*?=>\s*)?([A-Z][\w']*(?:\s+[\w()\[\],' ]*?)?)\s+where\s*$")
_HS_RESERVED = {"module", "import", "instance", "class", "where", "infix",
                "infixl", "infixr", "foreign", "deriving", "data", "newtype", "type"}
_HS_SIG = re.compile(r"^([a-z_][\w']*)\s*(?:,\s*[a-z_][\w']*\s*)*::")
_HS_EQ = re.compile(r"^([a-z_][\w']*)(?:\s+[^=\n]*?)?=(?!=)")
_ML_LET = re.compile(r"^let\s+(?:rec\s+)?(\(\)|[a-z_][\w']*)")
_ML_TYPE = re.compile(r"^type\s+(?:nonrec\s+)?(?:[+-]?'\w+\s+)*([a-z_][\w']*)")
_ML_MODULE = re.compile(r"^module\s+(?:type\s+)?([A-Z][\w']*)")
_MARKUP_OPEN = re.compile(r"^(\s*)<([A-Za-z][\w:.-]*)")
# hcl/terraform block/attribute + make rule/variable_assignment
# (NODE_TYPES ast_parser.py:415-418) — the last two table entries
_HCL_BLOCK = re.compile(r"^(\s*)([A-Za-z_][\w-]*)((?:\s+\"[^\"]*\")*)\s*\{\s*$")
_HCL_ATTR = re.compile(r"^(\s*)([A-Za-z_][\w-]*)\s*=")
_MK_VAR = re.compile(r"^([A-Za-z_][\w.]*)\s*[:?+!]?=")
_MK_RULE = re.compile(r"^([^\s:=#][^:=#]*?)\s*::?(?!=)")
_CSS_AT = re.compile(r"^(@media|@keyframes|@supports|@font-face)\b\s*([^{]*)")
_CSS_RULE = re.compile(r"^([^@\s{}/][^{}]*?)\s*\{")

# block terminator tokens that sit at the OPENER's indent and belong to the
# block (braces; ruby `end`) — included by _node_end so a function chunk
# carries its closing line, as a tree-sitter node span would
_CLOSERS = {
    "go": ("}",), "java": ("}",), "c": ("}",), "cpp": ("}",), "c_sharp": ("}",),
    "javascript": ("}", "};", "})", "});"), "typescript": ("}", "};", "})", "});"),
    "rust": ("}",), "ruby": ("end",),
    "php": ("}",), "kotlin": ("}",), "swift": ("}",), "scala": ("}",),
    "bash": ("}",), "lua": ("end",), "elixir": ("end",), "solidity": ("}",),
    "zig": ("}", "};"), "prisma": ("}",), "css": ("}",), "hcl": ("}",),
}


def _c_function_decl(ln: str):
    """C/C++ function-definition heuristic for an indent-0 line: an
    identifier( with a return type before it, not a control keyword, not a
    declaration/assignment statement. Returns the name or None."""
    s = ln.strip()
    if not s or ln[0].isspace() or "=" in s or s.endswith((";", ",")):
        return None
    first = re.match(r"[A-Za-z_]\w*", s)
    if not first or first.group(0) in _C_KEYWORDS:
        return None
    m = _C_FN_CALLish.search(s)
    if not m or m.group(1) in _C_KEYWORDS:
        return None
    # needs a return type token before the name (rules out bare calls)
    return m.group(1) if s[: m.start()].strip() else None


def _token_count(text: str) -> int:
    """Budget-token count for chunk splitting: the approximate-BPE cost
    model (functions/bpe_estimate.py), matching the reference's tiktoken
    budgeting semantics (rag/utils/token_counter.py:15-74) within the
    documented approximation — NOT the BM25 term count (doc_len), which
    stays separate per SURVEY §7.3."""
    return approx_bpe_len(text)


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
    elif lang == "go":
        pats = [(_GO_TYPE, "class"), (_GO_FUNC, "function")]
    elif lang in ("java", "c_sharp"):
        pats = [(_JAVA_CLASS, "class"), (_JAVA_METHOD, "function")]
    elif lang == "ruby":
        pats = [(_RB_CLASS, "class"), (_RB_DEF, "function")]
    elif lang == "php":
        pats = [(_PHP_CLASS, "class"), (_PHP_FUNC, "function")]
    elif lang == "kotlin":
        pats = [(_KT_CLASS, "class"), (_KT_FUN, "function")]
    elif lang == "swift":
        pats = [(_SWIFT_TYPE, "class"), (_SWIFT_FUNC, "function")]
    elif lang == "scala":
        pats = [(_SCALA_CLASS, "class"), (_SCALA_DEF, "function")]
    elif lang == "bash":
        pats = [(_SH_FUNC_KW, "function"), (_SH_FUNC, "function")]
    elif lang == "lua":
        pats = [(_LUA_FUNC, "function"), (_LUA_ASSIGN_FN, "function")]
    elif lang == "elixir":
        pats = [(_EX_MODULE, "class"), (_EX_DEF, "function")]
    elif lang == "solidity":
        pats = [(_SOL_TYPE, "class"), (_SOL_FUNC, "function"), (_SOL_SPECIAL, "function")]
    elif lang == "zig":
        pats = [(_ZIG_TYPE, "class"), (_ZIG_FN, "function")]
    elif lang == "hcl":
        # terraform: block name = identifier + dotted quoted labels
        # (`resource "aws_s3" "b"` → resource.aws_s3.b); top-level
        # attributes are their own nodes (.tfvars files are all attributes)
        for i, ln in enumerate(lines):
            m = _HCL_BLOCK.match(ln)
            if m:
                name = ".".join([m.group(2)] + re.findall(r'"([^"]*)"', m.group(3) or ""))
                decls.append((i, len(m.group(1)), "block", name))
                continue
            m = _HCL_ATTR.match(ln)
            if m:
                decls.append((i, len(m.group(1)), "attribute", m.group(2)))
        return decls
    elif lang == "makefile":
        # make rule/variable_assignment; tab-indented recipe lines ride
        # their rule's _node_end span
        for i, ln in enumerate(lines):
            m = _MK_VAR.match(ln)
            if m:
                decls.append((i, 0, "variable_assignment", m.group(1)))
                continue
            m = _MK_RULE.match(ln)
            if m:
                decls.append((i, 0, "rule", m.group(1).strip()))
        return decls
    elif lang == "prisma":
        # node_type = the prisma block keyword (reference NODE_TYPES
        # ast_parser.py:420: model/generator/datasource/enum)
        for i, ln in enumerate(lines):
            m = _PRISMA_BLOCK.match(ln)
            if m:
                decls.append((i, 0, m.group(1), m.group(2)))
        return decls
    elif lang == "haskell":
        # top-level only (col 0); a signature and its following equations
        # for the same name merge into ONE function_declaration node
        for i, ln in enumerate(lines):
            m = _HS_DATA.match(ln)
            if m:
                decls.append((i, 0, "data", m.group(2)))
                continue
            m = _HS_CLASSY.match(ln)
            if m:
                decls.append((i, 0, "class", m.group(1).split()[0]))
                continue
            m = _HS_SIG.match(ln) or _HS_EQ.match(ln)
            if m and m.group(1) not in _HS_RESERVED:
                if decls and decls[-1][3] == m.group(1) and decls[-1][2] == "function":
                    continue  # further equations of the same binding
                decls.append((i, 0, "function", m.group(1)))
        return decls
    elif lang == "ocaml":
        for i, ln in enumerate(lines):
            for pat, kind in ((_ML_MODULE, "module"), (_ML_TYPE, "type"), (_ML_LET, "value")):
                m = pat.match(ln)
                if m:
                    decls.append((i, 0, kind, m.group(1)))
                    break
        return decls
    elif lang in ("html", "xml"):
        # elements at the file's shallowest element indent (like json:
        # true indent kept, _structure_nodes rebases); script/style get
        # their reference node names (NODE_TYPES ast_parser.py:388,419)
        cand = []
        for i, ln in enumerate(lines):
            m = _MARKUP_OPEN.match(ln)
            if m:
                tag = m.group(2)
                kind = (tag + "_element") if lang == "html" and tag in ("script", "style") else "element"
                cand.append((i, len(m.group(1)), kind, tag))
        if not cand:
            return []
        base = min(ind for (_i, ind, _k, _n) in cand)
        return [d for d in cand if d[1] == base]
    elif lang == "css":
        # rule_set / media_statement / keyframes_statement (scss/less/sass
        # ride the same branch per the ext map)
        for i, ln in enumerate(lines):
            m = _CSS_AT.match(ln)
            if m:
                kind = {"@media": "media_statement", "@keyframes": "keyframes_statement"}.get(
                    m.group(1), "rule_set")
                decls.append((i, 0, kind, (m.group(1) + " " + m.group(2).strip()).strip()))
                continue
            m = _CSS_RULE.match(ln)
            if m:
                decls.append((i, 0, "rule_set", m.group(1).strip()))
        return decls
    elif lang == "yaml":
        # top-level block_mapping entries / block_sequence items; nested
        # keys stay inside their top-level node's span
        for i, ln in enumerate(lines):
            m = _YAML_KEY.match(ln)
            if m:
                decls.append((i, 0, "mapping", m.group(1).strip("\"' ")))
            elif _YAML_SEQ.match(ln):
                decls.append((i, 0, "sequence", None))
        return decls
    elif lang == "toml":
        for i, ln in enumerate(lines):
            m = _TOML_TABLE.match(ln)
            if m:
                decls.append((i, 0, "table", m.group(2)))
        return decls
    elif lang == "dockerfile":
        for i, ln in enumerate(lines):
            m = _DOCKER_INSTR.match(ln)
            if m:
                decls.append((i, 0, "instruction", m.group(1).upper()))
        return decls
    elif lang == "json":
        # container-opening keys at the SHALLOWEST key indent (a json file
        # is one top-level object, so its immediate children are the
        # chunkable object/array nodes); indent reported TRUE, not 0 —
        # _structure_nodes handles the rebase
        cand = []
        for i, ln in enumerate(lines):
            m = _JSON_CONTAINER_KEY.match(ln)
            if m:
                kind = "object" if m.group(3) == "{" else "array"
                cand.append((i, len(m.group(1)), kind, m.group(2)))
        if not cand:
            return []
        base = min(ind for (_i, ind, _k, _n) in cand)
        return [d for d in cand if d[1] == base]
    elif lang == "sql":
        # statement kind from the CREATE keyword: routines are functions,
        # relations/indexes are class-like containers (tree-sitter-sql
        # create_function vs create_table/create_view statement nodes)
        for i, ln in enumerate(lines):
            m = _SQL_CREATE.match(ln)
            if m:
                kw = re.sub(r"\s+", " ", m.group(2).lower())
                kind = "function" if kw in ("function", "procedure", "trigger") else "class"
                decls.append((i, len(m.group(1)), kind, m.group(3)))
        return decls
    elif lang in ("c", "cpp"):
        for i, ln in enumerate(lines):
            m = _C_TYPE.match(ln)
            if m:
                decls.append((i, len(m.group(1)), "class", m.group(2)))
                continue
            name = _c_function_decl(ln)
            if name:
                decls.append((i, 0, "function", name))
        return decls
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


def _node_end(lines: list[str], start: int, indent: int, closers: tuple = ()) -> int:
    """Last line (inclusive) of a block starting at `start` with `indent`:
    runs until the next non-blank line at indent ≤ indent. A block
    terminator token at the opener's indent (`}` for brace languages,
    `end` for ruby — _CLOSERS) belongs to the block, matching the span a
    tree-sitter node would carry."""
    end = start
    for j in range(start + 1, len(lines)):
        ln = lines[j]
        if not ln.strip():
            end = j
            continue
        cur = len(ln) - len(ln.lstrip())
        if cur <= indent:
            if closers and cur == indent:
                s = ln.strip()
                if s in closers:
                    return j
                if s == "{":  # Allman style (PSR-12 PHP, some C#): the
                    end = j   # opening brace sits alone at the opener's
                    continue  # indent and belongs to the block
            break
        end = j
    return end


def _markup_end(lines: list[str], start: int, indent: int, tag: str, fallback: int) -> int:
    """End line of an html/xml element opened at `start`: the first
    `</tag>` line at the opener's indent (formatted markup closes siblings
    at the opener's column; same-tag children sit deeper). Self-closing or
    same-line-closed elements end on their own line; an unclosed/void
    element runs to `fallback` (next sibling marker − 1 / EOF)."""
    s = lines[start].strip()
    if s.endswith("/>") or f"</{tag}>" in s:
        return start
    probe = f"</{tag}"
    for j in range(start + 1, len(lines)):
        ln = lines[j]
        if ln.strip().startswith(probe) and len(ln) - len(ln.lstrip()) == indent:
            return j
    return fallback


def _sql_stmt_end(lines: list[str], start: int) -> int:
    """End of a SQL statement: the first line (from `start`) whose code
    ends with ';' outside an open dollar-quoted ($$…$$) routine body —
    the line-heuristic span of a tree-sitter-sql statement node. SQL
    bodies are routinely written at indent 0, so the indentation-based
    _node_end cannot delimit them."""
    in_dollar = False
    for j in range(start, len(lines)):
        s = lines[j].strip()
        if s.count("$$") % 2 == 1:
            in_dollar = not in_dollar
        if not in_dollar and s.endswith(";"):
            return j
    return len(lines) - 1


# languages whose definitions may be preceded by @-prefixed attachment lines
# (python decorators, java/c# annotations, ts/js decorators); the reference
# emits `decorated_definition` nodes SPANNING the decorator (NODE_TYPES
# python, ast_parser.py:234) — here the decorator lines extend the node start
_DECORATOR_LANGS = {"python", "java", "c_sharp", "typescript", "javascript"}


def _decor_start(lines: list[str], i: int, indent: int, lang: str) -> int:
    """First line of the decorator run immediately above a declaration at
    line `i` (same indent, @-prefixed), else `i` itself."""
    if lang not in _DECORATOR_LANGS:
        return i
    s = i
    while s - 1 >= 0:
        ln = lines[s - 1]
        if ln.strip().startswith("@") and len(ln) - len(ln.lstrip()) == indent:
            s -= 1
        else:
            break
    return s


def _structure_nodes(content: str, lang: str, line_offset: int = 0) -> list[dict]:
    """File (or notebook cell) → structure nodes WITHOUT budget splitting.
    `line_offset` shifts emitted line numbers (and anonymous names) so
    notebook cells index into the notebook's concatenated source view.
    parent_index stays local to the returned list.

    Hierarchy follows the reference traversal (ast_parser.py:737-806):
    only class-like nodes are parents (PARENT_NODE_TYPES:424-476 —
    function_definition is NOT among them), so a nested declaration's
    parent is its nearest ENCLOSING CLASS, reached through any number of
    intervening function bodies; nested classes produce parent chains
    deeper than 2 (depth tracks the chain length). Nested declarations are
    emitted for function tops too — contained in their top node's range,
    so reconstruction's containment drop keeps files byte-exact."""
    lines = content.split("\n")
    n = len(lines)
    closers = _CLOSERS.get(lang, ())

    def node(kind, name, s, e, parent=None, is_parent=False, depth=1):
        text = "\n".join(lines[s : e + 1])
        return {
            "node_type": kind,
            "node_name": name or f"anonymous_{kind}_line_{line_offset + s + 1}",
            "start_line": line_offset + s + 1,
            "end_line": line_offset + e + 1,
            "parent_index": parent,
            "is_parent": is_parent,
            "is_split": False,
            "split_index": 0,
            "token_count": _token_count(text),
            "depth": depth,
            "content": text,
        }

    if _is_probably_binary(content) or not content.strip():
        # fallback whole-file chunk (ast_parser.py:634-675)
        return [node("file", None, 0, n - 1)]

    decls = _declarations(lines, lang)
    if lang in ("json", "html", "xml"):
        # decls carry the (shared) true base indent — see _declarations
        top = decls
    else:
        top = [(i, ind, k, nm) for (i, ind, k, nm) in decls if ind == 0]
    if not top:
        return [node("file", None, 0, n - 1)]

    out: list[dict] = []
    cursor = 0
    for idx, (i, _ind, kind, name) in enumerate(top):
        if i <= cursor - 1:
            continue  # declaration swallowed by the previous block's closer
        s0 = max(_decor_start(lines, i, 0, lang), cursor)
        if s0 > cursor:
            out.append(node("code", None, cursor, s0 - 1))
        if lang in ("markdown", "yaml", "toml", "dockerfile", "haskell", "ocaml"):
            # marker-to-next-marker span (a heading/key/table/instruction/
            # top-level binding owns everything until the next one, like
            # its tree-sitter node)
            nxt = top[idx + 1][0] if idx + 1 < len(top) else n
            end = nxt - 1
        elif lang == "sql":
            end = _sql_stmt_end(lines, i)
        elif lang == "json":
            end = _node_end(lines, i, _ind, _JSON_CLOSERS)
        elif lang in ("html", "xml"):
            end = _markup_end(lines, i, _ind, name,
                              top[idx + 1][0] - 1 if idx + 1 < len(top) else n - 1)
        else:
            end = _node_end(lines, i, 0, closers)
        is_cls = kind in ("class", "section")
        top_pos = len(out)
        out.append(node(kind, name, s0, end, is_parent=is_cls, depth=1))
        if lang not in ("markdown", "yaml", "toml", "dockerfile", "json",
                        "haskell", "ocaml", "html", "xml", "prisma", "css",
                        "hcl", "makefile"):
            # nested declarations inside this block (J1). Stack of
            # enclosing emitted nodes: (start, end, kind, out_pos, depth)
            stack = [(i, end, kind, top_pos, 1)]
            for (ci, cind, ck, cn) in decls:
                if not (i < ci <= end) or cind <= 0:
                    continue
                cend = min(
                    _sql_stmt_end(lines, ci) if lang == "sql"
                    else _node_end(lines, ci, cind, closers),
                    end,
                )
                while len(stack) > 1 and ci > stack[-1][1]:
                    stack.pop()
                # reference parent rule: nearest enclosing CLASS
                parent_pos, cdepth = None, 1
                for (_ss, _se, sk, sp, sd) in reversed(stack):
                    if sk == "class":
                        parent_pos, cdepth = sp, sd + 1
                        break
                cs = _decor_start(lines, ci, cind, lang)
                out.append(
                    node(ck, cn, cs, cend, parent=parent_pos,
                         is_parent=(ck == "class"), depth=cdepth)
                )
                stack.append((ci, cend, ck, len(out) - 1, cdepth))
        cursor = end + 1
    if cursor < n:
        out.append(node("code", None, cursor, n - 1))
    return out


def _notebook_nodes(content: str) -> list[dict] | None:
    """ipynb → cell-structured nodes (reference notebook_parser.py:34-202):
    code cells route to the kernel language's structure parser, markdown
    cells to the heading parser, raw cells pass through as one node
    (:205-241); invalid JSON returns None → whole-file fallback (:244-290).

    Line numbers index the notebook's SOURCE VIEW — the cell sources
    joined by newlines — so reconstruct_files reproduces that view exactly
    (the raw JSON is not reconstructable from cell chunks, same as the
    reference's cat of a notebook)."""
    import json as _json

    try:
        nb = _json.loads(content)
        cells = nb["cells"]
        assert isinstance(cells, list)
    except Exception:
        return None
    kernel_lang = (
        nb.get("metadata", {}).get("kernelspec", {}).get("language") or "python"
    )
    out: list[dict] = []
    offset = 0
    for ci, cell in enumerate(cells):
        src = cell.get("source", "")
        if isinstance(src, list):
            src = "".join(src)
        ctype = cell.get("cell_type", "raw")
        if ctype == "code":
            sub = _structure_nodes(src, kernel_lang, line_offset=offset)
        elif ctype == "markdown":
            sub = _structure_nodes(src, "markdown", line_offset=offset)
        else:  # raw passthrough
            n_lines = src.count("\n") + 1
            sub = [
                {
                    "node_type": "raw_cell",
                    "node_name": f"cell_{ci}",
                    "start_line": offset + 1,
                    "end_line": offset + n_lines,
                    "parent_index": None,
                    "is_parent": False,
                    "is_split": False,
                    "split_index": 0,
                    "token_count": _token_count(src),
                    "depth": 1,
                    "content": src,
                }
            ]
        base = len(out)
        for nd in sub:
            if nd["parent_index"] is not None:
                nd["parent_index"] += base
        out.extend(sub)
        offset += src.count("\n") + 1
    return out or None


def chunk_file(content: str, lang: str) -> list[dict]:
    """File → list of chunk-node dicts (schemas.CHUNK_NODE fields)."""
    nodes = None
    if lang == "ipynb":
        nodes = _notebook_nodes(content)
    if nodes is None:
        nodes = _structure_nodes(content, lang)
    return _split_over_budget(nodes)


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
        F.col("nd.depth").alias("depth"),
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


def tree_stats(chunks: DataFrame) -> DataFrame:
    """Per-file structure statistics (A5; reference ast_parser.py:933-959
    computes node count and max depth by recursive walk — here one
    aggregation): n_nodes, n_parents, n_splits, max_depth (length of the
    longest parent chain, computed by the chunker: nested classes produce
    depth > 2), total_tokens."""
    return chunks.groupBy("repo", "path").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("is_parent").cast("int")).alias("n_parents"),
        F.sum(F.col("is_split").cast("int")).alias("n_splits"),
        F.max("depth").alias("max_depth"),
        F.sum("token_count").alias("total_tokens"),
    )
