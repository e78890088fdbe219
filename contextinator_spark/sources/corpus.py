"""Corpus sources.

1. ``synth_corpus``      — deterministic code-like corpus per FIXTURES.md §1
                           (seeded; heavy-hitter terms `def`/`import` by
                           construction; ~3% duplicate contents; ~1%
                           unparseable files to exercise the fallback chunk
                           path, reference ast_parser.py:634-675).
2. ``load_documents``    — driver testdata `documents.parquet` as-is.
3. ``documents_as_corpus`` — adapter documents → corpus
                           (repo,path,commit,lang,content) per SURVEY.md §1.1.

At 100 TB the corpus is an Iceberg/parquet table partitioned by repo-bucket;
here the same DataFrame shape comes from these sources. All engine operators
take the DataFrame, never a path, so the storage layer is swappable.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas

_KEYWORDS = ["def", "import", "class", "return", "if", "else", "for", "while",
             "try", "except", "with", "lambda", "yield", "raise", "pass"]

# Extension → language projection (P2). Same contract as the reference's
# ~60-extension table (settings.py:23-120): map a file's suffix (or special
# filename) to a language id so ingest jobs over raw repo trees can populate
# the corpus `lang` column. Re-expressed as a literal map column expression
# (broadcast by construction — the map lives in the plan, no join).
LANG_OF_EXT = {
    "py": "python", "pyw": "python", "pyi": "python",
    "js": "javascript", "jsx": "javascript", "mjs": "javascript", "cjs": "javascript",
    "ts": "typescript", "tsx": "typescript",
    "java": "java",
    "c": "c", "h": "c",
    "cpp": "cpp", "cc": "cpp", "cxx": "cpp", "hpp": "cpp", "hh": "cpp", "hxx": "cpp",
    "cs": "c_sharp",
    "go": "go",
    "rs": "rust",
    "rb": "ruby", "rake": "ruby",
    "php": "php",
    "swift": "swift",
    "kt": "kotlin", "kts": "kotlin",
    "scala": "scala",
    "sh": "bash", "bash": "bash", "zsh": "bash",
    "pl": "perl", "pm": "perl",
    "r": "r",
    "lua": "lua",
    "jl": "julia",
    "hs": "haskell", "lhs": "haskell",
    "ex": "elixir", "exs": "elixir",
    "erl": "erlang",
    "clj": "clojure", "cljs": "clojure",
    "ml": "ocaml", "mli": "ocaml",
    "html": "html", "htm": "html",
    "css": "css", "scss": "css", "less": "css", "sass": "css",
    "prisma": "prisma",
    "md": "markdown", "markdown": "markdown", "rst": "markdown",
    "json": "json",
    "yaml": "yaml", "yml": "yaml",
    "toml": "toml",
    "xml": "xml",
    "sql": "sql",
    "sol": "solidity",
    "proto": "protobuf",
    "tf": "hcl", "tfvars": "hcl", "hcl": "hcl",
    "mk": "makefile",
    "ipynb": "ipynb",
    "vue": "vue",
    "svelte": "svelte",
    "dart": "dart",
    "zig": "zig",
    "txt": "text",
}
# whole-filename specials (no meaningful extension)
LANG_OF_FILENAME = {
    "dockerfile": "dockerfile",
    "makefile": "makefile",
    "cmakelists.txt": "cmake",
    "gemfile": "ruby",
    "rakefile": "ruby",
}
UNKNOWN_LANG = "unknown"


def lang_of_path(path) -> Column:
    """Language id from a repo path — pure columnar (create_map literals),
    usable in any ingest plan: filename specials first, then the lowercase
    extension, else 'unknown'."""
    p = F.col(path) if isinstance(path, str) else path
    fname = F.lower(F.element_at(F.split(p, "/"), -1))
    ext = F.regexp_extract(fname, r"\.([a-z0-9]+)$", 1)
    ext_map = F.create_map(*[F.lit(x) for kv in LANG_OF_EXT.items() for x in kv])
    name_map = F.create_map(*[F.lit(x) for kv in LANG_OF_FILENAME.items() for x in kv])
    return F.coalesce(
        F.element_at(name_map, fname), F.element_at(ext_map, ext), F.lit(UNKNOWN_LANG)
    )


def with_lang(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Populate a missing/null `lang` column from the path (ingest helper)."""
    if "lang" in df.columns:
        return df.withColumn("lang", F.coalesce(F.col("lang"), lang_of_path(path_col)))
    return df.withColumn("lang", lang_of_path(path_col))


_LANG_OF_EXT = {".py": "python", ".js": "javascript", ".rs": "rust", ".md": "markdown"}
_EXT_WEIGHTS = [(".py", 5), (".js", 3), (".rs", 2), (".md", 2)]


def _identifier_pool(rng: random.Random, n: int = 2000) -> list[str]:
    syll = ["auth", "user", "token", "index", "query", "parse", "node",
            "chunk", "embed", "store", "merge", "scan", "hash", "path",
            "file", "line", "tree", "repo", "data", "util"]
    pool = []
    for i in range(n):
        a = rng.choice(syll)
        b = rng.choice(syll)
        style = i % 3
        if style == 0:
            pool.append(f"{a}_{b}_{i % 97}")
        elif style == 1:
            pool.append(f"{a}{b.capitalize()}{i % 89}")
        else:
            pool.append(f"{a}{i % 83}")
    return pool


def _zipf_choice(rng: random.Random, pool: list[str]) -> str:
    # zipf-ish: rank r with prob ~ 1/r via inverse-CDF on a power law
    r = int(len(pool) * (rng.random() ** 3))
    return pool[min(r, len(pool) - 1)]


def _gen_file(rng: random.Random, pool: list[str], ext: str) -> str:
    n_lines = rng.randint(5, 120)
    lines: list[str] = []
    if ext == ".md":
        lines.append(f"# {_zipf_choice(rng, pool)} notes")
        for _ in range(n_lines):
            lines.append(" ".join(_zipf_choice(rng, pool) for _ in range(rng.randint(3, 10))))
        return "\n".join(lines)
    indent = ""
    for _ in range(rng.randint(1, 4)):
        lines.append(f"import {_zipf_choice(rng, pool)}")
    while len(lines) < n_lines:
        kind = rng.random()
        if kind < 0.15:
            lines.append(f"class {_zipf_choice(rng, pool).capitalize()}:")
            indent = "    "
        elif kind < 0.45:
            args = ", ".join(_zipf_choice(rng, pool) for _ in range(rng.randint(0, 3)))
            lines.append(f"{indent}def {_zipf_choice(rng, pool)}({args}):")
            body_len = rng.randint(1, 8)
            for _ in range(body_len):
                kw = rng.choice(_KEYWORDS[3:])
                expr = " ".join(_zipf_choice(rng, pool) for _ in range(rng.randint(1, 5)))
                lines.append(f"{indent}    {kw} {expr}")
        else:
            expr = " = ".join(_zipf_choice(rng, pool) for _ in range(2))
            lines.append(f"{indent}{expr}")
    return "\n".join(lines[:n_lines])


def synth_corpus_rows(n_files: int = 500, seed: int = 42) -> list[dict]:
    """Deterministic corpus rows (pure Python; also feeds the numpy oracle)."""
    rng = random.Random(seed)
    pool = _identifier_pool(rng)
    exts = [e for e, w in _EXT_WEIGHTS for _ in range(w)]
    rows: list[dict] = []
    for i in range(n_files):
        repo = f"org{i % 7}/repo{i % 23}"
        ext = rng.choice(exts)
        path = f"src/pkg{i % 11}/mod_{i}{ext}"
        commit = hashlib.sha1(f"42|{repo}".encode()).hexdigest()
        lang = _LANG_OF_EXT[ext]
        if rng.random() < 0.01:
            content = "\x00\x01binary" + "".join(chr(33 + rng.randrange(90)) for _ in range(64))
        else:
            content = _gen_file(rng, pool, ext)
        rows.append({"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content})
    # ~3% duplicate contents across different (repo, path) — dedup fixture
    n_dup = max(1, n_files * 3 // 100)
    for j in range(n_dup):
        src = rows[rng.randrange(len(rows) - n_dup)]
        dst = rows[len(rows) - 1 - j]
        dst["content"] = src["content"]
    return rows


def synth_corpus(spark: SparkSession, n_files: int = 500, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synth_corpus_rows(n_files, seed), schema=schemas.CORPUS)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: driver `documents` table → canonical corpus shape.

    doc_id is kept as an extra column (the engine's deterministic id).
    """
    d = load_documents(spark, sf_dir)
    return d.select(
        F.col("doc_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.col("source"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
