from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from contextinator_spark.operators.chunker import (
    children_index,
    chunk_corpus,
    chunk_file,
    enriched_content,
    reconstruct_files,
)

PY_FILE = '''import os

class Auth:
    def login(self, user):
        return os.token(user)

    def logout(self):
        pass

def main():
    a = Auth()
    a.login("x")
'''


def test_chunk_file_python_structure():
    nodes = chunk_file(PY_FILE, "python")
    kinds = [(n["node_type"], n["node_name"]) for n in nodes]
    assert ("class", "Auth") in kinds
    assert ("function", "login") in kinds
    assert ("function", "logout") in kinds
    assert ("function", "main") in kinds
    auth = next(n for n in nodes if n["node_name"] == "Auth")
    login = next(n for n in nodes if n["node_name"] == "login")
    assert auth["is_parent"]
    assert login["parent_index"] == nodes.index(auth)
    assert auth["start_line"] <= login["start_line"] <= login["end_line"] <= auth["end_line"]


def test_chunk_file_fallback_binary():
    nodes = chunk_file("\x00\x01junk", "python")
    assert len(nodes) == 1 and nodes[0]["node_type"] == "file"


def test_chunk_file_markdown_sections():
    md = "# Title\ntext\n## Sub\nmore\n# Next\nend"
    nodes = chunk_file(md, "markdown")
    names = [n["node_name"] for n in nodes if n["node_type"] == "section"]
    assert names == ["Title", "Next"]  # top-level (#) sections partition the doc


def test_split_over_budget():
    body = "\n".join("    x = " + " ".join(f"tok{i}_{j}" for j in range(20)) for i in range(60))
    big = f"def big():\n{body}"
    nodes = chunk_file(big, "python")
    splits = [n for n in nodes if n["is_split"]]
    assert len(splits) >= 2
    assert [s["split_index"] for s in splits] == list(range(len(splits)))
    # splits partition the node's lines exactly
    joined = "\n".join(s["content"] for s in sorted(splits, key=lambda s: s["split_index"]))
    assert joined == big
    assert all(s["token_count"] <= 512 + 25 for s in splits)


@pytest.fixture(scope="module")
def chunks(spark, corpus):
    df = chunk_corpus(corpus).cache()
    df.count()
    return df


def test_chunk_ids_deterministic(spark, corpus, chunks):
    again = chunk_corpus(corpus)
    a = sorted(r["doc_id"] for r in chunks.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in again.select("doc_id").collect())
    assert a == b


def test_sha_invariant_and_parent_links(spark, chunks):
    # per-row sha invariant (input_hint)
    bad = chunks.filter(F.sha2("content", 256) != F.col("content_sha256")).count()
    assert bad == 0
    # every parent_doc_id resolves to an is_parent chunk of the same file
    parents = chunks.filter(F.col("is_parent")).select(
        F.col("doc_id").alias("parent_doc_id"), F.col("path").alias("ppath")
    )
    linked = chunks.filter(F.col("parent_doc_id").isNotNull()).join(
        parents, "parent_doc_id", "left"
    )
    assert linked.filter(F.col("ppath").isNull()).count() == 0
    assert linked.filter(F.col("ppath") != F.col("path")).count() == 0


def test_children_index(spark, chunks):
    ci = children_index(chunks)
    assert ci.count() > 0
    r = ci.first()
    assert r["children_ids"] == sorted(r["children_ids"])


def test_reconstruction_exact(spark, corpus, chunks):
    rebuilt = reconstruct_files(chunks)
    joined = corpus.select("repo", "path", F.col("content").alias("orig")).join(
        rebuilt, ["repo", "path"]
    )
    assert joined.count() == corpus.count()
    mismatches = joined.filter(F.col("orig") != F.col("content")).count()
    assert mismatches == 0


def test_enriched_content_header(spark, chunks):
    e = enriched_content(chunks)
    row = e.filter(F.col("parent_doc_id").isNotNull()).first()
    assert row["enriched"].startswith("Parent: ")
    assert "\nFile: " in row["enriched"]
    assert row["enriched"].endswith(row["content"])


# --- language breadth (go/java/c/cpp/ruby — reference ast_parser NODE_TYPES
# intent) + .ipynb cell parsing (notebook_parser.py:34-202) ------------------

GO_FILE = '''package main

import "fmt"

type Server struct {
	port int
}

func (s *Server) Start() error {
	return nil
}

func main() {
	fmt.Println("up")
}
'''

JAVA_FILE = '''package app;

public class Account {
    private int balance;

    public int getBalance() {
        return balance;
    }

    public void deposit(int amt) {
        balance += amt;
    }
}
'''

C_FILE = '''#include <stdio.h>

struct point {
    int x;
    int y;
};

static int add(int a, int b) {
    return a + b;
}

int main(void) {
    printf("%d", add(1, 2));
    return 0;
}
'''

RB_FILE = '''require "json"

class Wallet
  def initialize
    @coins = 0
  end

  def add(n)
    @coins += n
  end
end

def helper(x)
  x * 2
end
'''


def _reassemble(nodes, content):
    """Top-level (non-child, non-split-overlap) nodes partition the lines."""
    tops = [n for n in nodes if n["parent_index"] is None]
    tops.sort(key=lambda n: (n["start_line"], n["split_index"]))
    out, maxend = [], 0
    for n in tops:
        if n["start_line"] > maxend:
            out.append(n["content"])
            maxend = max(maxend, n["end_line"])
    return "\n".join(out)


@pytest.mark.parametrize(
    "content,lang,want_names,want_class",
    [
        (GO_FILE, "go", {"Start", "main"}, "Server"),
        (JAVA_FILE, "java", {"getBalance", "deposit"}, "Account"),
        (C_FILE, "c", {"add", "main"}, "point"),
        (RB_FILE, "ruby", {"add", "initialize", "helper"}, "Wallet"),
    ],
)
def test_chunk_new_languages(content, lang, want_names, want_class):
    nodes = chunk_file(content, lang)
    names = {n["node_name"] for n in nodes}
    assert want_names <= names, names
    classes = [n for n in nodes if n["node_type"] == "class"]
    assert any(n["node_name"] == want_class for n in classes)
    assert all(n["is_parent"] for n in classes)
    # block closers belong to the block: function chunks end with } / end
    fn = next(n for n in nodes if n["node_type"] == "function")
    assert fn["content"].rstrip().endswith(("}", "end"))
    # top-level nodes partition the file exactly (reconstruction contract)
    assert _reassemble(nodes, content) == content


NOTEBOOK = """{
 "cells": [
  {"cell_type": "markdown", "source": ["# Intro\\n", "Some prose."]},
  {"cell_type": "code", "source": ["import os\\n", "\\n", "def load(p):\\n", "    return os.stat(p)\\n"]},
  {"cell_type": "raw", "source": "verbatim text"},
  {"cell_type": "code", "source": ["class Runner:\\n", "    def go(self):\\n", "        return 1\\n"]}
 ],
 "metadata": {"kernelspec": {"language": "python"}},
 "nbformat": 4
}"""


def test_chunk_notebook_cells():
    nodes = chunk_file(NOTEBOOK, "ipynb")
    types = {n["node_type"] for n in nodes}
    assert "section" in types            # markdown heading cell
    assert "function" in types           # code cell routed to python parser
    assert "raw_cell" in types           # raw passthrough
    names = {n["node_name"] for n in nodes}
    assert {"Intro", "load", "Runner", "go"} <= names
    # child link inside the second code cell: go's parent is Runner
    runner_idx = next(i for i, n in enumerate(nodes) if n["node_name"] == "Runner")
    go = next(n for n in nodes if n["node_name"] == "go")
    assert go["parent_index"] == runner_idx
    # line numbers index the concatenated source view
    src_view = "\n".join(
        ["# Intro", "Some prose.", "import os", "", "def load(p):",
         "    return os.stat(p)", "", "verbatim text",
         "class Runner:", "    def go(self):", "        return 1", ""]
    )
    assert _reassemble(nodes, src_view) == src_view
    load = next(n for n in nodes if n["node_name"] == "load")
    assert src_view.split("\n")[load["start_line"] - 1].startswith("def load")


def test_chunk_notebook_invalid_json_falls_back():
    nodes = chunk_file("{not json", "ipynb")
    assert len(nodes) == 1 and nodes[0]["node_type"] == "file"


def test_reconstruction_exact_new_languages(spark):
    rows = [
        ("org/r1", f"src/a.{ext}", "c0", lang, content)
        for ext, lang, content in [
            ("go", "go", GO_FILE), ("java", "java", JAVA_FILE),
            ("c", "c", C_FILE), ("rb", "ruby", RB_FILE),
        ]
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    rec = {r["path"]: r["content"] for r in reconstruct_files(chunk_corpus(df)).collect()}
    for _, path, _, _, content in rows:
        assert rec[path] == content, path
