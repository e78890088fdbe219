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
    # a split may overshoot the budget by at most one line's tokens
    from contextinator_spark.operators.chunker import _token_count

    max_line = max(_token_count(ln) for ln in big.split("\n"))
    assert all(s["token_count"] <= 512 + max_line for s in splits)


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


NESTED_PY = '''class A:
    def m(self):
        def h():
            return 1
        return h
    class B:
        def k(self):
            pass

def outer():
    def inner():
        return 2
    return inner
'''


def test_chunk_nested_hierarchy_reference_traversal():
    """Node set hand-derived from the reference traversal
    (ast_parser.py:737-806): functions are NOT parent types
    (PARENT_NODE_TYPES:424-476), so a declaration's parent is its nearest
    ENCLOSING CLASS through any function bodies — h's parent is A (not m),
    inner has no parent, k's parent is the nested class B (depth 3)."""
    nodes = chunk_file(NESTED_PY, "python")
    by_name = {n["node_name"]: n for n in nodes}
    for want in ("A", "m", "h", "B", "k", "outer", "inner"):
        assert want in by_name, f"missing node {want}"
    a, m, h, b, k = (by_name[x] for x in "AmhBk")
    outer, inner = by_name["outer"], by_name["inner"]
    assert m["parent_index"] == nodes.index(a) and m["depth"] == 2
    assert h["parent_index"] == nodes.index(a) and h["depth"] == 2
    assert b["parent_index"] == nodes.index(a) and b["depth"] == 2
    assert b["is_parent"] and not m["is_parent"]
    assert k["parent_index"] == nodes.index(b) and k["depth"] == 3
    assert outer["parent_index"] is None and outer["depth"] == 1
    assert inner["parent_index"] is None and inner["depth"] == 1
    # nested nodes sit inside their enclosing ranges
    assert a["start_line"] <= h["start_line"] <= h["end_line"] <= a["end_line"]
    assert outer["start_line"] <= inner["start_line"] <= inner["end_line"] <= outer["end_line"]


DECORATED_PY = '''import functools

@functools.cache
@registry.add
def fib(n):
    return n

class Svc:
    @property
    def name(self):
        return self._n
'''


def test_chunk_decorators_attached():
    """Decorator lines extend the definition's span (the reference's
    decorated_definition node, ast_parser.py NODE_TYPES python) instead of
    being stranded in the preceding interstitial code chunk."""
    nodes = chunk_file(DECORATED_PY, "python")
    fib = next(n for n in nodes if n["node_name"] == "fib")
    assert fib["start_line"] == 3  # @functools.cache line
    assert fib["content"].startswith("@functools.cache\n@registry.add\ndef fib")
    name = next(n for n in nodes if n["node_name"] == "name")
    assert name["content"].startswith("    @property\n    def name")
    # the code filler before fib must stop before the decorators
    code0 = nodes[0]
    assert code0["node_type"] == "code" and code0["end_line"] == 2


def test_chunk_nested_reconstruct_exact(spark):
    """Deep-nesting + decorator files still reconstruct byte-exactly —
    nested nodes are contained in their top node's range and dropped by
    reconstruction's containment filter."""
    rows = [
        ("o/r", "nested.py", "c0", "python", NESTED_PY),
        ("o/r", "deco.py", "c0", "python", DECORATED_PY),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    got = {
        r["path"]: r["content"]
        for r in reconstruct_files(chunk_corpus(df)).collect()
    }
    assert got["nested.py"] == NESTED_PY
    assert got["deco.py"] == DECORATED_PY


def test_tree_stats_depth3(spark):
    from contextinator_spark.operators.chunker import tree_stats

    df = spark.createDataFrame(
        [("o/r", "n.py", "c0", "python", NESTED_PY)],
        "repo string, path string, commit string, lang string, content string",
    )
    st = tree_stats(chunk_corpus(df)).collect()[0]
    assert st["max_depth"] == 3
    assert st["n_parents"] == 2  # A and B


# --- round-4 language tier: php / kotlin / swift / scala --------------------

PHP_FILE = '''<?php

class Cart
{
    private $items = [];

    public function add($item)
    {
        $this->items[] = $item;
    }

    protected static function empty_cart()
    {
        return new self();
    }
}

function format_total($cart)
{
    return count($cart);
}
'''

KT_FILE = '''package app

data class User(val id: Int) {
    fun display(): String {
        return "u$id"
    }

    private suspend fun refresh(): Unit {
        fetch(id)
    }
}

fun main() {
    println(User(1).display())
}
'''

SWIFT_FILE = '''import Foundation

struct Vector {
    var x: Double

    func norm() -> Double {
        return abs(x)
    }

    mutating func scale(_ f: Double) {
        x *= f
    }
}

public func makeVector() -> Vector {
    return Vector(x: 1.0)
}
'''

SCALA_FILE = '''package app

object Registry {
  def lookup(id: Int): Option[String] = {
    None
  }

  private def seed(): Unit = {
    ()
  }
}

case class Entry(id: Int) {
  def render: String = {
    s"entry-$id"
  }
}
'''


@pytest.mark.parametrize(
    "content,lang,want_names,want_class",
    [
        (PHP_FILE, "php", {"add", "empty_cart", "format_total"}, "Cart"),
        (KT_FILE, "kotlin", {"display", "refresh", "main"}, "User"),
        (SWIFT_FILE, "swift", {"norm", "scale", "makeVector"}, "Vector"),
        (SCALA_FILE, "scala", {"lookup", "seed", "render"}, "Registry"),
    ],
)
def test_chunk_round4_languages(content, lang, want_names, want_class):
    nodes = chunk_file(content, lang)
    names = {n["node_name"] for n in nodes}
    assert want_names <= names, names
    classes = [n for n in nodes if n["node_type"] == "class"]
    assert any(n["node_name"] == want_class for n in classes)
    assert all(n["is_parent"] for n in classes)
    # methods nest under their declaring type
    cls_idx = next(i for i, n in enumerate(nodes) if n["node_name"] == want_class)
    first_method = next(n for n in nodes if n["node_name"] in want_names and n["parent_index"] is not None)
    assert first_method["parent_index"] == cls_idx
    fn = next(n for n in nodes if n["node_type"] == "function")
    assert fn["content"].rstrip().endswith("}")
    assert _reassemble(nodes, content) == content


def test_reconstruction_exact_round4_languages(spark):
    rows = [
        ("org/r2", f"src/b.{ext}", "c0", lang, content)
        for ext, lang, content in [
            ("php", "php", PHP_FILE), ("kt", "kotlin", KT_FILE),
            ("swift", "swift", SWIFT_FILE), ("scala", "scala", SCALA_FILE),
        ]
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    rec = {r["path"]: r["content"] for r in reconstruct_files(chunk_corpus(df)).collect()}
    for _, path, _, _, content in rows:
        assert rec[path] == content, path


# round-4 second language tier: bash / lua / sql / elixir / solidity
# (reference NODE_TYPES ast_parser.py:336-413)
SH_FILE = '''#!/usr/bin/env bash
set -euo pipefail

usage() {
    echo "usage: $0 <dir>"
    exit 1
}

function build_all {
    make -j"$(nproc)"
}

clean-workdir() {
    rm -rf ./build
}

usage
'''

LUA_FILE = '''local M = {}

function M.greet(name)
    return "hi " .. name
end

local function helper(x)
    if x > 0 then
        return x
    end
    return -x
end

M.norm = function(v)
    return helper(v)
end

return M
'''

SQL_FILE = '''CREATE TABLE users (
    id BIGINT PRIMARY KEY,
    name TEXT NOT NULL
);

CREATE OR REPLACE VIEW active_users AS
SELECT id, name
FROM users
WHERE name IS NOT NULL;

CREATE FUNCTION user_count() RETURNS BIGINT AS $$
SELECT count(*) FROM users;
$$ LANGUAGE sql;

CREATE INDEX users_name_idx ON users (name);
'''

EX_FILE = '''defmodule Geometry do
  def area(%{w: w, h: h}) do
    w * h
  end

  defp scale(x) do
    x * 2
  end

  def perimeter?(s) do
    s > 0
  end
end

defmodule Geometry.CLI do
  def main(args) do
    IO.inspect(args)
  end
end
'''

SOL_FILE = '''// SPDX-License-Identifier: MIT
pragma solidity ^0.8.0;

contract Vault {
    uint256 public total;

    constructor() {
        total = 0;
    }

    modifier positive(uint256 amount) {
        require(amount > 0);
        _;
    }

    function deposit(uint256 amount) public positive(amount) {
        total += amount;
    }
}

interface IVault {
    function deposit(uint256 amount) external;
}
'''


@pytest.mark.parametrize(
    "content,lang,want_names,end_token",
    [
        (SH_FILE, "bash", {"usage", "build_all", "clean-workdir"}, "}"),
        (LUA_FILE, "lua", {"M.greet", "helper", "M.norm"}, "end"),
        (EX_FILE, "elixir", {"area", "scale", "perimeter?", "main"}, "end"),
        (SOL_FILE, "solidity", {"constructor", "positive", "deposit"}, "}"),
    ],
)
def test_chunk_round4b_languages(content, lang, want_names, end_token):
    nodes = chunk_file(content, lang)
    names = {n["node_name"] for n in nodes}
    assert want_names <= names, names
    fns = [n for n in nodes if n["node_type"] == "function" and n["node_name"] in want_names]
    assert fns
    # function chunks carry their block terminator, as a tree-sitter span would
    top_fns = [n for n in fns if n["parent_index"] is None and n["depth"] == 1]
    for n in top_fns:
        assert n["content"].rstrip().endswith(end_token), (n["node_name"], n["content"])
    assert _reassemble(nodes, content) == content


def test_chunk_elixir_and_solidity_hierarchy():
    ex = chunk_file(EX_FILE, "elixir")
    geo = next(i for i, n in enumerate(ex) if n["node_name"] == "Geometry")
    assert ex[geo]["node_type"] == "class" and ex[geo]["is_parent"]
    area = next(n for n in ex if n["node_name"] == "area")
    assert area["parent_index"] == geo

    sol = chunk_file(SOL_FILE, "solidity")
    vault = next(i for i, n in enumerate(sol) if n["node_name"] == "Vault")
    assert sol[vault]["node_type"] == "class"
    dep = next(n for n in sol if n["node_name"] == "deposit" and n["parent_index"] is not None)
    assert dep["parent_index"] == vault
    # the interface is its own top-level class node
    assert any(n["node_name"] == "IVault" and n["node_type"] == "class" for n in sol)


def test_chunk_sql_statements():
    nodes = chunk_file(SQL_FILE, "sql")
    by_name = {n["node_name"]: n for n in nodes if n["node_type"] != "code"}
    assert {"users", "active_users", "user_count", "users_name_idx"} <= set(by_name)
    assert by_name["users"]["node_type"] == "class"
    assert by_name["user_count"]["node_type"] == "function"
    # statement spans end at their terminating ';' — incl. the $$ body
    assert by_name["users"]["content"].rstrip().endswith(";")
    assert by_name["user_count"]["content"].rstrip().endswith("$$ LANGUAGE sql;")
    assert "SELECT count(*)" in by_name["user_count"]["content"]
    assert _reassemble(nodes, SQL_FILE) == SQL_FILE


def test_reconstruction_exact_round4b_languages(spark):
    rows = [
        ("org/r3", f"src/c.{ext}", "c0", lang, content)
        for ext, lang, content in [
            ("sh", "bash", SH_FILE), ("lua", "lua", LUA_FILE),
            ("sql", "sql", SQL_FILE), ("ex", "elixir", EX_FILE),
            ("sol", "solidity", SOL_FILE),
        ]
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    rec = {r["path"]: r["content"] for r in reconstruct_files(chunk_corpus(df)).collect()}
    for _, path, _, _, content in rows:
        assert rec[path] == content, path


YAML_FILE = """# deploy config
name: demo
server:
  host: 0.0.0.0
  port: 8080
features:
  - auth
  - metrics
replicas: 3
"""

TOML_FILE = """title = "demo"

[server]
host = "0.0.0.0"
port = 8080

[[plugins]]
name = "auth"

[clients.web]
timeout = 5
"""

DOCKER_FILE = """FROM python:3.11-slim
ENV APP_HOME=/app
WORKDIR /app
COPY . .
RUN pip install -r requirements.txt && \\
    pip cache purge
# start it
ENTRYPOINT ["python", "main.py"]
"""

JSON_FILE = """{
  "name": "demo",
  "scripts": {
    "build": "make",
    "test": "pytest"
  },
  "deps": [
    "left-pad",
    "right-pad"
  ],
  "version": 2
}
"""


def test_chunk_yaml_top_level_mappings():
    """yaml block_mapping/block_sequence tier (reference NODE_TYPES
    ast_parser.py:361-362) — one node per TOP-level key, nested keys
    stay inside their parent's span."""
    nodes = chunk_file(YAML_FILE, "yaml")
    maps = {n["node_name"]: n for n in nodes if n["node_type"] == "mapping"}
    assert {"name", "server", "features", "replicas"} <= set(maps)
    assert "port: 8080" in maps["server"]["content"]  # nested key swallowed
    assert "- metrics" in maps["features"]["content"]
    assert _reassemble(nodes, YAML_FILE) == YAML_FILE


def test_chunk_toml_tables():
    """toml table tier (NODE_TYPES ast_parser.py:367): [table] and
    [[array-of-tables]] headers; preamble key_values ride the leading
    code node."""
    nodes = chunk_file(TOML_FILE, "toml")
    tabs = {n["node_name"]: n for n in nodes if n["node_type"] == "table"}
    assert {"server", "plugins", "clients.web"} == set(tabs)
    assert 'host = "0.0.0.0"' in tabs["server"]["content"]
    assert _reassemble(nodes, TOML_FILE) == TOML_FILE


def test_chunk_dockerfile_instructions():
    """dockerfile instruction tier (NODE_TYPES ast_parser.py:365);
    backslash continuations belong to their instruction's span."""
    nodes = chunk_file(DOCKER_FILE, "dockerfile")
    instrs = [n for n in nodes if n["node_type"] == "instruction"]
    assert [n["node_name"] for n in instrs] == [
        "FROM", "ENV", "WORKDIR", "COPY", "RUN", "ENTRYPOINT"]
    run = next(n for n in instrs if n["node_name"] == "RUN")
    assert "pip cache purge" in run["content"]  # continuation line included
    assert _reassemble(nodes, DOCKER_FILE) == DOCKER_FILE


def test_chunk_json_containers():
    """json object/array tier (NODE_TYPES ast_parser.py:366): container
    keys at the file's base key indent become nodes; scalar keys stay in
    the surrounding code nodes."""
    nodes = chunk_file(JSON_FILE, "json")
    by = {n["node_name"]: n for n in nodes if n["node_type"] in ("object", "array")}
    assert set(by) == {"scripts", "deps"}
    assert by["scripts"]["node_type"] == "object"
    assert by["deps"]["node_type"] == "array"
    assert by["scripts"]["content"].rstrip().endswith("},")  # closer included
    assert _reassemble(nodes, JSON_FILE) == JSON_FILE


def test_reconstruction_exact_config_formats(spark):
    rows = [
        ("org/r4", path, "c0", lang, content)
        for path, lang, content in [
            ("deploy.yaml", "yaml", YAML_FILE), ("Cargo.toml", "toml", TOML_FILE),
            ("Dockerfile", "dockerfile", DOCKER_FILE), ("package.json", "json", JSON_FILE),
        ]
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    rec = {r["path"]: r["content"] for r in reconstruct_files(chunk_corpus(df)).collect()}
    for _, path, _, _, content in rows:
        assert rec[path] == content, path


HS_FILE = """module Demo where

import Data.List (sort)

data Shape = Circle Double | Square Double

area :: Shape -> Double
area (Circle r) = pi * r * r
area (Square s) = s * s

class Pretty a where
  pretty :: a -> String

main = print (area (Circle 1.0))
"""

ML_FILE = """let greeting = "hello"

type point = { x : int; y : int }

module Geometry = struct
  let origin = { x = 0; y = 0 }
end

let rec fact n =
  if n <= 1 then 1 else n * fact (n - 1)
"""

ZIG_FILE = """const std = @import("std");

const Point = struct {
    x: i32,
    y: i32,
};

pub fn add(a: i32, b: i32) i32 {
    return a + b;
}

fn main() void {
    std.debug.print("{}", .{add(1, 2)});
}
"""

PRISMA_FILE = """generator client {
  provider = "prisma-client-js"
}

datasource db {
  provider = "postgresql"
  url      = env("DATABASE_URL")
}

model User {
  id    Int    @id @default(autoincrement())
  email String @unique
}

enum Role {
  USER
  ADMIN
}
"""

HTML_FILE = """<!DOCTYPE html>
<html>
  <head>
    <title>demo</title>
    <style>
      body { margin: 0; }
    </style>
  </head>
  <body>
    <p>hi</p>
    <script>
      console.log(1);
    </script>
  </body>
</html>
"""

XML_FILE = """<?xml version="1.0"?>
<project>
  <groupId>org.demo</groupId>
  <dependencies>
    <dependency>
      <artifactId>core</artifactId>
    </dependency>
  </dependencies>
</project>
"""

CSS_FILE = """/* theme */
body {
  margin: 0;
}

@media (max-width: 600px) {
  body {
    font-size: 14px;
  }
}

@keyframes spin {
  from { transform: rotate(0deg); }
  to { transform: rotate(360deg); }
}

.nav > a:hover,
.nav > a:focus {
  color: red;
}
"""


def test_chunk_haskell_bindings():
    """haskell function/type/data_declaration tier (NODE_TYPES
    ast_parser.py:408): a signature and its equations merge into ONE
    function node; data/class get their own nodes."""
    nodes = chunk_file(HS_FILE, "haskell")
    by = {(n["node_type"], n["node_name"]) for n in nodes}
    assert ("data", "Shape") in by
    assert ("function", "area") in by
    assert ("class", "Pretty") in by
    assert ("function", "main") in by
    area = next(n for n in nodes if n["node_name"] == "area")
    assert "area (Square s)" in area["content"]  # equations merged with sig
    assert _reassemble(nodes, HS_FILE) == HS_FILE


def test_chunk_ocaml_definitions():
    """ocaml value/type/module_definition tier (NODE_TYPES
    ast_parser.py:410); module body (indented lets) stays in its span."""
    nodes = chunk_file(ML_FILE, "ocaml")
    by = {(n["node_type"], n["node_name"]) for n in nodes}
    assert ("value", "greeting") in by
    assert ("type", "point") in by
    assert ("module", "Geometry") in by
    assert ("value", "fact") in by
    geo = next(n for n in nodes if n["node_name"] == "Geometry")
    assert "let origin" in geo["content"] and geo["content"].rstrip().endswith("end")
    assert _reassemble(nodes, ML_FILE) == ML_FILE


def test_chunk_zig_declarations():
    """zig function/struct/enum_declaration tier (NODE_TYPES
    ast_parser.py:394): `const X = struct` is class-like, fns are
    functions with closer-inclusive spans."""
    nodes = chunk_file(ZIG_FILE, "zig")
    by = {n["node_name"]: n for n in nodes if n["node_type"] in ("class", "function")}
    assert by["Point"]["node_type"] == "class"
    assert by["add"]["node_type"] == "function"
    assert by["add"]["content"].rstrip().endswith("}")
    assert "main" in by
    assert _reassemble(nodes, ZIG_FILE) == ZIG_FILE


def test_chunk_prisma_blocks():
    """prisma model/generator/datasource/enum tier (NODE_TYPES
    ast_parser.py:420) — node_type is the block keyword itself."""
    nodes = chunk_file(PRISMA_FILE, "prisma")
    by = {n["node_name"]: n["node_type"] for n in nodes
          if n["node_type"] in ("model", "enum", "generator", "datasource")}
    assert by == {"client": "generator", "db": "datasource",
                  "User": "model", "Role": "enum"}
    user = next(n for n in nodes if n["node_name"] == "User")
    assert "@unique" in user["content"] and user["content"].rstrip().endswith("}")
    assert _reassemble(nodes, PRISMA_FILE) == PRISMA_FILE


def test_chunk_html_elements():
    """html element/script_element/style_element tier (NODE_TYPES
    ast_parser.py:388): the base-indent element owns its subtree; doctype
    rides the leading code node."""
    nodes = chunk_file(HTML_FILE, "html")
    html = next(n for n in nodes if n["node_type"] == "element")
    assert html["node_name"] == "html"
    assert html["content"].rstrip().endswith("</html>")
    assert _reassemble(nodes, HTML_FILE) == HTML_FILE
    # script/style become *_element nodes when they sit at base indent
    body = "\n".join(HTML_FILE.split("\n")[9:14])
    sub = chunk_file("<script>\n  x();\n</script>\n<style>\n a {}\n</style>\n", "html")
    kinds = [n["node_type"] for n in sub]
    assert "script_element" in kinds and "style_element" in kinds


def test_chunk_xml_elements():
    """xml element tier (NODE_TYPES ast_parser.py:419): prolog rides the
    leading code node; the root element spans to its close tag."""
    nodes = chunk_file(XML_FILE, "xml")
    root = next(n for n in nodes if n["node_type"] == "element")
    assert root["node_name"] == "project"
    assert root["content"].rstrip().endswith("</project>")
    assert _reassemble(nodes, XML_FILE) == XML_FILE


def test_chunk_css_rules():
    """css rule_set/media_statement/keyframes_statement tier (NODE_TYPES
    ast_parser.py:390); multi-line selector lists keep the FIRST selector
    line as the rule start."""
    nodes = chunk_file(CSS_FILE, "css")
    kinds = {n["node_type"]: n for n in nodes if n["node_type"] != "code"}
    assert "rule_set" in kinds and "media_statement" in kinds and "keyframes_statement" in kinds
    body = next(n for n in nodes if n["node_name"] == "body")
    assert body["content"].rstrip().endswith("}")
    km = next(n for n in nodes if n["node_type"] == "keyframes_statement")
    assert "rotate(360deg)" in km["content"]
    assert _reassemble(nodes, CSS_FILE) == CSS_FILE


def test_reconstruction_exact_final_tier(spark):
    rows = [
        ("org/r4c", path, "c0", lang, content)
        for path, lang, content in [
            ("Demo.hs", "haskell", HS_FILE), ("geo.ml", "ocaml", ML_FILE),
            ("main.zig", "zig", ZIG_FILE), ("schema.prisma", "prisma", PRISMA_FILE),
            ("index.html", "html", HTML_FILE), ("pom.xml", "xml", XML_FILE),
            ("theme.css", "css", CSS_FILE),
        ]
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    rec = {r["path"]: r["content"] for r in reconstruct_files(chunk_corpus(df)).collect()}
    for _, path, _, _, content in rows:
        assert rec[path] == content, path


TF_FILE = """variable "region" {
  default = "us-east-1"
}

provider "aws" {
  region = var.region
}

resource "aws_s3_bucket" "logs" {
  bucket = "demo-logs"
  tags = {
    env = "prod"
  }
}
"""

TFVARS_FILE = """region = "us-east-1"
replicas = 3
tags = {
  env = "dev"
}
"""

MAKE_FILE = """CC := gcc
CFLAGS = -O2 -Wall

all: build test

build: main.o
\t$(CC) $(CFLAGS) -o app main.o

.PHONY: clean
clean:
\trm -f *.o app
"""


def test_chunk_hcl_blocks_and_attributes():
    """hcl/terraform block + attribute tier (NODE_TYPES
    ast_parser.py:415-416): block names join the identifier with its
    quoted labels; .tfvars files are top-level attributes."""
    nodes = chunk_file(TF_FILE, "hcl")
    blocks = {n["node_name"]: n for n in nodes if n["node_type"] == "block"}
    assert set(blocks) == {"variable.region", "provider.aws", "resource.aws_s3_bucket.logs"}
    assert 'env = "prod"' in blocks["resource.aws_s3_bucket.logs"]["content"]
    assert _reassemble(nodes, TF_FILE) == TF_FILE

    tv = chunk_file(TFVARS_FILE, "hcl")
    attrs = {n["node_name"]: n for n in tv if n["node_type"] == "attribute"}
    assert set(attrs) == {"region", "replicas", "tags"}
    assert attrs["tags"]["content"].rstrip().endswith("}")  # multi-line attr spans its braces
    assert _reassemble(tv, TFVARS_FILE) == TFVARS_FILE


def test_chunk_makefile_rules():
    """make rule + variable_assignment tier (NODE_TYPES ast_parser.py:418);
    tab-indented recipes ride their rule's span."""
    nodes = chunk_file(MAKE_FILE, "makefile")
    by = {n["node_name"]: n for n in nodes if n["node_type"] in ("rule", "variable_assignment")}
    assert by["CC"]["node_type"] == "variable_assignment"
    assert by["CFLAGS"]["node_type"] == "variable_assignment"
    assert {"all", "build", ".PHONY", "clean"} <= set(by)
    assert "-o app main.o" in by["build"]["content"]  # recipe in span
    assert _reassemble(nodes, MAKE_FILE) == MAKE_FILE
