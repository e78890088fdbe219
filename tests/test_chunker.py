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
