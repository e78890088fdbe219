"""F5/F6/F13 scalar helpers + the U5 embedding stage plumbing."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from contextinator_spark.functions.names import (
    mtime_epoch_expr,
    repo_name_from_url,
    repo_name_from_url_expr,
    sanitize_collection_name,
    sanitize_collection_name_expr,
)


CASES = [
    "org/repo", "a b c", "-leading", "trailing-", "x" * 80,
    "weird!@#name", ".dotfirst", "ok_name.v2",
]


def test_sanitize_collection_name_rules():
    for raw in CASES + [""]:
        s = sanitize_collection_name(raw)
        assert 1 <= len(s) <= 63
        assert s[0].isalnum() and s[-1].isalnum()
        assert all(c.isalnum() or c in "._-" for c in s)


def test_sanitize_expr_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "raw string")
    got = {r["raw"]: r["s"] for r in df.select("raw", sanitize_collection_name_expr("raw").alias("s")).collect()}
    for raw in CASES:
        assert got[raw] == sanitize_collection_name(raw), raw


def test_repo_name_from_url():
    cases = {
        "https://github.com/user/My-Repo.git": "user_My_Repo",
        "git@github.com:user/repo": "user_repo",
        "https://gitlab.com/grp/sub.proj/": "grp_sub_proj",
    }
    for url, want in cases.items():
        assert repo_name_from_url(url) == want, url


def test_repo_name_expr_matches_python(spark):
    urls = ["https://github.com/user/My-Repo.git", "git@github.com:user/repo"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["n"] for r in df.select("url", repo_name_from_url_expr("url").alias("n")).collect()}
    for u in urls:
        assert got[u] == repo_name_from_url(u)


def test_mtime_epoch(spark):
    df = spark.createDataFrame([("2020-01-01 00:00:00",)], "ts string")
    val = df.select(mtime_epoch_expr("ts").alias("e")).collect()[0]["e"]
    assert val == 1577836800  # session tz pinned UTC


def test_embed_chunks_stub(spark):
    from contextinator_spark.operators.embed import embed_chunks, stub_encoder

    rows = [(i, f"text number {i} " * (i + 1)) for i in range(7)] + [(99, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    out = embed_chunks(df, dim=16).collect()
    # P6: the whitespace-only row is dropped
    assert {r["doc_id"] for r in out} == set(range(7))
    for r in out:
        v = np.asarray(r["embedding"], dtype=np.float32)
        assert v.shape == (16,)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3
        # deterministic: same content → same vector as a direct stub call
        want = stub_encoder([r["content"]], 16)[0]
        assert np.allclose(v, want, atol=1e-6)


def test_embed_truncation(spark):
    from contextinator_spark.operators.embed import MAX_EMBED_TOKENS, embed_chunks

    long_text = "x" * (MAX_EMBED_TOKENS * 5)
    df = spark.createDataFrame([(1, long_text)], "doc_id long, content string")
    row = embed_chunks(df, dim=8).collect()[0]
    assert row["content"].endswith("... (truncated)")
    assert len(row["content"]) < len(long_text)


def test_tree_stats(spark):
    from contextinator_spark.operators.chunker import chunk_corpus, tree_stats

    df = spark.createDataFrame(
        [("o/r", "a.py", "c0", "python",
          "class A:\n    def f(self):\n        pass\n\ndef g():\n    pass")],
        "repo string, path string, commit string, lang string, content string",
    )
    st = tree_stats(chunk_corpus(df)).collect()[0]
    assert st["n_nodes"] >= 3
    assert st["n_parents"] == 1      # class A
    assert st["max_depth"] == 2      # f has a parent link
    assert st["n_splits"] == 0
