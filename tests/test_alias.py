"""Index aliases: atomic pointer semantics and the blue/green cutover."""

from __future__ import annotations

import json
import os

import pytest

from contextinator_spark.operators.alias import (
    create_alias,
    is_alias,
    read_alias,
    resolve_index,
    swap_alias,
)

DOCS_A = [(0, "hash table"), (1, "spark join")]
DOCS_B = [(0, "hash table"), (1, "spark join"), (2, "merge sort")]


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    from contextinator_spark.operators.segments import write_index

    out = {}
    for name, docs in (("a", DOCS_A), ("b", DOCS_B)):
        d = str(tmp_path_factory.mktemp(f"alias_store_{name}"))
        write_index(spark, spark.createDataFrame(docs, "doc_id long, content string"), d)
        out[name] = d
    return out


def test_alias_create_resolve_swap(stores, tmp_path):
    a = str(tmp_path / "live")
    create_alias(a, stores["a"])
    assert is_alias(a) and not is_alias(stores["a"])
    assert resolve_index(a) == os.path.abspath(stores["a"])
    assert resolve_index(stores["a"]) == stores["a"]  # concrete → itself
    old = swap_alias(a, stores["b"])
    assert old == os.path.abspath(stores["a"])
    assert resolve_index(a) == os.path.abspath(stores["b"])


def test_alias_queries_follow_the_pointer(spark, stores, tmp_path):
    from contextinator_spark.operators.bm25_segments import match_count

    a = str(tmp_path / "live")
    create_alias(a, stores["a"])
    n_a = match_count(spark, resolve_index(a), ["merge"]).collect()[0]["n_docs"]
    assert n_a == 0  # store a has no 'merge'
    swap_alias(a, stores["b"])
    n_b = match_count(spark, resolve_index(a), ["merge"]).collect()[0]["n_docs"]
    assert n_b == 1  # cutover visible at next resolution


def test_alias_chain_and_cycle_guard(stores, tmp_path):
    a1 = str(tmp_path / "a1")
    a2 = str(tmp_path / "a2")
    create_alias(a1, stores["a"])
    create_alias(a2, a1)  # alias → alias → store
    assert resolve_index(a2) == os.path.abspath(stores["a"])
    # cycle: repoint a1 at a2 (bypassing the store check via direct write)
    with open(os.path.join(a1, "alias.json"), "w") as f:
        json.dump({"target": os.path.abspath(a2)}, f)
    with pytest.raises(ValueError, match="cyclic|too deep"):
        resolve_index(a2)


def test_alias_guards(stores, tmp_path):
    with pytest.raises(ValueError, match="neither a store nor an alias"):
        create_alias(str(tmp_path / "x"), str(tmp_path / "nonexistent"))
    with pytest.raises(FileNotFoundError):
        read_alias(stores["a"])
    # stale .tmp from a crashed swap is ignored and overwritten
    a = str(tmp_path / "crashy")
    create_alias(a, stores["a"])
    with open(os.path.join(a, "alias.json.tmp"), "w") as f:
        f.write("{torn")
    assert resolve_index(a) == os.path.abspath(stores["a"])
    swap_alias(a, stores["b"])
    assert resolve_index(a) == os.path.abspath(stores["b"])


def test_cli_alias_verb_end_to_end(capsys, spark, stores, tmp_path):
    from tests.test_cli import run_cli

    a = str(tmp_path / "live")
    out = run_cli(capsys, spark, "alias", "--alias", a, "--target", stores["a"])
    assert json.loads(out[0])["target"] == stores["a"]
    # query THROUGH the alias path
    rows = run_cli(
        capsys, spark, "--format", "text", "count", "--index", a,
        "--query", "hash",
    )
    assert int(rows[0]) == 1
    out = run_cli(
        capsys, spark, "alias", "--alias", a, "--target", stores["b"], "--swap"
    )
    rec = json.loads(out[0])
    assert rec["was"] == os.path.abspath(stores["a"])
    rows = run_cli(
        capsys, spark, "--format", "text", "count", "--index", a,
        "--query", "merge",
    )
    assert int(rows[0]) == 1
