"""Term vectors (Lucene TermVectors / ES _termvectors): doc-major
reconstruction from the term-major store, with and without positions."""

from __future__ import annotations

import re

import pytest

from contextinator_spark.operators.bm25_segments import term_vectors

DOCS = [
    (0, "hash table hash join probe"),
    (1, "spark join spark shuffle"),
    (2, "merge sort external merge run"),
    (3, "one off terms only here"),
]


def _toks(text):
    return re.findall(r"[a-z0-9_]+", text.lower())


@pytest.fixture(scope="module")
def plain_idx(spark, tmp_path_factory):
    from contextinator_spark.operators.segments import write_index

    d = str(tmp_path_factory.mktemp("tv_idx"))
    write_index(spark, spark.createDataFrame(DOCS, "doc_id long, content string"), d)
    return d


@pytest.fixture(scope="module")
def pos_idx(spark, tmp_path_factory):
    from contextinator_spark.operators.segments import write_index

    d = str(tmp_path_factory.mktemp("tv_pos_idx"))
    write_index(
        spark,
        spark.createDataFrame(DOCS, "doc_id long, content string"),
        d,
        positions=True,
    )
    return d


def _expected(doc_ids, with_positions=False):
    rows = []
    for d, text in DOCS:
        if d not in doc_ids:
            continue
        toks = _toks(text)
        for t in sorted(set(toks)):
            if with_positions:
                rows.append((d, t, toks.count(t), [i for i, x in enumerate(toks) if x == t]))
            else:
                rows.append((d, t, toks.count(t)))
    return rows


def test_term_vectors_match_tokenizer(spark, plain_idx):
    got = [
        (r["doc_id"], r["term"], r["tf"])
        for r in term_vectors(spark, plain_idx, [0, 2]).collect()
    ]
    assert got == _expected({0, 2})


def test_term_vectors_with_positions(spark, pos_idx):
    got = [
        (r["doc_id"], r["term"], r["tf"], list(r["positions"]))
        for r in term_vectors(spark, pos_idx, [0, 1], positions=True).collect()
    ]
    assert got == _expected({0, 1}, with_positions=True)


def test_term_vectors_positions_needs_format2(spark, plain_idx):
    with pytest.raises(ValueError, match="posting_format=2"):
        term_vectors(spark, plain_idx, [0], positions=True)


def test_term_vectors_deleted_doc_is_empty(spark, tmp_path_factory):
    from contextinator_spark.operators.deletes import delete_docs
    from contextinator_spark.operators.segments import write_index

    d = str(tmp_path_factory.mktemp("tv_del_idx"))
    write_index(spark, spark.createDataFrame(DOCS, "doc_id long, content string"), d)
    delete_docs(spark, d, [2])
    got = [
        (r["doc_id"], r["term"], r["tf"])
        for r in term_vectors(spark, d, [1, 2]).collect()
    ]
    assert got == _expected({1})


def test_term_vectors_empty_request(spark, plain_idx):
    assert term_vectors(spark, plain_idx, []).count() == 0
    assert term_vectors(spark, plain_idx, [999]).count() == 0
