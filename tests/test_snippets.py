"""Snippet/highlight generation: best-line selection, tie-breaking,
pushed-down corpus read, and highlighter marker placement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from contextinator_spark.operators.snippets import (
    best_line_snippets,
    highlight,
    term_hits_expr,
)

DOCS = [
    (0, "nothing here\nhash hash table\nhash only", "en"),
    (1, "spark\nno match line\nspark spark", "en"),
    (2, "one hash\nalso one hash", "en"),  # tie on n_hits → earliest line
    (3, "rehash hash_y\nhash", "en"),  # substrings must not count
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, content string, lang string")


@pytest.fixture(scope="module")
def hits(spark):
    return spark.createDataFrame(
        [(1, 0, 2.0), (2, 1, 1.5), (3, 2, 1.0), (4, 3, 0.5)],
        "rank int, doc_id long, score double",
    )


def test_best_line_picks_max_density_then_earliest(spark, docs, hits):
    rows = {
        r.doc_id: r
        for r in best_line_snippets(docs, hits, ["hash", "table"]).collect()
    }
    assert rows[0].line_no == 2 and rows[0].n_hits == 3
    assert rows[0].snippet == "hash hash table"
    assert rows[2].line_no == 1 and rows[2].n_hits == 1  # tie → earliest
    # doc 3: "rehash"/"hash_y" are different tokens — only line 2 hits
    assert rows[3].line_no == 2 and rows[3].n_hits == 1
    # doc 1 matches neither query term: best line is the first, 0 hits
    assert rows[1].n_hits == 0 and rows[1].line_no == 1
    # rank/score pass through from the hits frame
    assert [r.rank for r in sorted(rows.values(), key=lambda r: r.rank)] == [1, 2, 3, 4]


def test_empty_hits_yield_empty_frame(spark, docs):
    empty = spark.createDataFrame([], "rank int, doc_id long, score double")
    out = best_line_snippets(docs, empty, ["hash"])
    assert out.count() == 0
    assert out.columns == ["rank", "doc_id", "score", "line_no", "n_hits", "snippet"]


def test_term_hits_tokenization_matches_index(spark):
    df = spark.createDataFrame(
        [("HASH hash,hash;rehash hash_x",)], "line string"
    ).select(term_hits_expr("line", ["hash"]).alias("n"))
    # HASH, hash, hash count (case-folded, punctuation-split);
    # rehash and hash_x are single different tokens
    assert df.collect()[0].n == 3


def test_highlight_markers_and_boundaries(spark):
    df = spark.createDataFrame(
        [("Hash table rehash hash_y HASH",)], "line string"
    ).select(highlight("line", ["hash", "table"]).alias("h"))
    assert df.collect()[0].h == "«Hash» «table» rehash hash_y «HASH»"
    with pytest.raises(ValueError):
        highlight("line", ["not a token!"])


def test_snippets_compose_with_segment_topk(spark, docs, tmp_path_factory):
    from contextinator_spark.operators.bm25_segments import topk_segments
    from contextinator_spark.operators.segments import write_index

    d = str(tmp_path_factory.mktemp("snip_idx"))
    write_index(spark, docs, d)
    hits = topk_segments(spark, d, ["hash", "table"], k=3)
    out = best_line_snippets(docs, hits, ["hash", "table"]).collect()
    assert len(out) == 3
    assert all(r.n_hits >= 1 for r in out)  # scoring docs always have a hit line
    assert [r.rank for r in out] == [1, 2, 3]
