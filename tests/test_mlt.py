"""More-Like-This: interesting-term selection (tf/df gates, idf·tf order,
bound), source exclusion, and equivalence to the disjunctive executor."""

from __future__ import annotations

import pytest

from contextinator_spark.operators.mlt import mlt_terms, more_like_this

DOCS = [
    (0, "hash hash table table join rare_once"),  # source: tf hash2 table2
    (1, "hash table join join"),
    (2, "hash hash hash merge"),
    (3, "table table spark"),
    (4, "solo_term solo_term only here"),  # df(solo_term)=1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, content string")


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    from contextinator_spark.operators.segments import write_index

    d = str(tmp_path_factory.mktemp("mlt_idx"))
    write_index(spark, docs, d)
    return d


def test_mlt_terms_gates_and_order(spark, docs, idx):
    # tf gate: join/rare_once have tf 1 in doc 0 → dropped at min_tf=2
    assert mlt_terms(spark, idx, docs, 0) == ["hash", "table"]
    # min_tf=1 admits them, min_df=2 then drops rare_once (df=1)
    assert mlt_terms(spark, idx, docs, 0, min_tf=1) == ["hash", "join", "table"]
    # bound keeps the highest idf·tf: hash tf2·df3 vs table tf2·df3 —
    # equal score, term asc tiebreak keeps 'hash'
    assert mlt_terms(spark, idx, docs, 0, max_query_terms=1) == ["hash"]
    # min_df gate: solo_term (df=1) survives only when min_df=1
    assert mlt_terms(spark, idx, docs, 4, min_tf=2, min_df=2) == []
    assert mlt_terms(spark, idx, docs, 4, min_tf=2, min_df=1) == ["solo_term"]
    with pytest.raises(ValueError):
        mlt_terms(spark, idx, docs, 99)


def test_more_like_this_excludes_source_and_matches_disjunction(spark, docs, idx):
    from contextinator_spark.operators.bm25_segments import topk_segments

    got = [(r.rank, r.doc_id, r.score) for r in
           more_like_this(spark, idx, docs, 0, k=3).collect()]
    assert got and all(d != 0 for _, d, _ in got)
    # manual: disjunction over the expansion, drop source, re-rank
    full = [(r.doc_id, r.score) for r in
            topk_segments(spark, idx, ["hash", "table"], k=5).collect()]
    want = [(i + 1, d, s) for i, (d, s) in
            enumerate((d, s) for d, s in full if d != 0)][:3]
    assert got == want


def test_more_like_this_empty_expansion(spark, docs, idx):
    out = more_like_this(spark, idx, docs, 4, min_tf=2, min_df=5)
    assert out.count() == 0
