"""Reciprocal Rank Fusion: contribution math, absent-run docs, tie-break,
and the hybrid lexical+vector composition."""

from __future__ import annotations

import pytest

from contextinator_spark.operators.hybrid import RRF_K, hybrid_topk, rrf_fuse


def _run(spark, pairs):
    return spark.createDataFrame(
        [(r, d, 0.0) for r, d in pairs], "rank int, doc_id long, score double"
    )


def test_rrf_contributions_and_absence(spark):
    a = _run(spark, [(1, 10), (2, 11), (3, 12)])
    b = _run(spark, [(1, 11), (2, 13)])
    out = {r.doc_id: (r.rank, r.rrf_score) for r in rrf_fuse([a, b], k=10).collect()}
    # doc 11: 1/(60+2) + 1/(60+1); doc 10: 1/61; doc 13: 1/62; doc 12: 1/63
    assert out[11][1] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert out[10][1] == pytest.approx(round(1 / 61, 6))
    assert out[13][1] == pytest.approx(round(1 / 62, 6))
    assert out[12][1] == pytest.approx(round(1 / 63, 6))
    assert out[11][0] == 1  # two-run doc wins
    # 10 vs 13: same singleton contribs? 1/61 > 1/62 → 10 then 13 then 12
    assert [d for d, (r, _) in sorted(out.items(), key=lambda kv: kv[1][0])] == [
        11, 10, 13, 12,
    ]


def test_rrf_tiebreak_doc_id(spark):
    a = _run(spark, [(1, 20)])
    b = _run(spark, [(1, 7)])
    rows = rrf_fuse([a, b]).collect()  # equal 1/(K+1) scores
    assert [(r.rank, r.doc_id) for r in rows] == [(1, 7), (2, 20)]


def test_rrf_k_and_limit(spark):
    a = _run(spark, [(i, 100 + i) for i in range(1, 8)])
    out = rrf_fuse([a], k=3, rrf_k=10).collect()
    assert len(out) == 3
    assert out[0].rrf_score == pytest.approx(round(1 / 11, 6))
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_topk_composes(spark, tmp_path_factory):
    from contextinator_spark.operators.segments import write_index

    docs = spark.createDataFrame(
        [(i, "hash table" if i < 3 else "merge sort") for i in range(6)],
        "doc_id long, content string",
    )
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    d = str(tmp_path_factory.mktemp("hyb_idx"))
    write_index(spark, docs, d)
    out = hybrid_topk(spark, d, emb, ["hash"], [1.0, 0.0], k=4, depth=5)
    rows = out.collect()
    assert rows and rows[0].rank == 1
    # doc 0 and 2 appear in both runs (lexical 'hash' + even vec) → top-2
    top2 = {rows[0].doc_id, rows[1].doc_id}
    assert top2 == {0, 2}
    assert out.columns == ["rank", "doc_id", "rrf_score"]
    # RRF score of a both-runs doc exceeds any single-run doc at this depth
    assert rows[1].rrf_score > rows[2].rrf_score


def test_hybrid_ann_lsh_path(spark, tmp_path_factory):
    from contextinator_spark.operators.segments import write_index

    docs = spark.createDataFrame(
        [(i, "hash table" if i < 3 else "merge sort") for i in range(6)],
        "doc_id long, content string",
    )
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    d = str(tmp_path_factory.mktemp("hyb_lsh_idx"))
    write_index(spark, docs, d)
    out = hybrid_topk(spark, d, emb, ["hash"], [1.0, 0.0], k=4, depth=5, ann="lsh")
    rows = out.collect()
    assert rows and out.columns == ["rank", "doc_id", "rrf_score"]
    # LSH candidates are re-scored exactly: any doc it returns fused with
    # the lexical run must match the brute fusion's score for that doc
    brute = {r.doc_id: r.rrf_score for r in
             hybrid_topk(spark, d, emb, ["hash"], [1.0, 0.0], k=6, depth=5).collect()}
    for r in rows:
        assert r.rrf_score <= brute.get(r.doc_id, float("inf")) + 1e-9
    with pytest.raises(ValueError):
        hybrid_topk(spark, d, emb, ["hash"], [1.0, 0.0], ann="ivf")


def test_hybrid_ann_lsh_indexed_matches_inline(spark, tmp_path_factory):
    """ann='lsh_indexed' (persisted partition-pruned signature table — the
    graded q_hybrid_rrf path) fuses bit-identically to the inline knn_lsh
    run with the same parameters."""
    from contextinator_spark.operators.segments import write_index
    from contextinator_spark.operators.similarity import write_signature_table

    docs = spark.createDataFrame(
        [(i, "hash table" if i < 3 else "merge sort") for i in range(8)],
        "doc_id long, content string",
    )
    emb = spark.createDataFrame(
        [(i, [1.0, 0.1 * i]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    d = str(tmp_path_factory.mktemp("hyb_sig_idx"))
    sig = str(tmp_path_factory.mktemp("hyb_sig_tab"))
    write_index(spark, docs, d)
    write_signature_table(emb, sig, dim=2, n_bits=4, n_tables=2)
    qv = [1.0, 0.0]
    got = hybrid_topk(
        spark, d, emb, ["hash"], qv, k=5, depth=5,
        ann="lsh_indexed", sig_path=sig, n_bits=4, n_tables=2,
    ).collect()
    # inline LSH twin (recomputes signatures; same hyperplanes/params)
    want = hybrid_topk(
        spark, d, emb, ["hash"], qv, k=5, depth=5, ann="lsh",
    ).collect()
    assert [(r.rank, r.doc_id, r.rrf_score) for r in got] == [
        (r.rank, r.doc_id, r.rrf_score) for r in want
    ]
    with pytest.raises(ValueError):
        hybrid_topk(spark, d, emb, ["hash"], qv, ann="lsh_indexed")
