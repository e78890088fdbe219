from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from contextinator_spark.operators import bm25, postings as P
from contextinator_spark.oracle import BruteForceBM25

QUERIES = {
    1: ["auth", "token"],               # multi-term
    2: ["def"],                          # heavy hitter
    3: ["import", "return", "class"],    # keyword mix
    4: ["zzz_no_such_term"],             # zero matches
    5: ["authuser5", "indexquery"],      # rare identifiers
}


@pytest.fixture(scope="module")
def indexed(spark, corpus):
    c = corpus.withColumn("doc_id", F.pmod(F.xxhash64("repo", "path"), F.lit(2**61)))
    post = P.build_postings(c).cache()
    meta = P.doc_meta(c).cache()
    post.count(), meta.count()
    return c, post, meta


def _brute_oracle(spark, corpus):
    rows = corpus.withColumn("doc_id", F.pmod(F.xxhash64("repo", "path"), F.lit(2**61))).select("doc_id", "content").collect()
    return BruteForceBM25({r["doc_id"]: r["content"] for r in rows})


def test_rank_identical_vs_oracle(spark, corpus, indexed):
    _, post, meta = indexed
    oracle = _brute_oracle(spark, corpus)
    for qid, terms in QUERIES.items():
        got = [(r["rank"], r["doc_id"], r["score"]) for r in bm25.topk(post, meta, terms, k=10).collect()]
        exp = oracle.topk(terms, k=10)
        assert [g[1] for g in got] == [e[1] for e in exp], f"q{qid} rank mismatch: {got} vs {exp}"
        for g, e in zip(got, exp):
            assert abs(g[2] - e[2]) <= 1e-6, f"q{qid} score mismatch {g} vs {e}"


def test_topk_multi_matches_single(spark, indexed):
    _, post, meta = indexed
    multi = bm25.topk_multi(post, meta, QUERIES, k=10).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, terms in QUERIES.items():
        single = [(r["rank"], r["doc_id"], r["score"]) for r in bm25.topk(post, meta, terms, k=10).collect()]
        assert sorted(by_q.get(qid, [])) == sorted(single), f"q{qid}"


def test_doc_meta_invariants(spark, corpus, indexed):
    _, post, meta = indexed
    # sha256 invariant: doc_meta hash equals sha2 of corpus content (input_hint)
    c = corpus.withColumn("doc_id", F.pmod(F.xxhash64("repo", "path"), F.lit(2**61))).withColumn(
        "h", F.sha2("content", 256)
    )
    bad = meta.join(c.select("doc_id", "h"), "doc_id").filter(F.col("h") != F.col("content_sha256")).count()
    assert bad == 0
    # sum(tf) per doc == doc_len
    tot = post.groupBy("doc_id").agg(F.sum("tf").alias("s")).join(meta, "doc_id")
    assert tot.filter(F.col("s") != F.col("doc_len")).count() == 0
