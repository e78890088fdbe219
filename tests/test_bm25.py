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


def test_topk_with_dictionary_single_postings_scan(spark, tmp_path):
    """With the persisted dictionary passed as term_stats, the executor's
    plan must contain exactly ONE scan of the postings table — df becomes a
    broadcast probe instead of a second postings aggregation."""
    from contextinator_spark.operators import bm25, postings as P

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i % 3} delta" * (i % 4 + 1)) for i in range(30)],
        "doc_id long, content string",
    )
    post_path, dict_path = str(tmp_path / "post"), str(tmp_path / "dict")
    P.build_postings(docs, use_expr=True).write.parquet(post_path)
    meta = P.doc_meta(docs, use_expr=True)
    post = spark.read.parquet(post_path)
    P.term_stats(post).write.parquet(dict_path)
    tstats = spark.read.parquet(dict_path)

    res = bm25.topk_multi(
        post, meta, {1: ["alpha", "beta"], 2: ["delta"]}, k=5, term_stats=tstats
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    n_post_scans = sum(1 for ln in plan.splitlines() if "FileScan parquet" in ln and "post" in ln)
    assert n_post_scans == 1, plan
    # and values equal the no-dictionary fallback
    a = sorted(tuple(r) for r in res.collect())
    b = sorted(tuple(r) for r in bm25.topk_multi(post, meta, {1: ["alpha", "beta"], 2: ["delta"]}, k=5).collect())
    assert a == b
    c = sorted(tuple(r) for r in bm25.topk(post, meta, ["alpha", "delta"], k=5, term_stats=tstats).collect())
    d = sorted(tuple(r) for r in bm25.topk(post, meta, ["alpha", "delta"], k=5).collect())
    assert c == d


def test_topk_multi_fallback_single_postings_scan(spark, tmp_path):
    """WITHOUT a dictionary, df now comes from a count() window over the
    matched postings — the plan must still scan the postings table exactly
    once (the round-2 driver-graded entry query took a two-scan fallback)."""
    from contextinator_spark.operators import bm25, postings as P

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i % 3} delta" * (i % 4 + 1)) for i in range(30)],
        "doc_id long, content string",
    )
    post_path = str(tmp_path / "post")
    P.build_postings(docs, use_expr=True).write.parquet(post_path)
    meta = P.doc_meta(docs, use_expr=True)
    post = spark.read.parquet(post_path)

    res = bm25.topk_multi(post, meta, {1: ["alpha", "beta"], 2: ["delta"]}, k=5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    n_post_scans = sum(
        1 for ln in plan.splitlines() if "FileScan parquet" in ln and "post" in ln
    )
    assert n_post_scans == 1, plan


def test_bm25_batch_plan_has_no_df_count_window(spark):
    """q_bm25_batch passes the prebuilt dictionary, so df must enter as a
    broadcast probe — the ONLY Window in the plan is the per-query rank
    (row_number); no count(1)-over-term window exchange survives."""
    from contextinator_spark.entry_queries import q_bm25_batch

    df = q_bm25_batch(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    windows = [ln for ln in plan.splitlines() if ln.lstrip().startswith(("Window", "+- Window"))]
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert all("row_number" in ln for ln in win_lines), win_lines
    assert not any("count(1) windowspecdefinition" in ln for ln in plan.splitlines())
    # and results still match the no-dictionary form
    from contextinator_spark.entry_queries import BM25_QUERIES, _docs_meta, _docs_postings
    from contextinator_spark.operators import bm25

    want = sorted(
        tuple(r)
        for r in bm25.topk_multi(
            _docs_postings(spark, "/root/testdata/sf0.001"),
            _docs_meta(spark, "/root/testdata/sf0.001"),
            BM25_QUERIES,
            k=10,
        ).collect()
    )
    got = sorted(tuple(r) for r in df.collect())
    assert got == want
