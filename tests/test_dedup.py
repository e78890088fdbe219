from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from contextinator_spark.operators.dedup import (
    cosine_dup_pairs,
    exact_dedup,
    lsh_bands,
    minhash_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
)


@pytest.fixture(scope="module")
def dup_corpus(spark, corpus):
    return corpus.withColumn("doc_id", F.pmod(F.xxhash64("repo", "path"), F.lit(2**61)))


def test_exact_dedup_removes_injected_dups(spark, dup_corpus):
    n = dup_corpus.count()
    n_distinct = dup_corpus.select("content").distinct().count()
    out = exact_dedup(dup_corpus, order_cols=["repo", "path"])
    assert out.count() == n_distinct < n  # synth corpus injects ~3% duplicates
    # kept row is lexicographically first (deterministic winner)
    dups = out.filter(F.col("n_duplicates") > 0)
    assert dups.count() > 0


def test_minhash_finds_exact_dups_as_candidates(spark, dup_corpus):
    # identical contents share all bands → must appear as candidate pairs
    sig = minhash_signature(dup_corpus)
    pairs = minhash_candidate_pairs(lsh_bands(sig))
    h = dup_corpus.withColumn("h", F.sha2("content", 256)).select("doc_id", "h")
    a, b = h.alias("a"), h.alias("b")
    true_dups = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    # docs with >=3 tokens only (shorter docs have no shingles)
    missed = true_dups.join(pairs, ["doc_a", "doc_b"], "left_anti")
    from contextinator_spark.functions.tokenize import tokens_expr

    short_ids = {
        r["doc_id"]
        for r in dup_corpus.filter(F.size(tokens_expr("content")) < 3)
        .select("doc_id")
        .collect()
    }
    for r in missed.collect():
        assert r["doc_a"] in short_ids or r["doc_b"] in short_ids, r


def test_jaccard_exact_dups_are_1(spark, dup_corpus):
    pairs = ngram_jaccard_pairs(dup_corpus, threshold=0.99)
    h = dup_corpus.withColumn("h", F.sha2("content", 256)).select("doc_id", "h")
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    a, b = h.alias("a"), h.alias("b")
    expected = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    }
    assert expected <= got  # exact dups must score jaccard 1.0


def test_simhash_identical_for_dups(spark, dup_corpus):
    sh = simhash(dup_corpus)
    joined = dup_corpus.withColumn("h", F.sha2("content", 256)).join(sh, "doc_id")
    bad = (
        joined.groupBy("h")
        .agg(F.countDistinct("simhash").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert bad == 0


def test_cosine_pairs_self_similarity(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pairs = cosine_dup_pairs(emb.limit(100), threshold=0.99)
    # no asserts on count (data-dependent); sanity: cos bounded, ids ordered
    for r in pairs.collect():
        assert r["id_a"] < r["id_b"]
        assert r["cos"] <= 1.000001


def test_simhash_pairs_exact_recall(spark, corpus):
    """Band-join candidates must find EVERY pair within the Hamming bound
    (pigeonhole: max_hamming < n_bands), pinned against the brute-force
    all-pairs Hamming computed in numpy. The synth corpus plants ~3%
    duplicate contents → guaranteed hamming-0 pairs."""
    from pyspark.sql import functions as F

    from contextinator_spark.operators.dedup import simhash, simhash_pairs

    c = corpus.withColumn("doc_id", F.pmod(F.xxhash64("repo", "path"), F.lit(2**61)))
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(c, max_hamming=3).collect()
    }
    sigs = {r["doc_id"]: int(r["simhash"], 16) for r in simhash(c).collect()}
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    assert any(h == 0 for h in want.values()), "planted duplicates should be hamming-0"


def test_jaccard_verifier_form_matches_standalone(spark, dup_corpus):
    """candidates= (the scale-path verifier API) returns the same jaccard
    as the standalone self-join restricted to those pairs, and keeps
    zero-intersection candidates at jaccard 0."""
    full = ngram_jaccard_pairs(dup_corpus).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in full}
    some = list(by_pair)[:5]
    assert some, "fixture must produce overlapping pairs"
    # two docs that share shingles + one disjoint pair (no common shingle)
    from contextinator_spark.functions.tokenize import tokens_expr

    ids = sorted(
        r["doc_id"]
        for r in dup_corpus.filter(F.size(tokens_expr("content")) >= 3)
        .select("doc_id")
        .distinct()
        .collect()
    )
    disjoint = None
    for a in ids:
        for b in ids:
            if a < b and (a, b) not in by_pair:
                disjoint = (a, b)
                break
        if disjoint:
            break
    cand_rows = [{"doc_a": a, "doc_b": b} for a, b in some]
    if disjoint:
        cand_rows.append({"doc_a": disjoint[0], "doc_b": disjoint[1]})
    cand = spark.createDataFrame(cand_rows, "doc_a long, doc_b long")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, candidates=cand).collect()
    }
    for p in some:
        assert got[p] == by_pair[p], p
    if disjoint:
        assert got.get(disjoint, None) == 0.0
