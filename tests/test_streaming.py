from __future__ import annotations

import json
import shutil

import pytest
from pyspark.sql import functions as F

from contextinator_spark.operators import bm25_segments, segments as S
from contextinator_spark.streaming.ingest import start_incremental_ingest


def _topk(spark, index_dir, terms, **kw):
    res = bm25_segments.topk_segments(spark, index_dir, terms, k=10, **kw)
    return [(r["rank"], r["doc_id"], r["score"]) for r in res.collect()]


def test_incremental_ingest_matches_batch(spark, corpus, tmp_path_factory):
    """After a streamed delta, the index must be RANK-IDENTICAL to a fresh
    full-corpus rebuild: same top-k docIDs AND same BM25 scores. This pins
    that ingest.py maintains doc_meta + stats (n_docs/avgdl/max_doc_id), not
    just retrievability — stale stats would shift idf/avgdl and diverge."""
    base_dir = str(tmp_path_factory.mktemp("stream_idx"))
    fresh_dir = str(tmp_path_factory.mktemp("fresh_idx"))
    drop_dir = str(tmp_path_factory.mktemp("stream_drops"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    c = corpus.withColumn("doc_id", F.pmod(F.xxhash64("repo", "path"), F.lit(2**61)))
    first, second = c.filter(F.col("doc_id") % 2 == 0), c.filter(F.col("doc_id") % 2 == 1)

    # base index from the first half (batch path)
    S.write_index(spark, first, base_dir)
    # second half arrives as a streamed drop
    second.select("doc_id", "repo", "path", "commit", "lang", "content").write.parquet(
        f"{drop_dir}/drop1"
    )
    q = start_incremental_ingest(spark, f"{drop_dir}/*", base_dir, ckpt)
    q.awaitTermination(120)

    # reference: a fresh batch build over the FULL corpus
    S.write_index(spark, c, fresh_dir)

    # 1) merged stats == fresh stats (idf/avgdl inputs identical)
    with open(f"{base_dir}/stats.json") as f:
        merged = json.load(f)
    with open(f"{fresh_dir}/stats.json") as f:
        fresh = json.load(f)
    for key in ("n_docs", "avgdl", "max_doc_id", "total_terms"):
        assert merged[key] == fresh[key], key

    # 2) doc_meta covers streamed docs (J4 enrichment)
    dm = spark.read.parquet(f"{base_dir}/doc_meta")
    assert dm.count() == c.count()
    streamed_ids = {r["doc_id"] for r in second.select("doc_id").collect()}
    present = {
        r["doc_id"]
        for r in dm.filter(F.col("doc_id").isin(list(streamed_ids))).select("doc_id").collect()
    }
    assert present == streamed_ids

    # 3) rank-identical top-k incl. scores: heavy term, multi-term, and a
    # term that only exists in the streamed half
    probe = second.select(
        "doc_id", F.explode(F.split(F.lower("content"), "[^a-z0-9_]+")).alias("t")
    )
    first_terms = {
        r["t"]
        for r in first.select(F.explode(F.split(F.lower("content"), "[^a-z0-9_]+")).alias("t"))
        .distinct()
        .collect()
    }
    rare = (
        probe.filter(~F.col("t").isin(list(first_terms)) & (F.col("t") != ""))
        .groupBy("t")
        .count()
        .orderBy("count", "t")
        .first()
    )
    assert rare is not None
    for terms in (["def"], ["def", "import", "class"], [rare["t"]]):
        for prune in (True, False):
            got = _topk(spark, base_dir, terms, prune=prune)
            want = _topk(spark, fresh_dir, terms, prune=prune)
            assert got == want, f"terms={terms} prune={prune}\n{got}\nvs\n{want}"
        assert got, f"no results for {terms}"

    shutil.rmtree(base_dir, ignore_errors=True)
    shutil.rmtree(fresh_dir, ignore_errors=True)
    shutil.rmtree(drop_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
