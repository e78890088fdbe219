"""Amplified-scale probe of the late-round-5 surface: multi-field search
(best_fields + BM25F over a content store and a title store), term
vectors, match-set statistics (percentiles / extended stats), the phrase
suggester, and ranking evaluation.

Builds TWO stores from the sf0.1 corpus amplified A×: a positions-carrying
content store (phrase_suggest needs positions; the BM25 executors read
format-2 blobs unchanged) and a plain store over the derived title field
(first 8 tokens) — the per-field-store model multifield.py documents.

Usage:
  SPARK_GRAFT_AMPLIFY=1600 SPARK_GRAFT_TMPDIR=/dev/shm python scripts/r5b_surface_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from contextinator_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "1600"))
    tmp = os.environ.get("SPARK_GRAFT_TMPDIR", "/dev/shm")
    out_dir = os.path.join(tmp, "r5b_surface_probe")
    shutil.rmtree(out_dir, ignore_errors=True)
    idx_c = os.path.join(out_dir, "index_content")
    idx_t = os.path.join(out_dir, "index_title")
    os.makedirs(idx_c, exist_ok=True)
    os.makedirs(idx_t, exist_ok=True)

    spark = get_spark("r5b-surface-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    from contextinator_spark.functions.tokenize import tokens_expr
    from contextinator_spark.operators import bm25_segments as BS
    from contextinator_spark.operators import segments as S
    from contextinator_spark.operators.multifield import (
        bm25f_topk,
        multi_match_topk,
        term_tf_stream,
    )
    from contextinator_spark.operators.phrase import phrase_suggest
    from contextinator_spark.operators.rankeval import rank_eval

    base = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumnRenamed("text", "content")
    )

    def amplified(src):
        if amplify <= 1:
            return src
        return (
            src.repartition(4 * cpus)
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
            .withColumn("doc_id", F.col("doc_id") * amplify + F.col("rep"))
            .drop("rep")
        )

    corpus = amplified(base)
    n_docs = corpus.count()
    res: dict = {"n_docs": n_docs, "amplify": amplify, "cpus": cpus}

    hints = None
    if amplify > 1:
        hints = S.sampled_heavy_fanout(
            base.repartition(cpus), "doc_id", n_docs=n_docs, df_multiplier=amplify
        )
    t0 = time.perf_counter()
    S.write_index(spark, corpus, idx_c, id_col="doc_id",
                  heavy_fanout=hints, positions=True)
    res["build_content_sec"] = round(time.perf_counter() - t0, 1)

    title_base = base.withColumn(
        "content", F.concat_ws(" ", F.slice(tokens_expr(F.col("content")), 1, 8))
    )
    title_corpus = amplified(title_base)
    t_hints = None
    if amplify > 1:
        t_hints = S.sampled_heavy_fanout(
            title_base.repartition(cpus), "doc_id", n_docs=n_docs,
            df_multiplier=amplify,
        )
    t0 = time.perf_counter()
    S.write_index(spark, title_corpus, idx_t, id_col="doc_id", heavy_fanout=t_hints)
    res["build_title_sec"] = round(time.perf_counter() - t0, 1)
    print(f"builds: content {res['build_content_sec']}s, "
          f"title {res['build_title_sec']}s ({n_docs} docs)", flush=True)

    BS.topk_segments(spark, idx_c, ["warmup"], k=10).collect()

    def timed(name, fn):
        t = time.perf_counter()
        rows = fn().collect()
        res[name] = round(time.perf_counter() - t, 3)
        print(f"{name:>24}: {res[name]:8.3f}s  rows={len(rows)}", flush=True)
        return rows

    fields = {"content": idx_c, "title": idx_t}
    weights = {"content": 1.0, "title": 2.0}
    terms = ["hash", "join", "spark"]

    timed("bm25_single_field", lambda: BS.topk_segments(spark, idx_c, terms, k=10))
    timed("multi_match_best", lambda: multi_match_topk(
        spark, fields, terms, k=10, weights=weights, tie_breaker=0.3))
    timed("bm25f_cross", lambda: bm25f_topk(
        spark, fields, terms, k=10, weights=weights))
    timed("term_vectors_3docs", lambda: BS.term_vectors(
        spark, idx_c, [7, 4200001, 7999999]))
    timed("percentiles", lambda: BS.percentiles_agg(
        spark, idx_c, terms, "doc_len", (0.25, 0.5, 0.75, 0.99)))
    timed("extended_stats", lambda: BS.extended_stats(spark, idx_c, terms))
    timed("phrase_suggest", lambda: phrase_suggest(
        spark, idx_c, ["tble", "hsh"], k=5))

    got = term_tf_stream(spark, idx_c, terms)
    assert got is not None
    stream, _info = got
    relevant = (
        stream.groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt"))
        .filter(F.col("nt") == len(set(terms)))
        .select("doc_id")
    )
    ranking = BS.topk_segments(spark, idx_c, terms, k=10)
    timed("rank_eval", lambda: rank_eval(spark, ranking, relevant, k=10))

    print(json.dumps(res), flush=True)
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
