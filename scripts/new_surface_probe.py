"""Amplified-scale probe of the round-4 query surface.

Builds a positions-carrying store from the sf0.1 corpus amplified A×
(deterministic doc_id replication, born-distributed — same recipe as
bench.py), then times one query from every new family: Boolean occur
algebra, fuzzy, dismax, phrase (round-3 baseline for context), snippets,
search_after page-2, hybrid RRF. Records that the new executors keep the
probe-then-pruned-scan shape as the corpus grows 1600×.

Usage:
  SPARK_GRAFT_AMPLIFY=1600 SPARK_GRAFT_TMPDIR=/dev/shm python scripts/new_surface_probe.py
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
    out_dir = os.path.join(tmp, "new_surface_probe")
    shutil.rmtree(out_dir, ignore_errors=True)
    idx = os.path.join(out_dir, "index")
    os.makedirs(idx, exist_ok=True)

    spark = get_spark("new-surface-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    from contextinator_spark.operators import bm25_segments as BS
    from contextinator_spark.operators import segments as S
    from contextinator_spark.operators.boolean import boolean_topk_query
    from contextinator_spark.operators.hybrid import rrf_fuse
    from contextinator_spark.operators.mlt import more_like_this
    from contextinator_spark.operators.phrase import phrase_topk_indexed
    from contextinator_spark.operators.similarity import knn_brute
    from contextinator_spark.operators.snippets import best_line_snippets

    base = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumnRenamed("text", "content")
    )
    corpus = base
    if amplify > 1:
        corpus = (
            base.repartition(4 * cpus)
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
            .withColumn("doc_id", F.col("doc_id") * amplify + F.col("rep"))
            .drop("rep")
        )
    n_docs = corpus.count()

    hints = None
    t0 = time.perf_counter()
    if amplify > 1:
        hints = S.sampled_heavy_fanout(
            base.repartition(cpus), "doc_id", n_docs=n_docs, df_multiplier=amplify
        )
    S.write_index(spark, corpus, idx, id_col="doc_id",
                  heavy_fanout=hints, positions=True)
    build_sec = round(time.perf_counter() - t0, 1)

    BS.topk_segments(spark, idx, ["warmup"], k=10).collect()  # worker init

    res: dict[str, float] = {}

    def timed(name, fn):
        t = time.perf_counter()
        rows = fn().collect()
        res[name] = round(time.perf_counter() - t, 3)
        print(f"{name:>24}: {res[name]:7.3f}s  rows={len(rows)}", flush=True)
        return rows

    p1 = timed("bm25_latency", lambda: BS.topk_segments(
        spark, idx, ["hash", "join", "spark"], k=10))
    timed("bm25_page2", lambda: BS.topk_segments(
        spark, idx, ["hash", "join", "spark"], k=10,
        after=(p1[-1]["score"], p1[-1]["doc_id"])))
    timed("phrase_indexed", lambda: phrase_topk_indexed(
        spark, idx, ["table", "hash"], k=10))
    timed("boolean_mixed", lambda: boolean_topk_query(
        spark, idx, '+hash spark -join "table hash" lang:en', k=10))
    timed("boolean_dismax", lambda: boolean_topk_query(
        spark, idx, 'hash spark "table hash"', k=10,
        combine="dismax", tie_breaker=0.3))
    timed("fuzzy_grup", lambda: BS.fuzzy_topk(spark, idx, "grup", k=10))
    timed("mlt_doc0", lambda: more_like_this(
        spark, idx, corpus, 0, k=10, max_query_terms=5))
    timed("snippets_top10", lambda: best_line_snippets(
        corpus,
        BS.topk_segments(spark, idx, ["hash", "join", "spark"], k=10),
        ["hash", "join", "spark"]))

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    if amplify > 1:  # replicate vectors into the amplified id space
        emb = (
            emb.repartition(cpus)
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
            .withColumn("vec_id", F.col("vec_id") * amplify + F.col("rep"))
            .drop("rep")
        )
    qv = [float(x) for x in
          spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
          .filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]

    def hybrid():
        lex = BS.topk_segments(spark, idx, ["hash", "join", "spark"], k=50)
        vec = knn_brute(emb, qv, k=50).withColumnRenamed("vec_id", "doc_id")
        return rrf_fuse([lex, vec], k=10)

    timed("hybrid_rrf", lambda: hybrid())

    print(json.dumps({
        "amplify": amplify, "n_docs": n_docs, "cpus": cpus,
        "build_sec": build_sec, "queries": res,
    }))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
