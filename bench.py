"""Bench harness (driver contract).

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

  phase 1  index build  — corpus → postings → doc_meta → term_stats →
           compressed segments, materialized to parquet (the real sink path)
  phase 2  query batch  — BM25 top-k for the golden query set, one plan per
           query (measures per-query latency → p95)

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "index_build_sec": ..., "files_per_sec": ..., "query_p95_sec": ...}

Scaling-efficiency evidence (BASELINE.md): run twice with
SPARK_GRAFT_CPUS=8 and =32 via scripts/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from contextinator_spark.entry_queries import BM25_QUERIES, _docs  # noqa: E402
from contextinator_spark.operators import bm25, postings as P  # noqa: E402
from contextinator_spark.session import get_spark  # noqa: E402

BENCH_QUERIES: dict[int, list[str]] = {
    **BM25_QUERIES,
    6: ["scan", "table"],
    7: ["dup", "small"],
    8: ["fast", "key", "order", "sort"],
    9: ["part", "window", "stream"],
    10: ["batch"],
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_tmp")
    shutil.rmtree(out_dir, ignore_errors=True)

    spark = get_spark("contextinator-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        corpus = _docs(spark, sf_dir)
        n_files = corpus.count()  # warms the scan; excluded from build time

        t0 = time.perf_counter()
        post = P.build_postings(corpus)
        post.write.mode("overwrite").parquet(f"{out_dir}/postings")
        meta = P.doc_meta(corpus)
        meta.write.mode("overwrite").parquet(f"{out_dir}/doc_meta")
        P.term_stats(spark.read.parquet(f"{out_dir}/postings")).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/term_stats")
        build_sec = time.perf_counter() - t0

        post_r = spark.read.parquet(f"{out_dir}/postings").cache()
        meta_r = spark.read.parquet(f"{out_dir}/doc_meta").cache()
        post_r.count(), meta_r.count()

        per_query: dict[str, float] = {}
        for qid, terms in BENCH_QUERIES.items():
            tq = time.perf_counter()
            bm25.topk(post_r, meta_r, terms, k=10).collect()
            per_query[f"q{qid}"] = round(time.perf_counter() - tq, 4)

        lats = sorted(per_query.values())
        p95 = lats[min(len(lats) - 1, int(0.95 * len(lats)))]
        total = build_sec + sum(per_query.values())
        print(
            json.dumps(
                {
                    "metric": "index_build+query_batch_wall",
                    "value": round(total, 3),
                    "unit": "sec",
                    "queries": per_query,
                    "sf": sf_dir,
                    "cpus": int(cpus),
                    "n_files": n_files,
                    "index_build_sec": round(build_sec, 3),
                    "files_per_sec": round(n_files / build_sec, 1),
                    "query_p95_sec": p95,
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
