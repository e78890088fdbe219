"""Batch multi-field throughput at amplified scale: multi_match_topk_multi
and bm25f_topk_multi at n=10 and n=100 queries vs the sequential loop at
n=10, over the same content+title store pair as r5b_surface_probe.

Usage:
  SPARK_GRAFT_AMPLIFY=1600 python scripts/multifield_batch_bench.py
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from contextinator_spark.session import get_spark  # noqa: E402

VOCAB = [
    "hash", "join", "spark", "merge", "sort", "table", "scan", "window",
    "stream", "batch", "key", "order", "filter", "group", "query", "data",
    "row", "column", "value", "vector", "small", "big", "fast", "slow",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "1600"))
    tmp = os.environ.get("SPARK_GRAFT_TMPDIR", "/dev/shm")
    out_dir = os.path.join(tmp, "mf_batch_bench")
    shutil.rmtree(out_dir, ignore_errors=True)
    idx_c = os.path.join(out_dir, "index_content")
    idx_t = os.path.join(out_dir, "index_title")
    os.makedirs(idx_c, exist_ok=True)
    os.makedirs(idx_t, exist_ok=True)

    spark = get_spark("mf-batch-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    from contextinator_spark.functions.tokenize import tokens_expr
    from contextinator_spark.operators import segments as S
    from contextinator_spark.operators.multifield import (
        bm25f_topk,
        bm25f_topk_multi,
        multi_match_topk,
        multi_match_topk_multi,
    )

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

    n_docs = amplified(base).count()
    for src, dst in ((base, idx_c), (None, idx_t)):
        b = src if src is not None else base.withColumn(
            "content", F.concat_ws(" ", F.slice(tokens_expr(F.col("content")), 1, 8))
        )
        hints = None
        if amplify > 1:
            hints = S.sampled_heavy_fanout(
                b.repartition(cpus), "doc_id", n_docs=n_docs, df_multiplier=amplify
            )
        S.write_index(spark, amplified(b), dst, id_col="doc_id", heavy_fanout=hints)
    print(f"stores built ({n_docs} docs)", flush=True)

    rng = random.Random(7)
    def qset(n):
        return {
            i: rng.sample(VOCAB, rng.choice([1, 2, 2, 3, 3, 4])) for i in range(n)
        }

    fields = {"content": idx_c, "title": idx_t}
    weights = {"content": 1.0, "title": 2.0}
    res = {"n_docs": n_docs, "cpus": cpus}

    # warm
    multi_match_topk(spark, fields, ["warmup"], k=10).collect()

    q10, q100 = qset(10), qset(100)
    for name, fn in (
        ("mm_batch", lambda qs: multi_match_topk_multi(
            spark, fields, qs, k=10, weights=weights, tie_breaker=0.3)),
        ("bm25f_batch", lambda qs: bm25f_topk_multi(
            spark, fields, qs, k=10, weights=weights)),
    ):
        for label, qs in (("10", q10), ("100", q100)):
            t = time.perf_counter()
            n = len(fn(qs).collect())
            dt = time.perf_counter() - t
            res[f"{name}_{label}"] = round(dt, 2)
            res[f"{name}_{label}_qps"] = round(len(qs) / dt, 2)
            print(f"{name} n={label}: {dt:.2f}s ({len(qs)/dt:.2f} q/s, rows={n})",
                  flush=True)

    # sequential loop baseline at n=10
    for name, fn in (
        ("mm_seq", lambda ts: multi_match_topk(
            spark, fields, ts, k=10, weights=weights, tie_breaker=0.3)),
        ("bm25f_seq", lambda ts: bm25f_topk(
            spark, fields, ts, k=10, weights=weights)),
    ):
        t = time.perf_counter()
        for qid in sorted(q10):
            fn(q10[qid]).collect()
        dt = time.perf_counter() - t
        res[f"{name}_10"] = round(dt, 2)
        res[f"{name}_10_qps"] = round(10 / dt, 2)
        print(f"{name} n=10: {dt:.2f}s ({10/dt:.2f} q/s)", flush=True)

    print(json.dumps(res), flush=True)
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
