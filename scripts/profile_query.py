"""Diagnose batch-query scaling: build ONE amplified index, then time the
batch executor's phases at a given core count (pin externally via taskset).

  SPARK_GRAFT_CPUS=8 taskset -c 0-7 python scripts/profile_query.py build
  SPARK_GRAFT_CPUS=8 taskset -c 0-7 python scripts/profile_query.py query
  SPARK_GRAFT_CPUS=2 taskset -c 0-1 python scripts/profile_query.py query

`build` writes the amplified index to /dev/shm/ctx_profile_idx (reused by
every subsequent `query` run); `query` prints per-phase wall seconds:
probe (dictionary), theta (should be ~0 with impact metadata), plan
(DataFrame construction), exec (job run), per repeat.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextinator_spark.session import get_spark  # noqa: E402

IDX = os.environ.get("SPARK_GRAFT_IDX", "/dev/shm/ctx_profile_idx")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "1600"))


def build() -> None:
    import shutil

    from pyspark.sql import functions as F

    from contextinator_spark.entry_queries import _docs
    from contextinator_spark.operators import segments as S

    spark = get_spark("profile-build")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    shutil.rmtree(IDX, ignore_errors=True)
    base = _docs(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    corpus = (
        base.repartition(4 * cpus)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(AMPLIFY - 1))))
        .withColumn("doc_id", F.col("doc_id") * AMPLIFY + F.col("rep"))
        .drop("rep")
    )
    n = corpus.count()
    hints = S.sampled_heavy_fanout(
        base.repartition(cpus), "doc_id", n_docs=n, df_multiplier=AMPLIFY
    )
    t0 = time.perf_counter()
    res = S.write_index(spark, corpus, IDX, id_col="doc_id", heavy_fanout=hints)
    print(json.dumps({"n": n, "build_sec": round(time.perf_counter() - t0, 2),
                      "phases": res.get("phases")}))
    spark.stop()


def query() -> None:
    from contextinator_spark.operators import bm25_segments as B
    from contextinator_spark.entry_queries import BM25_QUERIES

    queries = {
        **BM25_QUERIES,
        6: ["scan", "table"], 7: ["dup", "small"], 8: ["fast", "key", "order", "sort"],
        9: ["part", "window", "stream"], 10: ["batch"],
    }
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    B.topk_segments(spark, IDX, ["warmup"], k=10).collect()  # worker init

    for rep in range(int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))):
        stats = B.load_stats(IDX)
        n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
        t0 = time.perf_counter()
        all_terms = sorted({t for ts in queries.values() for t in ts})
        info = B.probe_dictionary(spark, IDX, all_terms)
        t_probe = time.perf_counter()
        idf = {t: B._idf(float(info[t]["df"]), n) for t in info}
        thetas = B._batch_thetas(spark, IDX, queries, info, idf, 10, 1.2, 0.75, avgdl, stats)
        t_theta = time.perf_counter()
        df = B.topk_segments_multi(spark, IDX, queries, k=10)
        t_plan = time.perf_counter()
        rows = df.collect()
        t_exec = time.perf_counter()
        print(json.dumps({
            "rep": rep,
            "probe_sec": round(t_probe - t0, 3),
            "theta_sec": round(t_theta - t_probe, 3),
            "plan_sec": round(t_plan - t_theta, 3),
            "exec_sec": round(t_exec - t_plan, 3),
            "total_sec": round(t_exec - t0, 3),
            "rows": len(rows),
            "thetas_nonzero": sum(1 for v in thetas.values() if v > 0),
        }))
    spark.stop()


def posbuild() -> None:
    """Amplified POSITIONS index (posting_format=2) for positional-scaling
    pairs — same corpus amplification as `build`, positions=True."""
    import shutil

    from pyspark.sql import functions as F

    from contextinator_spark.entry_queries import _docs
    from contextinator_spark.operators import segments as S

    spark = get_spark("profile-posbuild")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    shutil.rmtree(IDX, ignore_errors=True)
    base = _docs(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    corpus = (
        base.repartition(4 * cpus)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(AMPLIFY - 1))))
        .withColumn("doc_id", F.col("doc_id") * AMPLIFY + F.col("rep"))
        .drop("rep")
    )
    n = corpus.count()
    hints = S.sampled_heavy_fanout(
        base.repartition(cpus), "doc_id", n_docs=n, df_multiplier=AMPLIFY
    )
    t0 = time.perf_counter()
    res = S.write_index(
        spark, corpus, IDX, id_col="doc_id", heavy_fanout=hints, positions=True
    )
    print(json.dumps({"n": n, "build_sec": round(time.perf_counter() - t0, 2),
                      "phases": res.get("phases")}))
    spark.stop()


def posquery() -> None:
    """Positional batch executor at SPARK_GRAFT_NQUERIES (default 100)
    mixed phrase/NEAR queries over the shared positions index — the
    positional twin of `query` for the pair protocol."""
    from contextinator_spark.operators.phrase import positional_topk_indexed_multi

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from phrase_batch_bench import _phrase_queries

    nq = int(os.environ.get("SPARK_GRAFT_NQUERIES", "100"))
    queries = _phrase_queries(nq)
    extra = (
        {"spark.ui.enabled": "true"}
        if os.environ.get("SPARK_GRAFT_STAGE_METRICS") == "1"
        else None
    )
    spark = get_spark("profile-posquery", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    positional_topk_indexed_multi(spark, IDX, {0: (["warmup"], None)}).collect()

    for rep in range(int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))):
        t0 = time.perf_counter()
        df = positional_topk_indexed_multi(spark, IDX, queries, k=10)
        t_plan = time.perf_counter()
        rows = df.collect()
        t_exec = time.perf_counter()
        print(json.dumps({
            "rep": rep,
            "plan_sec": round(t_plan - t0, 3),
            "exec_sec": round(t_exec - t_plan, 3),
            "total_sec": round(t_exec - t0, 3),
            "rows": len(rows),
            "n_queries": nq,
        }))
    if os.environ.get("SPARK_GRAFT_STAGE_METRICS") == "1":
        # stage-level accounting via the local UI REST API: per-stage cpu
        # vs wall lets an 8-vs-32-core pair attribute efficiency loss to
        # per-core cpu-time inflation (DRAM contention) vs skew/serialism
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
            app = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = json.load(r)
        big = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:6]
        for s in big:
            print(json.dumps({
                "stage": s["stageId"],
                "name": s.get("name", "")[:60],
                "tasks": s.get("numCompleteTasks"),
                "run_ms": s.get("executorRunTime"),
                "cpu_ms": int(s.get("executorCpuTime", 0) / 1e6),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            }))
    spark.stop()


def mfbuild() -> None:
    """Amplified multi-field store pair (content at IDX, derived title
    field at IDX_title) for multi-field batch scaling pairs."""
    import shutil

    from pyspark.sql import functions as F

    from contextinator_spark.entry_queries import _docs
    from contextinator_spark.functions.tokenize import tokens_expr
    from contextinator_spark.operators import segments as S

    spark = get_spark("profile-mfbuild")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    base = _docs(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    out = {}
    for dst, src in (
        (IDX, base),
        (IDX + "_title", base.withColumn(
            "content",
            F.concat_ws(" ", F.slice(tokens_expr(F.col("content")), 1, 8)),
        )),
    ):
        shutil.rmtree(dst, ignore_errors=True)
        corpus = (
            src.repartition(4 * cpus)
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(AMPLIFY - 1))))
            .withColumn("doc_id", F.col("doc_id") * AMPLIFY + F.col("rep"))
            .drop("rep")
        )
        n = corpus.count()
        hints = S.sampled_heavy_fanout(
            src.repartition(cpus), "doc_id", n_docs=n, df_multiplier=AMPLIFY
        )
        t0 = time.perf_counter()
        S.write_index(spark, corpus, dst, id_col="doc_id", heavy_fanout=hints)
        out[dst] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"builds": out}))
    spark.stop()


def mfquery() -> None:
    """Batch BM25F (the most multi-field-specific executor) at
    SPARK_GRAFT_NQUERIES (default 200) seeded random queries over the
    shared content+title store pair — the multi-field twin of `query`
    for the pair protocol."""
    import random

    from contextinator_spark.operators.multifield import (
        bm25f_topk_multi,
        multi_match_topk,
    )

    vocab = [
        "hash", "join", "spark", "merge", "sort", "table", "scan", "window",
        "stream", "batch", "key", "order", "filter", "group", "query", "data",
        "row", "column", "value", "vector", "small", "big", "fast", "slow",
    ]
    nq = int(os.environ.get("SPARK_GRAFT_NQUERIES", "200"))
    rng = random.Random(7)
    queries = {
        i: rng.sample(vocab, rng.choice([1, 2, 2, 3, 3, 4])) for i in range(nq)
    }
    fields = {"content": IDX, "title": IDX + "_title"}
    weights = {"content": 1.0, "title": 2.0}
    spark = get_spark("profile-mfquery")
    spark.sparkContext.setLogLevel("ERROR")
    multi_match_topk(spark, fields, ["warmup"], k=10).collect()
    for rep in range(int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))):
        t0 = time.perf_counter()
        rows = bm25f_topk_multi(
            spark, fields, queries, k=10, weights=weights
        ).collect()
        print(json.dumps({
            "rep": rep,
            "total_sec": round(time.perf_counter() - t0, 3),
            "rows": len(rows),
        }))
    spark.stop()


if __name__ == "__main__":
    {"build": build, "query": query, "posbuild": posbuild,
     "posquery": posquery, "mfbuild": mfbuild, "mfquery": mfquery}[
        sys.argv[1]
    ]()
