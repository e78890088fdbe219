"""Boolean batch-throughput measurement (round-5 VERDICT item 5).

Builds ONE positions index over the sf corpus, then answers a
query-log-shaped Boolean batch through `boolean_topk_multi` at two batch
sizes (default 10 and 100), plus the same batch as a sequential
per-query `boolean_topk` loop at the small size — the amortization
comparison (one dictionary probe / one pruned scan / one fold exchange
for the whole batch vs one plan per query).

Prints one JSON line per measurement:
  {"mode": "batch"|"sequential", "n_queries": N, "sec": s,
   "queries_per_sec": qps, ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BOOL_SIZES (default "10,100").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextinator_spark.entry_queries import _docs  # noqa: E402
from contextinator_spark.operators import segments as S  # noqa: E402
from contextinator_spark.operators.boolean import (  # noqa: E402
    boolean_topk_multi,
    boolean_topk_query,
)
from contextinator_spark.session import get_spark  # noqa: E402

_VOCAB = [
    "table", "hash", "scan", "key", "order", "sort", "part", "window",
    "stream", "batch", "index", "merge", "join", "group", "filter", "map",
]
# query-log-shaped templates: plain disjunctions, MUST conjunctions,
# exclusions, phrases, NEAR, boosts — cycled deterministically
_SHAPES = [
    "{a} {b}",
    "+{a} {b}",
    "{a} -{b} {c}",
    '"{a} {b}"',
    '"{a} {b}"~3 {c}',
    "+{a} {b}^2",
    "+{a} +{b}",
    '{a} "{b} {c}"',
]


def _boolean_queries(n: int) -> dict[int, str]:
    out: dict[int, str] = {}
    for i in range(n):
        a = _VOCAB[(i * 7) % len(_VOCAB)]
        b = _VOCAB[(i * 7 + 3) % len(_VOCAB)]
        c = _VOCAB[(i * 7 + 5) % len(_VOCAB)]
        out[i] = _SHAPES[i % len(_SHAPES)].format(a=a, b=b, c=c)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sizes = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_BOOL_SIZES", "10,100").split(",")
    ]
    out_dir = (
        "/dev/shm/boolean_batch_bench"
        if os.path.isdir("/dev/shm")
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_tmp_bool",
        )
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    index_dir = os.path.join(out_dir, "index")

    spark = get_spark("boolean-batch-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        corpus = _docs(spark, sf_dir)
        n_files = corpus.count()
        t0 = time.perf_counter()
        S.write_index(spark, corpus, index_dir, id_col="doc_id", positions=True)
        build_sec = time.perf_counter() - t0
        # warm-up must reach the scan kernel (an all-unindexed query
        # short-circuits before any job) — use a real corpus term
        boolean_topk_multi(spark, index_dir, {0: "table"}, k=10).collect()

        for n in sizes:
            queries = _boolean_queries(n)
            tb = time.perf_counter()
            rows = boolean_topk_multi(spark, index_dir, queries, k=10).collect()
            sec = time.perf_counter() - tb
            print(
                json.dumps(
                    {
                        "mode": "batch",
                        "n_queries": n,
                        "sec": round(sec, 3),
                        "queries_per_sec": round(n / sec, 2),
                        "result_rows": len(rows),
                        "n_files": n_files,
                        "index_build_sec": round(build_sec, 2),
                        "sf": sf_dir,
                        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                    }
                ),
                flush=True,
            )

        # sequential baseline at the smallest size (the latency path ×N)
        n = sizes[0]
        queries = _boolean_queries(n)
        tb = time.perf_counter()
        total_rows = 0
        for q in queries.values():
            total_rows += len(boolean_topk_query(spark, index_dir, q, k=10).collect())
        sec = time.perf_counter() - tb
        print(
            json.dumps(
                {
                    "mode": "sequential",
                    "n_queries": n,
                    "sec": round(sec, 3),
                    "queries_per_sec": round(n / sec, 2),
                    "result_rows": total_rows,
                }
            ),
            flush=True,
        )
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
