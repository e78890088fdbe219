"""Phrase/NEAR batch-throughput measurement (round-3 VERDICT item 8).

Builds ONE positions index (posting_format=2) over the sf corpus via the
unified segment store, then answers a mixed phrase/NEAR batch through
`positional_topk_indexed_multi` at two batch sizes (default 10 and 1000)
— the positional twin of bench.py's SPARK_GRAFT_NQUERIES experiment. The
amortization story is the same: one partition-pruned scan decodes every
needed term ONCE regardless of how many queries reference it, so q/s
should rise superlinearly with batch size until decode saturates.

Prints one JSON line per batch size:
  {"n_queries": N, "batch_sec": s, "queries_per_sec": qps, ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_PHRASE_SIZES (default "10,1000").
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
from contextinator_spark.operators.phrase import (  # noqa: E402
    positional_topk_indexed_multi,
)
from contextinator_spark.session import get_spark  # noqa: E402

# bigrams/trigrams that actually occur in the synthetic code corpus so the
# batch is non-vacuous (some queries must match and rank); every 5th query
# is a NEAR with window 3
_VOCAB = [
    "table", "hash", "scan", "key", "order", "sort", "part", "window",
    "stream", "batch", "index", "merge", "join", "group", "filter", "map",
]


def _phrase_queries(n: int) -> dict[int, tuple[list[str], int | None]]:
    out: dict[int, tuple[list[str], int | None]] = {}
    for i in range(n):
        k = 2 + (i % 2)
        terms = [_VOCAB[(i * 7 + j * 3) % len(_VOCAB)] for j in range(k)]
        window = 3 if i % 5 == 4 else None
        out[i + 1] = (terms, window)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sizes = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_PHRASE_SIZES", "10,1000").split(",")
    ]
    out_dir = (
        "/dev/shm/phrase_batch_bench"
        if os.path.isdir("/dev/shm")
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_tmp_phrase",
        )
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    index_dir = os.path.join(out_dir, "index")

    spark = get_spark("phrase-batch-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        corpus = _docs(spark, sf_dir)
        n_files = corpus.count()
        t0 = time.perf_counter()
        S.write_index(spark, corpus, index_dir, id_col="doc_id", positions=True)
        build_sec = time.perf_counter() - t0

        # warm-up (Python-worker spawn + broadcast init) before timing
        positional_topk_indexed_multi(
            spark, index_dir, {1: (["warmup", "noop"], None)}, k=10
        ).collect()

        for n in sizes:
            queries = _phrase_queries(n)
            tb = time.perf_counter()
            rows = positional_topk_indexed_multi(
                spark, index_dir, queries, k=10
            ).collect()
            sec = time.perf_counter() - tb
            print(
                json.dumps(
                    {
                        "n_queries": n,
                        "batch_sec": round(sec, 3),
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
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
