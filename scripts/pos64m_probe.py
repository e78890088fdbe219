"""64M-doc POSITIONS-store probe (round-5 VERDICT item 6) — mirror of the
round-4 64M BM25 evidence for posting_format=2: one amplify=12800 build
(5000 base files × 12800 ≈ 64M docs, ≈128 GB logical text) with phase
timings and peak memory sampling, then phrase / NEAR / Boolean batch
queries over the built store.

The store itself is tiny (replica-heavy synthetic corpus + zstd: 0.08 GB
measured at 64M docs) so /dev/shm holds it fine; the memory risk is the
BUILD's collect_list agg state and the Boolean fold's partial stream —
run with SPARK_GRAFT_DRIVER_MEM=64g (the documented heap for the 64M
shape; the default 8g heap GCLocker-thrashes in the slice merge).

Env: SPARK_GRAFT_AMPLIFY (default 12800), SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_IDX (default /dev/shm/pos64m_idx),
     SPARK_GRAFT_BOOL_SIZES batch sizes for the Boolean leg (default
     "10" — see BENCH/BASELINE.md round 5: the unpruned Boolean fold at
     100 queries × 64M docs exceeds single-node RAM by design; θ is
     unsound under occur constraints, so Boolean batches at this scale
     split across nodes, which is exactly what a cluster does),
     SPARK_GRAFT_SKIP_BUILD=1 to reuse an existing store.

Prints one JSON line per phase; deletes nothing (rerun queries cheaply).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from contextinator_spark.session import get_spark  # noqa: E402

IDX = os.environ.get("SPARK_GRAFT_IDX", "/dev/shm/pos64m_idx")
AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "12800"))


class MemPeak(threading.Thread):
    """Samples system memory use (total - available) once a second; the
    peak approximates the probe's high-water mark on an otherwise idle
    box (same method as the round-4 64M run)."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.peak_gb = 0.0
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            with open("/proc/meminfo") as f:
                mi = {l.split(":")[0]: int(l.split()[1]) for l in f}
            used = (mi["MemTotal"] - mi["MemAvailable"]) / (1024 * 1024)
            self.peak_gb = max(self.peak_gb, used)
            self._stop.wait(1.0)

    def stop(self) -> float:
        self._stop.set()
        return round(self.peak_gb, 1)


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from contextinator_spark.entry_queries import _docs
    from contextinator_spark.operators import segments as S
    from contextinator_spark.operators.boolean import boolean_topk_multi
    from contextinator_spark.operators.phrase import positional_topk_indexed_multi
    from phrase_batch_bench import _phrase_queries
    from boolean_batch_bench import _boolean_queries

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pos64m-probe")
    spark.sparkContext.setLogLevel("ERROR")
    mem = MemPeak()
    mem.start()

    if os.environ.get("SPARK_GRAFT_SKIP_BUILD") != "1":
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
        build_sec = time.perf_counter() - t0
        store_gb = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(IDX)
            for f in fs
        ) / (1 << 30)
        print(json.dumps({
            "phase": "build", "n_docs": n, "build_sec": round(build_sec, 1),
            "files_per_sec": round(n / build_sec, 1),
            "phases": res.get("phases"), "store_gb": round(store_gb, 2),
            "peak_mem_gb": mem.peak_gb,
        }), flush=True)

    # warm-up then timed positional batch (mixed phrase/NEAR) at 2 sizes
    positional_topk_indexed_multi(spark, IDX, {0: (["table"], None)}, k=10).collect()
    for nq in (10, 100):
        t0 = time.perf_counter()
        rows = positional_topk_indexed_multi(
            spark, IDX, _phrase_queries(nq), k=10
        ).collect()
        sec = time.perf_counter() - t0
        print(json.dumps({
            "phase": "positional_batch", "n_queries": nq,
            "sec": round(sec, 2), "queries_per_sec": round(nq / sec, 2),
            "rows": len(rows), "peak_mem_gb": mem.peak_gb,
        }), flush=True)

    bool_sizes = [
        int(x) for x in os.environ.get("SPARK_GRAFT_BOOL_SIZES", "10").split(",")
    ]
    # stream bound (rows): with it set, boolean_topk_multi sub-batches so
    # the unpruned fold never exceeds single-node RAM — the safety valve
    # for the 100-query OOM recorded in BENCH/BASELINE.md round 5. 0 = off.
    bound = int(os.environ.get("SPARK_GRAFT_BOOL_MAX_ROWS", "0")) or None
    for nq in bool_sizes:
        t0 = time.perf_counter()
        rows = boolean_topk_multi(
            spark, IDX, _boolean_queries(nq), k=10, max_partial_rows=bound
        ).collect()
        sec = time.perf_counter() - t0
        print(json.dumps({
            "phase": "boolean_batch", "n_queries": nq,
            "sec": round(sec, 2), "queries_per_sec": round(nq / sec, 2),
            "rows": len(rows), "max_partial_rows": bound,
            "peak_mem_gb": mem.peak_gb,
        }), flush=True)

    print(json.dumps({"phase": "done", "peak_mem_gb": mem.stop()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
