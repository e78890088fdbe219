"""One clock-equalized lo/hi pair for a LARGER query batch (default 100).

Why this exists (round 4): the 10-query pinned protocol became
bandwidth-bound on this VM after the batch-sketch port (BENCH/BASELINE.md
round-4 analysis — per-task cpu-time inflates ~2.4× at 8-way concurrency on
0.4 GB/s-per-core DRAM). The kernel's per-posting *compute* grows with the
number of queries sharing a term (the chunked qid×posting mask), while its
*bytes streamed* stay ~constant — so larger batches raise compute-per-byte
and recover the scaling ratio real clusters would see. A 4N cluster exists
to serve more queries; sustained multi-query throughput is the regime the
north-rule's query-phase criterion cares about at 100 TB.

Queries are generated deterministically from the shared index's term
dictionary (seeded RNG over mid-df terms, 1–4 terms per query), so lo and
hi run the identical workload. Usage:

  SPARK_GRAFT_BATCH_N=100 python scripts/batch100_pair.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
IDX = os.environ.get("SPARK_GRAFT_IDX", "/dev/shm/ctx_profile_idx")


def _run(cpus: int, hi: int, n_queries: int) -> dict:
    import query_scaling_pairs as QSP

    spin = []
    if cpus < hi and os.environ.get("SPARK_GRAFT_EQUALIZE", "1") != "0":
        spin = QSP._spinners(list(range(cpus, hi)))
    try:
        s0, t0 = QSP._steal(), time.perf_counter()
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        cmd = [sys.executable, os.path.join(REPO, "scripts", "batch100_pair.py"),
               "child", str(n_queries)]
        import shutil

        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith('{"child"')]
        if not line:
            raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
        child = json.loads(line[-1])
        s1, t1 = QSP._steal(), time.perf_counter()
        dsteal, dtot = s1[0] - s0[0], s1[1] - s0[1]
        return {
            "total_sec": round(t1 - t0, 3),
            "exec_sec": child["exec_sec"],
            "steal_pct": round(100.0 * dsteal / max(dtot, 1), 2),
        }
    finally:
        for p in spin:
            p.kill()


def child(n_queries: int) -> None:
    from contextinator_spark.session import get_spark
    from contextinator_spark.operators import bm25_segments as B

    spark = get_spark("batch100")
    spark.sparkContext.setLogLevel("ERROR")
    # deterministic queries from the dictionary: mid-df terms, 1-4 per query
    import numpy as np

    terms = [r["term"] for r in
             spark.read.parquet(os.path.join(IDX, "terms")).orderBy(
                 "df", "term").collect()]
    mid = terms[len(terms) // 4: 3 * len(terms) // 4] or terms
    rng = np.random.RandomState(42)
    queries = {
        qid: [mid[i] for i in rng.choice(len(mid), size=1 + qid % 4, replace=False)]
        for qid in range(n_queries)
    }
    B.topk_segments(spark, IDX, ["warmup"], k=10).collect()  # worker init
    t0 = time.perf_counter()
    rows = B.topk_segments_multi(spark, IDX, queries, k=10).collect()
    t1 = time.perf_counter()
    print(json.dumps({"child": True, "exec_sec": round(t1 - t0, 3),
                      "rows": len(rows)}))
    spark.stop()


def main() -> None:
    sys.path.insert(0, REPO)
    n = int(os.environ.get("SPARK_GRAFT_BATCH_N", "100"))
    lo = int(os.environ.get("SPARK_GRAFT_LO", "2"))
    hi = int(os.environ.get("SPARK_GRAFT_HI", "8"))
    r_hi = _run(hi, hi, n)
    r_lo = _run(lo, hi, n)
    eff = (r_lo["exec_sec"] / r_hi["exec_sec"]) / (hi / lo)
    out = {"n_queries": n, "lo": r_lo, "hi": r_hi, "eff": round(eff, 3),
           "lo_qps": round(n / r_lo["exec_sec"], 2),
           "hi_qps": round(n / r_hi["exec_sec"], 2)}
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n**{n}-query batch pair (clock-equalized lo, shared index):** "
            f"lo {r_lo['exec_sec']} s ({out['lo_qps']} q/s, steal "
            f"{r_lo['steal_pct']}%), hi {r_hi['exec_sec']} s ({out['hi_qps']} "
            f"q/s, steal {r_hi['steal_pct']}%) → efficiency **{out['eff']}** "
            f"of {hi//lo}×.\n"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        sys.path.insert(0, REPO)
        child(int(sys.argv[2]))
    else:
        main()
