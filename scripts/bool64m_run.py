"""Boolean-batch leg of the 64M-doc positions-store probe, standalone.

Reuses the store pos64m_probe.py built (SPARK_GRAFT_IDX, default
/dev/shm/pos64m_idx) and runs ONLY the Boolean batch executor at the
given sizes with the stream bound — the round-5 safety valve for the
100-query fold that exceeded single-node RAM unbounded (see
BENCH/BASELINE.md round 5). Run it ALONE: concurrent Spark sessions on
this box have twice pushed the global memory over the OOM killer's line
during this leg.

Env: SPARK_GRAFT_BOOL_SIZES (default "100"),
     SPARK_GRAFT_BOOL_MAX_ROWS (default 900_000_000 ≈ the known-safe
     10-query batch's dictionary-estimated partial rows at this store),
     SPARK_GRAFT_DRIVER_MEM (default 64g), SPARK_GRAFT_IDX.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

from contextinator_spark.session import get_spark  # noqa: E402
from pos64m_probe import IDX, MemPeak  # noqa: E402


def main() -> None:
    from boolean_batch_bench import _boolean_queries

    from contextinator_spark.operators.boolean import boolean_topk_multi

    spark = get_spark("bool64m")
    spark.sparkContext.setLogLevel("ERROR")
    mem = MemPeak()
    mem.start()
    bound = int(os.environ.get("SPARK_GRAFT_BOOL_MAX_ROWS", "900000000"))
    for nq in (
        int(x) for x in os.environ.get("SPARK_GRAFT_BOOL_SIZES", "100").split(",")
    ):
        t0 = time.perf_counter()
        rows = boolean_topk_multi(
            spark, IDX, _boolean_queries(nq), k=10, max_partial_rows=bound
        ).collect()
        sec = time.perf_counter() - t0
        print(json.dumps({
            "phase": "boolean_batch_bounded", "n_queries": nq,
            "sec": round(sec, 2), "queries_per_sec": round(nq / sec, 2),
            "rows": len(rows), "max_partial_rows": bound,
            "peak_mem_gb": mem.peak_gb,
        }), flush=True)
    print(json.dumps({"phase": "done", "peak_mem_gb": mem.stop()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
