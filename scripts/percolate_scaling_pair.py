"""Two-parallelism scaling pair for the percolation operator.

Percolation is ONE codegen corpus scan with zero exchanges (plan-asserted
in tests/test_percolate.py), so it should scale near-linearly with
cores — this script evidences the north rule's N-vs-4N criterion for the
round-5 operator by running the SAME registered query set over the SAME
amplified corpus at local[N] and local[4N] and reporting throughput at
both plus the efficiency ratio

    eff = (docs/s at 4N) / (docs/s at N) / 4.

The corpus is written to parquet once (tmpfs) so both runs read identical
bytes; each run is a fresh SparkSession pinned to its core count.

Usage:
  SPARK_GRAFT_AMPLIFY=400 SPARK_GRAFT_CORES_LO=8 python scripts/percolate_scaling_pair.py
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

QUERIES = {
    0: "+hash spark", 1: 'table -join "table hash"', 2: '+"table hash" merge',
    3: '"big table"~3 scan', 4: "-spark table", 5: "sca* sort",
    6: "grup~2", 7: '"table s*"', 8: "hash table spark", 9: "+stream +sort",
}


def run(cores: int, corpus_path: str) -> tuple[float, int, int]:
    # the corpus compresses far below the 128 MB default split size, so
    # without this the scan collapses to a handful of input splits and
    # BOTH legs serialize on them (measured: 8 and 32 cores within 10%).
    # On a real cluster the corpus is TBs and splits abound; here the
    # split size must shrink so task count ≫ the larger core count —
    # this is input-format plumbing, not a change to the measured work.
    spark = get_spark(
        f"percolate-pair-{cores}", master=f"local[{cores}]",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(512 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from contextinator_spark.operators.percolate import percolate

    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()  # warm FS cache / JVM before timing
    # warm whole-stage codegen of the (large) fused predicate expression:
    # the first percolate plan pays a one-time janino compile that would
    # otherwise be charged asymmetrically to whichever leg runs first
    percolate(corpus.limit(1000), QUERIES).count()
    t = time.perf_counter()
    matches = percolate(corpus, QUERIES).count()
    wall = time.perf_counter() - t
    spark.stop()
    return wall, n_docs, matches


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "400"))
    lo = int(os.environ.get("SPARK_GRAFT_CORES_LO", "8"))
    hi = 4 * lo
    tmp = os.environ.get("SPARK_GRAFT_TMPDIR", "/dev/shm")
    corpus_path = os.path.join(tmp, "percolate_pair_corpus")
    shutil.rmtree(corpus_path, ignore_errors=True)

    spark = get_spark("percolate-pair-prep", master=f"local[{hi}]")
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumnRenamed("text", "content")
    )
    corpus = (
        base.repartition(4 * hi)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
        .withColumn("doc_id", F.col("doc_id") * amplify + F.col("rep"))
        .drop("rep")
    )
    corpus.write.mode("overwrite").parquet(corpus_path)
    spark.stop()

    def steal() -> float:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:9]]
        return 100.0 * vals[7] / max(1, sum(vals))

    s0 = steal()
    w_hi, n_docs, m_hi = run(hi, corpus_path)
    w_lo, _, m_lo = run(lo, corpus_path)
    assert m_hi == m_lo, (m_hi, m_lo)
    thr_lo, thr_hi = n_docs / w_lo, n_docs / w_hi
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(json.dumps({
        "operator": "percolate", "n_queries": len(QUERIES),
        "n_docs": n_docs, "matches": m_hi,
        "cores_lo": lo, "cores_hi": hi,
        "wall_lo_sec": round(w_lo, 2), "wall_hi_sec": round(w_hi, 2),
        "docs_per_sec_lo": round(thr_lo, 1), "docs_per_sec_hi": round(thr_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "cum_steal_pct_at_start": round(s0, 3),
    }))
    shutil.rmtree(corpus_path, ignore_errors=True)


if __name__ == "__main__":
    main()
