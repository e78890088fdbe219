"""spark-submit job: build (or resume) the segment index.

Usage:
  scripts/package.sh
  spark-submit --py-files dist/contextinator_spark.zip jobs/build_index.py \
      --corpus /root/testdata/sf0.1 --index /tmp/idx [--partitions 128]

On a cluster, drop the local master: the same script runs under YARN/K8s —
all parallelism decisions live in the DataFrame plan, not the script.
Re-running after a failure resumes from the per-partition catalog.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="sf_dir with documents.parquet, or a corpus parquet path")
    ap.add_argument("--index", required=True)
    from contextinator_spark.config import INDEX_PARTITIONS

    ap.add_argument("--partitions", type=int, default=INDEX_PARTITIONS)
    ap.add_argument("--epoch", type=int, default=0)
    args = ap.parse_args()

    from contextinator_spark.session import get_spark
    from contextinator_spark.operators.segments import write_index
    from contextinator_spark.entry_queries import _docs

    spark = get_spark("index-build")
    try:
        corpus = _docs(spark, args.corpus)
        res = write_index(
            spark, corpus, args.index, n_partitions=args.partitions, epoch=args.epoch
        )
        print(json.dumps(res))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
