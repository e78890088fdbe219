"""spark-submit job: BM25 top-k query against a built segment index.

Usage:
  spark-submit --py-files dist/contextinator_spark.zip jobs/query.py \
      --index /tmp/idx --query "auth token parse" [--k 10] [--no-prune]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, help="free text; tokenized with the engine policy")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-prune", action="store_true")
    args = ap.parse_args()

    from contextinator_spark.session import get_spark
    from contextinator_spark.operators.bm25_segments import topk_segments
    from contextinator_spark.oracle import tokenize

    spark = get_spark("bm25-query")
    try:
        terms = tokenize(args.query)
        rows = topk_segments(
            spark, args.index, terms, k=args.k, prune=not args.no_prune
        ).collect()
        for r in rows:
            print(json.dumps({"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
