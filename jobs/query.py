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
    ap.add_argument(
        "--mode", choices=["any", "all"], default="any",
        help="any = disjunctive BM25 (default); all = conjunctive (MUST)",
    )
    args = ap.parse_args()

    from contextinator_spark.operators.alias import resolve_index

    args.index = resolve_index(args.index)  # --index accepts an alias

    from contextinator_spark.session import get_spark
    from contextinator_spark.operators.bm25_segments import (
        expand_wildcard,
        topk_segments,
        topk_segments_conjunctive,
    )
    from contextinator_spark.oracle import tokenize

    spark = get_spark("bm25-query")
    try:
        terms: list[str] = []
        for word in args.query.split():  # `*` words expand via the dictionary
            if "*" in word:
                terms.extend(expand_wildcard(spark, args.index, word.lower()))
            else:
                terms.extend(tokenize(word))
        if args.mode == "all":
            rows = topk_segments_conjunctive(
                spark, args.index, terms, k=args.k
            ).collect()
        else:
            rows = topk_segments(
                spark, args.index, terms, k=args.k, prune=not args.no_prune
            ).collect()
        for r in rows:
            print(json.dumps({"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
