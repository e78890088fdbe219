"""Amplified-scale probe of the round-5 query surface.

Builds a positions-carrying store from the sf0.1 corpus amplified A×
(same born-distributed replication recipe as new_surface_probe.py), then
times one query from every family added in round 5: ordered span-near,
multiphrase / phrase-prefix (single plan), Boolean with a phrase-prefix
clause, a mixed positional batch (phrase + NEAR + span-near + slot
alternatives in ONE plan), and did-you-mean suggestions (dictionary-only).
Records that the new kernels keep the probe-then-pruned-scan shape as the
corpus grows 1600×.

Usage:
  SPARK_GRAFT_AMPLIFY=1600 SPARK_GRAFT_TMPDIR=/dev/shm python scripts/r5_surface_probe.py
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "1600"))
    tmp = os.environ.get("SPARK_GRAFT_TMPDIR", "/dev/shm")
    out_dir = os.path.join(tmp, "r5_surface_probe")
    shutil.rmtree(out_dir, ignore_errors=True)
    idx = os.path.join(out_dir, "index")
    os.makedirs(idx, exist_ok=True)

    spark = get_spark("r5-surface-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    from contextinator_spark.operators import bm25_segments as BS
    from contextinator_spark.operators import segments as S
    from contextinator_spark.operators.boolean import (
        boolean_topk_multi,
        boolean_topk_query,
    )
    from contextinator_spark.operators.phrase import (
        phrase_prefix_topk_indexed,
        phrase_topk_indexed,
        positional_topk_indexed_multi,
        spannear_topk_indexed,
    )

    base = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumnRenamed("text", "content")
    )
    corpus = base
    if amplify > 1:
        corpus = (
            base.repartition(4 * cpus)
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
            .withColumn("doc_id", F.col("doc_id") * amplify + F.col("rep"))
            .drop("rep")
        )
    n_docs = corpus.count()

    hints = None
    t0 = time.perf_counter()
    if amplify > 1:
        hints = S.sampled_heavy_fanout(
            base.repartition(cpus), "doc_id", n_docs=n_docs, df_multiplier=amplify
        )
    S.write_index(spark, corpus, idx, id_col="doc_id",
                  heavy_fanout=hints, positions=True)
    build_sec = round(time.perf_counter() - t0, 1)

    BS.topk_segments(spark, idx, ["warmup"], k=10).collect()  # worker init

    res: dict[str, float] = {}

    def timed(name, fn):
        t = time.perf_counter()
        rows = fn().collect()
        res[name] = round(time.perf_counter() - t, 3)
        print(f"{name:>28}: {res[name]:7.3f}s  rows={len(rows)}", flush=True)
        return rows

    timed("phrase_indexed", lambda: phrase_topk_indexed(
        spark, idx, ["table", "hash"], k=10))
    timed("spannear_slop2", lambda: spannear_topk_indexed(
        spark, idx, ["table", "hash"], 2, k=10))
    timed("phrase_prefix_s", lambda: phrase_prefix_topk_indexed(
        spark, idx, ["table"], "s", k=10))
    timed("bool_phrase_prefix", lambda: boolean_topk_query(
        spark, idx, '+"table s*" hash', k=10))
    # mixed positional batch: 10 specs across every positional family,
    # ONE plan (decode-once fan-out); slot alternatives included
    mixed = {
        1: (["table", "hash"], None),
        2: (["hash", "table"], None),
        3: (["table", "hash"], 3),
        4: (["hash", "table"], 2, True),
        5: (["table", "hash"], 2, True),
        6: (["table", ["small", "scan", "slow", "stream", "sort", "spark"]], None),
        7: (["big", "table"], None),
        8: (["merge", "join"], 4),
        9: ([["big", "small"], "table"], None),
        10: (["data", "stream"], 2, True),
    }
    timed("positional_batch_10", lambda: positional_topk_indexed_multi(
        spark, idx, mixed, k=10))
    timed("boolean_batch_10pp", lambda: boolean_topk_multi(
        spark, idx, {
            i: q for i, q in enumerate([
                '+"table s*" hash', 'table -"table s*"', '+hash spark',
                '"big t*" join', 'merge "data s*"', '+join -spark hash',
                '"table hash" big', 'hash lang:en', 'small "scan t*"',
                'stream sort^2',
            ])
        }, k=10))
    timed("suggest_grup", lambda: BS.suggest_terms(spark, idx, "grup", k=5))
    from contextinator_spark.operators.boolean import boosting_topk, rescore_topk
    from contextinator_spark.operators.percolate import percolate

    timed("boosting", lambda: boosting_topk(
        spark, idx, "hash spark", 'join "table hash"', 0.3, k=10))
    timed("rescore_w50", lambda: rescore_topk(
        spark, idx, "hash table", '"table hash"',
        window_size=50, rescore_weight=2.0, k=10))
    # percolation scans the CORPUS (no index): 10 registered queries over
    # all 8M docs in one codegen pass; count() to avoid a driver collect
    t = time.perf_counter()
    n_matches = percolate(corpus, {
        0: "+hash spark", 1: 'table -join "table hash"', 2: '+"table hash" merge',
        3: '"big table"~3 scan', 4: "-spark table", 5: "sca* sort",
        6: "grup~2", 7: '"table s*"', 8: "hash table spark", 9: "+stream +sort",
    }).count()
    res["percolate_10q_corpus"] = round(time.perf_counter() - t, 3)
    print(f"{'percolate_10q_corpus':>28}: {res['percolate_10q_corpus']:7.3f}s  "
          f"matches={n_matches}", flush=True)

    print(json.dumps({
        "amplify": amplify, "n_docs": n_docs, "cpus": cpus,
        "build_sec": build_sec, "queries": res,
    }))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
