"""Per-phase build profiler: where does index-build wall time go?

NOTE: profiles the LEGACY (pre-fusion) topology's phases in isolation —
kept for A/B against the fused default, whose phase timings write_index
itself now reports (result["phases"], surfaced by bench.py as
build_phases). For the fused path just read the bench JSON.
Usage: SPARK_GRAFT_CPUS=4 SPARK_GRAFT_AMPLIFY=100 python scripts/profile_build.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_LEVEL = getattr(StorageLevel, os.environ.get("PDL_LEVEL", "MEMORY_AND_DISK"))

from contextinator_spark.entry_queries import _docs
from contextinator_spark.functions.tokenize import termfreq_udf
from contextinator_spark.operators import segments as S
from contextinator_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "100"))
    out = "/dev/shm/profile_index"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    spark = get_spark("profile-build")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _docs(spark, sf_dir)
    if amplify > 1:
        corpus = (
            corpus.repartition(4 * cpus)
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
            .withColumn("doc_id", F.col("doc_id") * amplify + F.col("rep"))
            .drop("rep")
        )
    n = corpus.count()

    t = {}

    t0 = time.perf_counter()
    enriched = (
        corpus.withColumn("_tf", termfreq_udf(F.col("content")))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .select(
            F.col("doc_id"),
            "content_sha256",
            F.col("_tf.dl").alias("dl"),
            F.col("_tf.terms").alias("terms"),
            F.col("_tf.tfs").alias("tfs"),
        )
        .persist(_LEVEL)
    )
    enriched.count()
    t["tokenize_persist"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    enriched.select("doc_id", F.col("dl").alias("doc_len"), "content_sha256").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "doc_meta"))
    t["doc_meta_write"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pdl = (
        enriched.select("doc_id", "dl", F.explode(F.arrays_zip("terms", "tfs")).alias("p"))
        .select("doc_id", "dl", F.col("p.terms").alias("term"), F.col("p.tfs").alias("tf"))
    )
    if os.environ.get("PERSIST_PDL") == "1":
        pdl = pdl.persist(_LEVEL)
    tdict = S.term_dictionary(pdl).persist()
    tdict.repartition(32, "partition_id").write.mode("overwrite").partitionBy(
        "partition_id"
    ).parquet(os.path.join(out, "terms"))
    t["dictionary"] = time.perf_counter() - t0

    # doc_id = orig_id*amplify + rep < n + amplify (NOT n*amplify: that
    # estimate collapsed every range slice to 0 — no salting at all)
    stats = {"n_docs": n, "max_doc_id": n + amplify}
    t0 = time.perf_counter()
    if os.environ.get("SPARK_GRAFT_SLICE_IMPL", "combine") == "combine":
        slices = S.build_slices_combine(enriched, tdict, stats["n_docs"], stats["max_doc_id"])
    else:
        slices = S.build_slices(pdl, tdict, stats["n_docs"], stats["max_doc_id"])
    if os.environ.get("PROFILE_SLICES") == "count":
        # force blob + block_max computation (count() would column-prune
        # the encode UDF away) without the repartition+write tail
        slices.agg(
            F.sum(F.length("blob")), F.sum(F.size("block_max"))
        ).collect()
    else:
        slices.repartition(32, "partition_id").write.mode("overwrite").partitionBy(
            "partition_id"
        ).parquet(os.path.join(out, "segments"))
    t["slices"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if os.environ.get("PROFILE_SLICES") == "count":
        print(json.dumps({"cpus": cpus, "n_files": n, **{k: round(v, 2) for k, v in t.items()}}))
        spark.stop()
        return
    seg = spark.read.parquet(os.path.join(out, "segments"))
    seg.groupBy("partition_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.sum("df_slice").alias("n_postings"),
        F.sum(F.length("blob")).alias("bytes"),
    ).collect()
    t["catalog"] = time.perf_counter() - t0

    total = sum(t.values())
    print(json.dumps({"cpus": cpus, "n_files": n, "total": round(total, 2),
                      **{k: round(v, 2) for k, v in t.items()},
                      "files_per_sec": round(n / total, 1)}))
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
