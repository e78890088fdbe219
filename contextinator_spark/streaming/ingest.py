"""Incremental index maintenance via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.9) and the north_rule asks
for RESUMABLE BATCH, which segments.write_index provides. This module adds
the idiomatic Spark form for continuous corpus growth: a file-source stream
with Trigger.AvailableNow (drain-everything-then-stop — exactly-once over
whatever landed since the last run) whose foreachBatch writes DELTA
segments into the same store layout, tagged by ingest epoch.

Query-side, readers see base + delta slices of a term transparently: the
executor already unions all slice rows per term (slice ranges may overlap
across epochs — scoring sums per doc_id, and re-ingesting the same doc_id
is forbidden by contract, same as the batch path). compact_segments folds
deltas back into one slice per term.

Each micro-batch also appends its rows to doc_meta/ and merge-updates
stats.json (n_docs / total_terms / max_doc_id additive, avgdl derived), so
BM25 idf/avgdl after a delta are IDENTICAL to a fresh full-corpus rebuild
(rank-identical top-k, pinned by test_incremental_ingest_matches_batch) and
doc-meta enrichment sees streamed docs. The stats write is atomic
(tmp + os.replace, the reference's own pattern embedding_service.py:620-633).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import INDEX_PARTITIONS
from ..operators.segments import build_slices, term_dictionary
from .. import schemas


def start_incremental_ingest(
    spark: SparkSession,
    corpus_stream_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    n_partitions: int = INDEX_PARTITIONS,
):
    """Stream parquet corpus drops from corpus_stream_dir into the index.

    Returns the StreamingQuery (AvailableNow: terminates when drained).
    Requires an existing base index at index_dir (for stats.json) — the
    first build is the batch write_index job.
    """
    from pyspark.sql import types as T

    stream_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False), *schemas.CORPUS.fields]
    )
    stream = spark.readStream.schema(stream_schema).parquet(corpus_stream_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import Observation

        from ..functions.tokenize import token_count_udf
        from ..operators.segments import postings_with_dl

        # fresh read per batch: earlier micro-batches already moved the stats
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)

        # (1) doc_meta delta — streamed docs must be enrichable (J4) and
        # count toward idf/avgdl exactly as in a full rebuild. Batch stats
        # ride the write via observe() (no extra scan).
        extra = [c for c in ("repo", "path", "lang") if c in batch_df.columns]
        obs = Observation(f"delta_stats_{batch_id}")
        meta = batch_df.select(
            F.col(id_col).alias("doc_id"),
            token_count_udf(F.col("content")).alias("doc_len"),
            *extra,
            F.sha2(F.col("content"), 256).alias("content_sha256"),
        ).observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_len").alias("total_terms"),
            F.max("doc_id").alias("max_doc_id"),
        )
        meta.write.mode("append").parquet(os.path.join(index_dir, "doc_meta"))
        g = obs.get
        n_docs = int(stats["n_docs"]) + int(g["n_docs"])
        total_terms = int(stats.get("total_terms", 0)) + int(g["total_terms"])
        max_doc_id = max(int(stats["max_doc_id"]), int(g["max_doc_id"]))

        # (2) delta slices, salted with the MERGED stats so range slicing
        # of new doc_ids beyond the base max_doc_id stays spread
        pdl = postings_with_dl(batch_df, id_col=id_col)
        tdict = term_dictionary(pdl, n_partitions)
        slices = build_slices(
            pdl, tdict, n_docs, max_doc_id, n_partitions=n_partitions
        ).withColumn(
            # epoch-shift keeps delta slice_ids disjoint from any base
            # slice_id (which is < MAX_SALT_FANOUT) and from other epochs
            "slice_id",
            F.col("slice_id") + F.lit(1_000_000 * (int(batch_id) + 1)),
        )
        slices.write.mode("append").partitionBy("partition_id").parquet(
            os.path.join(index_dir, "segments")
        )
        # delta rows for the dictionary (df/cf additive; readers aggregate)
        tdict.write.mode("append").partitionBy("partition_id").parquet(
            os.path.join(index_dir, "terms_delta")
        )

        # (3) merged collection stats — atomic replace so a reader never
        # sees a torn file; avgdl = total/count matches a fresh rebuild's
        # F.avg bit-for-bit (both are IEEE double division of exact longs)
        new_stats = {
            **stats,
            "n_docs": n_docs,
            "avgdl": total_terms / n_docs,
            "max_doc_id": max_doc_id,
            "total_terms": total_terms,
        }
        tmp = os.path.join(index_dir, f"stats.json.tmp.{batch_id}")
        with open(tmp, "w") as f:
            json.dump(new_stats, f)
        os.replace(tmp, os.path.join(index_dir, "stats.json"))

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
