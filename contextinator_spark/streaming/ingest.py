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
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)

    from pyspark.sql import types as T

    stream_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False), *schemas.CORPUS.fields]
    )
    stream = spark.readStream.schema(stream_schema).parquet(corpus_stream_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ..operators.segments import postings_with_dl

        pdl = postings_with_dl(batch_df, id_col=id_col)
        tdict = term_dictionary(pdl, n_partitions)
        slices = build_slices(
            pdl, tdict, stats["n_docs"], stats["max_doc_id"], n_partitions=n_partitions
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

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
