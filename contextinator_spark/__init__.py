"""contextinator_spark — PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the query/data-processing capabilities of
starthackHQ/Contextinator (reference at /root/reference, read-only) as an
idiomatic Spark engine: DataFrame/SQL logical plans, Catalyst optimization,
vectorized pandas/Arrow UDFs (never per-row Python), explicit partitioning
and skew handling for 100 TB-class corpora.

Layout:
    config.py            pinned engine configuration (tokenizer, BM25 k1/b, ...)
    session.py           SparkSession builder tuned for the engine
    schemas.py           explicit StructType for every stage boundary
    sources/corpus.py    deterministic corpus synthesis + documents.parquet adapter
    functions/           columnar + pandas-UDF scalar kernels
    operators/           postings build, compression, segments, BM25 top-k,
                         dedup, similarity, grep/symbol/reconstruction, ...
    streaming/           incremental (AvailableNow) index maintenance
"""

__version__ = "0.1.0"
