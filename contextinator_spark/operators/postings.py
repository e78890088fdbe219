"""Posting-list construction and corpus statistics (SURVEY.md §2.4 A9, §7.1).

All plain DataFrame ops — Catalyst does two-phase (partial + final) hash
aggregation automatically, so the `groupBy(term, doc_id)` shuffle is
map-side-combined: at 100 TB the shuffle carries (term, doc_id, partial_tf)
not raw tokens. Heavy-hitter terms are NOT a skew problem at this
granularity because doc_id spreads the key space; skew is handled where it
actually bites — the per-term segment build (segments.py, salted).

Tokenization uses the vectorized pandas UDF (A-axis requirement,
BASELINE.json input_hint); `use_expr=True` swaps in the pure-Catalyst twin
(identical results, pinned by test_tokenize.py) for oracle-checked plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_expr, tokens_udf


def tokenized(corpus: DataFrame, id_col: str = "doc_id", use_expr: bool = False) -> DataFrame:
    """corpus + `tokens` array column."""
    tok = tokens_expr("content") if use_expr else tokens_udf(F.col("content"))
    return corpus.withColumn("tokens", tok)


def build_postings(corpus: DataFrame, id_col: str = "doc_id", use_expr: bool = False) -> DataFrame:
    """(term, doc_id, tf) — the uncompressed inverted index.

    explode → groupBy(term, doc_id).count(); partial agg map-side.
    """
    return (
        tokenized(corpus, id_col, use_expr)
        .select(F.col(id_col).alias("doc_id"), F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df, cf) — document frequency / collection frequency (A9).

    postings are unique on (term, doc_id) by construction, so df = count(*).
    """
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def doc_meta(corpus: DataFrame, id_col: str = "doc_id", use_expr: bool = False) -> DataFrame:
    """(doc_id, doc_len, repo, path, lang, content_sha256).

    doc_len = number of BM25 terms (SURVEY.md §7.3: never conflated with the
    BPE budget count). content_sha256 is the per-row invariant vs the
    reference (BASELINE.json input_hint; reference hash_utils.py:11-27).
    """
    cols = [F.col(id_col).alias("doc_id"), F.size("tokens").cast("int").alias("doc_len")]
    for c in ("repo", "path", "lang"):
        if c in corpus.columns:
            cols.append(F.col(c))
    cols.append(F.sha2(F.col("content"), 256).alias("content_sha256"))
    return tokenized(corpus, id_col, use_expr).select(*cols)


def collection_stats(doc_meta_df: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — driver-side scalars for BM25; one tiny agg job."""
    row = doc_meta_df.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])
