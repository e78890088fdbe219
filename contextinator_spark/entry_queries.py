"""Driver-contract query registry.

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None).
oracle_sql is ANSI SQL DuckDB runs on the same parquet tables (views:
region nation customer supplier part orders lineitem events documents
embeddings). Column names/types are aligned on both sides; floats are
rounded to 6 decimals on both sides (config.SCORE_ROUND_DECIMALS).

The tokenizer SQL fragment mirrors functions/tokenize.py exactly:
lowercase, split on '[^a-z0-9_]+', drop empties.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import BM25_B, BM25_K1, SCORE_ROUND_DECIMALS
from .operators import bm25
from .operators import postings as P
from .sources.corpus import load_documents

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect, mirroring the Spark expressions)
# ---------------------------------------------------------------------------
SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '')"
)
SQL_POSTINGS = f"""
    SELECT term, doc_id, CAST(count(*) AS INT) AS tf
    FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents)
    GROUP BY term, doc_id
"""
SQL_DOCMETA = f"""
    SELECT doc_id, CAST(len({SQL_TOKENS}) AS INT) AS doc_len,
           sha256(text) AS content_sha256
    FROM documents
"""

BM25_QUERY_TERMS = ["hash", "join", "spark"]
BM25_QUERIES = {
    1: ["hash", "join", "spark"],
    2: ["merge", "sort"],
    3: ["window"],
    4: ["zzz_absent_term"],
    5: ["stream", "batch", "key", "order"],
}
GREP_PATTERN = "spark.*hash"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir).withColumnRenamed("text", "content")


def _docs_postings(spark: SparkSession, sf_dir: str, use_expr: bool = True) -> DataFrame:
    return P.build_postings(_docs(spark, sf_dir), use_expr=use_expr)


def _docs_meta(spark: SparkSession, sf_dir: str, use_expr: bool = True) -> DataFrame:
    return P.doc_meta(_docs(spark, sf_dir), use_expr=use_expr)


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------

def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (uncompressed postings) — SURVEY.md §7.1 step 2."""
    return _docs_postings(spark, sf_dir).select("term", "doc_id", "tf")


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df/cf per term (A9)."""
    return P.term_stats(_docs_postings(spark, sf_dir)).select(
        "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
    )


def q_doc_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_len + sha256 invariant (input_hint; reference hash_utils.py:11-27)."""
    return _docs_meta(spark, sf_dir).select("doc_id", "doc_len", "content_sha256")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: BM25 top-10, deterministic tiebreak (W4/T1/F16)."""
    return bm25.topk(
        _docs_postings(spark, sf_dir), _docs_meta(spark, sf_dir), BM25_QUERY_TERMS, k=10
    )


def q_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query executor (one plan, per-query windows)."""
    return bm25.topk_multi(
        _docs_postings(spark, sf_dir), _docs_meta(spark, sf_dir), BM25_QUERIES, k=10
    )


def q_grep_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep-style regex scan grouped by source (S3/F10/A7 analog)."""
    return (
        load_documents(spark, sf_dir)
        .filter(F.col("text").rlike(GREP_PATTERN))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_matching"))
    )


def _values_sql(terms: list[str]) -> str:
    return ", ".join(f"('{t}')" for t in sorted(set(terms)))


def _bm25_sql(terms_values: str, group_cols: str = "", select_qid: str = "") -> str:
    """Shared BM25 CTE chain; mirrors operators/bm25.py exactly."""
    k1, b = BM25_K1, BM25_B
    return f"""
WITH post AS ({SQL_POSTINGS}),
meta AS (SELECT doc_id, CAST(len({SQL_TOKENS}) AS INT) AS doc_len FROM documents),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(avg(doc_len) AS DOUBLE) AS avgdl FROM meta),
q(qid, term) AS (VALUES {terms_values}),
dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        FROM post WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
scored AS (
  SELECT q.qid, p.doc_id,
         CAST(round(sum(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (p.tf * ({k1} + 1.0))
           / (p.tf + {k1} * (1.0 - {b} + {b} * m.doc_len / s.avgdl))
         ), {SCORE_ROUND_DECIMALS}) AS DOUBLE) AS score
  FROM post p JOIN q ON p.term = q.term
       JOIN dfs d ON p.term = d.term
       JOIN meta m ON p.doc_id = m.doc_id
       CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id)
"""


def sql_bm25_topk() -> str:
    values = ", ".join(f"(1, '{t}')" for t in sorted(set(BM25_QUERY_TERMS)))
    return (
        _bm25_sql(values)
        + f"""
SELECT CAST(rank AS INT) AS rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank, doc_id, score
  FROM scored) WHERE rank <= 10
"""
    )


def sql_bm25_batch() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, ts in BM25_QUERIES.items() for t in sorted(set(ts))
    )
    return (
        _bm25_sql(values)
        + """
SELECT CAST(qid AS INT) AS query_id, CAST(rank AS INT) AS rank, doc_id, score FROM (
  SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank,
         doc_id, score
  FROM scored) WHERE rank <= 10
"""
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    return {
        "postings": (q_postings, SQL_POSTINGS),
        "term_stats": (
            q_term_stats,
            f"SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf "
            f"FROM ({SQL_POSTINGS}) GROUP BY term",
        ),
        "doc_meta": (q_doc_meta, SQL_DOCMETA),
        "bm25_topk": (q_bm25_topk, sql_bm25_topk()),
        "bm25_batch": (q_bm25_batch, sql_bm25_batch()),
        "grep_count": (
            q_grep_count,
            f"SELECT source, CAST(count(*) AS BIGINT) AS n_matching FROM documents "
            f"WHERE regexp_matches(text, '{GREP_PATTERN}') GROUP BY source",
        ),
    }
