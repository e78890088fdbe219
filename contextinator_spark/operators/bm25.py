"""BM25 scoring + top-k executor, pure DataFrame form (SURVEY.md W4/T1/F16).

k1=1.2, b=0.75 pinned in config; idf = ln(1 + (N - df + 0.5)/(df + 0.5));
ties broken by ascending doc_id. Scores rounded to SCORE_ROUND_DECIMALS so
results are stable across summation orders (1e-6 rank tolerance,
SURVEY.md §5.2.2).

Plan shape (reads like the flow in semantic_search.py:39-114 of the
reference, re-expressed relationally):

    postings ⨝ query_terms (broadcast, J3) → ⨝ term_stats (broadcast idf)
        → ⨝ doc_meta (doc_len) → per-term score column (F16, columnar)
        → groupBy(doc_id).sum → TakeOrderedAndProject(k)

N and avgdl enter via a 1-row crossJoin (broadcast NLJ of a single row) so
the whole computation is ONE lazily-optimized plan — the same shape the
DuckDB oracle SQL computes, giving value-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1, DEFAULT_TOP_K, SCORE_ROUND_DECIMALS


def idf_expr(df_col, n_col):
    return F.log(F.lit(1.0) + (n_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def tf_norm_expr(tf_col, dl_col, avgdl_col, k1: float = BM25_K1, b: float = BM25_B):
    return (tf_col * F.lit(k1 + 1.0)) / (
        tf_col + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col / avgdl_col)
    )


def score_terms(
    postings: DataFrame,
    doc_meta: DataFrame,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    term_stats: DataFrame | None = None,
) -> DataFrame:
    """Per-(doc, term) BM25 partial scores for a bag-of-terms query.

    `term_stats` = persisted dictionary → df is a broadcast probe and
    postings are scanned once (see topk_multi)."""
    spark = postings.sparkSession
    qt = spark.createDataFrame([(t,) for t in sorted(set(terms))], "term string")
    stats = (
        doc_meta.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
        )
    )
    matched = postings.join(F.broadcast(qt), "term")  # dictionary probe (J3)
    if term_stats is not None:
        tstats = term_stats.join(F.broadcast(qt), "term").select(
            "term", F.col("df").cast("double").alias("df")
        )
    else:
        tstats = matched.groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias("df")
        )
    return (
        matched.join(F.broadcast(tstats), "term")
        .join(doc_meta.select("doc_id", "doc_len"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            idf_expr(F.col("df"), F.col("n_docs"))
            * tf_norm_expr(
                F.col("tf").cast("double"), F.col("doc_len").cast("double"), F.col("avgdl"), k1, b
            ),
        )
    )


def topk(
    postings: DataFrame,
    doc_meta: DataFrame,
    terms: list[str],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    term_stats: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — global top-k, deterministic tiebreak.

    orderBy(desc(score), doc_id).limit(k) compiles to
    TakeOrderedAndProject — per-partition heaps + driver merge, no full sort.
    """
    scored = (
        score_terms(postings, doc_meta, terms, k1, b, term_stats)
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), SCORE_ROUND_DECIMALS).alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "score")
    )


def topk_multi(
    postings: DataFrame,
    doc_meta: DataFrame,
    queries: dict[int, list[str]],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    term_stats: DataFrame | None = None,
) -> DataFrame:
    """Batch executor: (query_id, rank, doc_id, score) for many queries.

    One plan for the whole batch — per-query row_number window instead of
    N separate jobs (W4). Used by bench.py's query phase.

    `term_stats` (term, df, …) — the engine's persisted dictionary — makes
    df a broadcast probe of a vocabulary-sized table, so the plan scans
    postings exactly ONCE (test-pinned). Without it, df comes from a
    count() window over the matched postings — still a single postings
    scan, at the cost of one extra per-term shuffle; the production
    executor (bm25_segments) always probes its dictionary.
    (An exchange-reuse form — repartition matched on (term, doc_id) and
    hang both subtrees off it — was A/B'd here: Catalyst reuses the
    exchange over in-memory sources but not over parquet scans, so it
    regressed to two scans + an extra shuffle and was dropped.)
    """
    spark = postings.sparkSession
    rows = [(qid, t) for qid, ts in queries.items() for t in sorted(set(ts))]
    qt = spark.createDataFrame(rows, "query_id int, term string")
    stats = doc_meta.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    if term_stats is not None:
        tstats = term_stats.join(
            F.broadcast(qt.select("term").distinct()), "term"
        ).select("term", F.col("df").cast("double").alias("df"))
        matched = postings.join(F.broadcast(qt), "term").join(
            F.broadcast(tstats), "term"
        )
    else:
        # Single-scan fallback: df comes from a count() window over the
        # matched postings themselves (rows are unique on (term, doc_id),
        # so the per-term row count IS df) — postings is scanned exactly
        # once either way. The per-query fan-out joins AFTER the window so
        # a term shared by many queries is not double-counted.
        matched = (
            postings.join(F.broadcast(qt.select("term").distinct()), "term")
            .withColumn(
                "df",
                F.count(F.lit(1))
                .over(Window.partitionBy("term"))
                .cast("double"),
            )
            .join(F.broadcast(qt), "term")
        )
    scored = (
        matched.join(doc_meta.select("doc_id", "doc_len"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            idf_expr(F.col("df"), F.col("n_docs"))
            * tf_norm_expr(
                F.col("tf").cast("double"), F.col("doc_len").cast("double"), F.col("avgdl"), k1, b
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("term_score"), SCORE_ROUND_DECIMALS).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def topk_conjunctive(
    postings: DataFrame,
    doc_meta: DataFrame,
    terms: list[str],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    term_stats: DataFrame | None = None,
) -> DataFrame:
    """MUST semantics (Lucene BooleanQuery AND): only documents containing
    EVERY query term are ranked; the score of a surviving doc is the same
    disjunctive BM25 sum, so conjunctive top-k ⊆ disjunctive candidates
    with a per-doc matched-term count filter.

    postings are unique on (term, doc_id), so after the dictionary probe
    the per-doc row count IS the number of distinct query terms the doc
    matches — count(*) == n_terms implements the AND with no extra join
    or intersection pass. A query term absent from the corpus makes the
    result empty (no doc can match all terms), which the count filter
    yields naturally."""
    n_terms = len(set(terms))
    scored = (
        score_terms(postings, doc_meta, terms, k1, b, term_stats)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("term_score"), SCORE_ROUND_DECIMALS).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
        .filter(F.col("n_matched") == F.lit(n_terms))
        .select("doc_id", "score")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "score")
    )
