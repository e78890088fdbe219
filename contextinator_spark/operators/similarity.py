"""Similarity search over embedding columns (brief requirement; reference
analog: ChromaDB HNSW top-k at `semantic_search.py:87-92`, rebuilt as
DataFrame plans).

- ``knn_brute``   — exact cosine top-k: columnar zip_with/aggregate dot
                    product → TakeOrderedAndProject. The correctness
                    baseline, and the in-bucket scorer for the ANN path.
- ``rhp_signature`` / ``knn_lsh`` — random-hyperplane LSH: sign-bit
                    signatures from a seeded deterministic hyperplane
                    matrix (broadcast), Hamming-bucket candidates, exact
                    re-scoring inside buckets. The 100 TB path: buckets
                    shard the self-join; recall is tunable via n_bits /
                    n_tables (pinned by test vs brute).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .dedup import cosine_expr

RHP_SEED = 42


def knn_brute(emb: DataFrame, query_vec: list[float], k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(rank, vec_id, cos) — exact top-k by cosine, doc-id tiebreak."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_expr(F.col(vec_col), q), 6).alias("cos"),
    )
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "vec_id", "cos")
    )


def _hyperplanes(dim: int, n_bits: int, table: int = 0) -> np.ndarray:
    rng = np.random.default_rng(RHP_SEED + table)
    return rng.standard_normal((n_bits, dim))


def rhp_signature(emb: DataFrame, dim: int, n_bits: int = 16, table: int = 0,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket) — sign bits of H·v packed into an int bucket id.

    H is deterministic (seeded) and lives in the UDF closure — broadcast
    once per executor, vectorized matmul per Arrow batch.
    """
    H = _hyperplanes(dim, n_bits, table)

    @pandas_udf(T.IntegerType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (M @ H.T) >= 0.0  # (batch, n_bits)
        packed = (bits.astype(np.int64) << np.arange(n_bits)[None, :]).sum(axis=1)
        return pd.Series(packed.astype(np.int32))

    return emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")).withColumn(
        "bucket", bucket_udf(F.col("v"))
    )


def knn_lsh(emb: DataFrame, query_vec: list[float], k: int = 10, dim: int | None = None,
            n_bits: int = 8, n_tables: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: union of candidates from n_tables RHP buckets
    matching the query's bucket, re-scored exactly. At scale the bucket
    filter prunes the scan (bucket is a partition column of a persisted
    signature table); here it filters inline."""
    q = np.asarray(query_vec, dtype=np.float64)
    dim = dim or q.size
    cands = None
    for t in range(n_tables):
        H = _hyperplanes(dim, n_bits, t)
        qb = int(((q @ H.T >= 0.0).astype(np.int64) << np.arange(n_bits)).sum())
        sig = rhp_signature(emb, dim, n_bits, t, id_col, vec_col)
        c = sig.filter(F.col("bucket") == qb).select("vec_id")
        cands = c if cands is None else cands.union(c)
    cand_ids = cands.distinct()
    pool = emb.join(cand_ids, emb[id_col] == cand_ids["vec_id"], "leftsemi")
    return knn_brute(pool, query_vec, k, id_col, vec_col)
