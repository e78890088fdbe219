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
- ``lsh_buckets`` / ``cosine_pairs_lsh`` — the bucketed NEAR-DUP pair
                    path: ±1 sign hyperplanes derived from md5 (spec-
                    deterministic AND embeddable as SQL literals, so the
                    DuckDB oracle reproduces the whole algorithm exactly,
                    the same way the minhash banding oracle does), bucket
                    equi-join for candidates, exact cosine verify. At
                    scale the self-join shuffles on (table_id, bucket) —
                    bucket population is corpus_size / 2^n_bits per table,
                    so n_bits scales with corpus size and no all-pairs
                    cross join ever exists.
- ``write_signature_table`` / ``knn_lsh_indexed`` — persisted signature
                    table partitioned by (table_id, bucket): the one-time
                    signature build for query-time ANN. A query probes its
                    n_tables buckets via partition-pruned scan — no
                    signature recomputation per query (the scale fix over
                    inline ``knn_lsh``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# bucketed cosine near-dup (the scale path promised by dedup.cosine_dup_pairs)
# ---------------------------------------------------------------------------

def rhp_sign_matrix(dim: int, n_bits: int, table: int = 0) -> np.ndarray:
    """±1 hyperplane matrix (n_bits × dim) derived from md5 of
    "rhp:{table}:{bit}:{j}" (low bit of the first digest byte).

    ±1 entries instead of Gaussians so the matrix is (a) reproducible from
    a one-line spec and (b) embeddable as literal vectors in the DuckDB
    oracle SQL — sign(H·v) is then computable identically on both engines
    (both cast the float32 embedding to double; a sign flip would need
    |dot| within summation-order noise ~1e-13, measured min |dot| on the
    testdata is 1.4e-5). For cosine LSH, ±1 projections are a standard
    substitute for Gaussian ones (same collision-probability asymptotics).
    """
    H = np.empty((n_bits, dim), dtype=np.float64)
    for b in range(n_bits):
        for j in range(dim):
            h = hashlib.md5(f"rhp:{table}:{b}:{j}".encode()).digest()
            H[b, j] = 1.0 if (h[0] & 1) else -1.0
    return H


def lsh_buckets(emb: DataFrame, dim: int, n_bits: int = 8, n_tables: int = 4,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, table_id, bucket) — one row per (vector, table).

    All tables are computed in ONE Arrow matmul per batch (stacked
    hyperplane matrix), then exploded; signatures are per-row column math,
    no shuffle until the candidate join."""
    H_all = np.vstack([rhp_sign_matrix(dim, n_bits, t) for t in range(n_tables)])

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy()).astype(np.float64)  # match ::DOUBLE[]
        bits = (M @ H_all.T) >= 0.0  # (batch, n_tables*n_bits)
        bits = bits.reshape(len(M), n_tables, n_bits)
        packed = (bits.astype(np.int64) << np.arange(n_bits)[None, None, :]).sum(axis=2)
        return pd.Series(list(packed.astype(np.int32)))

    return (
        emb.select(F.col(id_col).alias("vec_id"), buckets_udf(F.col(vec_col)).alias("_b"))
        .select("vec_id", F.posexplode("_b").alias("table_id", "bucket"))
    )


def lsh_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) sharing any (table_id, bucket). The join key
    is the bucket, so the shuffle is bounded by bucket population — never
    an all-pairs cross join."""
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )


def cosine_pairs_lsh(emb: DataFrame, threshold: float, dim: int,
                     n_bits: int = 8, n_tables: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id_a, id_b, cos) — LSH-bucketed candidates verified with the exact
    cosine. The 100 TB near-dup path: candidates come from bucket
    collisions (O(Σ bucket²) work), verification is an exact re-score of
    only those pairs. Recall vs brute is tunable via n_bits/n_tables and
    pinned by test_lsh_recall_on_planted_dups."""
    cands = lsh_candidate_pairs(lsh_buckets(emb, dim, n_bits, n_tables, id_col, vec_col))
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# persisted signature table → partition-pruned ANN (the knn_lsh scale fix)
# ---------------------------------------------------------------------------

def write_signature_table(emb: DataFrame, path: str, dim: int,
                          n_bits: int = 8, n_tables: int = 4,
                          id_col: str = "vec_id", vec_col: str = "embedding") -> None:
    """One-time signature build: (vec_id, embedding, table_id, bucket)
    written partitioned by (table_id, bucket). Query-time ANN then reads
    exactly n_tables partitions (partition pruning on the directory keys)
    instead of recomputing signatures over the full table per query."""
    sig = lsh_buckets(emb, dim, n_bits, n_tables, id_col, vec_col)
    vecs = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    sig.join(vecs, "vec_id").write.mode("overwrite").partitionBy(
        "table_id", "bucket"
    ).parquet(path)


def query_buckets(query_vec: list[float], dim: int, n_bits: int = 8,
                  n_tables: int = 4) -> list[tuple[int, int]]:
    """The (table_id, bucket) cells a query vector probes."""
    q = np.asarray(query_vec, dtype=np.float64)
    out = []
    for t in range(n_tables):
        H = rhp_sign_matrix(dim, n_bits, t)
        b = int((((H @ q) >= 0.0).astype(np.int64) << np.arange(n_bits)).sum())
        out.append((t, b))
    return out


def knn_lsh_indexed(spark: SparkSession, sig_path: str, query_vec: list[float],
                    k: int = 10, dim: int | None = None,
                    n_bits: int = 8, n_tables: int = 4) -> DataFrame:
    """Approximate top-k from the persisted signature table: probe the
    query's n_tables buckets (partition-pruned scan — PushedFilters on the
    directory keys), dedup candidates, exact re-score. Bit-identical to
    inline knn_lsh with the same parameters (tested)."""
    dim = dim or len(query_vec)
    cells = query_buckets(query_vec, dim, n_bits, n_tables)
    sig = spark.read.parquet(sig_path)
    cond = None
    for t, b in cells:
        c = (F.col("table_id") == t) & (F.col("bucket") == b)
        cond = c if cond is None else (cond | c)
    pool = (
        sig.filter(cond)
        .groupBy("vec_id")
        .agg(F.first("embedding").alias("embedding"))
    )
    return knn_brute(pool, query_vec, k)


def knn_filtered(emb: DataFrame, query_vec: list[float], predicate: str,
                 k: int = 10, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """ES knn-with-filter, exact PRE-filter semantics: the predicate (a
    SQL expression over the embedding frame's metadata columns) restricts
    the search set BEFORE ranking, so the result is the true top-k OF THE
    FILTERED SET — k hits whenever ≥ k rows satisfy the filter, never the
    post-filtered remnant of an unfiltered top-k. Brute = the exact
    baseline; the predicate reaches the parquet scan (PushedFilters) since
    it is a plain Catalyst filter ahead of the cosine projection."""
    return knn_brute(emb.filter(predicate), query_vec, k, id_col, vec_col)


def knn_lsh_indexed_filtered(spark: SparkSession, sig_path: str,
                             query_vec: list[float], meta: DataFrame,
                             predicate: str, k: int = 10,
                             dim: int | None = None, n_bits: int = 8,
                             n_tables: int = 4) -> DataFrame:
    """Filtered ANN over the persisted signature table: the query's
    n_tables bucket partitions are probed (partition-pruned, same as
    knn_lsh_indexed), candidates PRE-filtered by a semi-join against
    meta.filter(predicate) (meta = (vec_id, attributes…); broadcast by
    AQE when small), then exactly re-scored. Because an RHP signature
    depends only on the vector itself, this is bit-identical to running
    inline knn_lsh over the pre-filtered embedding frame (tested) —
    the filter commutes with bucketing. Like ES's filtered HNSW, a very
    selective filter can leave < k candidates in the probed buckets; the
    exact-recall fallback is knn_filtered (documented trade)."""
    dim = dim or len(query_vec)
    cells = query_buckets(query_vec, dim, n_bits, n_tables)
    sig = spark.read.parquet(sig_path)
    cond = None
    for t, b in cells:
        c = (F.col("table_id") == t) & (F.col("bucket") == b)
        cond = c if cond is None else (cond | c)
    keep = meta.filter(predicate).select("vec_id")
    pool = (
        sig.filter(cond)
        .join(keep, "vec_id", "left_semi")
        .groupBy("vec_id")
        .agg(F.first("embedding").alias("embedding"))
    )
    return knn_brute(pool, query_vec, k)
