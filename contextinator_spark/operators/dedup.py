"""Deduplication operators (reference A1 `node_collector.py:57-118` + the
training-data-pipeline extensions the brief requires).

All variants are declarative DataFrame plans (Catalyst-optimizable); the
only Python is the SimHash pandas UDF (bit-twiddling over Arrow batches).
Every hash primitive (sha256 / md5) is SQL-reproducible so each operator
has a DuckDB oracle twin in entry_queries.py.

Scale notes (100 TB):
- exact_dedup: one window over sha2(content) — shuffle on the hash, skew
  impossible (hash keys uniform) beyond true duplicate explosion.
- minhash: signatures are per-row column math (no shuffle); LSH banding
  shuffles (band_idx, band_val) — heavy buckets = true near-dup clusters;
  candidate pairs are emitted per bucket, so a pathological bucket is
  bounded by cluster size, and downstream jaccard verification is a
  co-located join on the bucket.
- ngram_jaccard: the shingle self-join explodes on common shingles — use
  it as the VERIFIER for LSH candidates, not standalone, at scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..config import (
    MINHASH_BAND_SIZE,
    MINHASH_NUM_PERM,
    SHINGLE_SIZE,
)
from ..functions.tokenize import tokens_expr


# ---------------------------------------------------------------------------
# exact dedup (A1): first-wins by explicit deterministic order
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, content_col: str = "content", order_cols: list[str] | None = None) -> DataFrame:
    """Keep the first row per sha256(content); order pinned for determinism
    (reference keeps arbitrary first-seen — SURVEY.md A1 pins lexicographic).
    Adds `n_duplicates` = number of dropped copies."""
    order_cols = order_cols or ["doc_id"]
    h = F.sha2(F.col(content_col), 256)
    w = Window.partitionBy("h").orderBy(*[F.asc(c) for c in order_cols])
    return (
        df.withColumn("h", h)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_duplicates", F.count(F.lit(1)).over(Window.partitionBy("h")) - 1)
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumnRenamed("h", "content_sha256")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def shingles_expr(tokens_col, k: int = SHINGLE_SIZE):
    """k-word shingles as strings; empty array when fewer than k tokens."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.when(
        F.size(c) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(c) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(c, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(df: DataFrame, content_col: str = "content",
                      num_perm: int = MINHASH_NUM_PERM, k: int = SHINGLE_SIZE) -> DataFrame:
    """Adds sig_0..sig_{P-1}: min over shingles of md5(f'{p}:{shingle}').

    md5-hex min (fixed-length lowercase hex ⇒ lexicographic = numeric) keeps
    the signature reproducible in ANSI SQL for the oracle.
    """
    sh = shingles_expr(tokens_expr(content_col), k)
    out = df.withColumn("_shingles", sh)

    def hasher(p: int):
        # NOTE: must be a 1-arg lambda — a 2-arg lambda is interpreted by
        # F.transform as the (element, index) variant
        prefix = f"{p}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    for p in range(num_perm):
        out = out.withColumn(
            f"sig_{p}", F.array_min(F.transform(F.col("_shingles"), hasher(p)))
        )
    return out.drop("_shingles")


def lsh_bands(sig_df: DataFrame, id_col: str = "doc_id",
              num_perm: int = MINHASH_NUM_PERM, band_size: int = MINHASH_BAND_SIZE) -> DataFrame:
    """(doc_id, band_idx, band_val) — long-format LSH buckets."""
    n_bands = num_perm // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"sig_{j * band_size + r}") for r in range(band_size)])
                ).alias("band_val"),
            )
            for j in range(n_bands)
        ]
    )
    return (
        sig_df.filter(F.col("sig_0").isNotNull())  # docs with ≥k tokens
        .select(F.col(id_col).alias("doc_id"), F.explode(bands).alias("b"))
        .select("doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_val").alias("band_val"))
    )


def minhash_candidate_pairs(bands_df: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) sharing any LSH bucket."""
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (verifier for LSH candidates; standalone at small scale)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, content_col: str = "content",
                        id_col: str = "doc_id", k: int = SHINGLE_SIZE,
                        threshold: float = 0.0,
                        candidates: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) over distinct k-shingle sets.

    candidates=None (standalone): shared-shingle self-equi-join — exact but
    explodes on common shingles; small corpora only (see module docstring).

    candidates=(doc_a, doc_b) DataFrame (the VERIFIER form — the API meant
    for scale, fed by minhash_candidate_pairs / simhash_candidate_pairs):
    intersections are computed only for the given pairs. Work is bounded by
    Σ_pairs |shingles(doc_a)| — per-pair doc size, never global shingle
    frequency — and pairs with an empty intersection are kept at jaccard 0
    (a verifier must return a verdict for every candidate)."""
    sh = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingles_expr(tokens_expr(content_col), k)).alias("sh"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is not None:
        cand = candidates.select("doc_a", "doc_b")
        inter = (
            cand.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
            .join(
                sh.select(F.col("doc_id").alias("doc_b"), "sh"),
                ["doc_b", "sh"],
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        inter = cand.join(inter, ["doc_a", "doc_b"], "left").fillna(
            {"inter": 0}
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit, tf-weighted, md5-derived token hashes)
# ---------------------------------------------------------------------------

@pandas_udf(T.StringType())
def simhash64_udf(tokens: pd.Series) -> pd.Series:
    """16-hex-char SimHash. Token hash = first 16 hex chars of md5 (so the
    DuckDB oracle can reproduce it); weight = term frequency; bit set when
    the weighted sum is >= 0.

    Batch-vectorized: tokens are factorized across the WHOLE Arrow batch
    and each batch-unique term is md5-hashed exactly once (code corpora
    share most of their vocabulary across files, so this cuts the Python
    hash calls ~10× vs hashing per doc-unique term); the per-doc
    tf-weighted bit sums reduce to one bincount per bit over the token
    stream, because summing ±1 once per OCCURRENCE equals weighting each
    unique term by its tf. Bit-identical to the per-doc form — the sums
    are small integers (exact in float64) and order-independent."""
    import itertools

    n = len(tokens)
    lens = np.array(
        [0 if t is None else len(t) for t in tokens], dtype=np.int64
    )
    if lens.sum() == 0:
        return pd.Series(["0" * 16] * n)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    flat = np.array(
        list(
            itertools.chain.from_iterable(t for t in tokens if t is not None)
        ),
        dtype=object,
    )
    codes, uniques = pd.factorize(flat)
    hs = np.fromiter(
        (int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in uniques),
        dtype=np.uint64,
        count=len(uniques),
    )
    # per-unique-term bit matrix in {0,1}; bit j of doc d is set when
    # 2 * Σ_tokens b_j - n_tokens >= 0
    bits01 = (
        (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.float64)
    # compress the token stream to (doc, term) pairs with tf counts — a
    # hash factorize, not a sort — so repetitive docs don't pay the 64-bit
    # loop once per occurrence
    u = np.int64(len(uniques))
    pcodes, pvals = pd.factorize(doc_idx * u + codes)
    tf = np.bincount(pcodes).astype(np.float64)
    d, c = pvals // u, pvals % u
    sigs = np.zeros(n, dtype=np.uint64)
    for j in range(64):
        s = np.bincount(d, weights=tf * bits01[c, j], minlength=n)
        sigs |= ((2.0 * s - lens) >= 0).astype(np.uint64) << np.uint64(j)
    out = np.array([f"{int(s):016x}" for s in sigs], dtype=object)
    out[lens == 0] = "0" * 16
    return pd.Series(out)


def simhash(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"), simhash64_udf(tokens_expr(content_col)).alias("simhash")
    )


def simhash_bands(sig_df: DataFrame, n_bands: int = 4) -> DataFrame:
    """(doc_id, band_idx, band_val) — the 64-bit signature split into
    n_bands equal hex substrings. Pigeonhole: two signatures within
    Hamming distance < n_bands MUST agree on at least one band, so the
    band equi-join below has EXACT recall for distance ≤ n_bands - 1."""
    width = 16 // n_bands  # hex chars per band
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.substring("simhash", 1 + j * width, width).alias("band_val"),
            )
            for j in range(n_bands)
        ]
    )
    return sig_df.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_val").alias("band_val")
    )


def simhash_pairs(df: DataFrame, content_col: str = "content", id_col: str = "doc_id",
                  max_hamming: int = 3, n_bands: int = 4) -> DataFrame:
    """(doc_a, doc_b, hamming) — near-duplicate pairs by SimHash, the scale
    path that turns signatures into pairs: band-collision candidates
    (bounded equi-join on (band_idx, band_val), never all-pairs) verified
    with the exact popcount Hamming distance. Recall is EXACT when
    max_hamming < n_bands (pigeonhole, see simhash_bands).

    Fully SQL-expressible (hex bands → int, xor, bit_count) so it carries a
    DuckDB oracle twin like the MinHash banding path."""
    assert max_hamming < n_bands, "pigeonhole guarantee needs max_hamming < n_bands"
    sig = simhash(df, content_col, id_col)
    bands = simhash_bands(sig, n_bands)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("_ha"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("_hb"))
    width = 16 // n_bands
    # per-band xor + popcount keeps every parsed value < 2^(4*width) ≤ 2^16,
    # clear of int64 sign issues on both engines
    ham = sum(
        F.bit_count(
            F.conv(F.substring("_ha", 1 + j * width, width), 16, 10).cast("long")
            .bitwiseXOR(F.conv(F.substring("_hb", 1 + j * width, width), 16, 10).cast("long"))
        )
        for j in range(n_bands)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicates
# ---------------------------------------------------------------------------

def cosine_expr(a, b):
    """Exact double-precision cosine of two float-array columns (columnar)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def cosine_dup_pairs(emb: DataFrame, threshold: float, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(id_a, id_b, cos) for all pairs with cosine ≥ threshold.

    Brute self-join — the CORRECTNESS BASELINE ONLY (quadratic). The scale
    path is similarity.cosine_pairs_lsh: lsh_buckets → lsh_candidate_pairs
    → exact verify with this same cosine_expr; recall vs this brute output
    is pinned by test_lsh_pairs_recall.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
