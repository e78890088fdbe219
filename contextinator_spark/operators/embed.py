"""Optional embedding stage (U5; reference embedding_service.py:27-508).

The reference embeds chunks through a network service (OpenAI client,
batches of 250, concurrency 5, retry/backoff — settings.py:228,
embedding_service.py:158-244). Network calls are out of engine scope
(SURVEY.md §2.10), but the SPARK-SIDE PLUMBING is in scope and real here:

  chunks → validate/truncate (P6, embedding_service.py:82-107)
         → mapInPandas batches of EMBED_BATCH rows
         → per-batch encoder call → `embedding array<float>` column

`encoder` is injectable. The default is a DETERMINISTIC STUB (clearly
marked): a hash-seeded unit vector per text — this container has no model
runtime and no network. A production deployment passes an encoder that
wraps its client; batching, truncation, schema and partitioning stay
identical. Executor-side batching replaces the reference's asyncio
semaphore: on a 1000-executor cluster the concurrency IS the task
parallelism, and retries are Spark task retries (O9).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_BATCH = 250          # reference settings.py:228
MAX_EMBED_TOKENS = 8191    # reference embedding_service.py:96
TRUNCATE_FRACTION = 0.9    # reference embedding_service.py:99-105


def stub_encoder(texts: list[str], dim: int = 64) -> np.ndarray:
    """DETERMINISTIC FAKE embeddings (no model in this container): each
    text maps to a unit vector seeded by its sha256. Stable across runs,
    partitionings, and parallelism levels — good enough to exercise every
    downstream consumer (ANN, cosine dedup) in tests."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim)
        out[i] = (v / np.linalg.norm(v)).astype(np.float32)
    return out


def validate_truncate(df: DataFrame, content_col: str = "content") -> DataFrame:
    """P6: drop empty/whitespace chunks; truncate over-long content to 90%
    of the token limit with a marker (embedding_service.py:82-107;
    token estimate = length/4, :96-97)."""
    est = F.length(content_col) / F.lit(4.0)
    max_chars = int(MAX_EMBED_TOKENS * TRUNCATE_FRACTION * 4)
    truncated = F.concat(
        F.substring(content_col, 1, max_chars), F.lit("\n... (truncated)")
    )
    return df.filter(F.length(F.trim(F.col(content_col))) > 0).withColumn(
        content_col,
        F.when(est > MAX_EMBED_TOKENS, truncated).otherwise(F.col(content_col)),
    )


def embed_chunks(
    df: DataFrame,
    content_col: str = "content",
    dim: int = 64,
    encoder: Callable[[list[str]], np.ndarray] | None = None,
    batch_size: int = EMBED_BATCH,
) -> DataFrame:
    """Append `embedding array<float>` to every row; the J2 chunk↔vector
    zip happens IN-ROW (the positional-zip join of the reference,
    embedding_service.py:199-211, disappears by construction)."""
    enc = encoder or (lambda texts: stub_encoder(texts, dim))
    validated = validate_truncate(df, content_col)
    out_schema = T.StructType(
        validated.schema.fields
        + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )
    cols = validated.columns

    def run(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            for s in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[s : s + batch_size].copy()
                vecs = enc(chunk[content_col].tolist())
                chunk["embedding"] = [np.asarray(v, dtype=np.float32) for v in vecs]
                yield chunk

    return validated.mapInPandas(run, schema=out_schema).select(
        *cols, "embedding"
    )
