from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from contextinator_spark.operators.multimodal import (
    extract_image_features,
    media_manifest,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synth_media(spark, n=64).cache()
    df.count()
    return df


def test_image_features_shape(spark, media):
    out = extract_image_features(media, n_features=8)
    rows = out.collect()
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(rows) == n_images
    for r in rows:
        assert len(r["features"]) == 8
        assert len(r["sha256"]) == 64
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in extract_image_features(media, 8).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_frame_sampling_counts(spark, media):
    out = sample_frames(media, every_ms=500)
    per = {r["media_id"]: r["n"] for r in out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    vids = media.filter(F.col("media_type") == "video").collect()
    assert per and len(per) == len(vids)
    for v in vids:
        assert per[v["media_id"]] == max(1, v["duration_ms"] // 500)


def test_resize_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_images(media, 32, 32).collect()


def test_manifest_and_column_pruning(spark, media, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("media")) + "/media.parquet"
    media.write.parquet(d)
    mp = spark.read.parquet(d)
    # metadata-only queries must NOT read the payload column — including
    # media_manifest itself, whose byte totals come from stored n_bytes
    for meta_only in (mp.groupBy("media_type").count(), media_manifest(mp)):
        plan = meta_only._jdf.queryExecution().executedPlan().toString()
        assert "payload" not in plan, "payload column not pruned from scan"
    rows = {r["media_type"]: r for r in media_manifest(mp).collect()}
    assert len(rows) == 3
    # n_bytes metadata agrees with the actual payload sizes
    truth = {
        r["media_type"]: r["t"]
        for r in mp.groupBy("media_type")
        .agg(F.sum(F.length("payload")).alias("t"))
        .collect()
    }
    assert {k: r["total_bytes"] for k, r in rows.items()} == truth
