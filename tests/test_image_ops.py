"""Multimodal plumbing: resize, mapInPandas feature extraction,
frame sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark.functions import image as I
from cookieblock_consent_classifier_spark.sources.synth import synth_image_updates


@pytest.fixture(scope="module")
def images(spark):
    return synth_image_updates(spark, num_entities=6, updates_per_entity=2,
                               hot_entities=0).cache()


def test_resize_shape_and_determinism(spark, images):
    out = images.select("image_id", "ts", I.resize_udf(8, 8)("bytes").alias("small"))
    rows = out.collect()
    for r in rows:
        px = I.decode_image(bytes(r["small"]))
        assert px.shape == (8, 8)
    rows2 = out.collect()
    assert [bytes(r["small"]) for r in rows] == [bytes(r["small"]) for r in rows2]


def test_resize_preserves_mean_approximately():
    px = I.synth_pixels("img_t", 0, 32, 32)
    small = I.resize_pixels(px, 8, 8)
    assert abs(float(px.mean()) - float(small.mean())) < 4.0


def test_map_in_pandas_feature_extraction(spark, images):
    out = I.extract_image_features(images)
    rows = out.collect()
    assert {"px_mean", "px_std", "phash_check"} <= set(out.columns)
    for r in rows:
        assert r["phash_check"] == r["phash"]  # single decode == stored
        assert 0.0 <= r["px_mean"] <= 255.0


def test_frame_sample_shape(spark, images):
    out = images.select(I.frame_sample_udf(2)("bytes").alias("frames"))
    r = out.first()
    assert len(r["frames"]) == 1
    assert I.decode_image(bytes(r["frames"][0])) is not None


def test_unknown_format_raises():
    px = I.synth_pixels("img_t", 0, 8, 8)
    with pytest.raises(NotImplementedError):
        I.encode_image(px, "webp")
