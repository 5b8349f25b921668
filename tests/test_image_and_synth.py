"""Image payload plumbing + deterministic synth tables (north-rule
shape, FIXTURES.md §2-3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark.functions import image as I
from cookieblock_consent_classifier_spark.operators.asof import asof_join
from cookieblock_consent_classifier_spark.sources.synth import (
    GAP_SECONDS,
    synth_image_updates,
    synth_label_dim,
)


@pytest.fixture(scope="module")
def images(spark):
    return synth_image_updates(
        spark, num_entities=12, updates_per_entity=4, hot_entities=2, hot_updates=16
    ).cache()


def test_codec_roundtrip_lossless():
    px = I.synth_pixels("img_x", 0, 32, 32)
    dec = I.decode_image(I.encode_image(px, "png"))
    assert np.array_equal(px, dec)


def test_codec_lossy_psnr_above_40():
    px = I.synth_pixels("img_x", 0, 32, 32)
    dec = I.decode_image(I.encode_image(px, "jpeg"))
    assert I.psnr(px, dec) >= 40.0


def test_phash_column_matches_bytes_decode(spark, images):
    """The stored phash int64 must equal phash(decode(bytes)) — the
    per-row invariant from input_hint."""
    recomputed = images.withColumn("ph2", I.phash_from_bytes("bytes"))
    assert recomputed.filter(F.col("ph2") != F.col("phash")).count() == 0


def test_decode_psnr_udf(spark, images):
    out = images.withColumn("p", I.decode_psnr("bytes", "bytes"))
    assert out.filter(F.col("p") != float("inf")).count() == 0


def test_phash_delta_first_update_null(spark, images):
    d = I.with_phash_delta(images)
    firsts = d.filter(F.col("update_idx") == 0)
    assert firsts.filter(F.col("phash_delta").isNotNull()).count() == 0
    rest = d.filter(F.col("update_idx") > 0)
    assert rest.filter(F.col("phash_delta").isNull()).count() == 0


def test_synth_deterministic(spark):
    a = synth_image_updates(spark, num_entities=5, updates_per_entity=3, hot_entities=0)
    b = synth_image_updates(spark, num_entities=5, updates_per_entity=3, hot_entities=0)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_synth_has_hot_entities(spark, images):
    counts = images.groupBy("image_id").count()
    assert counts.filter(F.col("count") == 16).count() == 2
    assert counts.filter(F.col("count") == 4).count() == 12


def test_label_asof_never_leaks_future(spark, images):
    labels = synth_label_dim(spark, 14)
    out = asof_join(
        images.select("image_id", "ts"),
        labels.withColumnRenamed("effective_ts", "ts"),
        on="image_id",
        payload=["label"],
    )
    # label 99 is only effective 10 days after each entity's day-0 —
    # with 4-16 updates spaced << 1 day it must never be attached
    assert out.filter(F.col("label_asof") == 99).count() == 0
    assert out.filter(F.col("label_asof").isNull()).count() == 0


def test_caption_equality_roundtrip(spark, images):
    """Captions written then re-read must be exactly equal (string
    passthrough invariant)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        images.select("image_id", "ts", "caption").write.mode("overwrite").parquet(d + "/c")
        back = spark.read.parquet(d + "/c")
        diff = (
            images.select("image_id", "ts", "caption")
            .exceptAll(back)
            .count()
        )
        assert diff == 0
