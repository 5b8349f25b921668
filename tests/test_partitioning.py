"""Storage-layout tests: date-partitioned image corpus → partition
pruning; files.maxPartitionBytes honored (scan granularity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark.sources.synth import synth_image_updates


def test_date_partitioned_scan_prunes(spark, tmp_path):
    """The 10^12-image corpus is written partitioned by event date;
    a day-filtered query must only scan that day's partition (pinned
    via PartitionFilters + the input files actually read)."""
    im = synth_image_updates(spark, num_entities=20, updates_per_entity=3,
                             hot_entities=0, with_bytes=False)
    path = str(tmp_path / "img_part")
    im.withColumn("dt", F.to_date("ts")).write.partitionBy("dt").parquet(path)

    back = spark.read.parquet(path)
    days = [r["dt"] for r in back.select("dt").distinct().collect()]
    assert len(days) > 3
    one_day = back.filter(F.col("dt") == days[0])

    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan, plan[:1200]

    # the files actually read must all come from the one partition dir
    files = [
        r[0]
        for r in one_day.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all(f"dt={days[0]}" in f for f in files)


def test_scan_split_size_is_configured(spark):
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "134217728"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
