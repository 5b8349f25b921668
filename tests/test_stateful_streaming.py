"""applyInPandasWithState custom stateful operator, end-to-end through
the streaming engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark.sources.synth import synth_cookie_updates
from cookieblock_consent_classifier_spark.streaming.stateful import streaming_entity_state


def test_streaming_entity_state_matches_batch(spark, tmp_path):
    cookies = synth_cookie_updates(spark, num_entities=12, updates_per_entity=4)
    src = str(tmp_path / "src")
    cookies.select("entity_id", "ts", "update_idx", "value").write.parquet(src)

    stream = spark.readStream.schema(
        cookies.select("entity_id", "ts", "update_idx", "value").schema
    ).parquet(src)
    q = (
        streaming_entity_state(stream)
        .writeStream.format("memory").queryName("ent_state")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    got = {
        r["entity_id"]: r
        for r in spark.sql(
            # one row per entity per micro-batch: keep the final state
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY entity_id "
            "ORDER BY update_count DESC) rn FROM ent_state) WHERE rn = 1"
        ).collect()
    }
    batch = {
        r["entity_id"]: r
        for r in cookies.groupBy("entity_id")
        .agg(
            F.count("*").alias("n"),
            (F.count_distinct("value") > 1).alias("changed"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(got) == set(batch)
    for e, b in batch.items():
        assert got[e]["update_count"] == b["n"], e
        assert got[e]["content_changed"] == b["changed"], e
