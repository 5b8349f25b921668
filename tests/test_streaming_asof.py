"""Streaming as-of join == batch as-of join, end-to-end through the
streaming engine (the batch operator is the pinned truth:
tests/test_asof.py covers leakage/tie/tolerance semantics)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark.operators.asof import asof_join
from cookieblock_consent_classifier_spark.streaming.asof import (
    apply_asof_state,
    streaming_asof_join,
    tagged_union,
)

SF_DIR = "/root/testdata/sf0.001"


def _inputs(spark):
    """events facts + orders dims for a slice of users; dim ts cast to
    timestamp (orders.o_orderdate) and unique per (user, ts) so the
    batch dim_order tie-break can't diverge from arrival order."""
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("user_id") % 7 == 0)
        .select("event_id", "ts", "user_id")
    )
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .withColumnRenamed("o_custkey", "user_id")
        .filter(F.col("user_id") % 7 == 0)
        .groupBy("user_id", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    return ev, orders


def _batch_expected(ev, orders):
    return {
        r["event_id"]: r["o_orderkey_asof"]
        for r in asof_join(
            ev, orders, on="user_id", fact_ts="ts", dim_ts="o_orderdate",
            payload=["o_orderkey"], dim_order=["o_orderkey"],
        ).collect()
    }


def _run_stream(df, name, timeout=180):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout)


def test_streaming_asof_single_batch_equals_batch(spark, tmp_path):
    ev, orders = _inputs(spark)
    fsrc, dsrc = str(tmp_path / "facts"), str(tmp_path / "dims")
    ev.write.parquet(fsrc)
    orders.write.parquet(dsrc)

    fact_stream = spark.readStream.schema(ev.schema).parquet(fsrc)
    dim_stream = spark.readStream.schema(orders.schema).parquet(dsrc)
    out = streaming_asof_join(
        fact_stream, dim_stream, on="user_id", fact_ts="ts",
        dim_ts="o_orderdate", payload=["o_orderkey"],
    )
    _run_stream(out, "asof_stream_1b")

    got = {
        r["event_id"]: r["o_orderkey_asof"]
        for r in spark.table("asof_stream_1b").collect()
    }
    want = _batch_expected(ev, orders)
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_asof_multi_batch_in_order_equals_batch(spark, tmp_path):
    """Rows split into two event-time-ordered micro-batches: dim state
    persisted in the store carries batch 1 → batch 2, matching the
    batch join over the whole input. The tagged union is pre-built and
    time-split into two files streamed one per trigger."""
    ev, orders = _inputs(spark)
    unioned = tagged_union(
        ev, orders, on="user_id", fact_ts="ts", dim_ts="o_orderdate",
        payload=["o_orderkey"],
    ).cache()
    cut = unioned.agg(
        F.percentile_approx(F.unix_micros("__ets"), 0.5).alias("c")
    ).first()["c"]

    src = str(tmp_path / "union_src")
    os.makedirs(src)
    early = unioned.filter(F.unix_micros("__ets") <= cut).coalesce(1)
    late = unioned.filter(F.unix_micros("__ets") > cut).coalesce(1)
    early.write.parquet(str(tmp_path / "e"))
    late.write.parquet(str(tmp_path / "l"))
    # one data file per micro-batch, ordered by mtime: early then late
    for i, d in enumerate(["e", "l"]):
        [part] = [f for f in os.listdir(tmp_path / d) if f.startswith("part-")]
        dst = os.path.join(src, f"{i}-{part}")
        os.rename(os.path.join(tmp_path / d, part), dst)
        os.utime(dst, (time.time() + i * 10, time.time() + i * 10))

    stream = (
        spark.readStream.schema(unioned.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = apply_asof_state(
        stream, ev.schema, [orders.schema["o_orderkey"]],
        on="user_id", payload=["o_orderkey"],
    )
    _run_stream(out, "asof_stream_2b")

    got = {
        r["event_id"]: r["o_orderkey_asof"]
        for r in spark.table("asof_stream_2b").collect()
    }
    want = _batch_expected(ev, orders)
    assert len(got) == len(want) > 0
    assert got == want
