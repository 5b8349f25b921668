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
    assert q.awaitTermination(timeout), f"{name}: streaming query timed out"


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


def test_streaming_asof_state_ttl_evicts_idle_entities(spark, tmp_path):
    """EventTime TTL bounds the state store: entity X gets dim state
    in batch 1, sits idle while the watermark advances past its
    timeout (filler batches 2-3 from entity Y), is evicted, and its
    batch-4 fact re-opens COLD (null asof) — whereas without a TTL the
    same input still serves the old dim state. Timeout fires only for
    groups with no data in the batch, hence the idle filler batches."""
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType, LongType, StructField as SF, StructType as ST, TimestampType,
    )

    import datetime as dt

    fact_schema = ST([SF("event_id", LongType()), SF("ts", TimestampType()), SF("user_id", LongType())])
    d0 = dt.datetime(2026, 1, 1)

    def day(n, hours=0):
        return d0 + dt.timedelta(days=n, hours=hours)

    # pre-tagged union rows: fact cols + __tag + __ets + __dim_v
    union_schema = ST(list(fact_schema.fields) + [
        SF("__tag", IntegerType()), SF("__ets", TimestampType()), SF("__dim_v", LongType()),
    ])
    batches = [
        # 1: dim X@d0 (v=1), fact X@d0+1h
        [(None, None, 7, 0, day(0), 1), (100, day(0, 1), 7, 1, day(0, 1), None)],
        # 2-3: filler from entity Y advancing the watermark
        [(200, day(10), 8, 1, day(10), None)],
        [(201, day(11), 8, 1, day(11), None)],
        # 4: fact X@d12 — X was idle > ttl in event time
        [(101, day(12), 7, 1, day(12), None)],
    ]
    src = str(tmp_path / "ttl_src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        f = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, union_schema).coalesce(1).write.parquet(f)
        [part] = [x for x in os.listdir(f) if x.startswith("part-")]
        dst = os.path.join(src, f"{i}-{part}")
        os.rename(os.path.join(f, part), dst)
        os.utime(dst, (time.time() + i * 10, time.time() + i * 10))

    from cookieblock_consent_classifier_spark.streaming.asof import apply_asof_state

    def run(name, ttl):
        stream = (
            spark.readStream.schema(union_schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        if ttl:
            stream = stream.withWatermark("__ets", "0 seconds")
        out = apply_asof_state(
            stream, fact_schema, [union_schema["__dim_v"]],
            on="user_id", payload=["v"], suffix="_asof", state_ttl=ttl,
        )
        _run_stream(out, name)
        return {r["event_id"]: r["v_asof"] for r in spark.table(name).collect()}

    with_ttl = run("asof_ttl", "2 days")
    no_ttl = run("asof_nottl", None)

    assert with_ttl[100] == 1  # in-window fact sees the dim state
    assert with_ttl[101] is None  # evicted: re-opened cold
    assert no_ttl[101] == 1  # contrast: without TTL the state survives


def test_transform_with_state_asof_equals_batch(spark, tmp_path):
    """The transformWithStateInPandas (state-v2) twin produces the
    same output as batch asof_join — pinning that the operator's
    semantics are API-independent. Executes only where the state-v2
    Python runtime exists (needs protobuf, absent in this container:
    the processor LOGIC is pinned below instead, and the module raises
    a clean actionable error — same gating pattern as Iceberg)."""
    import pytest

    from cookieblock_consent_classifier_spark.streaming.asof_tws import (
        ROCKSDB_PROVIDER, apply_asof_tws, tws_runtime_available,
    )

    if not tws_runtime_available():
        with pytest.raises(RuntimeError, match="protobuf"):
            apply_asof_tws(
                tagged_union(*_inputs(spark), on="user_id", fact_ts="ts",
                             dim_ts="o_orderdate", payload=["o_orderkey"]),
                _inputs(spark)[0].schema, [_inputs(spark)[1].schema["o_orderkey"]],
                on="user_id", payload=["o_orderkey"],
            )
        pytest.skip("state-v2 Python runtime unavailable (no protobuf); "
                    "clean-error gate asserted instead")

    ev, orders = _inputs(spark)
    unioned = tagged_union(
        ev, orders, on="user_id", fact_ts="ts", dim_ts="o_orderdate",
        payload=["o_orderkey"],
    )
    src = str(tmp_path / "tws_src")
    unioned.write.parquet(src)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = spark.readStream.schema(unioned.schema).parquet(src)
        out = apply_asof_tws(
            stream, ev.schema, [orders.schema["o_orderkey"]],
            on="user_id", payload=["o_orderkey"],
        )
        _run_stream(out, "asof_tws")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    got = {
        r["event_id"]: r["o_orderkey_asof"]
        for r in spark.table("asof_tws").collect()
    }
    want = _batch_expected(ev, orders)
    assert len(got) == len(want) > 0
    assert got == want


def test_tws_processor_logic_pinned_without_runtime():
    """Drive AsofStateProcessor.handleInputRows directly with a fake
    ValueState: dim-before-fact tie order, cross-batch state carriage,
    and the integral-payload coercion — so the state-v2 twin's LOGIC
    is pinned even where its runtime (protobuf) is absent."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField as SF, StructType as ST
    from cookieblock_consent_classifier_spark.streaming.asof_tws import (
        AsofStateProcessor,
    )

    class FakeState:
        def __init__(self):
            self.v = None
        def exists(self):
            return self.v is not None
        def get(self):
            return self.v
        def update(self, t):
            self.v = t
        def clear(self):
            self.v = None

    class FakeHandle:
        def __init__(self, st):
            self.st = st
        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.st

    state_schema = ST([SF("last_ts_us", LongType()), SF("p_0", LongType())])
    proc = AsofStateProcessor(
        ["event_id", "user_id"], ["v"], "_asof", state_schema,
        [SF("v", LongType())],
    )
    st = FakeState()
    proc.init(FakeHandle(st))

    d0 = dt.datetime(2026, 1, 1)
    # batch 1: dim v=1 at t0 and fact at the SAME ts (inclusive: sees 1);
    # dim value arrives float64 (pandas nullable-int upcast)
    b1 = pd.DataFrame({
        "event_id": [np.nan, 10.0], "user_id": [7, 7], "__tag": [0, 1],
        "__ets": [d0, d0], "__dim_v": [1.0, np.nan],
    })
    [out1] = list(proc.handleInputRows((7,), iter([b1]), None))
    assert out1["v_asof"].tolist() == [1]
    assert st.v[1] == 1 and isinstance(st.v[1], int)  # coerced, not 1.0

    # batch 2: fact only — served from carried state
    b2 = pd.DataFrame({
        "event_id": [11.0], "user_id": [7], "__tag": [1],
        "__ets": [d0 + dt.timedelta(days=1)], "__dim_v": [np.nan],
    })
    [out2] = list(proc.handleInputRows((7,), iter([b2]), None))
    assert out2["v_asof"].tolist() == [1]


def test_streaming_asof_resumes_from_checkpoint(spark, tmp_path):
    """North-rule resumability: the as-of state store survives a query
    RESTART via the streaming checkpoint — batch-1 dim state serves a
    batch-2 fact processed by a brand-new query instance, each fact is
    emitted exactly once, and values equal the batch join."""
    import datetime as dt

    from pyspark.sql.types import (
        IntegerType, LongType, StructField as SF, StructType as ST, TimestampType,
    )

    fact_schema = ST([SF("event_id", LongType()), SF("ts", TimestampType()), SF("user_id", LongType())])
    union_schema = ST(list(fact_schema.fields) + [
        SF("__tag", IntegerType()), SF("__ets", TimestampType()), SF("__dim_v", LongType()),
    ])
    d0 = dt.datetime(2026, 3, 1)
    b1 = [(None, None, 7, 0, d0, 41), (100, d0 + dt.timedelta(hours=1), 7, 1, d0 + dt.timedelta(hours=1), None)]
    b2 = [(101, d0 + dt.timedelta(days=1), 7, 1, d0 + dt.timedelta(days=1), None)]

    src = str(tmp_path / "resume_src")
    ckpt = str(tmp_path / "resume_ckpt")
    sink = str(tmp_path / "resume_sink")
    os.makedirs(src)

    def add_file(i, rows):
        f = str(tmp_path / f"rb{i}")
        spark.createDataFrame(rows, union_schema).coalesce(1).write.parquet(f)
        [part] = [x for x in os.listdir(f) if x.startswith("part-")]
        os.rename(os.path.join(f, part), os.path.join(src, f"{i}-{part}"))

    def run_once():
        stream = spark.readStream.schema(union_schema).parquet(src)
        out = apply_asof_state(
            stream, fact_schema, [union_schema["__dim_v"]],
            on="user_id", payload=["v"], suffix="_asof",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    add_file(0, b1)
    run_once()  # query #1: processes batch 1, checkpoints state
    add_file(1, b2)
    run_once()  # query #2: NEW instance resumes from the checkpoint

    got = {
        r["event_id"]: r["v_asof"]
        for r in spark.read.parquet(sink).collect()
    }
    # exactly-once: two facts, one row each; fact 101 served from the
    # RESTORED batch-1 dim state
    assert got == {100: 41, 101: 41}


def test_streaming_asof_null_dim_payload_does_not_clobber(spark, tmp_path):
    """Batch asof_join forward-fills each payload column with
    last(ignorenulls=True): a dim row whose payload is NULL must not
    clobber the stored state in the streaming twin either."""
    import datetime as dt

    d0 = dt.datetime(2026, 2, 1)
    fact = spark.createDataFrame(
        [(1, d0 + dt.timedelta(hours=5), 7)], "event_id long, ts timestamp, user_id long"
    )
    dim = spark.createDataFrame(
        [(7, d0, 5), (7, d0 + dt.timedelta(hours=1), None)],
        "user_id long, ts timestamp, v long",
    )
    want = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(fact, dim, on="user_id", payload=["v"]).collect()
    }
    assert want == {1: 5}  # the batch truth itself

    fsrc, dsrc = str(tmp_path / "nf"), str(tmp_path / "nd")
    fact.write.parquet(fsrc)
    dim.write.parquet(dsrc)
    out = streaming_asof_join(
        spark.readStream.schema(fact.schema).parquet(fsrc),
        spark.readStream.schema(dim.schema).parquet(dsrc),
        on="user_id", fact_ts="ts", dim_ts="ts", payload=["v"],
    )
    _run_stream(out, "asof_nullclobber")
    got = {r["event_id"]: r["v_asof"] for r in spark.table("asof_nullclobber").collect()}
    assert got == want


def test_streaming_asof_tolerance_matches_batch(spark, tmp_path):
    """The streaming staleness cut (tolerance_seconds) equals the
    batch operator's merge_asof-style tolerance on the same input —
    including facts whose state is too old (nulls) and facts with no
    prior dim at all."""
    ev, _ = _inputs(spark)
    # dims drawn from the events stream itself (every 5th event) so
    # dim and fact timestamps interleave; 2h tolerance → mixed outcome
    dim = (
        ev.filter(F.col("event_id") % 5 == 0)
        .select("user_id", "ts", F.col("event_id").alias("v"))
    )
    tol = 2 * 3600.0
    want = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(
            ev, dim, on="user_id", fact_ts="ts", dim_ts="ts",
            payload=["v"], dim_order=["v"], tolerance_seconds=tol,
        ).collect()
    }
    assert any(v is None for v in want.values())  # the cut actually fires
    assert any(v is not None for v in want.values())

    fsrc, dsrc = str(tmp_path / "tf"), str(tmp_path / "td")
    ev.write.parquet(fsrc)
    dim.write.parquet(dsrc)
    out = streaming_asof_join(
        spark.readStream.schema(ev.schema).parquet(fsrc),
        spark.readStream.schema(dim.schema).parquet(dsrc),
        on="user_id", fact_ts="ts", dim_ts="ts",
        payload=["v"], tolerance_seconds=tol,
    )
    _run_stream(out, "asof_tol_stream")
    got = {
        r["event_id"]: r["v_asof"]
        for r in spark.table("asof_tol_stream").collect()
    }
    assert got == want


def test_late_fact_never_leaks_future_state_and_is_counted(spark, tmp_path):
    """VERDICT r4 item 6, corrected: Spark does NOT watermark-filter
    applyInPandasWithState input (this test proves it — the late fact
    REACHES the operator), so the round-4 'watermark silently drops
    late rows' caveat was wrong, and the naive behavior would have
    served a day-0 fact the dim state from day 10 — temporal leakage.
    The leakage guard emits NULL for a fact older than its stored dim
    state and counts it in the late_facts_nulled accumulator; the
    in-window fact from the same batch still gets served."""
    import datetime as dt

    from pyspark.sql.types import (
        IntegerType, LongType, StructField as SF, StructType as ST, TimestampType,
    )

    from cookieblock_consent_classifier_spark.streaming.asof import (
        watermark_drop_counts,
    )

    fact_schema = ST([SF("event_id", LongType()), SF("ts", TimestampType()), SF("user_id", LongType())])
    union_schema = ST(list(fact_schema.fields) + [
        SF("__tag", IntegerType()), SF("__ets", TimestampType()), SF("__dim_v", LongType()),
    ])
    d0 = dt.datetime(2026, 1, 1)

    def day(n):
        return d0 + dt.timedelta(days=n)

    batches = [
        # 1: dim+fact at day 10 → watermark advances to day 10
        [(None, None, 7, 0, day(10), 5), (300, day(10), 7, 1, day(10), None)],
        # 2: one LATE fact (day 0, older than the stored dim state)
        #    + one in-window fact (day 11)
        [(301, day(0), 7, 1, day(0), None), (302, day(11), 7, 1, day(11), None)],
    ]
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        f = str(tmp_path / f"lb{i}")
        spark.createDataFrame(rows, union_schema).coalesce(1).write.parquet(f)
        [part] = [x for x in os.listdir(f) if x.startswith("part-")]
        dst = os.path.join(src, f"{i}-{part}")
        os.rename(os.path.join(f, part), dst)
        os.utime(dst, (time.time() + i * 10, time.time() + i * 10))

    stream = (
        spark.readStream.schema(union_schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("__ets", "0 seconds")
    )
    metrics: dict = {}
    out = apply_asof_state(
        stream, fact_schema, [union_schema["__dim_v"]],
        on="user_id", payload=["v"], suffix="_asof", state_ttl="30 days",
        metrics=metrics,
    )
    q = (
        out.writeStream.format("memory").queryName("asof_lates")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180), "streaming query timed out"

    got = {r["event_id"]: r["v_asof"] for r in spark.table("asof_lates").collect()}
    # the late fact reached the operator (NOT dropped) but got NULL,
    # never the day-10 dim state from its own future
    assert 301 in got and got[301] is None, got
    assert got[300] == 5 and got[302] == 5
    assert metrics["late_facts_nulled"].value == 1
    # Spark's own drop metric confirms nothing was engine-filtered
    stats = watermark_drop_counts(q)
    assert stats["batches_observed"] >= 2
    assert stats["rows_dropped_by_watermark"] == 0, stats


def test_late_dim_never_regresses_state(spark, tmp_path):
    """Forward-only state (code-review r5 finding): a dim row arriving
    LATE across batches (older than the stored dim state) must not
    regress the state — the batch twin serves the latest dim <= fact
    ts, not the latest-ARRIVED. Batch 1 stores dim day-10 (v=5);
    batch 2 delivers a late dim day-0 (v=1) then a fact at day 11,
    which must still see v=5."""
    import datetime as dt

    from pyspark.sql.types import (
        IntegerType, LongType, StructField as SF, StructType as ST, TimestampType,
    )

    fact_schema = ST([SF("event_id", LongType()), SF("ts", TimestampType()), SF("user_id", LongType())])
    union_schema = ST(list(fact_schema.fields) + [
        SF("__tag", IntegerType()), SF("__ets", TimestampType()), SF("__dim_v", LongType()),
    ])
    d0 = dt.datetime(2026, 1, 1)

    def day(n):
        return d0 + dt.timedelta(days=n)

    batches = [
        [(None, None, 7, 0, day(10), 5), (400, day(10), 7, 1, day(10), None)],
        [(None, None, 7, 0, day(0), 1), (401, day(11), 7, 1, day(11), None)],
    ]
    src = str(tmp_path / "latedim_src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        f = str(tmp_path / f"ld{i}")
        spark.createDataFrame(rows, union_schema).coalesce(1).write.parquet(f)
        [part] = [x for x in os.listdir(f) if x.startswith("part-")]
        dst = os.path.join(src, f"{i}-{part}")
        os.rename(os.path.join(f, part), dst)
        os.utime(dst, (time.time() + i * 10, time.time() + i * 10))

    stream = (
        spark.readStream.schema(union_schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = apply_asof_state(
        stream, fact_schema, [union_schema["__dim_v"]],
        on="user_id", payload=["v"], suffix="_asof",
    )
    q = (
        out.writeStream.format("memory").queryName("asof_latedim")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180), "streaming query timed out"
    got = {r["event_id"]: r["v_asof"] for r in spark.table("asof_latedim").collect()}
    assert got[400] == 5
    assert got[401] == 5, "late dim must not regress forward-only state"
