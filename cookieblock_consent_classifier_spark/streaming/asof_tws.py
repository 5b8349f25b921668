"""Streaming as-of join on the transformWithStateInPandas API
(Spark 4 arbitrary-state v2) — same semantics as streaming/asof.py.

Why a second implementation: transformWithState is Spark's
forward-looking stateful operator (typed state handles, native
per-state TTL, timers, RocksDB-backed schema'd state) and is the API
a new deployment would standardize on; applyInPandasWithState remains
the widely-deployed v1. Both twins share the tagged-union input shape
and are pinned to the SAME batch asof_join truth in
tests/test_streaming_asof.py — the pair demonstrates the operator's
semantics are API-independent.

State: one ValueState holding (last_dim_ts_us, *payload) per entity;
``ttl_ms`` uses the API's NATIVE state TTL (processing-time based —
idle entities are dropped by the store itself, no timer bookkeeping;
contrast asof.py's event-time timeout eviction).

Requires the RocksDB state store provider
(spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider)
— transformWithState does not run on the default HDFS-backed store —
AND the ``protobuf`` Python package (pyspark's state-v2 client speaks
protobuf to the JVM). This container ships no protobuf, so the runtime
path cannot execute here: ``require_tws_runtime()`` raises a clean
actionable error, the plan-construction path is still unit-covered,
and the test suite skips the execution pin with the reason recorded
(tests/test_streaming_asof.py) — the same honest gating used for the
Iceberg runtime. On a real cluster: ``pip install protobuf`` +
the provider conf, nothing else.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_runtime_available() -> bool:
    """True when the transformWithState Python runtime can execute:
    pyspark's state-v2 API client imports google.protobuf at its first
    set_handle_state call (StateMessage_pb2), and without it the
    driver-side streaming worker crashes opaquely mid-query."""
    try:
        import google.protobuf.descriptor  # noqa: F401, PLC0415
    except ImportError:
        return False
    return True


def require_tws_runtime() -> None:
    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' Python package "
            "(pyspark's state-v2 client) which is not installed in this "
            "environment; install protobuf and set "
            f"spark.sql.streaming.stateStore.providerClass={ROCKSDB_PROVIDER}. "
            "The applyInPandasWithState twin (streaming/asof.py) runs "
            "everywhere and is pinned to the same batch semantics."
        )

_INTEGRAL = {"byte", "short", "integer", "long"}


def payload_convs(dim_payload_fields: list):
    """Per-payload coercers: pandas upcasts nullable ints to float64,
    and a float written into an integral state field silently
    round-trips as NULL (see streaming/asof.py)."""
    return [
        (lambda v: None if pd.isna(v) else int(v))
        if f.dataType.typeName() in _INTEGRAL
        else (lambda v: None if pd.isna(v) else v)
        for f in dim_payload_fields
    ]


class AsofStateProcessor(StatefulProcessor):
    """Per-entity latest-dim-state store; dim rows (tag 0) update it,
    fact rows (tag 1) emit with the current state. Same sort and tie
    semantics as asof.apply_asof_state."""

    def __init__(
        self,
        fact_names: list[str],
        payload: Sequence[str],
        suffix: str,
        state_schema: StructType,
        dim_payload_fields: list,
        ttl_ms: int | None = None,
        tolerance_seconds: float | None = None,
    ) -> None:
        self.fact_names = fact_names
        self.payload = list(payload)
        self.suffix = suffix
        self.state_schema = state_schema
        self.dim_payload_fields = dim_payload_fields
        self.ttl_ms = ttl_ms
        self.tol_us = (
            int(tolerance_seconds * 1e6) if tolerance_seconds is not None else None
        )
        self.out_names = fact_names + [f"{p}{suffix}" for p in payload]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.dim = handle.getValueState(
            "dim", self.state_schema, ttlDurationMs=self.ttl_ms
        )
        self.convs = payload_convs(self.dim_payload_fields)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = len(self.payload)
        st = list(self.dim.get()) if self.dim.exists() else [None] * (1 + n)
        outs: list[dict] = []
        for pdf in rows:
            pdf = pdf.sort_values(["__ets", "__tag"], kind="mergesort")
            for rd in pdf.to_dict("records"):
                if rd["__tag"] == 0:
                    dim_us = int(pd.Timestamp(rd["__ets"]).value // 1000)
                    # forward-only: a late dim must not regress the
                    # as-of state (see streaming/asof.apply_asof_state)
                    if st[0] is not None and dim_us < st[0]:
                        continue
                    st[0] = dim_us
                    for i, p in enumerate(self.payload):
                        # batch parity: last(ignorenulls=True) — a
                        # NULL dim value must NOT clobber state
                        v = self.convs[i](rd[f"__dim_{p}"])
                        if v is not None:
                            st[1 + i] = v
                else:
                    fact_us = int(pd.Timestamp(rd["__ets"]).value // 1000)
                    # late-fact leakage guard (same as streaming/asof
                    # .apply_asof_state): stored dim state newer than
                    # the fact's own event time must never be served
                    late = st[0] is not None and st[0] > fact_us
                    stale = (
                        self.tol_us is not None
                        and (st[0] is None or fact_us - st[0] > self.tol_us)
                    )
                    o = {c: rd[c] for c in self.fact_names}
                    for i, p in enumerate(self.payload):
                        o[f"{p}{self.suffix}"] = None if (stale or late) else st[1 + i]
                    outs.append(o)
        self.dim.update(tuple(st))
        if outs:
            yield pd.DataFrame(outs, columns=self.out_names)

    def close(self) -> None:
        pass


def apply_asof_tws(
    unioned: DataFrame,
    fact_schema: StructType,
    dim_payload_fields: list,
    on: str,
    payload: Sequence[str],
    suffix: str = "_asof",
    ttl_ms: int | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """transformWithStateInPandas stage over a tagged_union stream
    (streaming/asof.tagged_union builds the input shape)."""
    require_tws_runtime()
    fact_names = [f.name for f in fact_schema.fields]
    out_schema = StructType(
        list(fact_schema.fields)
        + [StructField(f"{p}{suffix}", f.dataType) for p, f in zip(payload, dim_payload_fields)]
    )
    state_schema = StructType(
        [StructField("last_ts_us", LongType())]
        + [StructField(f"p_{i}", f.dataType) for i, f in enumerate(dim_payload_fields)]
    )
    proc = AsofStateProcessor(
        fact_names, payload, suffix, state_schema, dim_payload_fields, ttl_ms,
        tolerance_seconds,
    )
    # state TTL requires TimeMode.ProcessingTime — Spark rejects a
    # ttlDurationMs state in timeMode "none"
    # (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL)
    time_mode = "processingTime" if ttl_ms is not None else "none"
    return unioned.groupBy(on).transformWithStateInPandas(
        proc, outputStructType=out_schema, outputMode="append", timeMode=time_mode
    )
