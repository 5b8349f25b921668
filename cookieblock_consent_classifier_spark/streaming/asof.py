"""Streaming as-of join: point-in-time dim state on an unbounded
fact stream via applyInPandasWithState.

The batch operator (operators/asof.py) forward-fills the latest dim
state with one window pass; on a stream the equivalent is a per-entity
STATE STORE: dim rows update the entity's latest-known
(dim_ts, payload) state, fact rows emit with whatever state is
current. Same union+tag shape as batch — both sides merge into one
keyed stream, sorted (ts, tag) per micro-batch group with dim (tag 0)
before fact (tag 1) at equal timestamps, so a dim update effective
exactly at fact.ts IS visible (the batch inclusive semantics).

Semantics guarantee: output equals batch ``asof_join`` whenever rows
arrive in event-time order ACROSS micro-batches (within a batch any
order is fine — each group sorts before applying). Out-of-order
arrival across batches is the streaming-inherent limitation: state is
forward-only, a dim update older than already-emitted facts cannot
retract them. Parity is pinned in tests/test_streaming_asof.py (one
batch == batch join, and time-split multi-batch == batch join).

Scale: state is O(1) per entity (latest dim row only); the stream
shuffles once on the entity key into the state store — the same
single-exchange shape as the batch plan.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def tagged_union(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_ts: str = "ts",
    dim_ts: str = "ts",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Align fact (tag 1) and dim (tag 0) into one keyed shape:
    fact columns + __tag + __ets + __dim_<p> — the same construction
    as the batch operator (operators/asof.py:84-105), minus the
    window. Works on batch AND streaming DataFrames."""
    if not payload:
        raise ValueError("payload columns required")
    f_side = fact.withColumn("__tag", F.lit(1)).withColumn(
        "__ets", F.col(fact_ts).cast("timestamp")
    )
    for p in payload:
        f_side = f_side.withColumn(f"__dim_{p}", F.lit(None).cast(dim.schema[p].dataType))
    d_side = dim.select(
        F.col(on),
        F.col(dim_ts).cast("timestamp").alias("__ets"),
        F.lit(0).alias("__tag"),
        *[F.col(p).alias(f"__dim_{p}") for p in payload],
    )
    for field in fact.schema.fields:
        if field.name not in d_side.columns:
            d_side = d_side.withColumn(field.name, F.lit(None).cast(field.dataType))
    return f_side.unionByName(d_side.select(*f_side.columns))


def apply_asof_state(
    unioned: DataFrame,
    fact_schema: StructType,
    dim_payload_fields: list,
    on: str,
    payload: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """The state stage over a tagged_union stream: groupBy(entity) →
    applyInPandasWithState holding (last_dim_ts_us, *payload)."""
    fact_names = [f.name for f in fact_schema.fields]
    out_names = fact_names + [f"{p}{suffix}" for p in payload]
    out_schema = StructType(
        list(fact_schema.fields)
        + [StructField(f"{p}{suffix}", f.dataType) for p, f in zip(payload, dim_payload_fields)]
    )
    state_schema = StructType(
        [StructField("last_ts_us", LongType())]
        + [StructField(f"p_{i}", f.dataType) for i, f in enumerate(dim_payload_fields)]
    )
    n_payload = len(payload)

    def _update(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = list(state.get) if state.exists else [None] * (1 + n_payload)
        outs: list[dict] = []
        for pdf in pdf_iter:
            # stable sort: dim (tag 0) before fact at equal ts —
            # batch inclusive tie semantics; among equal-ts dim rows
            # the LAST in arrival order wins (batch: greatest
            # dim_order — feed pre-sorted dims for exact parity)
            pdf = pdf.sort_values(["__ets", "__tag"], kind="mergesort")
            # itertuples renames __-prefixed columns positionally
            for rd in pdf.to_dict("records"):
                if rd["__tag"] == 0:
                    st[0] = int(pd.Timestamp(rd["__ets"]).value // 1000)
                    for i, p in enumerate(payload):
                        st[1 + i] = rd[f"__dim_{p}"]
                else:
                    o = {n: rd[n] for n in fact_names}
                    for i, p in enumerate(payload):
                        o[f"{p}{suffix}"] = st[1 + i]
                    outs.append(o)
        state.update(tuple(st))
        if outs:
            yield pd.DataFrame(outs, columns=out_names)

    return unioned.groupBy(on).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_asof_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_ts: str = "ts",
    dim_ts: str = "ts",
    payload: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Streaming twin of operators/asof.asof_join (inclusive mode):
    fact stream + dim stream → fact rows with ``<payload>_asof``
    attached from the latest dim state at or before each fact ts."""
    unioned = tagged_union(fact, dim, on, fact_ts, dim_ts, payload)
    return apply_asof_state(
        unioned, fact.schema, [dim.schema[p] for p in payload], on, payload, suffix
    )
