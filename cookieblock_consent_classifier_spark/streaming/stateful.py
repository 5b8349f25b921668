"""Custom stateful streaming operator: per-entity running update
state via applyInPandasWithState.

The reference's per-entity sequence features assume a bounded batch of
updates; on an unbounded stream the equivalent is incremental state:
for each entity keep (update_count, last_value, last_ts) and emit, per
incoming micro-batch row-group, the updated per-entity features
(update_count, content_changed-so-far, seconds since previous update).
This is the `applyInPandasWithState` pattern (SURVEY §2.9): arbitrary
Python state with watermark-driven timeout/cleanup — used where
session_window/window aggregates can't express the semantics
(running value-change detection needs the previous VALUE, not an
aggregate).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("update_count", LongType()),
        StructField("content_changed", BooleanType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("count", LongType()),
        StructField("last_value", StringType()),
        StructField("changed", BooleanType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (entity_id,) = key
    if state.exists:
        count, last_value, changed, last_ts_us = state.get
    else:
        count, last_value, changed, last_ts_us = 0, None, False, None

    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "update_idx"])
        for _, row in pdf.iterrows():
            v = row["value"]
            if last_value is not None and v != last_value:
                changed = True
            last_value = v
            count += 1
            last_ts_us = int(pd.Timestamp(row["ts"]).value // 1000)

    state.update((count, last_value, changed, last_ts_us))
    yield pd.DataFrame(
        {
            "entity_id": [entity_id],
            "update_count": [count],
            "content_changed": [changed],
            "last_ts": [pd.Timestamp(last_ts_us * 1000) if last_ts_us else pd.NaT],
        }
    )


def streaming_entity_state(stream: DataFrame) -> DataFrame:
    """(entity_id, ts, update_idx, value) stream → running per-entity
    state rows, one per entity per micro-batch."""
    src = stream.selectExpr(
        "entity_id", "cast(ts as timestamp) as ts", "update_idx", "value"
    )
    return src.groupBy("entity_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
