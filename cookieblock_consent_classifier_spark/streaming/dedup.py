"""Streaming exact deduplication.

The batch engine dedups on a normalized-content hash
(operators/dedup.exact_dup_clusters); an unbounded ingest stream needs
the same guarantee incrementally. Structured Streaming's
``dropDuplicates`` keeps the seen-key set in state; pairing it with a
watermark ("dropDuplicatesWithinWatermark" semantics via the event-time
column in the key) bounds that state: a duplicate arriving later than
the watermark may be re-emitted, which is the standard
state-vs-completeness trade at unbounded scale.

Also works on a batch DataFrame (dropDuplicates is batch-compatible),
which is how the parity test pins streaming output == batch distinct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Exact dedup on ``key_cols`` — one surviving row per key.

    Survivor semantics differ by mode (inherent to incremental
    processing, documented rather than papered over):
    - STREAM: first ARRIVAL wins (dropDuplicatesWithinWatermark keeps
      whichever duplicate the engine saw first); state for keys older
      than ``watermark`` (event time) is dropped — O(active-window
      keys) memory, hash-partitioned by key so the operator scales
      horizontally.
    - BATCH: earliest EVENT TIME wins (deterministic row_number over
      (ts, *order_tiebreak)); pass ``order_tiebreak`` when multiple
      duplicates can share a timestamp, otherwise the survivor among
      exact ts-ties is arbitrary.
    """
    base = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if base.isStreaming:
        base = base.withWatermark(ts_col, watermark)
        return base.dropDuplicatesWithinWatermark(list(key_cols))
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_tiebreak)
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
