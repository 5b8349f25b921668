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

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-writer-wins exact dedup on ``key_cols``.

    On a stream, state for keys older than ``watermark`` (event time)
    is dropped — O(active-window keys) memory per partition instead of
    O(all keys ever). State is hash-partitioned by key, so the
    operator scales horizontally with executors.
    """
    base = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if base.isStreaming:
        base = base.withWatermark(ts_col, watermark)
        return base.dropDuplicatesWithinWatermark(list(key_cols))
    return base.dropDuplicates(list(key_cols))
