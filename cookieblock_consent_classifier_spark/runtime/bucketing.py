"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant repeated cost is re-shuffling the fact table on
the entity key for every join/window pass. Writing both sides bucketed
by the key (hash-bucketed files + a saved table) lets Spark plan a
sort-merge join with ZERO exchanges — each bucket pair joins locally.
The same bucketing also feeds the per-entity window/aggregate passes.

Local demo + tests use the session warehouse; on a cluster the same
API writes to the shared catalog (or Iceberg bucket-partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on the bucket key — the
    plan must contain no Exchange (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
