"""Readers: parquet/JSON entity-update tables + the driver testdata
star schema.

The reference loads N JSON files into one dict where later files win
on key collision (prepare_training_data.py:64-80). Our analogue is a
multi-path union + last-writer-wins dedupe (`union_latest_wins`) —
distributed, no driver-side dict.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession, sf_dir: str, names: Sequence[str] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def read_entity_updates(spark: SparkSession, paths: Sequence[str], fmt: str = "parquet") -> DataFrame:
    """Multi-path scan; format 'parquet' | 'json' | 'iceberg'.

    Iceberg requires the iceberg-spark-runtime jar on the classpath
    plus a configured catalog (north rule names Iceberg as the target
    table format; this TEST CONTAINER ships parquet-only, so the
    branch is exercised by tests/test_sinks.py only up to the clean
    unavailability error — see README 'container limits')."""
    if fmt == "iceberg":
        if len(paths) != 1:
            raise ValueError("iceberg reads take exactly one table identifier")
        try:
            return spark.read.format("iceberg").load(paths[0])
        except Exception as e:  # AnalysisException lacks a stable subclass for this
            if "Failed to find data source" in str(e) or "DATA_SOURCE_NOT_FOUND" in str(e):
                raise RuntimeError(
                    "Iceberg runtime is not on the classpath: submit with "
                    "--packages org.apache.iceberg:iceberg-spark-runtime-"
                    "<spark_ver>_<scala_ver>:<iceberg_ver> and configure a "
                    "catalog (spark.sql.catalog.*). This container is "
                    "parquet-only."
                ) from e
            raise
    reader = spark.read.format(fmt)
    if fmt == "json":
        reader = reader.option("multiLine", "true")
    return reader.load(list(paths))


def read_libsvm(spark: SparkSession, path: str, num_features: int | None = None) -> DataFrame:
    """LibSVM matrix load (classifiers/utils.py:39-82 load_data path
    for .libsvm inputs): returns (label double, features mllib
    SparseVector). numFeatures pins the width so partial files stay
    schema-stable."""
    reader = spark.read.format("libsvm")
    if num_features:
        reader = reader.option("numFeatures", str(num_features))
    return reader.load(path)


def cookie_json_to_rows(data: dict) -> list[tuple]:
    """Flatten the reference's training-data JSON shape
    ({cookie_key -> {name, domain, path, first_party_domain, label,
    cmp_origin, variable_data: [update...]}}; README.md:40-63 /
    training_data/test_case.json) into COOKIE_UPDATE_SCHEMA rows.
    Update order becomes (ts, update_idx) with a synthetic 60s cadence —
    the reference's positional ordering contract (processor.py:25)
    made explicit as event time."""
    from datetime import datetime, timedelta

    t0 = datetime(2021, 1, 1)
    rows: list[tuple] = []
    for key, entry in data.items():
        for i, u in enumerate(entry["variable_data"]):
            rows.append((
                key,
                t0 + timedelta(seconds=60 * i),
                entry["name"],
                entry["domain"],
                entry["path"],
                entry["first_party_domain"],
                int(entry.get("label", -1)),
                int(entry.get("cmp_origin", -1)),
                i,
                u["value"],
                int(u["expiry"]),
                bool(u["session"]),
                bool(u["http_only"]),
                bool(u["host_only"]),
                bool(u["secure"]),
                u["same_site"],
            ))
    return rows


def union_latest_wins(
    dfs: Sequence[DataFrame], key_cols: Sequence[str], precedence_col: str = "__src_rank"
) -> DataFrame:
    """Union N inputs; on key collision the row from the LATEST input
    wins (reference dict-merge semantics,
    prepare_training_data.py:79). Each df is tagged with its position;
    row_number over (key) ordered by tag desc keeps the winner."""
    tagged = [df.withColumn(precedence_col, F.lit(i)) for i, df in enumerate(dfs)]
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(precedence_col))
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", precedence_col)
    )
