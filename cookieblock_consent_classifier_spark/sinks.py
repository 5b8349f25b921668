"""Sinks for assembled feature rows (SURVEY §2.1).

- parquet: native columnar sink for (entity_id, indices, values,
  label, weight) — replaces the reference's pickled CSR + sidecar
  files (dump_sparse_matrix, processor.py:320-341).
- libsvm text: trainer-compatible `label idx:val ...` lines with
  0-based ascending indices (dump_libsvm, processor.py:343-356) —
  built as a formatted string column, written via the text sink;
  fully distributed, no driver materialization.
- debug JSON: dense {feature_name: value} per row — the golden-output
  mechanism (retrieve_debug_output, processor.py:358-373); test-only.
- feature map: one line per column `<idx>\t<name>\tq` for XGBoost
  (dump_feature_map, processor.py:382-391); driver-side metadata.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def libsvm_lines(df: DataFrame, with_weight_comment: bool = False) -> DataFrame:
    """Format (indices, values, label[, weight]) as LibSVM text lines.
    Indices are already ascending (assemble.py sorts)."""
    pairs = F.zip_with(
        "indices", "values",
        lambda i, v: F.concat(i.cast("string"), F.lit(":"), v.cast("string")),
    )
    line = F.concat_ws(" ", F.col("label").cast("string"), F.concat_ws(" ", pairs))
    return df.select(line.alias("value"))


def write_libsvm(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    libsvm_lines(df).write.mode(mode).text(path)


def debug_rows(df: DataFrame, feature_names: list[str], limit: int = 100) -> list[dict]:
    """Dense {name: value} dicts (test/debug only — collects!)."""
    out = []
    for r in df.limit(limit).collect():
        out.append(
            {
                "entity_id": r["entity_id"],
                "features": {feature_names[i]: v for i, v in zip(r["indices"], r["values"])},
            }
        )
    return out


def write_debug_json(df: DataFrame, feature_names: list[str], path: str, limit: int = 100) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fd:
        json.dump(debug_rows(df, feature_names, limit), fd, indent=1, sort_keys=True)


def write_feature_map(feature_names: list[str], path: str) -> None:
    """Byte-exact reference fmap (dump_feature_map, processor.py:
    382-391): each line `{idx} {name}-{i} i` — space-separated, type
    char `i`. feature_names here are FeatureSchema.feature_names()
    (already `-{i}`-suffixed); the index prefix is added per line."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fd:
        for i, n in enumerate(feature_names):
            fd.write(f"{i} {n} i\n")
