"""Stage checkpoints with per-partition lineage + metrics and
idempotent resume (north rule: "every stage checkpoints with
per-partition lineage and metrics so runs resume idempotently").

Model: a pipeline is a named sequence of stage functions
``DataFrame|None -> DataFrame``. Each stage materializes to
``<root>/<stage>/data`` (parquet) and writes a ``manifest.json``
recording:

- a fingerprint of the stage inputs (upstream manifest fingerprints +
  declared config), so a resume only reuses a checkpoint whose inputs
  are unchanged;
- per-partition lineage: for each output partition id, the set of
  input files that fed it (via input_file_name) and its row count —
  the audit trail for selective re-runs and skew forensics;
- wall-clock + row-count metrics (the distributed analogue of the
  reference's per-feature-function ns timings, processor.py:570-586).

Resume: a stage whose manifest exists, is marked complete, and
fingerprint-matches is skipped — its parquet is read back instead of
recomputing. The parquet write itself is atomic-enough for this
single-writer model (Spark writes to _temporary then commits; the
manifest is written only after the write succeeds).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class StageResult:
    name: str
    df: DataFrame
    skipped: bool
    wall_sec: float
    rows: int
    manifest_path: str


# manifest lineage bound: files beyond this are dropped from the
# manifest with input_files_truncated=true (never silently)
MAX_LINEAGE_FILES = 100_000


def _fingerprint(parts: list[str]) -> str:
    import hashlib

    return hashlib.md5("||".join(parts).encode()).hexdigest()


@dataclass
class CheckpointedPipeline:
    spark: SparkSession
    root: str
    config_token: str = ""  # bump to invalidate all stages
    results: list[StageResult] = field(default_factory=list)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest(self, name: str) -> dict | None:
        p = os.path.join(self._stage_dir(name), "manifest.json")
        if not os.path.exists(p):
            return None
        try:
            with open(p, encoding="utf-8") as fd:
                return json.load(fd)
        except Exception:
            return None

    def stage(
        self,
        name: str,
        fn: Callable[[DataFrame | None], DataFrame],
        upstream: DataFrame | None = None,
        upstream_fingerprint: str = "",
    ) -> StageResult:
        """Run (or resume) one stage. ``fn`` builds the stage's
        DataFrame from ``upstream`` (None for source stages)."""
        sdir = self._stage_dir(name)
        data_dir = os.path.join(sdir, "data")
        fp = _fingerprint([self.config_token, name, upstream_fingerprint])

        man = self._manifest(name)
        if man and man.get("complete") and man.get("fingerprint") == fp:
            df = self.spark.read.parquet(data_dir).drop("__part_id")
            res = StageResult(name, df, True, 0.0, man["rows"], os.path.join(sdir, "manifest.json"))
            self.results.append(res)
            return res

        t0 = time.perf_counter()
        out = fn(upstream)
        tagged = out.withColumn("__part_id", F.spark_partition_id())
        tagged.write.mode("overwrite").parquet(data_dir)
        written = self.spark.read.parquet(data_dir)

        # stage-level input lineage: the distinct source files the
        # upstream scan read (empty for non-file sources). Bounded:
        # at 10^12-row scale a stage can read millions of files — the
        # manifest records up to MAX_LINEAGE_FILES and FLAGS the
        # truncation explicitly (a silently capped list would read as
        # "complete" in an audit).
        input_files: list[str] = []
        input_files_truncated = False
        if upstream is not None:
            try:
                rows = (
                    upstream.select(F.input_file_name().alias("f"))
                    .distinct()
                    .limit(MAX_LINEAGE_FILES + 1)
                    .collect()
                )
                input_files = sorted(
                    os.path.basename(r["f"]) for r in rows if r["f"]
                )
                if len(input_files) > MAX_LINEAGE_FILES:
                    input_files = input_files[:MAX_LINEAGE_FILES]
                    input_files_truncated = True
            except Exception:
                input_files = []

        # per-partition lineage from the written data: rows + the
        # checkpoint file(s) holding each logical partition
        lineage_rows = (
            written.withColumn("__file", F.input_file_name())  # project first:
            # non-deterministic exprs are rejected inside agg functions
            .groupBy("__part_id")
            .agg(
                F.count("*").alias("rows"),
                F.collect_set("__file").alias("out_files"),
            )
            .collect()
        )
        rows = sum(r["rows"] for r in lineage_rows)
        wall = time.perf_counter() - t0
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "complete": True,
            "rows": rows,
            "wall_sec": round(wall, 3),
            "input_files": input_files,
            "input_files_truncated": input_files_truncated,
            "partitions": {
                str(r["__part_id"]): {
                    "rows": r["rows"],
                    "files": sorted(os.path.basename(f) for f in r["out_files"]),
                }
                for r in lineage_rows
            },
        }
        with open(os.path.join(sdir, "manifest.json"), "w", encoding="utf-8") as fd:
            json.dump(manifest, fd, indent=1, sort_keys=True)
        res = StageResult(
            name, written.drop("__part_id"), False, wall, rows, os.path.join(sdir, "manifest.json")
        )
        self.results.append(res)
        return res

    def metrics(self) -> list[dict]:
        return [
            {"stage": r.name, "skipped": r.skipped, "wall_sec": round(r.wall_sec, 3), "rows": r.rows}
            for r in self.results
        ]
