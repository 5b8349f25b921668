"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Metric (BASELINE.json): entity-timestamps/sec of feature rows
materialized by the flagship feature pipeline; per-query wall times
for the operator suite. Scaling-efficiency evidence (local[8] vs
local[32]) is produced by scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cookieblock_consent_classifier_spark.session import get_spark

# the per-round benchmark suite: flagship pipeline + the heaviest
# operator families (temporal window, as-of, dedup, similarity, text)
BENCH_QUERIES = [
    "update_count",
    "flag_changed",
    "time_diff_stats",
    "slot_pivot",
    "sessionize",
    "asof_join_orders",
    "backfill",
    "phash_delta",
    "levenshtein_stats",
    "content_flags",
    "tpch_q1",
    "dedup_exact",
    "minhash_signatures",
    "embedding_topk",
    "text_quality",
    "entropy_zlib",
    "gestalt_diff",
    "simhash",
    "grid_search_cv",
    "rolling_time_sum",
    "dedup_clusters_cc",
    "audio_pipeline",
    "cookie_feature_pipeline",
    "cookie_pipeline_fullwidth",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    qs = entrymod.queries()

    # warm-up: JIT, codegen cache, Arrow worker pool — otherwise the
    # first timed query absorbs ~2s of one-time JVM cost
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # ... and the Python worker pool: the first pandas-UDF stage spawns
    # one worker per core (~10s one-time on 32 cores). Workers are
    # reused (spark.python.worker.reuse), so a tiny Arrow UDF across
    # all cores moves that cost out of the first timed kernel query.
    from pyspark.sql import functions as F  # noqa: PLC0415

    # (explicit Iterator form: `from __future__ import annotations`
    # stringifies hints, which pandas_udf's type inference rejects)
    def _warm_fn(it):
        for s in it:
            yield s * 1.0

    from pyspark.sql.functions import PandasUDFType  # noqa: PLC0415

    _warm = F.pandas_udf(_warm_fn, "double", PandasUDFType.SCALAR_ITER)
    spark.range(0, 10_000, 1, int(cpus)).select(
        _warm(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()

    # timings are split per query:
    #   construct = the qs[name](...) call — driver-side plan
    #     compilation; for iterative operators (connected components,
    #     Lloyd refine) this legitimately includes the actions they
    #     run while converging
    #   exec = the noop write of the returned DataFrame — the cluster
    #     execution cost, the number that scales with data
    # "queries" carries exec (the trend line, round-1 semantics);
    # "construct" is reported separately so driver-side compile cost
    # doesn't pollute the scaling signal (round-2 merged them, which
    # made the two pipeline entries look like 30-50 s regressions).
    timings: dict[str, float] = {}
    construct: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        construct[name] = round(t1 - t0, 3)
        timings[name] = round(t2 - t1, 3)
    total_sec = time.perf_counter() - t_all

    # flagship throughput: entity-timestamp rows materialized per sec
    # (the north-rule metric) over the composite feature pipeline
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_entity_ts = ev.count()
    # entry() is pinned to sf0.001 for the smoke check; rebuild the same
    # flagship plan at the bench SF via the module helper. Min of 3 runs:
    # the sandbox host is shared and identical runs vary up to 3x under
    # external load — the fastest run is the least-contended measurement
    flagship_runs = []
    for _ in range(3):
        # rebuild the plan each run: re-writing the SAME DataFrame lets
        # Spark reuse its shuffle files and the repeat runs measure only
        # the post-shuffle stages — a fresh plan keeps every run honest
        flagship = _flagship_at(spark, sf_dir)
        t0 = time.perf_counter()
        flagship.write.format("noop").mode("overwrite").save()
        flagship_runs.append(round(time.perf_counter() - t0, 3))
    flagship_sec = min(flagship_runs)
    throughput = n_entity_ts / flagship_sec if flagship_sec > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "entity-timestamps/sec (flagship feature pipeline)",
                "value": round(throughput, 1),
                "unit": "rows/sec",
                "queries": timings,
                "construct": construct,
                "total_sec": round(total_sec, 3),
                "flagship_sec": round(flagship_sec, 3),
                "flagship_runs": flagship_runs,
                "input_rows": n_entity_ts,
                "cpus": int(cpus),
                "sf": sf,
            }
        )
    )


def _flagship_at(spark, sf_dir):
    from pyspark.sql import Window, functions as F

    from cookieblock_consent_classifier_spark.operators import asof, temporal

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "user_id"
    )
    enriched = asof.asof_join(
        ev, orders, on="user_id", fact_ts="ts", dim_ts="o_orderdate",
        payload=["o_orderkey"], dim_order=["o_orderkey"],
    )
    enriched = temporal.sessionize(enriched, "user_id", "ts", 1800, order_tiebreak=["event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    enriched = enriched.withColumn("lev", F.levenshtein(F.lag("props").over(w), F.col("props")))
    gap = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
    ) / F.lit(1e6)
    enriched = enriched.withColumn("gap_s", gap)
    return enriched.groupBy("user_id").agg(
        F.count("*").alias("n_updates"),
        (F.max("session_id") + 1).alias("n_sessions"),
        F.round(F.coalesce(F.avg("gap_s"), F.lit(-1.0)), 4).alias("gap_mean"),
        F.round(F.coalesce(F.avg("lev"), F.lit(-1.0)), 4).alias("lev_mean"),
        F.coalesce(temporal.flag_changed("event_type", "user_id", ["ts"]), F.lit(0.0)).alias("type_changed"),
        F.max("o_orderkey_asof").alias("last_orderkey_asof"),
    )


if __name__ == "__main__":
    main()
