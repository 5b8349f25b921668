"""The oracled end-to-end pipeline surface (driver query
``cookie_feature_pipeline``, VERDICT r4 item 1): the real
compile_features + assembler over compiler.native_schema on the
events-derived cookie table, value-pinned against its full DuckDB twin
by the driver gate / scripts/check_oracles.py. These units pin the
pieces the gate can't see directly: adapter determinism, sub-schema
consistency with the full schema, plan shape (zero Python nodes,
window/groupBy sharing ONE entity exchange), and the long-form
(posexplode) output contract.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark.plans.compiler import (
    KERNEL_ONLY_PER_UPDATE,
    compile_features,
    default_schema,
    native_schema,
)
from cookieblock_consent_classifier_spark.sources.readers import (
    cookie_updates_from_events,
)
from cookieblock_consent_classifier_spark.sources.resources import fixture_resources

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def res():
    return fixture_resources()


@pytest.fixture(scope="module")
def pipeline(spark, events, res):
    src = cookie_updates_from_events(events)
    wide, names = compile_features(src, native_schema(res, num_updates=2, num_diffs=2), res)
    return wide.cache(), names


def test_native_schema_is_a_sub_schema(res):
    """Every native_schema spec exists in default_schema with the SAME
    width (same builders compile it) — it is a subset, not a fork."""
    full = default_schema(res, num_updates=2, num_diffs=2)
    sub = native_schema(res, num_updates=2, num_diffs=2)
    full_specs = {
        s.name: s.vector_size
        for fam in (full.per_entity, full.per_update, full.per_diff)
        for s in fam
    }
    for fam in (sub.per_entity, sub.per_update, sub.per_diff):
        for s in fam:
            assert full_specs[s.name] == s.vector_size, s.name
    # and none of its per-update specs REQUIRES the Arrow kernel
    # (shannon_entropy is kernel-resident in the full schema but
    # native-capable — NATIVE_CAPABLE_PER_UPDATE)
    assert not any(s.name in KERNEL_ONLY_PER_UPDATE for s in sub.per_update)


def test_adapter_is_deterministic_and_schema_shaped(spark, events):
    from cookieblock_consent_classifier_spark.schema import COOKIE_UPDATE_SCHEMA

    src = cookie_updates_from_events(events)
    assert [f.name for f in src.schema.fields] == [
        f.name for f in COOKIE_UPDATE_SCHEMA.fields
    ]
    a = sorted(src.limit(50).collect())
    b = sorted(cookie_updates_from_events(events).limit(50).collect())
    assert a == b
    # expiry hits the named boundary values (bucket-overlap probes)
    hit = {
        r.expiry
        for r in src.select("expiry").filter(F.col("expiry").isin(3600, 86400, 46656000)).collect()
    }
    assert hit, "boundary expiry values never generated"


def test_native_pipeline_plan_is_pure_jvm_single_entity_exchange(pipeline):
    wide, names = pipeline
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, (
        "native sub-schema must compile to zero Python nodes"
    )
    # the feature path (window -> groupBy -> assembly) reuses ONE
    # entity exchange; the only other entity exchanges allowed are the
    # column-pruned weight side-branches (entity_id+label only).
    ent_ex = re.findall(r"Exchange hashpartitioning\(entity_id#\d+", plan)
    assert 1 <= len(ent_ex) <= 3, plan[:2000]


def test_sparse_rows_contract(pipeline, res):
    wide, names = pipeline
    schema = native_schema(res, num_updates=2, num_diffs=2)
    assert len(names) == schema.total_width == 94
    rows = wide.limit(20).collect()
    assert rows
    for r in rows:
        assert list(r.indices) == sorted(r.indices), "indices must ascend"
        assert all(0 <= i < len(names) for i in r.indices)
        assert len(r.indices) == len(r.values)
        assert 0 <= r.label <= 3
        assert r.weight > 0


def test_label_filter_applied(spark, events):
    """training=True drops label-4 entities before any feature work."""
    res = fixture_resources()
    src = cookie_updates_from_events(events)
    n_lab4 = src.filter(F.col("label") == 4).select("entity_id").distinct().count()
    assert n_lab4 > 0, "fixture must contain filtered entities"
    wide, _ = compile_features(src, native_schema(res), res)
    assert wide.filter(F.col("label") == 4).count() == 0


def test_oracle_sql_parses_and_matches_rowcount(spark, events):
    """Smoke the generated DuckDB twin at sf0.001 (the full value-exact
    comparison runs in scripts/check_oracles.py and the driver gate)."""
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["cookie_feature_pipeline"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    oracle_n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    spark_n = entrymod.queries()["cookie_feature_pipeline"](spark, SF_DIR).count()
    assert oracle_n == spark_n > 0
