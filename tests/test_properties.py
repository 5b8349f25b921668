"""Property-based tests (hypothesis): as-of zero-leakage/correctness
vs a naive oracle on random inputs, sessionization boundary laws,
sparse assembly invariants."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from cookieblock_consent_classifier_spark.operators.asof import asof_join
from cookieblock_consent_classifier_spark.operators.temporal import sessionize

T0 = datetime(2024, 1, 1)

# timestamps as small ints (seconds) — duplicates and disorder welcome
fact_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
    min_size=1, max_size=12,
)
dim_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50), st.integers(0, 99)),
    min_size=0, max_size=12,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(facts=fact_rows, dims=dim_rows)
def test_asof_matches_naive_oracle(spark, facts, dims):
    fact_df = spark.createDataFrame(
        [(e, T0 + timedelta(seconds=s), i) for i, (e, s) in enumerate(facts)],
        ["entity", "ts", "fid"],
    )
    dim_df = spark.createDataFrame(
        [(e, T0 + timedelta(seconds=s), v) for (e, s, v) in dims],
        schema="entity string, ts timestamp, state int",
    )
    out = {
        r["fid"]: r["state_asof"]
        for r in asof_join(fact_df, dim_df, on="entity", payload=["state"],
                           dim_order=["state"]).collect()
    }
    for i, (e, s) in enumerate(facts):
        candidates = [(ds, v) for (de, ds, v) in dims if de == e and ds <= s]
        expected = max(candidates)[1] if candidates else None
        assert out[i] == expected, (i, e, s, candidates)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(gaps=st.lists(st.integers(1, 30), min_size=1, max_size=15),
       threshold=st.integers(5, 15))
def test_sessionize_matches_naive(spark, gaps, threshold):
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(acc)
    df = spark.createDataFrame(
        [("e", T0 + timedelta(seconds=s), i) for i, s in enumerate(ts)],
        ["entity", "ts", "i"],
    )
    got = {
        r["i"]: r["session_id"]
        for r in sessionize(df, "entity", "ts", threshold, order_tiebreak=["i"]).collect()
    }
    sid, prev = 0, None
    for i, s in enumerate(ts):
        if prev is not None and s - prev > threshold:
            sid += 1
        assert got[i] == sid, (i, s, prev, threshold)
        prev = s


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(values=st.lists(
    st.text(alphabet="ab,|:{}0189ef ", max_size=12), min_size=1, max_size=5))
def test_pipeline_invariants_on_random_values(spark, values):
    """Width/sortedness/range invariants hold for arbitrary payloads."""
    from datetime import timedelta

    from cookieblock_consent_classifier_spark.plans.compiler import (
        compile_features, default_schema,
    )
    from cookieblock_consent_classifier_spark.schema import COOKIE_UPDATE_SCHEMA
    from cookieblock_consent_classifier_spark.sources.resources import fixture_resources

    res = fixture_resources()
    rows = [
        ("e0", T0 + timedelta(seconds=i), "n", "d.com", "/", "d.com", 1, 0,
         i, v, 100, False, False, False, False, "lax")
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, COOKIE_UPDATE_SCHEMA)
    wide, names = compile_features(df, default_schema(res), res)
    r = wide.first()
    assert r["indices"] == sorted(r["indices"])
    assert len(r["indices"]) == len(set(r["indices"])) == len(r["values"])
    assert all(0 <= i < len(names) for i in r["indices"])
    assert all(v is not None for v in r["values"])
