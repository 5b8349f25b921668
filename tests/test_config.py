"""features.json config-loader unit tests (no Spark needed)."""

from __future__ import annotations

import json

import pytest

from cookieblock_consent_classifier_spark.sources.config import load_features_config
from cookieblock_consent_classifier_spark.sources.resources import (
    load_pattern_csv,
    load_rank_csv,
    py_uniform_domain,
)

REF = "/root/reference"
CFG = f"{REF}/feature_extraction/features.json"


def test_shipped_config_width_and_resources():
    schema, res = load_features_config(CFG, base_dir=REF)
    assert schema.total_width == 1689
    assert schema.num_updates == 1 and schema.num_diffs == 1
    assert len(res.top_names) == 500
    assert len(res.top_domains) == 500
    assert len(res.name_patterns) == 50
    assert len(res.name_tokens) == 500
    assert len(res.content_terms) == 50
    assert len(res.iab_vendors) > 500
    # vendors normalized at load (setup_iabeurope_vendors)
    assert all(v == py_uniform_domain(v) for v in res.iab_vendors)


def test_disabled_feature_shrinks_width(tmp_path):
    cfg = json.load(open(CFG))
    for sec in ("per_cookie_features", "per_update_features", "per_diff_features"):
        for e in cfg[sec]:
            if "source" in e:
                e["source"] = f"{REF}/{e['source']}"
    # disable the 500-wide name_tokens block
    [e for e in cfg["per_cookie_features"] if e["name"] == "name_tokens"][0]["enabled"] = False
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    schema, _ = load_features_config(str(p), base_dir=REF)
    assert schema.total_width == 1689 - 500
    assert len(schema.feature_names()) == 1189


def test_unknown_function_rejected(tmp_path):
    cfg = json.load(open(CFG))
    cfg["per_update_features"][0]["function"] = "feature_does_not_exist"
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="Unsupported feature function"):
        load_features_config(str(p), base_dir=REF)


def test_rank_loader_reference_exact(tmp_path):
    # '#' comments skipped, blank lines KEPT (empty key), last
    # comma-field is the key, count-truncated — load_lookup_from_csv
    # (utils.py:33-56) semantics
    f = tmp_path / "r.csv"
    f.write_text("# comment\n10,alpha\n\n30,beta,gamma\n40,delta\n")
    assert load_rank_csv(str(f), 3) == ["alpha", "", "gamma"]
    with pytest.raises(RuntimeError):
        load_rank_csv(str(f), 9)


def test_pattern_loader_keeps_comments(tmp_path):
    # setup_pattern_names does NOT skip '#' lines (processor.py:611-628)
    f = tmp_path / "p.csv"
    f.write_text("#notacomment\n1,^ga_\n")
    assert load_pattern_csv(str(f), 2) == ["#notacomment", "^ga_"]
