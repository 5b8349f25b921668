"""Lookup resources for the broadcast-join / pattern-list features.

The reference loads pre-sorted CSV/TXT resources into dicts and
compiled-pattern lists at setup (load_lookup_from_csv utils.py:33-56;
setup_* processor.py:594-682). Our analogue:

- rank tables (top names / top domains) → small DataFrames, consumed
  via broadcast hash join;
- regex lists (name patterns, name tokens, content terms) → Python
  lists captured in vectorized pandas UDF closures;
- vendor domains → broadcast left-semi join (or set closure).

File format matches the reference's: one entry per line, CSV with the
lookup key in the LAST field, '#' comments skipped, top-k truncation
at load (utils.py:43-54).

``fixture_resources()`` synthesizes a small deterministic resource
bundle (our own data, for tests/bench) — the production path loads
real crawl-derived files through the same loaders.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Resources:
    top_names: list[str]
    top_domains: list[str]
    name_patterns: list[str]  # anchored .match semantics
    name_tokens: list[str]    # .search semantics
    content_terms: list[str]  # .search on URL-decoded value
    iab_vendors: frozenset[str]


def py_uniform_domain(url: str) -> str:
    """url_to_uniform_domain (utils.py:19-30), reference-exact Python
    twin (the native Column version is functions/native.uniform_domain;
    this one runs at resource-load time and in test oracles)."""
    u = url.strip()
    u = re.sub(r"^http(s)?://", "", u)
    u = re.sub(r"^www([0-9])?", "", u)
    u = re.sub(r"^\.", "", u)
    u = re.sub(r"/$", "", u)
    return u


def load_rank_csv(path: str, count: int) -> list[str]:
    """load_lookup_from_csv (utils.py:33-56), reference-exact: last
    comma-field of each line is the key; '#'-prefixed lines skipped
    (blank lines are NOT — the reference keeps them as empty keys);
    exactly ``count`` entries in file order; raises if the file runs
    out first."""
    out: list[str] = []
    with open(path, encoding="utf-8") as fd:
        for line in fd:
            if line.startswith("#"):
                continue
            out.append(line.strip().split(",")[-1])
            if len(out) == count:
                return out
    raise RuntimeError(f"Not enough entries in {path}: wanted {count}, got {len(out)}")


def load_pattern_csv(path: str, count: int) -> list[str]:
    """setup_pattern_names / setup_name_features / setup_content_terms
    (processor.py:611-682), reference-exact: last comma-field is the
    pattern; NO comment skipping (unlike load_rank_csv); exactly
    ``count`` patterns in file order."""
    out: list[str] = []
    with open(path, encoding="utf-8") as fd:
        for line in fd:
            out.append(line.strip().split(",")[-1])
            if len(out) == count:
                return out
    raise RuntimeError(f"Not enough patterns in {path}: wanted {count}, got {len(out)}")


def load_vendor_txt(path: str) -> frozenset[str]:
    """setup_iabeurope_vendors (processor.py:653-663): one domain per
    line, normalized through url_to_uniform_domain at load."""
    with open(path, encoding="utf-8") as fd:
        return frozenset(py_uniform_domain(line.strip()) for line in fd)


def rank_df(spark: SparkSession, keys: list[str], key_col: str, rank_col: str = "rank") -> DataFrame:
    """Rank table as a DataFrame for broadcast hash joins (rank =
    position, 0-based). Mirrors the reference's dict construction
    (utils.py:43-54): a duplicate key keeps its LAST rank — critical
    for join correctness too, since a duplicate key in the build side
    would fan out the probe rows."""
    last_wins = {k: i for i, k in enumerate(keys)}
    return spark.createDataFrame(
        [(k, i) for k, i in last_wins.items()], [key_col, rank_col]
    )


def fixture_resources(
    n_names: int = 20, n_domains: int = 20, n_patterns: int = 10,
    n_tokens: int = 15, n_terms: int = 10,
) -> Resources:
    """Deterministic synthetic resource bundle shaped like the
    reference's resources/ directory contents (same cardinality knobs,
    smaller defaults)."""
    top_names = [f"track_cookie_{i}" for i in range(n_names - 4)] + [
        "session-id", "consent-pref", "ga_visitor", "ab_bucket",
    ]
    top_domains = [f"cdn{i}.example-ads.com" for i in range(n_domains - 3)] + [
        "analytics.example.org", "example-cmp.net", "social-widgets.io",
    ]
    name_patterns = [
        r"^ga_", r"^_?utm", r"^sess(ion)?[-_]", r"^consent", r"^ab[-_]test",
        r"^track_cookie_[0-9]+$", r"^cf[a-z]+$", r"^id_[0-9a-f]+", r"^pref", r"^opt(in|out)",
    ][:n_patterns]
    name_tokens = [
        "id", "sess", "track", "consent", "pref", "visitor", "bucket",
        "ga", "utm", "ab", "opt", "cf", "uid", "token", "cart",
    ][:n_tokens]
    content_terms = [
        "consent", "true", "false", "preferences", "analytics",
        "advertising", "necessary", "functional", "userid", "timestamp",
    ][:n_terms]
    iab_vendors = frozenset(
        {"example-ads.com", "analytics.example.org", "bigsspvendor.com"}
    )
    return Resources(
        top_names=top_names,
        top_domains=top_domains,
        name_patterns=name_patterns,
        name_tokens=name_tokens,
        content_terms=content_terms,
        iab_vendors=iab_vendors,
    )
