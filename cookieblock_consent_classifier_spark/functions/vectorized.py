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

from cookieblock_consent_classifier_spark.functions.jsparse import try_split_json_like


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


def _py_b64_decodable(dec: str) -> bool:
    """feature_base64_encoded core (processor.py:1133-1146): the
    reference calls ``base64.b64decode(unquoted)`` WITHOUT
    validate=True — non-alphabet characters are silently discarded and
    only residual length/padding errors reject. Operates on the
    already-URL-decoded content."""
    try:
        base64.b64decode(dec)
        return True
    except (base64.binascii.Error, ValueError):
        return False


def _py_b64_valid(s: str | None) -> bool | None:
    """feature_base64_encoded (processor.py:1133-1146): URL-decode,
    then lenient b64decode (see _py_b64_decodable)."""
    if s is None:
        return None
    return _py_b64_decodable(unquote(s))


def _py_js_parse(txt: str):
    """Parsed JS/JSON value per feature_js_content's gating
    (processor.py:1215-1235): only attempt when '{' present; fall back
    to base64-decode + re-check (try_decode_base64, utils.py:81-94).
    try_split_json's js2py fallback is the bounded JS-literal parser
    (functions/jsparse.py). Returns ANY parsed value (dict/list/str)
    or None — the reference uses len() of non-dict results too."""
    if "{" in txt:
        return try_split_json_like(txt)
    dec = _py_b64_decode(txt)
    if dec and "{" in dec:
        return try_split_json_like(dec)
    return None


def _py_json_object(s: str | None) -> dict | None:
    """Engine convenience API: the parsed object of feature_js_content
    when (and only when) it is a dict; None otherwise. Input is the
    raw value (URL-decoded internally, like the reference)."""
    if s is None:
        return None
    obj = _py_js_parse(unquote(s))
    return obj if isinstance(obj, dict) else None


# str-class predicates: Python unicode semantics (str.isnumeric etc.)
# differ from any regex approximation (processor.py:1305-1374) — these
# must run in Python. 'identifier' excludes pure-alpha/pure-numeric
# strings (feature_is_identifier, processor.py:1339-1345).
_STR_CLASSES = {
    "numeric": lambda v: v.isnumeric(),
    "alpha": lambda v: v.isalpha(),
    "upper": lambda v: v.isupper(),
    "lower": lambda v: v.islower(),
    "identifier": lambda v: v.isidentifier() and not v.isalpha() and not v.isnumeric(),
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


def gestalt_stats_udf(num_diffs: int):
    """Per-entity gestalt statistics from the ordered value sequence
    (one row per entity, input = array<string> of update values):
    mean/stdev of consecutive SequenceMatcher ratios with −1 sentinels
    (feature_gestalt_mean_and_stddev, processor.py:812-841) plus the
    first ``num_diffs`` ratios (feature_gestalt_pattern_ratio,
    processor.py:1485-1494).

    Runs POST-aggregation so the expensive difflib kernel sees one
    Arrow batch per entity instead of sitting between the window and
    the groupBy (where a Python node would break partitioning reuse
    and force a second shuffle)."""
    import statistics

    @pandas_udf(
        T.StructType(
            [
                T.StructField("mean", T.DoubleType()),
                T.StructField("std", T.DoubleType()),
                T.StructField("diffs", T.ArrayType(T.DoubleType())),
            ]
        )
    )
    def _udf(vals: pd.Series) -> pd.DataFrame:
        rows = []
        for seq in vals:
            if seq is None or len(seq) < 2:
                rows.append((-1.0, -1.0, []))
                continue
            ratios = [
                difflib.SequenceMatcher(None, a, b).ratio()
                for a, b in zip(seq, seq[1:])
            ]
            m = statistics.mean(ratios)
            s = statistics.stdev(ratios) if len(ratios) > 1 else -1.0
            rows.append((m, s, ratios[:num_diffs]))
        return pd.DataFrame(rows, columns=["mean", "std", "diffs"], index=vals.index)

    return _udf


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
    """len(parsed JS/JSON value) or null when unparseable
    (feature_js_content slot 0, processor.py:1288-1291 — the reference
    takes len() of ANY non-None parse, including lists and strings)."""

    def one(v):
        obj = _py_js_parse(unquote(v))
        return None if obj is None else len(obj)

    return s.map(one, na_action="ignore").astype("Int32")


DELIMITERS = ",|#:;&_.-"  # processor.py:151


def _py_split_delimited(txt: str, min_seps: int, delimiters: str = DELIMITERS):
    """split_delimiter_separated (utils.py:114-143) semantics:
    Sniffer dialect over the restricted delimiter set; accepted only if
    the raw string contains STRICTLY MORE than ``min_seps`` occurrences
    of the chosen delimiter; split via csv.reader (quote-aware). On
    sniff failure, the reference checks base64-decodability and then
    re-sniffs the SAME string (a quirk we reproduce: it almost always
    fails again). Returns (tokens|None, delimiter|None)."""
    import csv

    sniffer = csv.Sniffer()

    def attempt():
        dialect = sniffer.sniff(txt, delimiters=delimiters)
        if txt.count(dialect.delimiter) > min_seps:
            return list(csv.reader((txt,), dialect))[0], dialect.delimiter
        return None, None

    try:
        return attempt()
    except csv.Error:
        if _py_b64_decode(txt) is not None:
            try:
                return attempt()
            except csv.Error:
                pass
    return None, None


def _py_b64_decode(s: str, min_len: int = 8):
    """try_decode_base64 (utils.py:81-94): decode iff ≥ MIN_B64_LEN
    and the result is valid UTF-8."""
    if not isinstance(s, str) or len(s) < min_len:
        return None
    try:
        return base64.b64decode(s).decode("utf-8")
    except Exception:
        return None


def csv_sniff_udf(delimiters: str = DELIMITERS, min_seps: int = 1):
    """feature_delimiter_separated (processor.py:1116-1130): chosen
    delimiter slot = token count, others −1 (handled by the caller);
    returns struct(delim_idx int, num_tokens int), nulls when not
    delimiter-separated."""

    @pandas_udf(
        T.StructType(
            [
                T.StructField("delim_idx", T.IntegerType()),
                T.StructField("num_tokens", T.IntegerType()),
            ]
        )
    )
    def _udf(s: pd.Series) -> pd.DataFrame:
        def one(v):
            if v is None:
                return (None, None)
            toks, d = _py_split_delimited(unquote(v), min_seps, delimiters)
            if toks is None:
                return (None, None)
            return (delimiters.index(d), len(toks))

        rows = [one(v) for v in s]
        return pd.DataFrame(rows, columns=["delim_idx", "num_tokens"], index=s.index)

    return _udf


_TRUTH_PAT = None  # compiled lazily per worker


def _truth_pat():
    global _TRUTH_PAT
    if _TRUTH_PAT is None:
        import re

        _TRUTH_PAT = re.compile(r"\b(true|false|yes|no|0|1|on|off)\b", re.IGNORECASE)
    return _TRUTH_PAT


def _hex_pat():
    import re

    return re.compile("^[0-9a-f]+$", re.IGNORECASE)


def _py_csv_content_flags(v: str | None, min_seps: int = 2):
    """feature_csv_content (processor.py:1176-1213): split (sniffer)
    then flags over tokens: numeric/hex/alpha/alnum/bool; ±1."""
    if v is None:
        return None
    toks, _ = _py_split_delimited(unquote(v), min_seps)
    flags = [False] * 5
    if toks:
        hx = _hex_pat()
        tv = _truth_pat()
        for e in toks:
            flags[0] |= e.isnumeric()
            flags[1] |= hx.match(e) is not None
            flags[2] |= e.isalpha()
            flags[3] |= e.isalnum()
            flags[4] |= tv.match(e) is not None
    return tuple(1.0 if f else -1.0 for f in flags)


def csv_content_udf(min_seps: int = 2):
    fields = ["csv_num", "csv_hex", "csv_alpha", "csv_alnum", "csv_bool"]

    @pandas_udf(T.StructType([T.StructField(f, T.DoubleType()) for f in fields]))
    def _udf(s: pd.Series) -> pd.DataFrame:
        rows = [
            _py_csv_content_flags(v, min_seps) if v is not None else (None,) * 5
            for v in s
        ]
        return pd.DataFrame(rows, columns=fields, index=s.index)

    return _udf


def _py_js_content(v: str | None):
    """feature_js_content (processor.py:1215-1303): 11-wide vector —
    len(parsed value) (or −1), then ±1 flags: id-key, bool, num,
    string, alpha, alnum, subobject, list, none, hex. Slot 0 uses
    len() of ANY successful parse (dict, list or string —
    processor.py:1288-1291); the type flags apply to dicts only. The
    js2py fallback is the bounded JS-literal parser
    (functions/jsparse.py)."""
    import re

    if v is None:
        return None
    data = _py_js_parse(unquote(v))

    flags = dict.fromkeys(
        ["id", "bool", "num", "str", "alpha", "alnum", "sub", "list", "none", "hex"], False
    )
    if isinstance(data, dict):
        idpat = re.compile("(id|ident)", re.IGNORECASE)
        hx = _hex_pat()
        tv = _truth_pat()
        for key in data:
            if isinstance(key, str) and idpat.search(key):
                flags["id"] = True
        for val in data.values():
            # reference order: int/float first (excl. bool), then bool
            if type(val) in (int, float):
                flags["num"] = True
            elif type(val) is bool:
                flags["bool"] = True
            elif type(val) is str:
                flags["str"] = True
                if tv.match(val):
                    flags["bool"] = True
                elif val.isnumeric():
                    flags["num"] = True
                elif hx.match(val):
                    flags["hex"] = True
                if val.isalpha():
                    flags["alpha"] = True
                elif val.isalnum():
                    flags["alnum"] = True
            elif type(val) is dict:
                flags["sub"] = True
            elif type(val) is list:
                flags["list"] = True
            elif val is None:
                flags["none"] = True
    length = float(len(data)) if data is not None else -1.0
    order = ["id", "bool", "num", "str", "alpha", "alnum", "sub", "list", "none", "hex"]
    return (length, *[1.0 if flags[k] else -1.0 for k in order])


JS_CONTENT_FIELDS = [
    "js_len", "js_id", "js_bool", "js_num", "js_str", "js_alpha",
    "js_alnum", "js_sub", "js_list", "js_none", "js_hex",
]


@pandas_udf(T.StructType([T.StructField(f, T.DoubleType()) for f in JS_CONTENT_FIELDS]))
def js_content_udf(s: pd.Series) -> pd.DataFrame:
    rows = [_py_js_content(v) if v is not None else (None,) * 11 for v in s]
    return pd.DataFrame(rows, columns=JS_CONTENT_FIELDS, index=s.index)


def content_kernel_udf(content_terms: list[str], delimiters: str = DELIMITERS,
                       delim_min_seps: int = 1, csv_min_seps: int = 2):
    """FUSED per-update Python kernel: every non-native feature
    computed in ONE Arrow round-trip with ONE URL-decode per value.

    Separate pandas UDFs per feature would mean ~10 ArrowEvalPython
    evaluations per row batch, each re-decoding the value (measured
    ~2ms·core/row on the full schema); fusing them cuts the Python
    path to a single batch pass. Field semantics are identical to the
    standalone UDFs above (which remain the per-operator API and the
    parity-test subjects).
    """
    import re

    fields = (
        [
            # `dec` is THE url-decoded value (urllib.parse.unquote
            # semantics). Downstream native rlike/compare expressions
            # consume this field rather than F.try_url_decode, whose
            # Java URLDecoder decodes '+' as space and NULLs out any
            # malformed %-escape — both diverge from Python unquote
            # (the reference decodes with unquote everywhere).
            T.StructField("dec", T.StringType()),
            T.StructField("dec_len", T.DoubleType()),  # utf-8 bytes of dec
            T.StructField("zlib_len", T.DoubleType()),
            T.StructField("entropy", T.DoubleType()),
            T.StructField("b64_valid", T.BooleanType()),
            T.StructField("is_empty", T.DoubleType()),
            T.StructField("js_obj", T.DoubleType()),
            T.StructField("bool_content", T.DoubleType()),
            T.StructField("is_numeric", T.DoubleType()),
            T.StructField("is_alpha", T.DoubleType()),
            T.StructField("is_upper", T.DoubleType()),
            T.StructField("is_lower", T.DoubleType()),
            T.StructField("is_ident", T.DoubleType()),
            T.StructField("delim_idx", T.IntegerType()),
            T.StructField("num_tokens", T.IntegerType()),
        ]
        + [T.StructField(f, T.DoubleType()) for f in
           ["csv_num", "csv_hex", "csv_alpha", "csv_alnum", "csv_bool"]]
        + [T.StructField(f, T.DoubleType()) for f in JS_CONTENT_FIELDS]
        + [T.StructField("term_ranks", T.ArrayType(T.IntegerType()))]
    )

    @pandas_udf(T.StructType(fields))
    def _udf(s: pd.Series) -> pd.DataFrame:
        # literal patterns (no regex metachars — most of the shipped
        # 50-term/500-token resources) take the substring fast path:
        # `lit in text` == re.search(re.escape(lit), text) but ~10×
        # cheaper across a 500-pattern bank
        lit_terms = [(t, i) for i, t in enumerate(content_terms) if t == re.escape(t)]
        re_terms = [(re.compile(t), i) for i, t in enumerate(content_terms)
                    if t != re.escape(t)]
        js_pat = re.compile(r"^\{.*}$")  # processor.py:175
        truth = _truth_pat()

        def one(v):
            if v is None:
                return (None,) * len(fields)
            dec = unquote(v)
            enc = dec.encode("utf-8", errors="replace")
            zl = float(len(zlib.compress(enc, 9)))
            if len(dec) == 0:
                ent = 0.0
            else:
                cnt = Counter(dec)
                n = len(dec)
                ent = -sum((c / n) * math.log2(c / n) for c in cnt.values())
            b64 = _py_b64_decodable(dec)
            pm = lambda b: 1.0 if b else -1.0  # noqa: E731
            # feature_empty_content (processor.py:1376-1384): RAW value
            empty = pm(not v or v.isspace())
            # feature_contains_javascript_object (processor.py:1148-1162):
            # shape-regex on dec, else base64-decode dec and re-check
            if js_pat.search(dec):
                jso = 1.0
            else:
                mb = _py_b64_decode(dec)
                jso = 1.0 if (mb and js_pat.search(mb)) else -1.0
            # feature_boolean_content (processor.py:1386-1395): Python
            # \b is unicode-aware (Java's is ASCII) — keep in Python
            boolc = pm(truth.search(dec) is not None)
            toks, d = _py_split_delimited(dec, delim_min_seps, delimiters)
            didx = delimiters.index(d) if toks else None
            ntok = len(toks) if toks else None
            csvf = _py_csv_content_flags(v, csv_min_seps)
            jsf = _py_js_content(v)
            ranks = sorted(
                [i for t, i in lit_terms if t in dec]
                + [i for c, i in re_terms if c.search(dec)]
            )
            return (
                dec, float(len(enc)), zl, ent, b64, empty, jso, boolc,
                pm(dec.isnumeric()), pm(dec.isalpha()), pm(dec.isupper()),
                pm(dec.islower()),
                pm(dec.isidentifier() and not dec.isalpha() and not dec.isnumeric()),
                didx, ntok, *csvf, *jsf, ranks,
            )

        names = [f.name for f in fields]
        return pd.DataFrame([one(v) for v in s], columns=names, index=s.index)

    return _udf


def regex_ranks_udf(patterns: list[str], mode: str = "search", flags: int = 0,
                    url_decode: bool = False):
    """Multi-hot regex-list lookup → array of matched ranks.

    Covers feature_pattern_names (.match, processor.py:712-722),
    feature_name_tokens (.search, :724-733), and
    feature_english_terms_in_content (.search on unquoted value,
    :1164-1174). The pattern list is captured in the closure (compiled
    once per executor at UDF init — the reference's precompile
    discipline, processor.py:154-175); a broadcast-variable hookup is
    unnecessary at these list sizes (≤500 strings ship with the task).
    """
    import re

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def _udf(s: pd.Series) -> pd.Series:
        # literal patterns (no metachars, default flags) short-circuit
        # to substring/prefix tests — semantically identical to
        # re.search/re.match of the escaped literal, ~10× cheaper over
        # a 500-pattern bank
        lits, regs = [], []
        for i, p in enumerate(patterns):
            if flags == 0 and p == re.escape(p):
                lits.append((p, i))
            else:
                regs.append((re.compile(p, flags), i))
        matcher = (lambda c, v: c.match(v)) if mode == "match" else (lambda c, v: c.search(v))
        lit_test = (
            (lambda p, v: v.startswith(p)) if mode == "match" else (lambda p, v: p in v)
        )

        def one(v):
            if url_decode:
                v = unquote(v)
            return sorted(
                [rank for p, rank in lits if lit_test(p, v)]
                + [rank for c, rank in regs if matcher(c, v)]
            )

        return s.map(one, na_action="ignore")

    return _udf
