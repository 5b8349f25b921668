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
import csv
import difflib
import json
import math
import zlib
from collections import Counter
from functools import lru_cache
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


@lru_cache(maxsize=8192)
def _gestalt_cached(a: str, b: str) -> float:
    return difflib.SequenceMatcher(None, a, b).ratio()


# short-string memo bound: 8192 entries x <=256 chars ~ 2 MB/worker
_GESTALT_MEMO_MAX_LEN = 256


def _py_gestalt(a: str | None, b: str | None) -> float | None:
    """difflib SequenceMatcher ratio (feature_gestalt_pattern_ratio,
    processor.py:1485-1494).

    Short pairs go through a bounded lru_cache: ratio() is a pure
    function and real update streams repeat values heavily (the bench
    events table: 0.5% distinct props — each distinct pair recomputed
    ~200x at 23 us/pair), while a memo hit costs ~0.1 us. Long pairs
    bypass the cache so it can never hold more than ~2 MB per worker
    (opt guide §4.5: amortize per-task state, bound its memory)."""
    if a is None or b is None:
        return None
    if len(a) + len(b) <= _GESTALT_MEMO_MAX_LEN:
        return _gestalt_cached(a, b)
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


_UNSET = object()


def _py_js_parse(txt: str, b64=_UNSET):
    """Parsed JS/JSON value per feature_js_content's gating
    (processor.py:1215-1235): only attempt when '{' present; fall back
    to base64-decode + re-check (try_decode_base64, utils.py:81-94).
    try_split_json's js2py fallback is the bounded JS-literal parser
    (functions/jsparse.py). Returns ANY parsed value (dict/list/str)
    or None — the reference uses len() of non-dict results too.
    ``b64`` lets a caller that already ran _py_b64_decode(txt) pass
    the result in (the fused kernel shares one decode per value)."""
    if "{" in txt:
        return try_split_json_like(txt)
    dec = _py_b64_decode(txt) if b64 is _UNSET else b64
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
            # same memo as _py_gestalt (ratio() is pure; update streams
            # repeat values); long pairs bypass the cache unchanged
            ratios = [
                _gestalt_cached(a, b)
                if len(a) + len(b) <= _GESTALT_MEMO_MAX_LEN
                else difflib.SequenceMatcher(None, a, b).ratio()
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


_SNIFF_PREFERRED = (",", "\t", ";", " ", ":")  # csv.Sniffer().preferred
_SNIFFER = csv.Sniffer()


def _sniff_delim(txt: str, delimiters: str):
    """Exact twin of ``csv.Sniffer().sniff(txt, delimiters=...)``
    restricted to the fields ``_py_split_delimited`` consumes: returns
    ``(delimiter, quotechar, doublequote, skipinitialspace)`` or None
    where sniff would raise ``csv.Error``.

    csv.Sniffer costs ~75-105 us per call even on strings containing
    no delimiter at all (_guess_delimiter builds a frequency table for
    every 7-bit char); it was the single largest per-row cost of the
    fused cookie kernel (~186 us/row of ~200, called twice). The fast
    path replays csv.py's single-chunk arithmetic exactly for
    single-line, quote-free samples (the overwhelming majority of
    cookie values): with one line every restricted delimiter present
    gets mode (count, 1) and consistency 1/1, so the candidate set is
    simply the delimiters with count > 0; one candidate wins directly,
    several fall to the `preferred` list then to max (count, char);
    skipinitialspace = count(d) == count(d + ' '). Anything containing
    a newline or a quote char falls back to the real Sniffer
    (_guess_quote_and_delimiter's regexes / multi-chunk voting).
    Parity is pinned by tests/test_functions.py::test_sniff_parity
    against csv.Sniffer over a structured fuzz corpus."""
    if "\n" not in txt and '"' not in txt and "'" not in txt:
        cands = {d: txt.count(d) for d in delimiters if d in txt}
        if not cands:
            return None  # sniff() raises Error("Could not determine delimiter")
        if len(cands) == 1:
            delim = next(iter(cands))
        else:
            for p in _SNIFF_PREFERRED:
                if p in cands:
                    delim = p
                    break
            else:
                delim = max(cands.items(), key=lambda kv: (kv[1], kv[0]))[0]
        skip = txt.count(delim) == txt.count(delim + " ")
        # no quote chars present -> _guess_quote_and_delimiter returns
        # ('', False, ...) and sniff defaults quotechar to '"'
        return delim, '"', False, skip
    try:
        d = _SNIFFER.sniff(txt, delimiters=delimiters)
        return d.delimiter, d.quotechar, d.doublequote, d.skipinitialspace
    except csv.Error:
        return None


def _split_sniffed(txt: str, sniffed) -> list[str]:
    """csv.reader split of ``txt`` under a ``_sniff_delim`` result —
    identical to reading with the sniffed dialect class (same
    attribute values; escapechar None / strict False are Dialect
    defaults either way)."""
    delim, quote, dq, skip = sniffed
    return list(
        csv.reader(
            (txt,),
            delimiter=delim,
            quotechar=quote,
            doublequote=dq,
            skipinitialspace=skip,
            lineterminator="\r\n",
            quoting=csv.QUOTE_MINIMAL,
        )
    )[0]


def _py_split_delimited(txt: str, min_seps: int, delimiters: str = DELIMITERS):
    """split_delimiter_separated (utils.py:114-143) semantics:
    Sniffer dialect over the restricted delimiter set; accepted only if
    the raw string contains STRICTLY MORE than ``min_seps`` occurrences
    of the chosen delimiter; split via csv.reader (quote-aware).
    Returns (tokens|None, delimiter|None).

    The reference's sniff-failure path base64-decodes and re-sniffs
    the SAME string; sniff is deterministic, so that retry always
    fails again — the dead retry is skipped here (output identical,
    saves a base64 decode + a second ~100 us sniff per miss). A
    csv.Error from the READER (e.g. newline in an unquoted field) is
    (None, None) exactly like the original's shared except-clause."""
    s = _sniff_delim(txt, delimiters)
    if s is None:
        return None, None
    if txt.count(s[0]) > min_seps:
        try:
            return _split_sniffed(txt, s), s[0]
        except csv.Error:
            return None, None
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


def _py_csv_flags_from_tokens(toks):
    """The flag pass of feature_csv_content over already-split tokens
    (None/empty → all −1) — shared by the standalone UDF and the fused
    kernel (which reuses one sniff+split for both csv features)."""
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


def _py_csv_content_flags(v: str | None, min_seps: int = 2):
    """feature_csv_content (processor.py:1176-1213): split (sniffer)
    then flags over tokens: numeric/hex/alpha/alnum/bool; ±1."""
    if v is None:
        return None
    toks, _ = _py_split_delimited(unquote(v), min_seps)
    return _py_csv_flags_from_tokens(toks)


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


def _py_js_flags_tuple(data):
    """The 11-wide vector of feature_js_content from an ALREADY-parsed
    value (see _py_js_content) — shared by the standalone UDF and the
    fused kernel (which parses once per value)."""
    import re

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


def _py_js_content(v: str | None):
    """feature_js_content (processor.py:1215-1303): 11-wide vector —
    len(parsed value) (or −1), then ±1 flags: id-key, bool, num,
    string, alpha, alnum, subobject, list, none, hex. Slot 0 uses
    len() of ANY successful parse (dict, list or string —
    processor.py:1288-1291); the type flags apply to dicts only. The
    js2py fallback is the bounded JS-literal parser
    (functions/jsparse.py)."""
    if v is None:
        return None
    return _py_js_flags_tuple(_py_js_parse(unquote(v)))


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
            # ONE lenient base64 decode shared by the js-object shape
            # check and the js-content parse gate (each used to decode
            # independently)
            mb = _py_b64_decode(dec)
            # feature_contains_javascript_object (processor.py:1148-1162):
            # shape-regex on dec, else base64-decode dec and re-check
            if js_pat.search(dec):
                jso = 1.0
            else:
                jso = 1.0 if (mb and js_pat.search(mb)) else -1.0
            # feature_boolean_content (processor.py:1386-1395): Python
            # \b is unicode-aware (Java's is ASCII) — keep in Python
            boolc = pm(truth.search(dec) is not None)
            # ONE sniff + ONE csv split serve BOTH delimiter_sep
            # (min_seps=delim_min_seps) and csv_contents
            # (min_seps=csv_min_seps): only the acceptance threshold
            # differs, the sniffed dialect and the split tokens are
            # identical (the standalone UDFs sniffed twice per value —
            # the kernel's single largest per-row cost)
            sn = _sniff_delim(dec, delimiters)
            didx = ntok = None
            ctoks = None
            if sn is not None:
                cnt = dec.count(sn[0])
                split_toks = None
                if cnt > min(delim_min_seps, csv_min_seps):
                    try:
                        split_toks = _split_sniffed(dec, sn)
                    except csv.Error:
                        # reader error (newline in unquoted field):
                        # the original per-feature path returned
                        # (None, None) for both features
                        cnt = -1
                if cnt > delim_min_seps and split_toks:
                    didx = delimiters.index(sn[0])
                    ntok = len(split_toks)
                if cnt > csv_min_seps:
                    ctoks = split_toks
            csvf = _py_csv_flags_from_tokens(ctoks)
            # ONE js parse feeds the whole js_contents block (the
            # standalone UDF re-decodes and re-parses)
            jsf = _py_js_flags_tuple(_py_js_parse(dec, b64=mb))
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
