"""Feature-function parity vs pure-Python twins (the reference's
semantics re-derived independently; SURVEY.md §2.3-2.4)."""

from __future__ import annotations

import base64
import difflib
import math
import zlib
from collections import Counter
from urllib.parse import unquote

import pytest
from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark.functions import native, vectorized as V

VALUES = [
    "hello world",
    "a%20b%7Cc",                     # url-encoded
    "dGVzdHN0cmluZw==",              # base64
    '{"a": 1, "b": {"c": 2}}',       # json object
    "12345",
    "deadbeef",
    "DEADBEEF123",
    "٣٤٥",                           # unicode digits: isnumeric true, regex [0-9] false
    "",
    "   ",
    "true",
    "a,b,c,d",
    "1609459200123",                 # 16-prefix epoch millis
    "2021-03-04",
    "Mon, 01 Jan 2024",
    "https://example.com/x",
    "f81d4fae-7dec-41d0-a765-00a0c91e6bf6",  # uuid v4
    "UPPER",
    "lower",
    "_ident_1",
]


@pytest.fixture(scope="module")
def vals(spark):
    return spark.createDataFrame([(v,) for v in VALUES], ["v"]).cache()


def collect_col(df, col):
    return [r["c"] for r in df.select(col.alias("c")).collect()]


def test_entropy_matches_python(vals):
    got = collect_col(vals, V.shannon_entropy("v"))
    for v, g in zip(VALUES, got):
        dec = unquote(v)
        if len(dec) == 0:
            exp = 0.0
        else:
            cnt = Counter(dec)
            exp = -sum((c / len(dec)) * math.log2(c / len(dec)) for c in cnt.values())
        assert g == pytest.approx(exp), v


def test_zlib_len_matches_python(vals):
    got = collect_col(vals, V.zlib_compressed_len("v"))
    for v, g in zip(VALUES, got):
        assert g == len(zlib.compress(unquote(v).encode(), 9)), v


def test_base64_validity(vals):
    # feature_base64_encoded (processor.py:1133-1146): lenient decode
    # (validate=False silently drops non-alphabet chars) on the
    # URL-DECODED content
    got = collect_col(vals, V.base64_valid("v"))
    for v, g in zip(VALUES, got):
        try:
            base64.b64decode(unquote(v))
            exp = True
        except Exception:
            exp = False
        assert g == exp, v


def test_base64_reference_quirks(spark):
    # url-encoded padding decodes ('dGVzdA%3D%3D'), embedded spaces are
    # discarded by the lenient decoder ('dGVz dA==')
    df = spark.createDataFrame([("dGVzdA%3D%3D",), ("dGVz dA==",), ("a",)], ["v"])
    got = collect_col(df, V.base64_valid("v"))
    assert got == [True, True, False]


def test_str_classes_unicode_exact(vals):
    for kind, fn in [
        ("numeric", str.isnumeric),
        ("alpha", str.isalpha),
        ("upper", str.isupper),
        ("lower", str.islower),
        # feature_is_identifier (processor.py:1339-1345) excludes
        # pure-alpha and pure-numeric strings
        ("identifier", lambda s: s.isidentifier() and not s.isalpha() and not s.isnumeric()),
    ]:
        got = collect_col(vals, V.str_class_udf(kind)("v"))
        for v, g in zip(VALUES, got):
            exp = 1.0 if fn(unquote(v)) else -1.0
            assert g == exp, (kind, v)


def test_unicode_digits_diverge_from_regex(spark):
    # the reason isnumeric is a pandas UDF, not rlike (SURVEY §2.3#17)
    df = spark.createDataFrame([("٣٤٥",)], ["v"])
    regex = df.select(F.col("v").rlike("^[0-9]+$").alias("c")).first()["c"]
    py = df.select(V.str_class_udf("numeric")("v").alias("c")).first()["c"]
    assert regex is False and py == 1.0


def test_gestalt_matches_difflib(spark):
    pairs = [("abcdef", "abcxef"), ("", "x"), ("same", "same")]
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = collect_col(df, V.gestalt_ratio("a", "b"))
    for (a, b), g in zip(pairs, got):
        assert g == pytest.approx(difflib.SequenceMatcher(None, a, b).ratio())


def test_expiry_buckets_boundaries(spark):
    # reference semantics (processor.py:1029-1050): dense ±1; bucket 0
    # upper bound is STRICT (< 3600) so at exactly 1h only bucket1
    # fires, while interior boundaries overlap (both adjacent buckets
    # fire at exactly 12h).
    df = spark.createDataFrame([(3600,), (43200,), (100,)], ["e"])
    cols = native.expiry_buckets("e")
    rows = df.select("e", *[c.alias(f"b{i}") for i, c in enumerate(cols)]).collect()
    by = {r["e"]: [r[f"b{i}"] for i in range(8)] for r in rows}
    assert by[3600] == [-1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]
    assert by[43200] == [-1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0, -1.0]
    assert by[100] == [1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]


def test_pm_encoding_true_false(spark):
    df = spark.createDataFrame([(True,), (False,)], ["f"])
    got = collect_col(df, native.pm_flag("f"))
    assert got == [1.0, -1.0]


def test_one_hot_unknown_all_minus(spark):
    df = spark.createDataFrame([("lax",), ("weird",)], ["s"])
    cols = native.one_hot("s", ["no_restriction", "lax", "strict"])
    rows = df.select(*[c.alias(f"c{i}") for i, c in enumerate(cols)]).collect()
    assert [rows[0][f"c{i}"] for i in range(3)] == [-1.0, 1.0, -1.0]
    assert [rows[1][f"c{i}"] for i in range(3)] == [-1.0, -1.0, -1.0]


def test_uuid_onehot(vals):
    cols = native.uuid_version_onehot("v")
    rows = vals.select(
        F.col("v"), *[c.alias(f"u{i}") for i, c in enumerate(cols)]
    ).collect()
    by = {r["v"]: [r[f"u{i}"] for i in range(6)] for r in rows}
    assert by["f81d4fae-7dec-41d0-a765-00a0c91e6bf6"] == [-1.0, -1.0, -1.0, 1.0, -1.0, -1.0]
    assert by["hello world"] == [-1.0] * 6


def test_regex_detectors(vals):
    rows = vals.select(
        "v",
        native.boolean_content("v").alias("bool"),
        native.timestamp_content("v").alias("tsc"),
        native.date_content("v").alias("date"),
        native.url_content("v").alias("url"),
        native.hex_content("v").alias("hex"),
        native.empty_content("v").alias("empty"),
    ).collect()
    by = {r["v"]: r for r in rows}
    assert by["true"]["bool"] == 1.0 and by["hello world"]["bool"] == -1.0
    assert by["1609459200123"]["tsc"] == 1.0
    assert by["2021-03-04"]["date"] == 1.0 and by["Mon, 01 Jan 2024"]["date"] == 1.0
    assert by["https://example.com/x"]["url"] == 1.0
    assert by["deadbeef"]["hex"] == 1.0 and by["12345"]["hex"] == -1.0
    assert by[""]["empty"] == 1.0 and by["   "]["empty"] == 1.0


def test_url_encoding_and_content_length(spark):
    df = spark.createDataFrame([("a%20b",), ("plain",)], ["v"])
    enc = collect_col(df, native.url_encoded("v"))
    assert enc == [1.0, -1.0]
    cl = collect_col(df, native.content_length("v"))
    assert cl == [3.0, 5.0]  # "a b" is 3 utf-8 bytes


def test_uniform_domain(spark):
    # url_to_uniform_domain (utils.py:19-30): '^www([0-9])?' needs NO
    # dot — 'wwwfoo.com' loses its www prefix too (reference quirk)
    df = spark.createDataFrame(
        [("https://www.example.com/",), (".example.com",),
         ("www3.sub.example.com",), ("wwwfoo.com",), (" spaced.com ",)], ["d"]
    )
    got = collect_col(df, native.uniform_domain("d"))
    assert got == ["example.com", "example.com", "sub.example.com", "foo.com", "spaced.com"]


def test_csv_sniffer_parity(spark):
    # reference split_delimiter_separated semantics (utils.py:114-143):
    # sniff over the restricted set, accept only when the raw string
    # holds STRICTLY MORE than min_seps occurrences, split via
    # csv.reader (quote-aware)
    import csv

    vals = ["a,b,c", "x|y|z|w", "no-delims-here maybe", "k=v&k2=v2", "a,b"]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = [r["c"] for r in df.select(V.csv_sniff_udf(min_seps=1)("v").alias("c")).collect()]
    sniffer = csv.Sniffer()
    delims = ",|#:;&_.-"
    for v, g in zip(vals, got):
        try:
            dialect = sniffer.sniff(v, delimiters=delims)
            if v.count(dialect.delimiter) > 1:
                toks = list(csv.reader((v,), dialect))[0]
                exp = (delims.index(dialect.delimiter), len(toks))
            else:
                exp = (None, None)
        except csv.Error:
            exp = (None, None)
        assert (g["delim_idx"], g["num_tokens"]) == exp, v


def test_pii_scrub_and_counts(spark):
    """PII rules (functions/text.py): counts + chained typed-token
    redaction, both polarities, exact expected strings (the
    text_quality oracle hashes the scrubbed string so this pins the
    same bytes DuckDB must produce)."""
    import re

    from cookieblock_consent_classifier_spark.functions import text as TX

    cases = [
        ("mail bob.smith+test@mail.example.org now", 1, 0, 0,
         "mail <EMAIL> now"),
        ("node 192.168.001.042 and 10.0.0.7 up", 0, 2, 0,
         "node <IP> and <IP> up"),
        ("ref 123-45-6789 filed", 0, 0, 1, "ref <ID> filed"),
        ("a@b.cd via 1.2.3.4 id 987-65-4321", 1, 1, 1,
         "<EMAIL> via <IP> id <ID>"),
        ("no pii here 1234 x192.168.0.1", 0, 0, 0,
         "no pii here 1234 x192.168.0.1"),
        ("", 0, 0, 0, ""),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(cases)], ["i", "t"]
    )
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            *[
                TX.pii_count("t", pat).alias(f"n_{name}")
                for name, pat, _ in TX.PII_RULES
            ],
            TX.pii_scrub("t").alias("scrubbed"),
        ).collect()
    }
    for i, (t, n_em, n_ip, n_id, want) in enumerate(cases):
        r = out[i]
        assert (r["n_email"], r["n_ipv4"], r["n_id"]) == (n_em, n_ip, n_id), t
        assert r["scrubbed"] == want, t
        # cross-check vs Python re (Java-regex semantics twin)
        s = t
        for _, pat, token in TX.PII_RULES:
            s = re.sub(pat, token, s)
        assert s == want, t


def test_sniff_fast_path_parity_fuzz():
    """_sniff_delim (the csv.Sniffer fast path added in opt round 7)
    must agree with the REAL csv.Sniffer on every input: same chosen
    delimiter/quote/doublequote/skipinitialspace, same error cases.
    Structured fuzz biased toward the fast path's branch boundaries
    (single vs multiple candidate delimiters, preferred-list ties,
    max-(count,char) ties, trailing 'd ' runs for skipinitialspace,
    quotes/newlines forcing the real-Sniffer fallback)."""
    import csv as _csv
    import random

    rng = random.Random(4207)
    delims = V.DELIMITERS
    alphabet = "ab1 " + delims + "\"'\n%\t"
    corpus = [
        "", "a", "a,b", "a,b;c", "a, b, c", "x|y|z", "k:v;k2:v2",
        "a-b-c-d", "a_b_c", "1.2.3.4", "a&b&c", "#x#y#", "a.b,c.d",
        "a;b:c", ",,,", "a,'q,z',b", 'he said "x,y" ok', "l1,a\nl2,b",
        "a\nb\nc", ". . .", "a, b,c", "--", "__", "a;;b", ":;",
        "tok,tok tok,tok", "x" * 50, ",".join("t" * 3 for _ in range(20)),
    ]
    for _ in range(3000):
        n = rng.randint(1, 24)
        corpus.append("".join(rng.choice(alphabet) for _ in range(n)))
    sniffer = _csv.Sniffer()
    for txt in corpus:
        try:
            d = sniffer.sniff(txt, delimiters=delims)
            exp = (d.delimiter, d.quotechar, d.doublequote, d.skipinitialspace)
        except _csv.Error:
            exp = None
        got = V._sniff_delim(txt, delims)
        assert got == exp, (repr(txt), got, exp)
        # and the full split path: tokens must match reading with the
        # real sniffed dialect under both acceptance thresholds
        for min_seps in (1, 2):
            want = (None, None)
            if exp is not None and txt.count(exp[0]) > min_seps:
                try:
                    want = (list(_csv.reader((txt,), d))[0], exp[0])
                except _csv.Error:
                    # reader error (e.g. newline in unquoted field):
                    # the reference path's shared except returns None
                    want = (None, None)
            assert V._py_split_delimited(txt, min_seps) == want, repr(txt)
