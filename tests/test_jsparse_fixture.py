"""Independent oracle for the bounded JS-literal parser.

The golden-parity suite routes the reference's js2py fallback through
the SAME bounded parser (tests/ref_shims.py), so parity alone cannot
detect a divergence on values both sides parse. This fixture breaks
that circularity: every EXPECTED value below is hand-derived from the
ECMAScript literal grammar + js2py's documented conversion rules
(``eval_js("function a(){return <v>}")().to_dict()``), NOT from
running the parser:

- object literal → Python dict (keys are strings; unquoted identifier
  and numeric keys stringify);
- array literal → ``to_dict()`` iterates the array's own enumerable
  properties (indices; ``length`` is non-enumerable) → INDEX-KEYED
  dict ``{'0': v0, ...}`` with nested values pythonized (nested
  arrays → lists, objects → dicts);
- primitive (string/number/boolean/null) → js2py hands back a plain
  Python value, ``.to_dict()`` raises AttributeError → the reference's
  except-clause yields None (utils.py:107-109);
- ``undefined``/``null`` property values → None;
- a syntax error (or any non-literal: expressions, identifier
  references, function calls) → JsException/rejection → None. For
  EXPRESSIONS js2py would actually evaluate (``{a:1+2}``), rejection
  is the engine's documented waiver class (COVERAGE.md) — asserted
  here as rejected-by-design.

Inputs only reach this path when ``json.loads`` already FAILED and the
URL-decoded value contains '{' (processor.py:1227-1235), so every case
below is non-JSON on purpose; the two real-crawl shapes (Cookiebot
consent object, px-size array) are included verbatim.
"""

from __future__ import annotations

import pytest

from cookieblock_consent_classifier_spark.functions.jsparse import (
    JsLiteralError,
    parse_js_literal,
    try_split_json_like,
)

# (input, expected result of the reference's try_split_json given REAL
# js2py semantics) — expected values hand-derived, see module docstring
FALLBACK_CASES = [
    # the Cookiebot consent-cookie shape (real crawl fallback hit)
    (
        "{stamp:'9mnDLHfyaTdR+luI0z54==',necessary:true,preferences:false,"
        "statistics:true,marketing:false,ver:2,utc:1612530000000,region:'ch'}",
        {
            "stamp": "9mnDLHfyaTdR+luI0z54==",
            "necessary": True,
            "preferences": False,
            "statistics": True,
            "marketing": False,
            "ver": 2,
            "utc": 1612530000000,
            "region": "ch",
        },
    ),
    # the px-size array shape (real crawl fallback hit): top-level JS
    # array → index-keyed dict via to_dict()
    (
        "[{'st':'px','s':200},{}]",
        {"0": {"st": "px", "s": 200}, "1": {}},
    ),
    (
        "[{'st':'px','s':200},{'st':'%','s':100}]",
        {"0": {"st": "px", "s": 200}, "1": {"st": "%", "s": 100}},
    ),
    # single-quoted object (invalid JSON, valid JS)
    ("{'single':'quoted'}", {"single": "quoted"}),
    # trailing comma (invalid JSON, valid JS)
    ("{a:1,}", {"a": 1}),
    # numeric + identifier keys stringify (JS property-name semantics)
    ("{1:'x',foo:2}", {"1": "x", "foo": 2}),
    # null and undefined property values → None (js2py to_dict)
    ("{a:null,b:undefined}", {"a": None, "b": None}),
    # nested: arrays nested INSIDE objects pythonize to lists
    ("{a:[1,'x'],b:{c:true},}", {"a": [1, "x"], "b": {"c": True}}),
    # escapes + whitespace tolerance
    ("{ a : '\\'q\\'' , b : \"\\n\" }", {"a": "'q'", "b": "\n"}),
    # negative/float/exponent numbers
    ("{a:-3,b:2.5,c:1e2}", {"a": -3, "b": 2.5, "c": 1e2}),
    # PRIMITIVE results: js2py returns a plain Python value, .to_dict()
    # AttributeErrors → reference sees None
    ("'{abc}'", None),  # single-quoted string containing a brace
    ("true;", None),  # trailing ';' is legal in the function body, not JSON
    ("+42", None),  # unary plus: JS number, invalid JSON
    # REJECTS (syntax errors in JS too): URL with a template brace —
    # real crawl reject ('https:' label + '//' comment → bad return)
    ("https://sync.taboola.com/sg/id5-network/1/?taboola_hm={ID5UID}", None),
    ("{a:", None),  # truncated
    ("{a 1}", None),  # missing colon
    ("{a:bar}", None),  # identifier reference → ReferenceError in js2py
]


@pytest.mark.parametrize("src,expected", FALLBACK_CASES, ids=range(len(FALLBACK_CASES)))
def test_js2py_fallback_matrix(src, expected):
    """Engine surface (try_split_json_like) — but pin the FALLBACK
    branch: every input here must NOT be valid JSON, otherwise the
    case silently tests the json.loads branch instead."""
    import json

    with pytest.raises(Exception):
        json.loads(src)
    assert try_split_json_like(src) == expected


def test_expression_is_documented_waiver():
    """js2py would EVALUATE {a:1+2} to {'a': 3}; the bounded parser
    rejects all expressions by design (COVERAGE.md waiver class) —
    pin the rejection so the waiver stays deliberate."""
    with pytest.raises(JsLiteralError):
        parse_js_literal("{a:1+2}")
    assert try_split_json_like("{a:1+2}") is None


def test_shim_matches_fixture_semantics():
    """The golden-parity shim (tests/ref_shims.py _eval_js) must
    observe the same matrix through the js2py call shape the
    reference uses."""
    import ref_shims

    for src, expected in FALLBACK_CASES:
        fn_src = "function a() { return " + src + " }"
        try:
            got = ref_shims._eval_js(fn_src)().to_dict()
        except (ref_shims.JsException, AttributeError):
            got = None
        assert got == expected, src
