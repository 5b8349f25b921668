"""Bounded JavaScript-literal parser for cookie values.

The reference's ``try_split_json`` (utils.py:97-111) falls back to a
full JS interpreter (js2py) when ``json.loads`` fails:

    js_func = js2py.eval_js("function a() { return " + s + " }")
    return js_func().to_dict()

Shipping a JS interpreter inside an Arrow kernel is neither portable
nor fast; real cookie values that reach this path are JS *object
literals* (unquoted keys, single-quoted strings, bare true/false/null,
hex numbers, trailing commas — see the shipped fixture
training_data/test_case.json: ``{stamp:'...',necessary:true,...}``).
This module implements exactly that subset with a recursive-descent
parser. Anything outside the subset (expressions, function calls,
identifiers as values) raises ``JsLiteralError`` — the same observable
outcome as js2py raising JsException (the caller maps both to None).

Parity notes vs js2py, mirrored deliberately:
- object keys are always strings (JS semantics): numeric keys are
  stringified;
- ``undefined`` and ``null`` both map to Python None (js2py to_dict
  does the same);
- a line terminator between ``return`` and the literal triggers JS
  automatic-semicolon-insertion: js2py returns undefined and its
  ``.to_dict()`` raises — we raise too (leading \\n/\\r before the
  first token is an error);
- a single trailing ``;`` after the literal is legal inside the
  generated function body — accepted.

The residual divergence (values js2py would evaluate but this parser
rejects) is measured per-corpus by tests/test_golden_reference.py and
documented in COVERAGE.md.
"""

from __future__ import annotations

import json
from typing import Any


class JsLiteralError(ValueError):
    """Input is not a supported JS literal."""


_WS = " \t\f\v "
_WS_NL = _WS + "\r\n  "
_IDENT_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_$")
_IDENT_CONT = _IDENT_START | set("0123456789")
_ESCAPES = {
    "'": "'", '"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f",
    "n": "\n", "r": "\r", "t": "\t", "v": "\v", "0": "\0",
}


class _Parser:
    __slots__ = ("s", "i", "n")

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def err(self, msg: str) -> JsLiteralError:
        return JsLiteralError(f"{msg} at {self.i}")

    def skip_ws(self) -> None:
        s, n = self.s, self.n
        while self.i < n and s[self.i] in _WS_NL:
            self.i += 1

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def expect(self, ch: str) -> None:
        if self.peek() != ch:
            raise self.err(f"expected {ch!r}")
        self.i += 1

    # ---- values ------------------------------------------------------

    def value(self) -> Any:
        self.skip_ws()
        c = self.peek()
        if c == "{":
            return self.obj()
        if c == "[":
            return self.arr()
        if c in "'\"":
            return self.string(c)
        if c.isdigit() or c in "+-." :
            return self.number()
        if c in _IDENT_START:
            return self.word()
        raise self.err(f"unexpected {c!r}")

    def obj(self) -> dict:
        self.expect("{")
        out: dict[str, Any] = {}
        self.skip_ws()
        if self.peek() == "}":
            self.i += 1
            return out
        while True:
            self.skip_ws()
            key = self.key()
            self.skip_ws()
            self.expect(":")
            out[key] = self.value()
            self.skip_ws()
            c = self.peek()
            if c == ",":
                self.i += 1
                self.skip_ws()
                if self.peek() == "}":  # trailing comma
                    self.i += 1
                    return out
            elif c == "}":
                self.i += 1
                return out
            else:
                raise self.err("expected , or }")

    def arr(self) -> list:
        self.expect("[")
        out: list[Any] = []
        self.skip_ws()
        if self.peek() == "]":
            self.i += 1
            return out
        while True:
            out.append(self.value())
            self.skip_ws()
            c = self.peek()
            if c == ",":
                self.i += 1
                self.skip_ws()
                if self.peek() == "]":  # trailing comma
                    self.i += 1
                    return out
            elif c == "]":
                self.i += 1
                return out
            else:
                raise self.err("expected , or ]")

    def key(self) -> str:
        c = self.peek()
        if c in "'\"":
            return self.string(c)
        if c in _IDENT_START:
            start = self.i
            while self.i < self.n and self.s[self.i] in _IDENT_CONT:
                self.i += 1
            return self.s[start:self.i]
        if c.isdigit():  # numeric key -> JS stringifies
            num = self.number()
            if isinstance(num, int):
                return str(num)
            return repr(num)
        raise self.err("bad object key")

    def string(self, quote: str) -> str:
        self.expect(quote)
        buf: list[str] = []
        s, n = self.s, self.n
        while True:
            if self.i >= n:
                raise self.err("unterminated string")
            c = s[self.i]
            if c == quote:
                self.i += 1
                return "".join(buf)
            if c in "\n\r":
                raise self.err("newline in string")
            if c == "\\":
                self.i += 1
                if self.i >= n:
                    raise self.err("bad escape")
                e = s[self.i]
                if e in _ESCAPES:
                    buf.append(_ESCAPES[e])
                    self.i += 1
                elif e == "x":
                    buf.append(chr(int(s[self.i + 1:self.i + 3], 16)))
                    self.i += 3
                elif e == "u":
                    buf.append(chr(int(s[self.i + 1:self.i + 5], 16)))
                    self.i += 5
                elif e in "\n\r":  # line continuation
                    self.i += 1
                else:  # JS: unknown escape -> the char itself
                    buf.append(e)
                    self.i += 1
            else:
                buf.append(c)
                self.i += 1

    def number(self) -> int | float:
        start = self.i
        s, n = self.s, self.n
        if self.peek() in "+-":
            self.i += 1
        if self.s[self.i:self.i + 2].lower() in ("0x",):
            self.i += 2
            h0 = self.i
            while self.i < n and s[self.i] in "0123456789abcdefABCDEF":
                self.i += 1
            if self.i == h0:
                raise self.err("bad hex literal")
            sign = -1 if s[start] == "-" else 1
            return sign * int(s[h0:self.i], 16)
        seen_digit = seen_dot = seen_exp = False
        while self.i < n:
            c = s[self.i]
            if c.isdigit():
                seen_digit = True
            elif c == "." and not seen_dot and not seen_exp:
                seen_dot = True
            elif c in "eE" and seen_digit and not seen_exp:
                seen_exp = True
                if self.i + 1 < n and s[self.i + 1] in "+-":
                    self.i += 1
            else:
                break
            self.i += 1
        if not seen_digit:
            raise self.err("bad number")
        txt = s[start:self.i]
        if seen_dot or seen_exp:
            return float(txt)
        return int(txt)

    def word(self) -> Any:
        start = self.i
        while self.i < self.n and self.s[self.i] in _IDENT_CONT:
            self.i += 1
        w = self.s[start:self.i]
        if w == "true":
            return True
        if w == "false":
            return False
        if w in ("null", "undefined"):
            return None
        if w == "NaN":
            return float("nan")
        if w == "Infinity":
            return float("inf")
        raise self.err(f"bare identifier {w!r}")


def parse_js_literal(s: str) -> Any:
    """Parse a JS literal the way js2py's generated function would
    evaluate it (see module docstring). Raises JsLiteralError outside
    the supported subset."""
    # ASI: "function a() { return \n <lit> }" returns undefined.
    i = 0
    while i < len(s) and s[i] in _WS:
        i += 1
    if i < len(s) and s[i] in "\r\n  ":
        raise JsLiteralError("ASI: line terminator after return")
    p = _Parser(s)
    v = p.value()
    p.skip_ws()
    if p.peek() == ";":  # "return <lit>; }" is legal in the wrapper
        p.i += 1
        p.skip_ws()
    if p.i != p.n:
        raise JsLiteralError(f"trailing content at {p.i}")
    return v


def try_split_json_like(s: str) -> Any | None:
    """Reference try_split_json (utils.py:97-111): strict json.loads
    first; on JSONDecodeError fall back to the JS-literal parser.

    json.loads results pass through unchanged (the reference handles
    list/str results with no-op branches, processor.py:1282-1285).
    The js2py fallback mimics REAL js2py ``js_func().to_dict()``:
    a JS object converts to a dict; a JS array's to_dict() iterates
    its own enumerable properties, yielding an INDEX-KEYED dict
    ``{'0': v0, '1': v1, ...}`` (length is non-enumerable); a
    primitive result (str/number/bool/null) is a plain Python value
    in js2py, so ``.to_dict()`` raises AttributeError and the
    reference's except-clause returns None (utils.py:107-109)."""
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        try:
            val = parse_js_literal(s)
        except (JsLiteralError, IndexError, ValueError):
            return None
        return js2py_to_dict_result(val)
    except (TypeError, ValueError):
        return None


def js2py_to_dict_result(val: Any) -> dict | None:
    """What the reference observes from real js2py's
    ``eval_js(...)().to_dict()`` given a parsed JS-literal value:
    dict → dict, array → index-keyed dict (nested values already
    pythonized), anything else → None (AttributeError in js2py)."""
    if isinstance(val, dict):
        return val
    if isinstance(val, list):
        return {str(i): v for i, v in enumerate(val)}
    return None
