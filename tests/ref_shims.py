"""In-process harness for running the REAL reference extractor
(/root/reference/feature_extraction) as the golden oracle.

The container has no network and no js2py/Levenshtein/scipy/sklearn/
xgboost/tqdm, so this module installs exact-semantics stand-ins into
sys.modules before importing the reference package:

- ``Levenshtein.distance`` — exact edit distance (vectorized numpy row
  DP; same values as python-Levenshtein's C implementation).
- ``scipy.sparse.csr_matrix`` — minimal COO→dense used only by
  retrieve_sparse_matrix/retrieve_debug_output; duplicate (row,col)
  entries SUM like scipy's.
- ``tqdm`` — identity passthrough.
- ``sklearn.datasets.dump_svmlight_file`` / ``xgboost.DMatrix`` —
  present so the module imports; raise if actually called.
- ``js2py.eval_js`` — evaluates the reference's
  "function a() { return <cookie value> }" wrapper with the SAME
  bounded JS-literal parser the engine kernel uses
  (cookieblock_consent_classifier_spark/functions/jsparse.py), so the
  js2py-only residual (exotic JS the bounded parser rejects) is a
  measured waiver, not a hidden divergence — see
  test_golden_reference.py::test_js2py_waiver_rate.

Only sys.modules is touched; /root/reference stays read-only.
"""

from __future__ import annotations

import sys
import types

import numpy as np

from cookieblock_consent_classifier_spark.functions.jsparse import (
    JsLiteralError,
    parse_js_literal,
)

REFERENCE_ROOT = "/root/reference"

# js2py-shim call accounting (reset per test to measure the waiver).
# status: "ok" = parsed to an object/array (dict via to_dict),
# "primitive" = parsed but js2py's .to_dict() would raise
# AttributeError (reference treats as unparseable — deterministic,
# NOT a waiver), "reject" = bounded parser rejected (the only class
# where a full JS interpreter could diverge)
JS2PY_CALLS: list[tuple[str, str]] = []  # (body, status)


def levenshtein_distance(a: str, b: str) -> int:
    """Exact Levenshtein via numpy row DP (O(len(a)) vectorized rows).
    cur[j] = min(prev[j]+1, prev[j-1]+cost, cur[j-1]+1); the in-row
    dependency resolves as a prefix-min of (cand[j]-j)+j."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(lb + 1, dtype=np.int64)
    idx = np.arange(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cand = np.empty(lb + 1, dtype=np.int64)
        cand[0] = i
        cand[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (bb != aa[i - 1]))
        cur = np.minimum.accumulate(cand - idx) + idx
        prev = cur
    return int(prev[-1])


class _MiniCSR:
    """scipy.sparse.csr_matrix((data, (rows, cols))) subset used by the
    reference's retrieve_sparse_matrix/retrieve_debug_output."""

    def __init__(self, arg):
        data, (rows, cols) = arg
        n_rows = (max(rows) + 1) if len(rows) else 0
        n_cols = (max(cols) + 1) if len(cols) else 0
        m = np.zeros((n_rows, n_cols), dtype=np.float64)
        for r, c, d in zip(rows, cols, data):
            m[r, c] += d  # scipy sums duplicate COO entries
        self._m = m
        self.shape = m.shape

    def todense(self):
        return self._m


class JsException(Exception):
    pass


_PREFIX = "function a() { return "
_SUFFIX = " }"


def _eval_js(src: str):
    assert src.startswith(_PREFIX) and src.endswith(_SUFFIX), src[:50]
    body = src[len(_PREFIX):-len(_SUFFIX)]
    try:
        val = parse_js_literal(body)
    except (JsLiteralError, IndexError, ValueError) as e:
        JS2PY_CALLS.append((body, "reject"))
        raise JsException(str(e))
    JS2PY_CALLS.append((body, "ok" if isinstance(val, (dict, list)) else "primitive"))

    class _Result:
        def to_dict(self):
            # real js2py: a JS object wraps (to_dict → dict); an array
            # wrap's to_dict iterates its enumerable own properties →
            # index-keyed dict; a primitive result is a plain Python
            # value with NO to_dict — AttributeError, which the
            # reference's except-clause turns into None
            # (utils.py:107-109)
            if isinstance(val, dict):
                return val
            if isinstance(val, list):
                return {str(i): v for i, v in enumerate(val)}
            raise AttributeError(f"'{type(val).__name__}' object has no attribute 'to_dict'")

    return lambda: _Result()


def _module(name: str) -> types.ModuleType:
    # a real ModuleSpec so importlib.util.find_spec (pyspark probes
    # scipy availability this way) doesn't choke on __spec__ = None
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def install_shims() -> None:
    if "js2py" in sys.modules:
        return

    lev = _module("Levenshtein")
    lev.distance = levenshtein_distance
    sys.modules["Levenshtein"] = lev

    scipy_mod = _module("scipy")
    scipy_mod.__version__ = "1.11.4"  # pyspark.testing probes this
    sparse_mod = _module("scipy.sparse")
    sparse_mod.csr_matrix = _MiniCSR
    scipy_mod.sparse = sparse_mod
    sys.modules["scipy"] = scipy_mod
    sys.modules["scipy.sparse"] = sparse_mod

    def _unavailable(*a, **k):
        raise NotImplementedError("not available in this container")

    sk = _module("sklearn")
    skd = _module("sklearn.datasets")
    skd.dump_svmlight_file = _unavailable
    sk.datasets = skd
    sys.modules["sklearn"] = sk
    sys.modules["sklearn.datasets"] = skd

    xgb = _module("xgboost")
    xgb.DMatrix = _unavailable
    sys.modules["xgboost"] = xgb

    tqdm_mod = _module("tqdm")
    tqdm_mod.tqdm = lambda x, **kw: x
    sys.modules["tqdm"] = tqdm_mod

    js2py_mod = _module("js2py")
    internals = _module("js2py.internals")
    simplex = _module("js2py.internals.simplex")
    simplex.JsException = JsException
    internals.simplex = simplex
    js2py_mod.internals = internals
    js2py_mod.eval_js = _eval_js
    sys.modules["js2py"] = js2py_mod
    sys.modules["js2py.internals"] = internals
    sys.modules["js2py.internals.simplex"] = simplex


def load_reference_processor():
    """Import the reference package (installs shims first). Returns
    the feature_extraction.processor module."""
    install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import feature_extraction.processor as rp  # noqa: PLC0415

    return rp


def load_reference_dump_predictors():
    """Import the reference's pure-Python dump predictors
    (classifiers/xgbpredictor_dump.py, xgbpredictor_sparsedump.py) —
    the golden oracle for the engine's xgb.py tree-scoring. They pull
    in classifiers/utils.py (sklearn.metrics names) and docopt at
    module level, so shim those too; `main()` is __main__-guarded, no
    import side effects. Returns (dump_mod, sparsedump_mod)."""
    install_shims()

    def _unavailable(*a, **k):
        raise NotImplementedError("not available in this container")

    if "docopt" not in sys.modules:
        d = _module("docopt")
        d.docopt = _unavailable
        sys.modules["docopt"] = d
    skm = sys.modules.get("sklearn.metrics")
    if skm is None:
        skm = _module("sklearn.metrics")
        for name in ("precision_score", "recall_score", "accuracy_score", "f1_score"):
            setattr(skm, name, _unavailable)
        sys.modules["sklearn.metrics"] = skm
        sys.modules["sklearn"].metrics = skm
    # utils.py needs load_svmlight_file as well (shim ships dump_ only)
    skd = sys.modules["sklearn.datasets"]
    if not hasattr(skd, "load_svmlight_file"):
        skd.load_svmlight_file = _unavailable

    cls_dir = REFERENCE_ROOT + "/classifiers"
    sys.path.insert(0, cls_dir)
    try:
        import xgbpredictor_dump as fd  # noqa: PLC0415
        import xgbpredictor_sparsedump as sd  # noqa: PLC0415
    finally:
        # don't leave the reference dir on sys.path: its generic
        # module names (utils.py, ...) would shadow any later
        # top-level import in this process. NB the imported modules
        # (and their `utils`) stay cached in sys.modules — fine, the
        # repo has no bare `utils` module of its own.
        sys.path.remove(cls_dir)

    return fd, sd


def reference_dense_matrix(proc) -> np.ndarray:
    """Dense (n_rows, num_features) matrix from a processor that has
    run extract_features — trailing never-inserted columns padded."""
    csr = proc.retrieve_sparse_matrix()
    m = csr.todense()
    out = np.zeros((m.shape[0], proc.num_features))
    out[:, : m.shape[1]] = m
    return out
