"""JavaScript number semantics helpers.

The reference engine (tibetty/osm2geojson-lite) carries coordinates as raw
strings (XML path) or JS numbers (JSON path), builds hash keys with
``Array.join(',')`` (reference ``src/utils.ts:16``), and converts to float with
``parseFloat`` only at emission (``src/utils.ts:83-89``). These helpers
reproduce those semantics so the Spark engine's token-level equality and
emitted float values match the reference bit-for-bit.
"""

from __future__ import annotations

import math
import re

_PARSEFLOAT_RE = re.compile(r"^\s*([+-]?(?:Infinity|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?))")


def parse_float_js(token) -> float:
    """``parseFloat`` semantics: longest numeric prefix, else NaN."""
    if token is None:
        return math.nan
    if isinstance(token, (int, float)):
        return float(token)
    m = _PARSEFLOAT_RE.match(token)
    if not m:
        return math.nan
    text = m.group(1)
    if text.endswith("Infinity"):
        return -math.inf if text.startswith("-") else math.inf
    return float(text)


def js_str(value) -> str:
    """``String(number)`` for a JS number (shortest round-trip form).

    Used when normalizing JSON-path numbers into coordinate tokens so that
    token equality matches JS number equality. Exact textual parity with V8
    is not required (tokens are only compared to other tokens produced by
    this same function within one document) — injectivity per double is.
    """
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    f = float(value)
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    return repr(f)


def _collapse(obj):
    """Recursively turn integral floats into ints (JS JSON.stringify parity)."""
    if isinstance(obj, float):
        if math.isnan(obj) or math.isinf(obj):
            return None  # JSON.stringify(NaN) === 'null'
        if obj == int(obj) and abs(obj) < 1e15:
            return int(obj)
        return obj
    if isinstance(obj, list):
        return [_collapse(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _collapse(v) for k, v in obj.items()}
    return obj


def canonical_json(obj) -> str:
    """Serialize like ``JSON.stringify``: compact, insertion order, integral
    floats rendered as ints (reference fixtures show ``1`` not ``1.0``)."""
    import json

    return json.dumps(_collapse(obj), ensure_ascii=False, separators=(",", ":"))
