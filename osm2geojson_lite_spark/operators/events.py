"""Progressive XML event bus with the conditional-listener DSL (S3).

Reference: ``/root/reference/src/xmlparser.ts`` — ``addListener`` accepts
events ``<path>`` / ``</path>`` (dot-joined tag paths, ``xmlparser.ts:78,100``)
optionally *conditioned*: ``<path[EXPR]>`` where ``$``-prefixed names in
``EXPR`` are compiled to a predicate with ``new Function``
(``xmlparser.ts:1-16``) and evaluated per emission (``xmlparser.ts:167-180``).

Spark-first re-expression — no driver-side callbacks, no Python eval:

- the event bus is a **DataFrame of events**: one row per open/close
  emission in document order (``seq``), produced by one Arrow
  ``mapInPandas`` pass that reuses the S2 tokenizer (`xml_scan`);
- a **subscription is a Catalyst filter**: `subscribe()` parses the
  reference's event grammar and compiles the condition into a Spark SQL
  expression over the event's ``attrs`` map — evaluated JVM-side inside
  whole-stage codegen, so N subscriptions share a single extraction pass
  and each listener is a scan+filter, not a per-node callback.

Condition-name resolution mirrors ``genConditionFunc`` (``xmlparser.ts:13-16``)
and extends it usefully: ``$tag`` -> the tag column, ``$innerText`` -> the
inner-text column (both exist on the reference node), and any other
``$name`` -> ``attrs['name']`` (the reference stores attributes directly on
the node; its ``$``-rewrite cannot reach them — a dead end this engine keeps
reachable).  Comparing a missing attribute yields NULL which the filter
drops, matching JS ``undefined`` comparisons being falsy.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from .parse import xml_scan

EVENTS_SCHEMA = (
    "doc_id string, seq long, phase string, path string, tag string, "
    "attrs map<string,string>, inner_text string"
)


def _doc_events(doc_id: str, payload: str) -> list[tuple]:
    """All progressive emissions for one document, in emission order."""
    out: list[tuple] = []

    def emit(evt: str, node: dict, parent) -> None:
        phase = "close" if evt.startswith("</") else "open"
        path = evt[2:-1] if phase == "close" else evt[1:-1]
        # snapshot: the open emission fires before inner recursion mutates
        # the node (xmlparser.ts:78), so capture attrs/inner state NOW
        attrs = {k: v for k, v in node.items() if not k.startswith("$")}
        out.append((
            doc_id, len(out), phase, path, node["$tag"], attrs,
            node.get("$innerText"),
        ))

    xml_scan(payload, emit)
    return out


def events_kernel(batches) -> Iterator:
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            # the reference XmlParser is a standalone class fed raw markup;
            # anything not starting with '<' (e.g. Overpass JSON) emits nothing
            if payload is None or not payload.lstrip("﻿ \t\r\n").startswith("<"):
                continue
            rows.extend(_doc_events(doc_id, payload))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "seq", "phase", "path", "tag", "attrs",
                     "inner_text"],
        )


def xml_events(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload) -> progressive event rows (XML documents only)."""
    return payloads.select("doc_id", "payload").mapInPandas(
        events_kernel, schema=EVENTS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Listener DSL (xmlparser.ts:1-16 grammar)
# ---------------------------------------------------------------------------

_CONDITIONED_RE = re.compile(r"^(.+?)\[(.+?)\]>$")  # xmlparser.ts:1-11
_NAME_RE = re.compile(r"\$([A-Za-z_][A-Za-z0-9_:.-]*)")
_NUM_CMP_RE = re.compile(
    r"(element_at\(attrs, '[^']+'\))\s*(=|<>|<=|>=|<|>)\s*(-?\d+(?:\.\d+)?)"
)


def parse_event(evt: str) -> tuple[str, str, str | None]:
    """``'<osm.way[$id==\"1\"]>'`` -> ('open', 'osm.way', '$id==\"1\"')."""
    exp = None
    m = _CONDITIONED_RE.match(evt)
    if m:
        evt, exp = m.group(1) + ">", m.group(2)
    if evt.startswith("</") and evt.endswith(">"):
        return "close", evt[2:-1], exp
    if evt.startswith("<") and evt.endswith(">"):
        return "open", evt[1:-1], exp
    raise ValueError(f"not an event string: {evt!r}")


def condition_to_sql(exp: str) -> str:
    """Compile the DSL condition to a Spark SQL boolean expression.

    Supported grammar (documented superset of what the reference's JS eval
    can usefully express): ``$name`` references, string/number literals,
    ``== != === !== < <= > >= && || !``, parentheses.  Comparisons of an
    attribute against a *numeric* literal coerce the attribute to double
    (JS ``==`` string-number coercion parity).
    """
    def ref(m: re.Match) -> str:
        name = m.group(1)
        if name == "tag":
            return "tag"
        if name == "innerText":
            return "inner_text"
        return f"element_at(attrs, '{name}')"

    # Split on JS double-quoted string literals FIRST (supporting \" escapes)
    # so the operator / $name / coercion rewrites never touch literal
    # contents: '$name=="a&&b"' must compare against the literal "a&&b",
    # and '$k=="$id"' against the literal "$id" (ADVICE r2).
    toks = re.split(r'"((?:[^"\\]|\\.)*)"', exp)
    out = []
    for i, tok in enumerate(toks):
        if i % 2:  # literal body -> SQL single-quoted string
            body = tok.replace('\\"', '"')
            out.append("'" + body.replace("'", "''") + "'")
            continue
        # code segment: operators (longest first), then name refs
        c = tok.replace("===", "==").replace("!==", "!=")
        c = c.replace("==", " = ").replace("!=", " <> ")
        c = c.replace("&&", " AND ").replace("||", " OR ")
        c = re.sub(r"!(?![=<>])", " NOT ", c)
        c = _NAME_RE.sub(ref, c)
        # numeric coercion: attrs are strings; JS '12' == 12 is true.
        # Comparisons against numeric literals live wholly inside one code
        # segment (a literal comparison spans segments), so per-segment
        # application cannot misfire inside user strings.
        c = _NUM_CMP_RE.sub(r"cast(\1 as double) \2 \3", c)
        # whitespace tidy — skipping single-quoted (SQL-style) literals,
        # which pass through code segments verbatim
        sq = c.split("'")
        sq[::2] = [re.sub(r"\s+", " ", p) for p in sq[::2]]
        out.append("'".join(sq))
    return "".join(out).strip()


def subscribe(events: DataFrame, evt: str) -> DataFrame:
    """One listener = one Catalyst filter over the shared event stream."""
    phase, path, exp = parse_event(evt)
    out = events.filter((F.col("phase") == phase) & (F.col("path") == path))
    if exp is not None:
        out = out.filter(F.expr(condition_to_sql(exp)))
    return out
