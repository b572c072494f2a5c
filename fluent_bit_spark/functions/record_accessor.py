"""Record-accessor path compiler (SURVEY.md §1.1).

Reference semantics (upstream:src/flb_record_accessor.c,
src/record_accessor/flb_ra_parser.c): template strings address record
content — ``$key``, ``$key['sub']['sub2']``, ``$key[0]``, plus the
specials ``$TAG`` (the chunk tag), ``$TAG[n]`` (dot-split tag part n)
and ``$TIME`` (event timestamp). Used by rewrite_tag NEW_TAG templates,
out_s3 key formats, grep/modify key selectors, es logstash keys, …

Spark re-expression: compile the path ONCE to a Column expression —
struct access via ``getField``, array index via ``getItem`` (0-based
here; document: fluent-bit msgpack arrays are 0-based too), map access
via ``element_at`` semantics of getItem. Whole templates (mixed text +
accessors) compile to ``concat`` — all JVM-side, codegen, no UDF; the
analogue of the reference's compile-once ra parse.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PATH = re.compile(
    r"\$(?P<name>[A-Za-z_][A-Za-z0-9_]*)(?P<subs>(\[(\d+|'[^']*')\])*)")
_SUB = re.compile(r"\[(\d+|'[^']*')\]")


def compile_path(path: str, tag_col: str = "tag",
                 ts_col: str = "ts") -> Column:
    """One accessor (``$...``) → Column."""
    m = _PATH.fullmatch(path.strip())
    if not m:
        raise ValueError(f"not a record-accessor path: {path!r}")
    name, subs = m.group("name"), _SUB.findall(m.group("subs") or "")
    if name == "TIME":
        return F.col(ts_col)
    if name == "TAG":
        if subs:
            if len(subs) != 1 or not subs[0].isdigit():
                raise ValueError(f"$TAG takes one integer index: {path!r}")
            return F.split(F.col(tag_col), r"\.")[int(subs[0])]
        return F.col(tag_col)
    c = F.col(name)
    for s in subs:
        c = c.getItem(int(s)) if s.isdigit() else c.getField(s[1:-1])
    return c


_TEMPLATE = re.compile(
    r"\$[A-Za-z_][A-Za-z0-9_]*(?:\[(?:\d+|'[^']*')\])*")


def compile_template(template: str, tag_col: str = "tag",
                     ts_col: str = "ts") -> Column:
    """A mixed text/accessor template (e.g. out_s3 ``logs/$TAG[1]/$key``)
    → one concat() Column. Null accessor values render as empty string
    (fluent-bit renders missing keys as empty)."""
    parts: list[Column] = []
    last = 0
    for m in _TEMPLATE.finditer(template):
        if m.start() > last:
            parts.append(F.lit(template[last:m.start()]))
        parts.append(F.coalesce(
            compile_path(m.group(0), tag_col, ts_col).cast("string"),
            F.lit("")))
        last = m.end()
    if last < len(template):
        parts.append(F.lit(template[last:]))
    if not parts:
        return F.lit("")
    return parts[0] if len(parts) == 1 else F.concat(*parts)
