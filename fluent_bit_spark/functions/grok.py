"""Grok pattern front end: ``%{SYNTAX:semantic:type}`` → RegexParser.

The north-star pipeline calls for "grok/regex field extraction"
(BASELINE.json north_star). Upstream fluent-bit ships only the raw
regex parser (upstream:src/flb_parser_regex.c); the grok *syntax* is
public knowledge from the logstash-patterns-core / fluentd
grok-parser ecosystem: a pattern library of named regex fragments plus
the ``%{SYNTAX}``, ``%{SYNTAX:semantic}`` and
``%{SYNTAX:semantic:type}`` reference forms that expand recursively
into one big named-group regex.

This module is a pure COMPILER — the output is a
:class:`~fluent_bit_spark.functions.parsers.RegexParser`, so grok
patterns ride the exact same vectorized Arrow-batched extraction path
(``Series.str.extract``) as hand-written regex parsers; nothing new
executes per row.

Python ``re`` notes (deliberate deviations from the Oniguruma
originals, semantics preserved for well-formed inputs):

- no atomic groups / possessive quantifiers → ``BASE10NUM`` et al are
  written with plain groups (the inputs we parse are anchored field
  boundaries, so backtracking blowup is not reachable),
- named groups must be unique and valid identifiers → a semantic used
  twice, or a non-identifier semantic (grok allows ``a.b`` / ``a[0]``),
  raises ``ValueError`` instead of silently renaming.

Grok types ``int``/``float`` map onto the parser's existing hint
vocabulary (``integer``/``float`` → ``try_cast``); any hint the
RegexParser understands (``bool``, ``hex``, …) is passed through.
"""

from __future__ import annotations

import re

from .parsers import RegexParser

# ---------------------------------------------------------------------------
# Core pattern library (public logstash-patterns-core vocabulary,
# re-expressed for Python `re`)
# ---------------------------------------------------------------------------

GROK_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "INT": r"[+-]?(?:[0-9]+)",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"%{BASE10NUM}",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": (r"\"(?:[^\"\\]*(?:\\.[^\"\\]*)*)\""
                     r"|'(?:[^'\\]*(?:\\.[^'\\]*)*)'"),
    "QS": r"%{QUOTEDSTRING}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    # network
    "IPV4": (r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
             r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"),
    # Full RFC-4291 alternation (logstash-patterns-core IPV6 semantics,
    # rewritten with non-capturing groups so semantic group names stay
    # unique): every compression point, including mixed forms like
    # 2001:db8::1 and v4-mapped ::ffff:1.2.3.4. Deviation from the
    # logstash original: the zone-id tail is bounded
    # ((?:%[0-9A-Za-z._~-]+)? instead of (%.+)?) — the original's
    # greedy .+ swallows the rest of the line when a literal % follows
    # the address inside a larger pattern.
    "IPV6": (r"(?:(?:[0-9A-Fa-f]{1,4}:){7}(?:[0-9A-Fa-f]{1,4}|:)"
             r"|(?:[0-9A-Fa-f]{1,4}:){6}(?:%{IPV4}|:[0-9A-Fa-f]{1,4}|:)"
             r"|(?:[0-9A-Fa-f]{1,4}:){5}"
             r"(?::%{IPV4}|(?::[0-9A-Fa-f]{1,4}){1,2}|:)"
             r"|(?:[0-9A-Fa-f]{1,4}:){4}"
             r"(?:(?::[0-9A-Fa-f]{1,4}){0,1}:%{IPV4}"
             r"|(?::[0-9A-Fa-f]{1,4}){1,3}|:)"
             r"|(?:[0-9A-Fa-f]{1,4}:){3}"
             r"(?:(?::[0-9A-Fa-f]{1,4}){0,2}:%{IPV4}"
             r"|(?::[0-9A-Fa-f]{1,4}){1,4}|:)"
             r"|(?:[0-9A-Fa-f]{1,4}:){2}"
             r"(?:(?::[0-9A-Fa-f]{1,4}){0,3}:%{IPV4}"
             r"|(?::[0-9A-Fa-f]{1,4}){1,5}|:)"
             r"|(?:[0-9A-Fa-f]{1,4}:){1}"
             r"(?:(?::[0-9A-Fa-f]{1,4}){0,4}:%{IPV4}"
             r"|(?::[0-9A-Fa-f]{1,4}){1,6}|:)"
             r"|:(?:(?::[0-9A-Fa-f]{1,4}){0,5}:%{IPV4}"
             r"|(?::[0-9A-Fa-f]{1,4}){1,7}|:))"
             r"(?:%[0-9A-Za-z._~-]+)?"),
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": (r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}"
                 r"(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b"),
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    # dates / times
    "MONTH": (r"\b(?:[Jj]an(?:uary)?|[Ff]eb(?:ruary)?|[Mm]ar(?:ch)?"
              r"|[Aa]pr(?:il)?|[Mm]ay|[Jj]une?|[Jj]uly?"
              r"|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo]ct(?:ober)?"
              r"|[Nn]ov(?:ember)?|[Dd]ec(?:ember)?)\b"),
    "MONTHDAY": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": (r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]"
                          r"%{HOUR}:?%{MINUTE}(?::?%{SECOND})?"
                          r"%{ISO8601_TIMEZONE}?"),
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "LOGLEVEL": (r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG"
                 r"|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO"
                 r"|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?"
                 r"|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL"
                 r"|[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?"),
    # composites with embedded semantics (expand to named groups)
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}|-",
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} (?:%{HTTPDUSER:ident}) "
        r"(?:%{HTTPDUSER:auth}) \[%{HTTPDATE:timestamp}\] "
        r"\"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
}

# grok reference: %{SYNTAX}, %{SYNTAX:semantic}, %{SYNTAX:semantic:type}
_TOKEN = re.compile(r"%\{(\w+)(?::([^:}]+))?(?::([^:}]+))?\}")

# grok's type vocabulary → RegexParser hint vocabulary
_GROK_TYPES = {"int": "integer", "integer": "integer",
               "float": "float", "bool": "bool",
               "string": "string", "hex": "hex"}


def _expand(pattern: str, lib: dict[str, str], stack: tuple[str, ...],
            seen: dict[str, str]) -> str:
    def repl(m: re.Match) -> str:
        syntax, semantic, typ = m.group(1), m.group(2), m.group(3)
        if syntax not in lib:
            raise ValueError(
                f"grok: unknown pattern %{{{syntax}}} (not in the core "
                f"library or pattern_definitions)")
        if syntax in stack:
            chain = " -> ".join((*stack, syntax))
            raise ValueError(f"grok: recursive pattern reference: {chain}")
        body = _expand(lib[syntax], lib, (*stack, syntax), seen)
        if semantic is None:
            return f"(?:{body})"
        if not semantic.isidentifier():
            raise ValueError(
                f"grok: semantic name {semantic!r} is not a valid "
                f"identifier (Python named groups; rename e.g. 'a.b' "
                f"to 'a_b')")
        if semantic in seen:
            raise ValueError(
                f"grok: semantic name {semantic!r} captured twice "
                f"(named groups must be unique)")
        if typ is not None:
            hint = _GROK_TYPES.get(typ.lower())
            if hint is None:
                raise ValueError(
                    f"grok: unknown type {typ!r} for %{{{syntax}:"
                    f"{semantic}}} (know: {sorted(_GROK_TYPES)})")
            seen[semantic] = hint
        else:
            seen[semantic] = "string"
        return f"(?P<{semantic}>{body})"

    return _TOKEN.sub(repl, pattern)


def compile_grok(pattern: str, name: str = "grok",
                 pattern_definitions: dict[str, str] | None = None,
                 time_key: str | None = None,
                 time_format: str | None = None) -> RegexParser:
    """Compile a grok pattern to a :class:`RegexParser`.

    ``pattern_definitions`` adds/overrides library entries (the
    logstash ``pattern_definitions`` / fluentd
    ``grok_pattern_definition`` escape hatch); definitions may
    themselves use ``%{...}`` references.

    The compiled parser captures every *semantic* name in the pattern
    (including semantics embedded in composite library entries like
    ``COMMONAPACHELOG``); typed semantics (``:int``/``:float``) become
    ``try_cast`` hints on the vectorized extraction path.
    """
    lib = dict(GROK_PATTERNS)
    if pattern_definitions:
        lib.update(pattern_definitions)
    seen: dict[str, str] = {}
    expanded = _expand(pattern, lib, (), seen)
    if not seen:
        raise ValueError(
            "grok: pattern has no semantic captures (%{SYNTAX:name}); "
            "nothing would be extracted")
    try:
        re.compile(expanded)
    except re.error as e:  # pragma: no cover - library patterns are valid
        raise ValueError(f"grok: expanded regex does not compile: {e}") from e
    types = {k: v for k, v in seen.items() if v != "string"}
    return RegexParser(name=name, pattern=expanded, types=types,
                       time_key=time_key, time_format=time_format)
