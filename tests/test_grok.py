"""Grok compiler (functions/grok.py): %{SYNTAX:semantic:type} patterns
must expand to the same named-group regexes a hand author would write,
ride the vectorized regex-parser path unchanged, and fail loudly on
every malformed-pattern class (unknown name, duplicate semantic,
non-identifier semantic, recursive definition, no captures)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.functions.grok import GROK_PATTERNS, compile_grok
from fluent_bit_spark.functions.parsers import apply_regex_parser
from fluent_bit_spark.plans.config import parse_classic, parsers_from_tree

APACHE = ('10.12.0.34 - user13 [01/Jan/2024:00:09:58 +0000] '
          '"GET /api/error HTTP/1.1" 200 130')


def test_library_patterns_all_compile():
    # every library entry must expand (cycle-free) and compile under
    # Python re when referenced without a semantic
    for name in GROK_PATTERNS:
        p = compile_grok("%{" + name + ":x}")
        re.compile(p.pattern)


def test_commonapachelog_embedded_semantics():
    p = compile_grok("%{COMMONAPACHELOG}", name="apache")
    m = re.match(p.pattern + r"$", APACHE)
    assert m is not None
    g = m.groupdict()
    assert g["clientip"] == "10.12.0.34"
    assert g["ident"] == "-"
    assert g["auth"] == "user13"
    assert g["timestamp"] == "01/Jan/2024:00:09:58 +0000"
    assert g["verb"] == "GET"
    assert g["request"] == "/api/error"
    assert g["httpversion"] == "1.1"
    assert g["response"] == "200"
    assert g["bytes"] == "130"
    assert g["rawrequest"] is None  # alternation arm not taken


def test_typed_semantics_map_to_parser_hints():
    p = compile_grok("%{NUMBER:resp:int} %{NUMBER:lat:float} "
                     "%{BASE16NUM:addr:hex} %{WORD:tag}")
    assert p.types == {"resp": "integer", "lat": "float", "addr": "hex"}
    # untyped semantics stay string (no hint entry)
    assert "tag" not in p.types


def test_syslogprog_composite_and_custom_definitions():
    p = compile_grok(
        "%{SYSLOGTIMESTAMP:t} %{SYSLOGPROG}: %{SESSION:sess:int} "
        "%{GREEDYDATA:msg}",
        pattern_definitions={"SESSION": r"s-[0-9]+-(%{NONNEGINT})"})
    m = re.match(p.pattern,
                 "Jan  1 00:09:58 sshd[4321]: s-7-88 Accepted publickey")
    assert m is not None
    g = m.groupdict()
    assert g["program"] == "sshd" and g["pid"] == "4321"
    assert g["sess"] == "s-7-88" and g["msg"] == "Accepted publickey"


@pytest.mark.parametrize("pattern,msg", [
    ("%{NOPE:x}", "unknown pattern"),
    ("%{WORD:a} %{WORD:a}", "captured twice"),
    ("%{WORD:a.b}", "not a valid identifier"),
    ("%{WORD}", "no semantic captures"),
])
def test_malformed_patterns_raise(pattern, msg):
    with pytest.raises(ValueError, match=msg):
        compile_grok(pattern)


def test_recursive_definition_raises():
    with pytest.raises(ValueError, match="recursive"):
        compile_grok("%{A:x}",
                     pattern_definitions={"A": "%{B}", "B": "%{A}"})


def test_grok_rides_the_regex_parser_path(spark):
    lines = [
        APACHE,
        '192.168.1.1 - - [02/Feb/2024:10:00:00 +0000] '
        '"POST /submit HTTP/1.1" 404 0',
        "not an access log line at all",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)],
                               "id long, line string")
    p = compile_grok(
        r'%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} '
        r'\[%{HTTPDATE:timestamp}\] "%{WORD:verb} %{NOTSPACE:request} '
        r'HTTP/%{NUMBER:httpversion:float}" %{NUMBER:response:int} '
        r'%{NUMBER:bytes:int}', name="apache")
    out = apply_regex_parser(df, p, key="line", out="g")
    rows = {r["id"]: r for r in
            out.select("id", "g.*").orderBy("id").collect()}
    assert rows[0]["clientip"] == "10.12.0.34"
    assert rows[0]["response"] == 200 and rows[0]["bytes"] == 130
    assert rows[0]["httpversion"] == pytest.approx(1.1)
    assert rows[1]["verb"] == "POST" and rows[1]["response"] == 404
    # no-match row: struct stays null through the filter_parser contract
    null_struct = out.filter(F.col("id") == 2).select(
        F.col("g").isNull().alias("n")).collect()[0]["n"]
    assert null_struct


def test_config_format_grok_parser_block():
    conf = """\
[PARSER]
    Name   apache
    Format grok
    Grok_Pattern %{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} \\[%{HTTPDATE:timestamp}\\] "%{WORD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion:float}" %{NUMBER:response:int} %{NUMBER:bytes:int}

[PARSER]
    Name   sess
    Format grok
    Grok_Pattern %{SESSION:sess:int} %{GREEDYDATA:msg}
    Grok_Pattern_Definition SESSION s-[0-9]+
"""
    parsers = parsers_from_tree(parse_classic(conf))
    apache = parsers["apache"]
    assert apache.types == {"httpversion": "float", "response": "integer",
                            "bytes": "integer"}
    assert re.match(apache.pattern + r"$", APACHE)
    sess = parsers["sess"]
    m = re.match(sess.pattern, "s-12 hello")
    assert m and m.group("sess") == "s-12"


def test_config_format_grok_errors():
    with pytest.raises(ValueError, match="needs Grok_Pattern"):
        parsers_from_tree(parse_classic(
            "[PARSER]\n    Name x\n    Format grok\n"))
    with pytest.raises(ValueError, match="NAME REGEX"):
        parsers_from_tree(parse_classic(
            "[PARSER]\n    Name x\n    Format grok\n"
            "    Grok_Pattern %{WORD:w}\n"
            "    Grok_Pattern_Definition BROKEN\n"))


def test_ipv6_full_alternation():
    # ADVICE r4: the reduced IPV6 missed mixed-compression addresses
    # (2001:db8::1), silently null-parsing IPORHOST-anchored lines.
    p = compile_grok("%{IP:ip} ok")
    rx = re.compile(p.pattern)
    good = ["2001:db8::1", "::1", "fe80::1%eth0", "::ffff:192.0.2.1",
            "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
            "1:2:3:4:5:6:7:8", "1:2:3:4:5:6:192.0.2.1",
            "::", "1::", "::8", "10.0.0.1"]
    for addr in good:
        m = rx.fullmatch(f"{addr} ok")
        assert m and m.group("ip") == addr, addr
    # zone-id stays bounded: a literal % later in the line is NOT eaten
    m = rx.fullmatch("::1 ok")
    assert m and m.group("ip") == "::1"
