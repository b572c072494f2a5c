"""Web-corpus curation ops (operators/web.py): unicode normalization
forms, URL decomposition, base-domain heuristic, and the exactness of
the salted two-phase per-host cap against the single-window form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.web import (
    base_domain, cap_per_host, normalize_text, url_parts,
)


def test_normalize_forms(spark):
    rows = [
        (0, "Café"),          # decomposed acute → NFC composes
        (1, "ﬁle"),            # ﬁ ligature → NFKC folds to "fi"
        (2, "ＡＢＣ"),                # fullwidth → NFKC folds to ASCII
        (3, "  a \t b\n\nc  "),     # whitespace collapse
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    nfc = {r["id"]: r["text"] for r in normalize_text(
        df, "text", form="NFC").collect()}
    assert nfc[0] == "Café"
    assert nfc[1] == "ﬁle"     # NFC does NOT fold compatibility
    assert nfc[4] is None
    nfkc = {r["id"]: r["text"] for r in normalize_text(
        df, "text", form="NFKC", lower=True, collapse_ws=True).collect()}
    assert nfkc[1] == "file"
    assert nfkc[2] == "abc"
    assert nfkc[3] == "a b c"


def test_normalize_none_stays_jvm(spark):
    df = spark.createDataFrame([(0, " A  B ")], "id long, text string")
    out = normalize_text(df, "text", form="none", lower=True,
                         collapse_ws=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert out.collect()[0]["text"] == "a b"


def test_normalize_unknown_form():
    with pytest.raises(ValueError, match="unknown normalization form"):
        normalize_text(None, "text", form="NFX")


@pytest.mark.parametrize("host,expected", [
    ("a.b.co.uk", "b.co.uk"),
    ("x.example.com", "example.com"),
    ("deep.sub.x.example.com", "example.com"),
    ("h3.co.jp", "h3.co.jp"),
    ("localhost", "localhost"),
    ("co.uk", "co.uk"),             # 2 labels → the host itself
])
def test_base_domain(spark, host, expected):
    df = spark.createDataFrame([(host,)], "h string")
    got = df.select(base_domain("h").alias("d")).collect()[0]["d"]
    assert got == expected


def test_url_parts(spark):
    df = spark.createDataFrame(
        [(0, "https://h3.example.com/p/click?q=5"),
         (1, "http://a.b.co.uk/"),
         (2, "not a url")],
        "id long, url string")
    rows = {r["id"]: r for r in url_parts(df, "url").collect()}
    assert rows[0]["u_proto"] == "https"
    assert rows[0]["u_host"] == "h3.example.com"
    assert rows[0]["u_path"] == "/p/click"
    assert rows[0]["u_query"] == "q=5"
    assert rows[0]["u_domain"] == "example.com"
    assert rows[1]["u_domain"] == "b.co.uk"
    assert rows[2]["u_host"] is None


def test_cap_per_host_salted_equals_plain(spark):
    # skewed fixture: one host carries 80% of rows
    rows = [(i, "big.com" if i % 5 != 0 else f"h{i % 7}.com",
             float(i % 13), i) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, host string, "
                                     "score double, tie long")
    order = [F.desc("score"), F.col("tie")]
    plain = cap_per_host(df, "host", order, 4)
    salted = cap_per_host(df, "host", order, 4, salt_buckets=8,
                          salt_key="id")
    assert sorted(r["id"] for r in plain.collect()) == \
           sorted(r["id"] for r in salted.collect())
    per_host = salted.groupBy("host").count().collect()
    assert all(r["count"] <= 4 for r in per_host)


def test_cap_per_host_errors(spark):
    df = spark.createDataFrame([(1, "h")], "id long, host string")
    with pytest.raises(ValueError, match="must be positive"):
        cap_per_host(df, "host", [F.col("id")], 0)
    with pytest.raises(ValueError, match="needs salt_key"):
        cap_per_host(df, "host", [F.col("id")], 3, salt_buckets=4)


def test_html_to_text(spark):
    from fluent_bit_spark.operators.web import html_to_text
    html = ('<html><head><script>if (a<b) { x(); }</script>'
            '<style>p{color:red}</style></head><body><!-- hidden -->'
            '<h1>Title</h1><p>One &amp; two &lt;three&gt;</p>'
            '<div>A &amp;amp; B&nbsp;C</div><br/>tail  words'
            '</body></html>')
    df = spark.createDataFrame([(0, html)], "id long, html string")
    out = html_to_text(df, "html").collect()[0]["text_plain"]
    # script/style/comment bodies gone; block closers -> newlines;
    # entities decoded exactly one level (&amp;amp; -> &amp;)
    assert out == "Title\nOne & two <three>\nA &amp; B C\ntail words"
    plan = html_to_text(df, "html")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
