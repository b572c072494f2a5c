"""Web-corpus curation: unicode normalization, URL decomposition,
per-host document capping (domain balancing).

Training-data pipelines over crawled corpora normalize text BEFORE
dedup/quality (C4, Gopher, RefinedWeb all NFC/NFKC-normalize), group
documents by host, and cap the share any single domain contributes.
These are the web-corpus analogues of the engine's log-side filters:

- ``normalize_text``   — NFC/NFKC + optional casefold + whitespace
  collapse. Unicode normalization has no Catalyst builtin, so this is
  an Arrow-batched pandas UDF (the sanctioned Python boundary) doing
  ``unicodedata.normalize`` per BATCH via pandas ``str`` ops; lower/
  whitespace-collapse stay JVM-side when normalization is off.
- ``url_parts``        — host/path/query via the JVM ``parse_url``
  builtin (zero Python), plus a documented base-domain heuristic.
- ``cap_per_host``     — keep at most ``n`` documents per host,
  best-first. EXACT two-phase form: phase 1 takes the top-n of every
  (host, salt) bucket, phase 2 the top-n of the ≤ salt_buckets·n
  survivors per host — any row in a host's global top-n is in its
  bucket's top-n, so the result is identical to the single-window
  form while the heaviest host (a 10^9-doc crawl domain at 100 TB)
  spreads over ``salt_buckets`` tasks instead of one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["normalize_text", "url_parts", "base_domain", "cap_per_host",
           "html_to_text", "canonical_url"]


def normalize_text(df: DataFrame, col: str = "text",
                   out: str | None = None, *, form: str = "NFC",
                   lower: bool = False,
                   collapse_ws: bool = False) -> DataFrame:
    """Unicode-normalize ``col`` into ``out`` (default: in place).

    ``form`` ∈ {NFC, NFKC, NFD, NFKD, none}. With ``form='none'`` the
    whole expression stays JVM-side (no Python boundary at all);
    otherwise one vectorized pandas UDF runs ``str.normalize`` over
    Arrow batches — map-only, no shuffle either way.
    """
    out = out or col
    form = form.upper() if form else "NONE"
    if form == "NONE":
        c: Column = F.col(col)
    else:
        if form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError(f"unknown normalization form {form!r}")

        @F.pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            return s.str.normalize(form)

        c = _norm(F.col(col))
    if lower:
        c = F.lower(c)
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out, c)


# second-level registries under which the registrable domain has three
# labels (host = x.co.uk → base co.uk is NOT the owner). Deliberately a
# SMALL, documented approximation of the public-suffix list — callers
# with full PSL needs pass their own set.
_SECOND_LEVEL = frozenset({
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "co.in", "co.za", "com.br",
    "com.cn", "com.mx", "com.ar", "com.tr",
})


def base_domain(host: Column | str,
                second_level: frozenset[str] = _SECOND_LEVEL) -> Column:
    """Registrable-domain approximation: last 2 labels, or last 3 when
    the last 2 form a known second-level registry (co.uk, com.au, …).
    Pure Catalyst (split + element_at + concat_ws)."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), F.element_at(parts, -2),
                        F.element_at(parts, -1))
    return (F.when(n <= 2, h)
            .when(last2.isin(*second_level), last3)
            .otherwise(last2))


def url_parts(df: DataFrame, url_col: str = "url",
              prefix: str = "u_") -> DataFrame:
    """Decompose a URL column into ``<prefix>host/path/query/proto``
    plus ``<prefix>domain`` (base-domain heuristic). All JVM builtins
    (``parse_url``) — zero Python, map-only."""
    u = F.col(url_col)
    # try_parse_url: malformed URLs yield NULL parts instead of an ANSI
    # runtime abort (the same tolerate-and-null posture as filter_parser)
    host = F.try_parse_url(u, F.lit("HOST"))
    return (df
            .withColumn(f"{prefix}proto",
                        F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*):",
                                         1))
            .withColumn(f"{prefix}host", host)
            .withColumn(f"{prefix}path", F.try_parse_url(u, F.lit("PATH")))
            .withColumn(f"{prefix}query", F.try_parse_url(u, F.lit("QUERY")))
            .withColumn(f"{prefix}domain", base_domain(host)))


def cap_per_host(df: DataFrame, host_col: str, order_cols: list[Column],
                 n: int, *, salt_buckets: int = 0,
                 salt_key: str | Column | None = None) -> DataFrame:
    """Keep the best ``n`` rows per host (domain balancing), exact.

    ``order_cols`` must be a TOTAL order (append a unique id as the
    last key) or the kept set is nondeterministic. With
    ``salt_buckets > 0``, runs the two-phase salted form: phase 1
    ranks within (host, salt) — the skewed host's rows spread over
    ``salt_buckets`` tasks — phase 2 ranks the ≤ buckets·n survivors.
    Provably identical output: a row in a host's global top-n is in
    the top-n of whichever bucket it landed in, so phase 1 never
    discards a winner.
    """
    if n <= 0:
        raise ValueError("cap_per_host: n must be positive")
    if salt_buckets:
        if salt_key is None:
            raise ValueError("cap_per_host: salt_buckets needs salt_key "
                             "(a stable per-row column to derive the "
                             "bucket from, e.g. the doc id)")
        sk = F.col(salt_key) if isinstance(salt_key, str) else salt_key
        salt = F.pmod(F.xxhash64(sk), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col(host_col), salt).orderBy(*order_cols)
        df = (df.withColumn("__rn1", F.row_number().over(w1))
                .filter(F.col("__rn1") <= n).drop("__rn1"))
    w = Window.partitionBy(host_col).orderBy(*order_cols)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= n).drop("__rn"))


# ---------------------------------------------------------------------------
# HTML → plain text
# ---------------------------------------------------------------------------

# (pattern, replacement) passes, applied in order. Same Java/RE2-agree
# subset as PII_RULES: inline (?is) flags, non-greedy .*?, single-token
# alternations only.
_HTML_STRIP_PASSES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<br\s*/?>", "\n"),
    (r"(?i)</(p|div|h1|h2|h3|h4|h5|h6|li|tr|ul|ol|table|blockquote)\s*>",
     "\n"),
    (r"<[^>]*>", " "),
)

# literal entity decodes; '&amp;' LAST so double-encoded entities decode
# exactly once ('&amp;lt;' → '&lt;', not '<').
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
)


def html_to_text(df: DataFrame, col: str = "html",
                 out: str = "text_plain") -> DataFrame:
    """Boilerplate-stripping HTML→text for web-corpus curation (the
    extraction step before language-ID/quality/dedup in C4-style
    pipelines).

    Drops <script>/<style> bodies and comments, turns <br> and closing
    block tags into newlines, strips remaining tags, decodes the common
    named entities (one level — ``&amp;`` last), and canonicalizes
    whitespace. Entire chain is Catalyst ``regexp_replace``/``replace``
    — map-only, zero Python, and every pass sits in the Java∩RE2 regex
    subset so an external scan engine reproduces it byte-for-byte
    (that is what the DuckDB oracle checks).

    Honest limits: not an HTML5 parser — no numeric entity decode, no
    attribute-aware handling of ``>`` inside quoted attributes. Those
    need a real parser (trafilatura-class) at the mapInPandas boundary.
    """
    c: Column = F.col(col)
    for pat, repl in _HTML_STRIP_PASSES:
        c = F.regexp_replace(c, pat, repl)
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    # whitespace canon: runs of blanks → one space, blank-padded
    # newline runs → one newline, strip the ends.
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    c = F.regexp_replace(c, r"^\s+", "")
    c = F.regexp_replace(c, r"\s+$", "")
    return df.withColumn(out, c)


# query params that identify a click, not a resource — the standard
# strip set every crawl canonicalizer carries (utm_* per Google's
# campaign-tagging docs; the click ids per their owners' docs).
_TRACKING_PARAM_RE = (r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid"
                      r"|ref|ref_src)=")


def canonical_url(df: DataFrame, url_col: str = "url",
                  out: str = "url_canon") -> DataFrame:
    """URL canonicalization — the key for URL-level dedup, the stage
    crawl pipelines run BEFORE content dedup (two captures of one page
    differ only in click-tracking noise).

    Rules (the conservative, lossless-intent subset):
    - scheme and host lowercased (path case is significant — kept);
    - default port stripped only when it matches the scheme
      (``http…:80``, ``https…:443``; ``https://x:80`` is preserved);
    - fragment dropped;
    - tracking params (``utm_*``, click ids, ``ref``) removed, the
      remaining params sorted for order-independence;
    - empty path → ``/``, otherwise one trailing slash stripped.

    Non-URLs (no ``scheme://``) yield NULL — the tolerate-and-null
    posture of ``url_parts``/``try_parse_url``. Entire expression is
    Catalyst (regexp in the Java∩RE2 subset + array filter/sort) —
    map-only, zero Python, zero shuffle at any scale.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(
        u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    host = (F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(auth, r":443$", ""))
            .otherwise(auth))
    path = F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")) \
            .when(path != "/", F.regexp_replace(path, r"/$", "")) \
            .otherwise(path)
    params = F.filter(
        F.split(F.regexp_extract(u, r"\?([^#]*)", 1), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE))
    q = F.concat_ws("&", F.array_sort(params))
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    return df.withColumn(out,
                         F.when(scheme == "", F.lit(None)).otherwise(canon))
