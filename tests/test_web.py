"""Web-ingest operators: HTML -> text, link harvest, URL normalize,
per-domain cap. The oracle queries (web_html_extract / web_domain_cap)
prove engine parity; these tests pin the edge semantics the synthetic
corpus can't reach."""

import pytest
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators import web as W


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0].v


def test_html_to_text_strips_script_style_comments_tags(spark):
    html = ('<html><head><title>T</title><style>p{c:red}</style>'
            '<script>if (1<2) { x="<p>"; }</script></head>'
            '<body><!-- hidden --><h1>Head</h1><p>body text</p></body></html>')
    out = _one(spark, W.html_to_text(F.lit(html)))
    assert out == "T\nHead\nbody text"


def test_html_to_text_decodes_entities_in_order(spark):
    # '&amp;lt;' must come out as the LITERAL '&lt;' -> decoded once to '<'?
    # No: &amp; decodes last, so the text reads '&lt;' (entity-encoded
    # markup stays text, never re-parsed as a tag).
    out = _one(spark, W.html_to_text(F.lit("a &amp;lt; b &lt;i&gt; &quot;q&quot; &#39;s&#39;&nbsp;!")))
    assert out == 'a &lt; b <i> "q" \'s\' !'


def test_html_to_text_folds_whitespace_and_breaks(spark):
    out = _one(spark, W.html_to_text(F.lit("<p>one  \t two</p>\n\n<p>three</p><br><br>")))
    assert out == "one two\nthree"


def test_extract_links_orders_and_requires_quotes(spark):
    html = ('<a class="x" href="https://a.com/1">1</a>'
            "<a href='https://b.com/2'>2</a>"
            "<a href=https://unquoted.com>skip</a>")
    out = _one(spark, W.extract_links(F.lit(html)))
    assert out == ["https://a.com/1", "https://b.com/2"]


@pytest.mark.parametrize(
    ("url", "norm"),
    [
        ("HTTPS://User@Ex.COM:443/Path/x?q=1#frag", "https://ex.com/Path/x?q=1"),
        ("http://a.b.co:80", "http://a.b.co/"),
        ("http://a.b.co:8080/x?", "http://a.b.co:8080/x"),
        ("https://h.io:443", "https://h.io/"),
        ("http://h.io:443/k", "http://h.io:443/k"),  # 443 is not http's default
        ("not a url", "not a url"),
        ("ftp://Host.Net:21/file", "ftp://host.net:21/file"),
    ],
)
def test_normalize_url_cases(spark, url, norm):
    assert _one(spark, W.normalize_url(F.lit(url))) == norm


def test_url_host_strips_userinfo_and_port_keeps_ipv6_brackets(spark):
    assert _one(spark, W.url_host(F.lit("https://u:p@A.B.c:8443/x"))) == "a.b.c"
    assert _one(spark, W.url_host(F.lit("http://[::1]:8080/x"))) == "[::1]"
    assert _one(spark, W.url_host(F.lit("no scheme"))) == ""


def test_registrable_domain_last_two_labels(spark):
    assert _one(spark, W.registrable_domain(F.lit("news.bbc.co.uk"))) == "co.uk"
    assert _one(spark, W.registrable_domain(F.lit("example.org"))) == "example.org"
    assert _one(spark, W.registrable_domain(F.lit("localhost"))) == "localhost"


def test_cap_per_domain_binds_per_domain_and_keeps_order(spark):
    rows = [(i, f"https://{'big' if i < 30 else 'small'}.example.com/{i}", 100 - i)
            for i in range(36)]
    # one registrable domain (example.com) across two hosts: the cap
    # applies to the DOMAIN, folding both hosts into one quota.
    df = spark.createDataFrame(rows, ["id", "url", "score"])
    out = W.cap_per_domain(df, "url", 5, order_by=[F.desc("score"), F.asc("id")])
    got = sorted(r.id for r in out.collect())
    assert got == [0, 1, 2, 3, 4]
    assert {r.domain for r in out.collect()} == {"example.com"}


def test_cap_per_domain_plan_uses_window_group_limit(spark):
    df = spark.createDataFrame([(1, "https://a.com/x", 1)], ["id", "url", "score"])
    plan = W.cap_per_domain(df, "url", 3, order_by=[F.asc("id")])._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_parse_psl_rules_standard_format():
    from nypd_arrest_etl_spark.operators.web import parse_psl_rules

    lines = [
        "// ===BEGIN ICANN DOMAINS===",
        "",
        "com",
        "co.uk",
        "*.ck",
        "!www.ck",
        "  jp  ",
        "// ===END ICANN DOMAINS===",
    ]
    assert parse_psl_rules(lines) == [
        ("com", 0, 1),
        ("co.uk", 0, 2),
        ("ck", 1, 2),        # wildcard: one label deeper than the key
        ("www.ck", 2, 1),    # exception: the rule's own host registers
        ("jp", 0, 1),
    ]


def test_registrable_domain_psl_rule_kinds(spark):
    from nypd_arrest_etl_spark.operators.web import registrable_domain_psl

    cases = {
        "news.bbc.co.uk": "bbc.co.uk",   # multi-label suffix (approx gets co.uk)
        "example.com": "example.com",
        "a.b.example.com": "example.com",
        "foo.bar.ck": "foo.bar.ck",      # *.ck: bar.ck is the suffix
        "www.ck": "www.ck",              # !www.ck exception beats the wildcard
        "co.uk": None,                   # host IS a public suffix
        "com": None,
        "x.y.zz": "y.zz",                # no rule -> implicit '*' (TLD)
        "deep.gov.uk": "deep.gov.uk",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["h"])
    out = {r.h: r.registrable for r in registrable_domain_psl(df, "h").collect()}
    assert out == cases


def test_registrable_domain_psl_wildcard_never_matches_its_own_base(spark):
    """Regression: a wildcard rule '*.X' must not claim bare X — the
    host equal to a wildcard's base falls through to other rules (here
    the implicit '*'), while one-label-deeper hosts ARE the suffix."""
    from nypd_arrest_etl_spark.operators.web import (
        parse_psl_rules,
        registrable_domain_psl,
    )

    rules = parse_psl_rules(["*.compute.example"])
    cases = {
        "compute.example": "compute.example",      # implicit '*' applies
        "a.compute.example": None,                 # IS a public suffix
        "b.a.compute.example": "b.a.compute.example",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["h"])
    out = {
        r.h: r.registrable
        for r in registrable_domain_psl(df, "h", rules=rules).collect()
    }
    assert out == cases


def test_registrable_domain_psl_preserves_row_multiplicity(spark):
    from nypd_arrest_etl_spark.operators.web import registrable_domain_psl

    df = spark.createDataFrame(
        [(1, "a.example.com"), (2, "a.example.com"), (3, "b.co.uk")],
        ["id", "h"],
    )
    out = registrable_domain_psl(df, "h")
    assert out.count() == 3
    got = {(r.id, r.registrable) for r in out.collect()}
    assert got == {(1, "example.com"), (2, "example.com"), (3, "b.co.uk")}
