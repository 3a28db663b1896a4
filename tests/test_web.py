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


# ---------------------------------------------------------------------------
# Official PSL test vectors against the BUNDLED REAL list
# ---------------------------------------------------------------------------

# checkPublicSuffix(host, registrable) vectors from the PSL project's
# published test file (publicsuffix.org/list/, CC0 — reproduced as
# data). The commented-out "Listed, but non-Internet TLD" block of the
# official file is omitted, matching the official harness. Expected
# values hold for the bundled 2023-02-09 list.
PSL_OFFICIAL_VECTORS = [
    # Mixed case + leading dots (canonicalization behavior).
    (None, None),
    ("COM", None),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    (".com", None),
    (".example", None),
    (".example.com", None),
    (".example.example", None),
    # Unlisted TLD.
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # TLD with only 1 rule.
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    # TLD with some 2-level rules.
    ("com", None),
    ("example.com", "example.com"),
    ("b.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("uk.com", None),
    ("example.uk.com", "example.uk.com"),
    ("b.example.uk.com", "example.uk.com"),
    ("a.b.example.uk.com", "example.uk.com"),
    ("test.ac", "test.ac"),
    # TLD with only 1 (wildcard) rule.
    ("mm", None),
    ("c.mm", None),
    ("b.c.mm", "b.c.mm"),
    ("a.b.c.mm", "b.c.mm"),
    # More complex TLD.
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", None),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", None),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("c.kobe.jp", None),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    # TLD with a wildcard rule and exceptions.
    ("ck", None),
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # US K12.
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", None),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # IDN labels.
    ("食狮.com.cn", "食狮.com.cn"),
    ("食狮.公司.cn", "食狮.公司.cn"),
    ("www.食狮.公司.cn", "食狮.公司.cn"),
    ("shishi.公司.cn", "shishi.公司.cn"),
    ("公司.cn", None),
    ("食狮.中国", "食狮.中国"),
    ("www.食狮.中国", "食狮.中国"),
    ("shishi.中国", "shishi.中国"),
    ("中国", None),
    # Same as above, but punycoded.
    ("xn--85x722f.com.cn", "xn--85x722f.com.cn"),
    ("xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("www.xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("shishi.xn--55qx5d.cn", "shishi.xn--55qx5d.cn"),
    ("xn--55qx5d.cn", None),
    ("xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("www.xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("shishi.xn--fiqs8s", "shishi.xn--fiqs8s"),
    ("xn--fiqs8s", None),
]


def test_real_psl_loads_and_is_big():
    from nypd_arrest_etl_spark.operators.web import load_psl_rules

    rules = load_psl_rules()
    assert len(rules) > 9000  # the real list, not a demo subset
    kinds = {k for _, k, _ in rules}
    assert kinds == {0, 1, 2}  # normal + wildcard + exception all present
    # IDN rules carry their punycode twins ('中国' -> 'xn--fiqs8s')
    keys = {m for m, _, _ in rules}
    assert "中国" in keys and "xn--fiqs8s" in keys


def test_official_psl_vectors_on_real_list(spark):
    """The PSL project's published checkPublicSuffix vectors, all in
    ONE Spark job against the bundled real list (default rules)."""
    from nypd_arrest_etl_spark.operators.web import registrable_domain_psl

    rows = [(i, h) for i, (h, _want) in enumerate(PSL_OFFICIAL_VECTORS)]
    df = spark.createDataFrame(rows, ["i", "h"])
    got = {
        r.i: r.registrable
        for r in registrable_domain_psl(df, "h").collect()
    }
    bad = [
        (h, want, got[i])
        for i, (h, want) in enumerate(PSL_OFFICIAL_VECTORS)
        if got[i] != want
    ]
    assert not bad, f"{len(bad)} vector(s) diverge: {bad[:10]}"


# ---------------------------------------------------------------------------
# r10 API hardening: cap_per_domain out_col/domain_key, quality signals
# ---------------------------------------------------------------------------


def test_cap_per_domain_refuses_to_overwrite_existing_column(spark):
    import pytest as _pytest

    from nypd_arrest_etl_spark.operators import web as W

    df = spark.createDataFrame(
        [(1, "http://a.com/x", "keepme")], ["id", "url", "domain"]
    )
    with _pytest.raises(ValueError, match="domain"):
        W.cap_per_domain(df, "url", 5)
    # out_col=None keeps the caller's column untouched
    out = W.cap_per_domain(df, "url", 5, out_col=None)
    assert out.columns == ["id", "url", "domain"]
    assert out.collect()[0].domain == "keepme"


def test_cap_per_domain_accepts_psl_domain_key(spark):
    """The exact-PSL key can be plugged into the cap (r9 ADVICE):
    with the default last-two-labels key, every *.co.uk host shares
    one 'co.uk' bucket; with a PSL-derived key they do not."""
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.operators import web as W

    rows = [
        (1, "http://a.alpha.co.uk/1"),
        (2, "http://b.alpha.co.uk/2"),
        (3, "http://a.beta.co.uk/3"),
        (4, "http://b.beta.co.uk/4"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    # default approximation: all four fold into 'co.uk', cap=2 keeps 2
    approx = W.cap_per_domain(df, "url", 2, order_by=[F.asc("id")])
    assert approx.count() == 2
    # exact PSL key: alpha.co.uk and beta.co.uk are separate quotas
    with_host = df.withColumn("h", W.url_host(F.col("url")))
    keyed = W.registrable_domain_psl(with_host, "h")
    exact = W.cap_per_domain(
        keyed, "url", 2,
        order_by=[F.asc("id")],
        domain_key=F.col("registrable"),
    )
    assert exact.count() == 4
    doms = {r.domain for r in exact.collect()}
    assert doms == {"alpha.co.uk", "beta.co.uk"}


def test_quality_signals_hand_computed(spark):
    from nypd_arrest_etl_spark.operators.web import quality_signals

    text = "This is a long enough prose line, truly.\n- bullet\nnav\nnav\nTrailing thought..."
    html = "<p>" + "x" * 96 + "</p>"  # len 103
    df = spark.createDataFrame([(text, html), ("", "")], ["t", "h"])
    out = {
        (r.t != ""): r
        for r in quality_signals(df, "t", html_col="h").collect()
    }
    r = out[True]
    # 5 non-empty lines: 1 long prose, '- bullet', 'nav', 'nav', ellipsis
    assert r.n_lines == 5
    assert r.short_line_frac == 0.8          # all but the prose line < 30
    assert r.bullet_line_frac == 0.2
    assert r.ellipsis_line_frac == 0.2
    assert r.terminal_punct_frac == 0.4      # prose '.' + the '...' line
    assert r.dup_line_frac == 0.2            # one 'nav' repeat
    assert r.text_markup_ratio == round(len(text) / len(html), 8)
    empty = out[False]
    assert empty.n_lines == 0
    assert empty.short_line_frac is None and empty.dup_line_frac is None
    assert empty.text_markup_ratio == 0.0    # empty html guard


def test_quality_signals_refuses_column_collision(spark):
    import pytest as _pytest

    from nypd_arrest_etl_spark.operators.web import quality_signals

    df = spark.createDataFrame([("x", 1)], ["t", "n_lines"])
    with _pytest.raises(ValueError, match="n_lines"):
        quality_signals(df, "t")


# ---------------------------------------------------------------------------
# robots.txt parsing + admission
# ---------------------------------------------------------------------------

ROBOTS_BODY = (
    "# global group\n"
    "User-agent: *\r\n"
    "Disallow: /private/\n"
    "Allow: /private/ok\n"
    "\n"
    "User-agent: TrainBot\n"
    "User-agent: auditbot\n"
    "Disallow: /doc/9\n"
    "Allow: /doc/   # inline comment\n"
    "Disallow:\n"
    "\n"
    "User-agent: otherbot\n"
    "Disallow: /\n"
)


def _robots_frames(spark, agent):
    from nypd_arrest_etl_spark.operators.web import robots_rules

    robots = spark.createDataFrame([("ex.com", ROBOTS_BODY)], ["h", "txt"])
    return robots_rules(robots, "h", "txt", agent=agent)


def test_robots_rules_exact_agent_beats_star(spark):
    rules = {(r.prefix, r.allow) for r in _robots_frames(spark, "trainbot").collect()}
    # only the trainbot/auditbot group; empty Disallow dropped;
    # comments stripped (incl. inline + \r line endings)
    assert rules == {("/doc/9", False), ("/doc/", True)}


def test_robots_rules_falls_back_to_star_group(spark):
    rules = {(r.prefix, r.allow) for r in _robots_frames(spark, "unknownbot").collect()}
    assert rules == {("/private/", False), ("/private/ok", True)}


def test_robots_allowed_longest_prefix_and_defaults(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from nypd_arrest_etl_spark.operators.web import robots_allowed

    rules = _robots_frames(spark, "trainbot")
    urls = [
        (1, "http://ex.com/doc/42"),      # Allow /doc/ -> True
        (2, "http://ex.com/doc/99"),      # Disallow /doc/9 longer -> False
        (3, "http://ex.com/elsewhere"),   # no rule matches -> True
        (4, "http://other.com/doc/9x"),   # host without rules -> True
        (5, "http://ex.com"),             # empty path -> '/' -> True
    ]
    df = spark.createDataFrame(urls, ["id", "url"])
    got = {r.id: r.allowed for r in robots_allowed(df, "url", rules).collect()}
    assert got == {1: True, 2: False, 3: True, 4: True, 5: True}


def test_robots_allow_wins_prefix_length_tie(spark):
    from nypd_arrest_etl_spark.operators.web import robots_allowed, robots_rules

    body = "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    robots = spark.createDataFrame([("ex.com", body)], ["h", "txt"])
    rules = robots_rules(robots, "h", "txt", agent="anybot")
    df = spark.createDataFrame([(1, "http://ex.com/a/x")], ["id", "url"])
    assert robots_allowed(df, "url", rules).collect()[0].allowed is True


def test_robots_rules_before_any_group_are_ignored(spark):
    from nypd_arrest_etl_spark.operators.web import robots_rules

    body = "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n"
    robots = spark.createDataFrame([("ex.com", body)], ["h", "txt"])
    rules = {(r.prefix, r.allow)
             for r in robots_rules(robots, "h", "txt", agent="any").collect()}
    assert rules == {("/x", False)}


def _admit(spark, body, urls, agent="anybot"):
    from nypd_arrest_etl_spark.operators.web import robots_allowed, robots_rules

    robots = spark.createDataFrame([("ex.com", body)], ["h", "txt"])
    rules = robots_rules(robots, "h", "txt", agent=agent)
    df = spark.createDataFrame(list(enumerate(urls)), ["id", "url"])
    return [r.allowed for r in
            robots_allowed(df, "url", rules).orderBy("id").collect()]


def test_robots_wildcard_and_anchor_rfc9309(spark):
    # RFC 9309 §2.2.3: '*' matches any sequence, trailing '$' anchors.
    body = "User-agent: *\nDisallow: /*.pdf$\nAllow: /doc/\n"
    got = _admit(spark, body, [
        "http://ex.com/doc/file.pdf",     # /*.pdf$ (7) beats /doc/ (5)
        "http://ex.com/doc/file.pdfx",    # anchor: .pdfx does NOT match
        "http://ex.com/a/b/c/deep.pdf",   # '*' spans any depth
        "http://ex.com/doc/file.pdf.txt", # anchor again
    ])
    assert got == [False, True, False, True]


def test_robots_midpattern_wildcard_and_metachar_escape(spark):
    # '?' in the rule is a literal (regex metachar must be escaped).
    body = "User-agent: *\nDisallow: /*?session=\nAllow: /doc/\n"
    got = _admit(spark, body, [
        "http://ex.com/doc/1x?session=abc",  # mid-'*' + literal '?'
        "http://ex.com/doc/1xsession=abc",   # no '?': must NOT match
    ])
    assert got == [False, True]


def test_robots_dollar_midrule_is_literal(spark):
    # Only a TRAILING '$' anchors; elsewhere it is a literal octet.
    body = "User-agent: *\nDisallow: /x$y\n"
    got = _admit(spark, body, [
        "http://ex.com/x$y-more",  # literal '$' in path -> matches
        "http://ex.com/xy-more",   # no '$' -> no match
    ])
    assert got == [False, True]


def test_robots_percent_normalization_rfc9309(spark):
    # §2.2.2: unreserved escapes decode on BOTH sides; reserved
    # escapes stay encoded but hex-uppercased; %2F != '/'.
    body = (
        "User-agent: *\n"
        "Disallow: /doc/%70ub/\n"       # %70 = 'p' (unreserved) -> decodes
        "Disallow: /a%2fb\n"            # %2f reserved: stays, hex uppercased
    )
    got = _admit(spark, body, [
        "http://ex.com/doc/p%75b/x",   # path %75='u' decodes -> /doc/pub/ blocked
        "http://ex.com/doc/pub/x",     # plain form blocked too
        "http://ex.com/doc/p75b/x",    # not an escape -> allowed
        "http://ex.com/a%2Fb/c",       # %2F matches %2f after case-fold
        "http://ex.com/a/b/c",         # literal '/' does NOT match %2F
    ])
    assert got == [False, False, True, False, True]


def test_robots_longest_match_uses_normalized_octets(spark):
    # Allow /doc/%70ub/ normalizes to /doc/pub/ (9 octets) and must
    # beat Disallow /doc/ (5) — length measured AFTER normalization.
    body = "User-agent: *\nDisallow: /doc/\nAllow: /doc/%70ub/\n"
    got = _admit(spark, body, [
        "http://ex.com/doc/pub/x",
        "http://ex.com/doc/other",
    ])
    assert got == [True, False]


def test_robots_rowwise_agrees_with_batch(spark):
    from nypd_arrest_etl_spark.operators.web import (
        robots_allowed,
        robots_allowed_rowwise,
        robots_rules,
    )

    body = (
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
        "Disallow: /*.pdf$\nAllow: /doc/%70ub/\nDisallow: /doc/9\n"
        "Allow: /doc/\n"
    )
    robots = spark.createDataFrame([("ex.com", body)], ["h", "txt"])
    rules = robots_rules(robots, "h", "txt", agent="anybot")
    urls = [
        "http://ex.com/private/x", "http://ex.com/private/ok1",
        "http://ex.com/doc/file.pdf", "http://ex.com/doc/p%75b/z",
        "http://ex.com/doc/99", "http://ex.com/doc/5",
        "http://other.com/a", "http://ex.com",
    ]
    df = spark.createDataFrame(list(enumerate(urls)), ["id", "url"])
    batch = {r.id: r.allowed for r in robots_allowed(df, "url", rules).collect()}
    roww = {r.id: r.allowed
            for r in robots_allowed_rowwise(df, "url", rules).collect()}
    assert batch == roww
    # and the stream-safe form keeps the caller's columns intact
    assert robots_allowed_rowwise(df, "url", rules).columns == [
        "id", "url", "allowed"]


def test_robots_policy_delay_and_sitemaps(spark):
    from nypd_arrest_etl_spark.operators.web import robots_policy

    body = (
        "Sitemap: https://ex.com/top.xml\n"       # before any group: valid
        "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"
        "Sitemap: https://ex.com/a.xml\n"
        "\nUser-agent: trainbot\nCrawl-delay: 2.5\nAllow: /\n"
    )
    robots = spark.createDataFrame(
        [("ex.com", body), ("empty.com", "User-agent: *\nDisallow: /\n")],
        ["h", "txt"],
    )
    got = {r.host: r for r in
           robots_policy(robots, "h", "txt", agent="trainbot").collect()}
    ex = got["ex.com"]
    # exact group's delay wins over the star group's
    assert ex.crawl_delay == 2.5
    # sitemaps are group-independent: the pre-group one counts
    assert ex.sitemaps == "https://ex.com/a.xml,https://ex.com/top.xml"
    assert ex.n_sitemaps == 2
    none = got["empty.com"]
    assert none.crawl_delay is None
    assert (none.sitemaps, none.n_sitemaps) == ("", 0)


def test_robots_policy_merged_groups_take_max_delay(spark):
    from nypd_arrest_etl_spark.operators.web import robots_policy

    body = (
        "User-agent: trainbot\nCrawl-delay: 3\nDisallow: /a\n"
        "\nUser-agent: trainbot\nCrawl-delay: 7\nDisallow: /b\n"
    )
    robots = spark.createDataFrame([("ex.com", body)], ["h", "txt"])
    row = robots_policy(robots, "h", "txt", agent="trainbot").collect()[0]
    assert row.crawl_delay == 7.0  # polite merge: max across groups


def test_robots_policy_drops_bogus_and_negative_delays(spark):
    from nypd_arrest_etl_spark.operators.web import robots_policy

    body = "User-agent: *\nCrawl-delay: bogus\nCrawl-delay: -5\n"
    robots = spark.createDataFrame([("ex.com", body)], ["h", "txt"])
    row = robots_policy(robots, "h", "txt", agent="any").collect()[0]
    assert row.crawl_delay is None


def test_robots_allowed_refuses_column_collision(spark):
    import pytest as _pytest

    from nypd_arrest_etl_spark.operators.web import robots_allowed

    rules = _robots_frames(spark, "trainbot")
    df = spark.createDataFrame([(1, "http://ex.com/", True)],
                               ["id", "url", "allowed"])
    with _pytest.raises(ValueError, match="allowed"):
        robots_allowed(df, "url", rules)


# ---------------------------------------------------------------------------
# Parser-based fidelity extraction (html_to_text_parsed)
# ---------------------------------------------------------------------------


def test_parsed_extract_handles_numeric_charrefs_and_gt_attrs(spark):
    from nypd_arrest_etl_spark.operators.web import html_to_text_parsed

    html = ('<div data-note="a > b"><p>caf&#233; r&#xE9;sum&#xE9;</p>'
            "<p>plain</p></div>")
    df = spark.createDataFrame([(1, html)], ["id", "h"])
    out = html_to_text_parsed(df, "h").collect()[0].text
    # regex path would mangle both: charrefs stay encoded and the '>'
    # inside the attribute truncates the tag strip
    assert out == "café résumé\nplain"


def test_parsed_extract_agrees_with_regex_path_on_wellformed(spark):
    from nypd_arrest_etl_spark.operators.web import (
        html_to_text,
        html_to_text_parsed,
    )

    pages = [
        "<html><head><title>T</title><style>p{c:red}</style>"
        '<script>var x = "<p>";</script></head>'
        "<body><!-- note --><h1>Head</h1><p>body &amp; text</p>"
        "<ul><li>one</li><li>two</li></ul><br></body></html>",
        "<p>one  \t two</p>\r\n<p>three</p><hr>",
        "plain text, no markup",
        "<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;!</p>",
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)], ["id", "h"])
    both = (
        html_to_text_parsed(df, "h", out_col="parsed")
        .withColumn("regex", W.html_to_text(F.col("h")))
        .collect()
    )
    for r in both:
        assert r.parsed == r.regex, (r.id, r.parsed, r.regex)


def test_parsed_extract_refuses_collision_and_keeps_nulls(spark):
    import pytest as _pytest

    from nypd_arrest_etl_spark.operators.web import html_to_text_parsed

    df = spark.createDataFrame([(1, None)], "id int, h string")
    assert html_to_text_parsed(df, "h").collect()[0].text is None
    with _pytest.raises(ValueError, match="text"):
        html_to_text_parsed(df.withColumnRenamed("id", "text"), "h")
