"""Hypothesis properties for the web-ingest operators: URL
normalization must be IDEMPOTENT (a second pass changes nothing — the
property that makes it a safe dedup key), host-preserving, and the
HTML text extractor must emit disciplined whitespace. Fuzzed over
URL-shaped composites AND arbitrary unicode (non-URLs must pass
through untouched)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.web import (

    html_to_text,
    normalize_url,
    url_host,
)

# Long-running suite (streaming drains / live servers / storage-format
# e2e / property fuzz / soak): excluded from the default gate run by
# pytest.ini's `-m "not slow"`; run with -m "" or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow


SETTINGS = dict(max_examples=15, deadline=None)

_label = st.text(alphabet="abcdefXYZ09-", min_size=1, max_size=5)
_urlish = st.builds(
    lambda scheme, user, labels, port, path, query, frag: (
        scheme
        + "://"
        + (user + "@" if user else "")
        + ".".join(labels)
        + (f":{port}" if port else "")
        + path
        + query
        + frag
    ),
    scheme=st.sampled_from(["http", "HTTPS", "ftp", "HtTp", "ws+x"]),
    user=st.sampled_from(["", "u", "User:pw"]),
    labels=st.lists(_label, min_size=1, max_size=4),
    port=st.sampled_from(["", "80", "443", "8080"]),
    path=st.sampled_from(["", "/", "/A/b", "/x%20y"]),
    query=st.sampled_from(["", "?", "?a=1&B=2"]),
    frag=st.sampled_from(["", "#f", "#A/b?c"]),
)
_any_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=12
)
_inputs = st.lists(st.one_of(_urlish, _any_text), min_size=1, max_size=8)


def _eval2(spark, values, expr_a, expr_b):
    df = spark.createDataFrame([(v,) for v in values], "c string")
    rows = df.select(expr_a.alias("a"), expr_b.alias("b")).collect()
    return [(r.a, r.b) for r in rows]


@settings(**SETTINGS)
@given(_inputs)
def test_normalize_url_is_idempotent(spark, values):
    once = normalize_url(F.col("c"))
    twice = normalize_url(normalize_url(F.col("c")))
    for v, (a, b) in zip(values, _eval2(spark, values, once, twice)):
        assert a == b, (v, a, b)


@settings(**SETTINGS)
@given(_inputs)
def test_normalize_url_preserves_host(spark, values):
    h_raw = url_host(F.col("c"))
    h_norm = url_host(normalize_url(F.col("c")))
    for v, (a, b) in zip(values, _eval2(spark, values, h_raw, h_norm)):
        assert a == b, (v, a, b)


@settings(**SETTINGS)
@given(_inputs)
def test_normalize_url_leaves_non_urls_untouched(spark, values):
    non_urls = [v for v in values if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", v)]
    if not non_urls:
        return
    out = _eval2(spark, non_urls, normalize_url(F.col("c")), F.col("c"))
    for v, (a, b) in zip(non_urls, out):
        assert a == b == v, (v, a, b)


@settings(**SETTINGS)
@given(st.lists(_any_text, min_size=1, max_size=8))
def test_html_to_text_whitespace_discipline(spark, values):
    """No carriage returns, no space/tab runs, no blank lines, no
    leading/trailing newline survive extraction — whatever the input
    (downstream line-based quality stats key on this shape)."""
    out = _eval2(spark, values, html_to_text(F.col("c")), F.col("c"))
    for txt, _src in out:
        assert "\r" not in txt
        assert "  " not in txt and "\t" not in txt
        assert "\n\n" not in txt
        assert txt == txt.strip("\n")
        assert not txt.startswith(" ") and not txt.endswith(" ")


# ---------------------------------------------------------------------------
# RFC 9309 percent normalization + rule-regex translation (round 11)
# ---------------------------------------------------------------------------

# path-shaped fuzz: slashes, unreserved + reserved chars, %-escapes
# (well-formed, uppercase, lowercase, and STRAY ones), wildcards
_pathish = st.lists(
    st.one_of(
        st.text(alphabet="abcZ09./_~-*$?=&", min_size=1, max_size=4),
        st.sampled_from(
            ["%2F", "%2f", "%41", "%61", "%7e", "%aF", "%", "%z", "%7"]
        ),
    ),
    min_size=1,
    max_size=6,
).map(lambda parts: "/" + "".join(parts))


def _pct_norm_py(s):
    """Driver-side twin of pct_normalize for property checks."""
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "%" and re.match(r"[0-9A-Fa-f]{2}", s[i + 1: i + 3] or ""):
            h = s[i + 1: i + 3].upper()
            ch = chr(int(h, 16))
            if re.match(r"[A-Za-z0-9._~-]", ch):
                out.append(ch)
            else:
                out.append("%" + h)
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


@settings(**SETTINGS)
@given(st.lists(_pathish, min_size=1, max_size=6))
def test_pct_normalize_matches_sequential_twin(spark, values):
    """ALL inputs, malformed escapes included: the column expression
    equals a sequential reference implementation character-for-
    character — the single-pass determinism both admission paths and
    the SQL oracle rely on."""
    from nypd_arrest_etl_spark.operators.web import pct_normalize

    df = spark.createDataFrame([(v,) for v in values], ["p"])
    got = df.select("p", pct_normalize(F.col("p")).alias("n")).collect()
    for r in got:
        assert r.n == _pct_norm_py(r.p), (r.p, r.n)


@settings(**SETTINGS)
@given(st.lists(_pathish.filter(
    lambda p: not re.search(r"%(?![0-9A-Fa-f]{2})", p)
), min_size=1, max_size=6))
def test_pct_normalize_idempotent_on_wellformed(spark, values):
    """WELL-FORMED inputs (every '%' starts a two-hex escape):
    normalization is idempotent. Malformed input is deliberately out
    of scope — a stray '%' can absorb a decoded char on a second pass
    ('/%7%41' -> '/%7A' -> '/z', found BY this property test in r11)
    — so pct_normalize's contract is apply-exactly-once, documented
    in its docstring."""
    from nypd_arrest_etl_spark.operators.web import pct_normalize

    df = spark.createDataFrame([(v,) for v in values], ["p"])
    got = (
        df.select("p", pct_normalize(F.col("p")).alias("n"))
        .select("p", "n", pct_normalize(F.col("n")).alias("nn"))
        .collect()
    )
    for r in got:
        assert r.nn == r.n, (r.p, r.n, r.nn)


@settings(**SETTINGS)
@given(st.lists(_pathish, min_size=1, max_size=4))
def test_robots_batch_and_rowwise_agree_under_fuzz(spark, paths):
    """The streaming-safe rowwise admission and the batch
    distinct-machinery admission are the SAME RFC decision — fuzzed
    over wildcard/anchor/escape-bearing rules and paths."""
    from nypd_arrest_etl_spark.operators.web import (
        robots_allowed,
        robots_allowed_rowwise,
        robots_rules,
    )

    body = (
        "User-agent: *\n"
        + "".join(
            f"{'Allow' if i % 2 else 'Disallow'}: {p}\n"
            for i, p in enumerate(paths)
        )
        + "Disallow: /*.pdf$\n"
    )
    robots = spark.createDataFrame([("ex.com", body)], ["h", "txt"])
    rules = robots_rules(robots, "h", "txt", agent="any")
    urls = [(i, "http://ex.com" + p) for i, p in enumerate(paths)] + [
        (len(paths), "http://ex.com/x.pdf"),
        (len(paths) + 1, "http://ex.com/other"),
    ]
    df = spark.createDataFrame(urls, ["id", "url"])
    a = {r.id: r.allowed for r in robots_allowed(df, "url", rules).collect()}
    b = {r.id: r.allowed
         for r in robots_allowed_rowwise(df, "url", rules).collect()}
    assert a == b
