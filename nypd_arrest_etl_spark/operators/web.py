"""Web-ingest operators for crawl-scale training-data pipelines:
HTML -> text extraction, link harvesting, URL normalization, and
per-domain document capping.

Everything here is a pure column expression (regexp/replace chains the
JVM codegens — zero Python in the row path), so the operators run
map-only and scale linearly with input splits. That is the property a
CommonCrawl-style pipeline needs: boilerplate stripping runs on every
fetched page, so it must never shuffle and never leave whole-stage
codegen. Real pipelines swap in a DOM-aware extractor (trafilatura,
jusText) behind a mapInPandas seam when fidelity matters more than
throughput; the regex chain is the honest, dependency-free scale path
and is bit-for-bit replayable by any RE2/PCRE SQL engine, which is what
lets the DuckDB oracles hash-match it (patterns deliberately avoid
backreferences, which RE2 lacks).

Reference anchor: the reference ETL ingests an already-clean API feed
(scripts/extract.py) and never sees markup; these operators extend the
same ingest layer to raw web capture, the dominant 100 TB input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Block-level closers rendered as a line break so paragraph structure
# survives tag stripping (quality filters downstream key on line shape:
# see text.repetition_stats' duplicate-line fractions).
_BLOCK_BREAK = r"(?i)<(?:br|hr|/p|/div|/h[1-6]|/li|/tr|/title|/table|/ul|/ol)[^>]*>"

# Entity decode order matters: '&amp;' must decode LAST or
# '&amp;lt;' would double-decode to '<'.
_ENTITIES = (
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)

_HREF_PATTERN = r"""(?i)<a\s[^>]*href\s*=\s*["']([^"']*)["']"""

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_QUERY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def html_to_text(col: Column | str) -> Column:
    """Strip markup from an HTML column, yielding display text.

    Order of operations (each a codegen'd regexp_replace):
      1. drop <script>/<style> elements WITH their contents (two
         separate patterns — RE2 oracles cannot express the
         backreference that would fuse them);
      2. drop comments;
      3. turn block-level closers into newlines (preserves paragraph
         shape for downstream line-based quality filters);
      4. strip remaining tags to a space;
      5. decode the six dominant entities ('&amp;' last);
      6. collapse horizontal whitespace, then fold newline runs.

    Unhandled: numeric character references beyond &#39; (decoding
    &#NNN; needs chr(capture), inexpressible as a single SQL regex on
    either engine) and CDATA. Both are rare in post-2010 crawl HTML;
    a fidelity-first pipeline routes through a real parser seam.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, _BLOCK_BREAK, "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, "[ \t]+", " ")
    c = F.regexp_replace(c, "[ \t]*\r?\n[ \t\r\n]*", "\n")
    return F.regexp_replace(F.trim(c), r"^\n+|\n+$", "")


def extract_links(col: Column | str) -> Column:
    """All href targets of <a> tags, in document order (array<string>).

    Attribute-order tolerant (href need not be first) but requires a
    quoted value — the HTML5 spec allows unquoted hrefs, which this
    deliberately skips rather than risk swallowing '>' (documented
    precision/recall trade; crawl HTML is overwhelmingly quoted).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_HREF_PATTERN), 1)


def url_host(col: Column | str) -> Column:
    """Lowercased host of a URL ('' when the URL has no ://authority).

    Userinfo and port are stripped; IPv6 bracket hosts come back with
    their brackets (they contain ':' internally, so the port strip
    keys on the LAST colon only when what follows is all digits).
    """
    c = F.col(col) if isinstance(col, str) else col
    auth = F.lower(F.regexp_extract(c, _AUTHORITY_RE, 1))
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(no_user, r":[0-9]+$", "")


def normalize_url(col: Column | str) -> Column:
    """Canonical URL form so syntactic variants dedup to one key:
    scheme and host lowercased, userinfo dropped, default port
    stripped (http:80 / https:443; other ports kept), fragment
    dropped, empty path -> '/', bare trailing '?' dropped.

    Deliberately NOT done: percent-encoding normalization and query
    parameter re-ordering — both change retrieval semantics on real
    servers, so crawl dedup keys shouldn't collapse them. Non-URL
    strings (no ://) pass through unchanged, flagged by url_host=''.
    """
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    auth = F.regexp_replace(F.lower(F.regexp_extract(c, _AUTHORITY_RE, 1)), r"^[^@]*@", "")
    return F.when(scheme == "", c).otherwise(  # not a URL: pass through
        F.concat(scheme, F.lit("://"), _strip_default_port(scheme, auth), _norm_path_query(c))
    )


def _strip_default_port(scheme: Column, host_port: Column) -> Column:
    # Suffix strip via substring arithmetic: rtrim(str, ':80') would
    # strip CHARACTERS from the set {':','8','0'}, eating real digits.
    return (
        F.when((scheme == F.lit("http")) & host_port.endswith(":80"),
               F.substring(host_port, F.lit(1), F.length(host_port) - 3))
        .when((scheme == F.lit("https")) & host_port.endswith(":443"),
              F.substring(host_port, F.lit(1), F.length(host_port) - 4))
        .otherwise(host_port)
    )


def _norm_path_query(url: Column) -> Column:
    pq = F.regexp_extract(url, _PATH_QUERY_RE, 1)
    pq = F.regexp_replace(pq, r"\?$", "")
    return F.when(pq == "", F.lit("/")).otherwise(pq)


def registrable_domain(host: Column | str) -> Column:
    """Last-two-labels approximation of the PSL registrable domain
    ('news.bbc.co.uk' -> 'co.uk' — wrong for multi-label suffixes, and
    documented as such). The production path is a broadcast join
    against the ~9k-row public-suffix list, which stays a broadcast at
    any corpus size; the approximation keeps this module join-free and
    oracle-expressible.
    """
    c = F.col(host) if isinstance(host, str) else host
    two = F.regexp_extract(c, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", c).otherwise(two)


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    cap: int,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per registrable domain — the
    domain-diversity guard every crawl-curation recipe applies so one
    mega-site cannot dominate the training mixture (FineWeb/Gopher-
    style per-domain quota).

    One hash shuffle on the derived domain key; Catalyst rewrites the
    rank filter into WindowGroupLimit, so each map task forwards at
    most ``cap`` rows per domain into the final window — the shuffle
    moves O(domains * cap) for the capped tail, not the raw stream.
    Heavy-hitter domains (the exact rows this exists to bound) arrive
    pre-truncated to ``cap`` per upstream partition.
    """
    dom = registrable_domain(url_host(F.col(url_col)))
    order = order_by if order_by is not None else [F.col(url_col)]
    w = Window.partitionBy(dom).orderBy(*order)
    return (
        df.withColumn("domain", dom)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
