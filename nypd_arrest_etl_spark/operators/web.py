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

import os

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
    # \r\n AND bare \r (old-Mac payloads) normalize to \n first, or a
    # lone \r would ride through the \n-anchored folds below
    c = F.regexp_replace(c, "\r\n?", "\n")
    c = F.regexp_replace(c, "[ \t]+", " ")
    c = F.regexp_replace(c, "[ \t]*\n[ \t\n]*", "\n")
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
    domain_key: Column | None = None,
    out_col: str | None = "domain",
) -> DataFrame:
    """Keep at most ``cap`` rows per registrable domain — the
    domain-diversity guard every crawl-curation recipe applies so one
    mega-site cannot dominate the training mixture (FineWeb/Gopher-
    style per-domain quota).

    ``domain_key`` overrides the default last-two-labels key with any
    column expression (e.g. a ``registrable`` column produced by
    :func:`registrable_domain_psl`, so multi-label public suffixes like
    ``co.uk`` don't collapse every site into one bucket — r9 ADVICE).
    ``out_col`` names the emitted domain column; pass None to omit it.
    A pre-existing column of that name raises instead of being
    silently overwritten (withColumn replaces on collision).

    One hash shuffle on the domain key; Catalyst rewrites the
    rank filter into WindowGroupLimit, so each map task forwards at
    most ``cap`` rows per domain into the final window — the shuffle
    moves O(domains * cap) for the capped tail, not the raw stream.
    Heavy-hitter domains (the exact rows this exists to bound) arrive
    pre-truncated to ``cap`` per upstream partition.
    """
    if out_col is not None and out_col in df.columns:
        raise ValueError(
            f"cap_per_domain would overwrite existing column {out_col!r}; "
            "pass out_col=None or a different name"
        )
    dom = domain_key if domain_key is not None else registrable_domain(
        url_host(F.col(url_col))
    )
    order = order_by if order_by is not None else [F.col(url_col)]
    w = Window.partitionBy(F.col("__dom")).orderBy(*order)
    capped = (
        df.withColumn("__dom", dom)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
    if out_col is None:
        return capped.drop("__dom")
    return capped.withColumnRenamed("__dom", out_col)


def html_to_text_parsed(
    df: DataFrame,
    html_col: str,
    out_col: str = "text",
) -> DataFrame:
    """The FIDELITY path the regex extractor documents as its upgrade:
    a real HTML tokenizer (stdlib ``html.parser`` — no dependency)
    over Arrow-batched ``mapInPandas``. Handles what the codegen'd
    regex chain documented-cannot: ALL numeric character references
    (``&#233;``/``&#xE9;`` -> ``é``), every named entity (via
    ``convert_charrefs``), attribute values containing ``>``, and
    unterminated/overlapping tags, while keeping the same block-break
    and whitespace-fold semantics so the two paths agree byte-for-byte
    on well-formed markup (property-tested in tests/test_web.py).

    Scale posture: map-only like the regex path, but through the
    Python worker lane (Arrow batches, one parser instance reused per
    batch) — ~an order slower per byte than whole-stage codegen, which
    is why the regex chain stays the default: run THIS path when
    fidelity matters (evaluation corpora, legal-hold extractions), the
    regex path for the 100 TB sweep. Zero shuffle either way.
    """
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    if out_col in df.columns:
        raise ValueError(
            f"html_to_text_parsed would overwrite existing column {out_col!r}"
        )
    # StructType.add MUTATES in place — never call it on df.schema (it
    # would poison the DataFrame's cached Python-side schema); build a
    # fresh StructType instead.
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, StringType())]
    )

    def run(batches):
        import re as _re
        from html.parser import HTMLParser

        _BLOCK_END = {
            "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
            "li", "tr", "title", "table", "ul", "ol",
        }

        class _Extract(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.parts: list[str] = []
                self.skip = 0  # script/style nesting depth

            def handle_starttag(self, tag, attrs):
                if tag in ("script", "style"):
                    # one space for the WHOLE element, like the regex
                    # path's single-replacement of <script>…</script>
                    self.parts.append(" ")
                    self.skip += 1
                elif tag in ("br", "hr"):
                    self.parts.append("\n")
                else:
                    self.parts.append(" ")

            def handle_startendtag(self, tag, attrs):
                self.parts.append("\n" if tag in ("br", "hr") else " ")

            def handle_endtag(self, tag):
                if tag in ("script", "style"):
                    self.skip = max(0, self.skip - 1)
                elif tag in _BLOCK_END:
                    self.parts.append("\n")
                else:
                    self.parts.append(" ")

            def handle_data(self, data):
                if not self.skip:
                    self.parts.append(data)

            # comments/declarations/PIs render as one space, matching
            # the regex path's single-blank replacement — dropping them
            # outright would fuse "a<!-- x -->b" into "ab"
            def handle_comment(self, data):
                self.parts.append(" ")

            def handle_decl(self, decl):
                self.parts.append(" ")

            def unknown_decl(self, data):
                self.parts.append(" ")

            def handle_pi(self, data):
                self.parts.append(" ")

        def extract(html: str | None) -> str | None:
            if html is None:
                return None
            p = _Extract()
            try:
                p.feed(html)
                p.close()
            except Exception:
                pass  # keep whatever was extracted before the choke
            text = "".join(p.parts)
            # &nbsp; decodes to U+00A0; the extraction contract (and
            # the regex path) renders it as a plain space so the
            # whitespace folds below treat it like any other gap
            text = text.replace("\xa0", " ")
            text = _re.sub(r"\r\n?", "\n", text)
            text = _re.sub(r"[ \t]+", " ", text)
            text = _re.sub(r"[ \t]*\n[ \t\n]*", "\n", text)
            return text.strip().strip("\n")

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [extract(v) for v in pdf[html_col]], index=pdf.index,
                dtype=object,
            )
            yield pdf

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Crawl-quality column signals (FineWeb/Gopher-recipe shape): cheap,
# pure-expression per-document scores computed directly on the
# extractor output, completing ingest -> quota -> QUALITY -> dedup.
# ---------------------------------------------------------------------------


def quality_signals(
    df: DataFrame,
    text_col: str,
    html_col: str | None = None,
    short_line_chars: int = 30,
) -> DataFrame:
    """Append crawl-quality signal columns computed from the extracted
    text's LINE SHAPE (which is why ``html_to_text`` preserves block
    structure as newlines):

    - ``n_lines``            non-empty lines
    - ``short_line_frac``    lines shorter than ``short_line_chars``
    - ``bullet_line_frac``   lines starting '-' / '*' / '•'
    - ``ellipsis_line_frac`` lines ending '...' / '…'
    - ``terminal_punct_frac`` lines ending . ! ? " '
    - ``dup_line_frac``      1 - distinct_lines/n_lines (boilerplate
      nav/footer lines repeat; prose lines don't)
    - ``text_markup_ratio``  len(text)/len(html) (only when
      ``html_col`` is given; 0.0 for empty html) — low ratio means the
      page is mostly markup, the classic link-farm/nav-page signal.

    Fractions are NULL for empty documents (no lines: undefined, not
    zero) and rounded to 8 decimals so the DuckDB oracle hash-matches
    float-for-float. Everything is a codegen'd higher-order-function
    expression over ONE split of the text — map-only, zero shuffle,
    zero Python in the row path: quality scoring runs on every fetched
    page, so it must cost one projection, exactly like the extractor
    upstream of it.
    """
    sig_cols = [
        "n_lines", "short_line_frac", "bullet_line_frac",
        "ellipsis_line_frac", "terminal_punct_frac", "dup_line_frac",
    ] + (["text_markup_ratio"] if html_col is not None else [])
    clash = [c for c in sig_cols if c in df.columns]
    if clash:
        raise ValueError(
            f"quality_signals would overwrite existing column(s) {clash}"
        )
    text = F.col(text_col)
    lines = F.filter(F.split(text, "\n"), lambda x: x != "")
    n = F.size(lines)

    def frac(pred) -> Column:
        return F.when(
            n > 0,
            F.round(
                F.size(F.filter(lines, pred)).cast("double")
                / n.cast("double"),
                8,
            ),
        )

    out = (
        df.withColumn("n_lines", n.cast("long"))
        .withColumn(
            "short_line_frac", frac(lambda x: F.length(x) < short_line_chars)
        )
        .withColumn(
            "bullet_line_frac",
            frac(
                lambda x: x.startswith("-")
                | x.startswith("*")
                | x.startswith("•")
            ),
        )
        .withColumn(
            "ellipsis_line_frac",
            frac(lambda x: x.endswith("...") | x.endswith("…")),
        )
        .withColumn(
            "terminal_punct_frac",
            frac(lambda x: F.right(x, F.lit(1)).isin(".", "!", "?", '"', "'")),
        )
        .withColumn(
            "dup_line_frac",
            F.when(
                n > 0,
                F.round(
                    F.lit(1.0)
                    - F.size(F.array_distinct(lines)).cast("double")
                    / n.cast("double"),
                    8,
                ),
            ),
        )
    )
    if html_col is not None:
        html_len = F.length(F.col(html_col))
        out = out.withColumn(
            "text_markup_ratio",
            F.when(
                html_len > 0,
                F.round(F.length(text).cast("double") / html_len.cast("double"), 8),
            ).otherwise(F.lit(0.0)),
        )
    return out


# ---------------------------------------------------------------------------
# robots.txt admission (RFC 9309 path-pattern semantics, including the
# §2.2.3 special characters '*' and '$') — the compliance gate a crawl
# pipeline applies before any fetched document enters the corpus.
# Parse once per DISTINCT host (hosts << documents, the same scale
# property as the PSL join), match per DISTINCT (host, path).
# ---------------------------------------------------------------------------

# Hex pairs (uppercased) whose decoded octet is an RFC 3986 §2.3
# UNRESERVED character (ALPHA / DIGIT / - . _ ~): the only
# percent-escapes RFC 9309 §2.2.2 says to decode before comparison.
# Reserved and non-ASCII octets stay encoded (hex uppercased so the
# two sides compare canonically). Gating the decode on the hex pair —
# not decoding first and inspecting the char — also keeps invalid
# UTF-8 bytes (e.g. %AF) out of the decoder.
_UNRESERVED_HEX_RE = r"^(2[DE]|3[0-9]|4[1-9A-F]|5[0-9A]|5F|6[1-9A-F]|7[0-9A]|7E)$"


def pct_normalize(col: Column | str) -> Column:
    """RFC 9309 §2.2.2 percent-encoding normalization as a pure column
    expression: split on '%', decode escapes of unreserved characters,
    uppercase the hex of every other escape, and pass stray '%' (not
    followed by two hex digits) through literally. Applied to BOTH the
    rule path-pattern and the URL path so '%70ub' and 'p%75b' compare
    equal. Zero Python in the row path — split/transform/array_join
    all codegen.

    Contract: apply EXACTLY ONCE per side (which robots_allowed,
    robots_allowed_rowwise and the SQL oracle all do). On well-formed
    input the function is idempotent (property-tested); on MALFORMED
    input a stray '%' can absorb a decoded character on a second pass
    ('/%7%41' -> '/%7A', which a second pass would read as a valid
    %7A escape) — single-pass determinism, not idempotence, is the
    guarantee there, and RFC 3986 assigns malformed escapes no
    semantics to preserve anyway."""
    col = F.col(col) if isinstance(col, str) else col
    parts = F.split(col, "%")
    head = F.element_at(parts, 1)
    tail = F.slice(parts, 2, F.size(parts) - 1)

    def seg(s: Column) -> Column:
        h = F.upper(F.substring(s, 1, 2))
        rest = F.substring(s, F.lit(3), F.lit(2147483647))
        return (
            F.when(~s.rlike("^[0-9A-Fa-f]{2}"), F.concat(F.lit("%"), s))
            .when(
                h.rlike(_UNRESERVED_HEX_RE),
                F.concat(F.decode(F.unhex(h), "UTF-8"), rest),
            )
            .otherwise(F.concat(F.lit("%"), h, rest))
        )

    return F.concat(
        head, F.coalesce(F.array_join(F.transform(tail, seg), ""), F.lit(""))
    )


def robots_rule_regex(prefix: Column | str) -> Column:
    """Translate an RFC 9309 path pattern (already pct-normalized) to
    an anchored RE2/Java-safe regex implementing the §2.2.3 special
    characters: every regex metachar escaped, ``*`` -> ``.*`` (any
    character sequence), and a TRAILING ``$`` -> end-of-path anchor.
    A ``$`` anywhere else is a literal, matching Google's reference
    matcher (github.com/google/robotstxt), which the RFC cites as the
    de-facto interpretation. Decoding unreserved escapes first can
    only surface characters the escape step then handles (e.g. %2E ->
    '.' -> '\\.'), never a new '*' or '$' — those are reserved and
    stay encoded."""
    prefix = F.col(prefix) if isinstance(prefix, str) else prefix
    anchored = prefix.endswith("$")
    body = F.when(
        anchored, F.substring(prefix, F.lit(1), F.length(prefix) - 1)
    ).otherwise(prefix)
    esc = F.regexp_replace(body, r"([.^$|?+\[\]{}()\\])", r"\\$1")
    return F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )


def robots_rules(
    df: DataFrame,
    host_col: str,
    txt_col: str,
    agent: str,
) -> DataFrame:
    """Parse robots.txt bodies -> DataFrame[host, prefix, allow] with
    the rule set that applies to ``agent``.

    RFC 9309 semantics, column-expression end to end (line posexplode
    + two window functions per host — robots bodies are one per
    domain, so this shuffles O(hosts), never O(documents)):

    - a GROUP is one-or-more consecutive ``User-agent:`` lines plus
      the Allow/Disallow records that follow, until the next
      user-agent line that starts a new group;
    - groups naming the exact agent (case-insensitive) win over ``*``
      groups; ALL matching groups' rules merge (the RFC's combine
      rule); rules before any user-agent line are ignored;
    - comments (# to end of line) and empty-value rules are dropped
      (an empty ``Disallow:`` means "allow everything" — i.e. no
      rule);
    - path patterns are emitted RAW; :func:`robots_allowed` applies
      the RFC 9309 §2.2.2 percent normalization and §2.2.3 ``*``/``$``
      special-character matching (both are part of the RFC proper —
      ``*`` matches any character sequence, a trailing ``$`` anchors
      the end of the path).
    """
    # The grouped parse feeds both the record filter below and the
    # group-selection aggregate. Its one shuffle (the per-host window
    # exchange) is deduplicated across branches by runtime exchange
    # reuse; only the O(robots lines) window arithmetic re-runs per
    # branch — negligible at host grain. The r12 `.cache()` here had
    # no committed-metric win (0.83x that round) and leaked storage in
    # library sessions (no unpersist path on a lazily returned plan),
    # so r13 removed it.
    g = _robots_grouped(df, host_col, txt_col, ("allow", "disallow"))
    chosen = _robots_chosen_groups(g, agent)
    return (
        g.filter((F.col("is_ua") == 0) & (F.col("val") != ""))
        .join(chosen, ["host", "grp"])
        .select(
            "host",
            F.col("val").alias("prefix"),
            (F.col("key") == "allow").alias("allow"),
        )
    )


def _robots_grouped(
    df: DataFrame, host_col: str, txt_col: str, keys: tuple
) -> DataFrame:
    """Shared robots.txt line parse -> DataFrame[host, pos, key, val,
    is_ua, grp]: comment/CR stripping, key/value split, and the
    consecutive-User-agent-lines group numbering every record-level
    consumer (rules, crawl-delay, sitemaps) keys on. ``keys`` are the
    record names to keep besides ``user-agent``."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "line"),
    )
    clean = F.trim(
        F.regexp_replace(F.regexp_replace("line", "#.*$", ""), "\r$", "")
    )
    key = F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)\s*:", 1))
    val = F.trim(F.regexp_extract(clean, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    parsed = lines.select(
        "host", "pos", key.alias("key"), val.alias("val")
    ).filter(F.col("key").isin("user-agent", *keys))
    w = Window.partitionBy("host").orderBy("pos")
    return (
        parsed.withColumn("is_ua", (F.col("key") == "user-agent").cast("int"))
        .withColumn("prev_ua", F.lag("is_ua", 1, 0).over(w))
        .withColumn(
            "grp", F.sum(F.col("is_ua") * (1 - F.col("prev_ua"))).over(w)
        )
    )


def _robots_chosen_groups(g: DataFrame, agent: str) -> DataFrame:
    """The (host, grp) pairs whose records apply to ``agent``: groups
    naming the exact agent (case-insensitive) win over ``*`` groups;
    ALL matching groups merge (the RFC's combine rule)."""
    agents = (
        g.filter(F.col("is_ua") == 1)
        .groupBy("host", "grp")
        .agg(
            F.max((F.lower(F.col("val")) == agent.lower()).cast("int")).alias(
                "has_agent"
            ),
            F.max((F.col("val") == "*").cast("int")).alias("has_star"),
        )
    )
    any_exact = agents.groupBy("host").agg(
        F.max("has_agent").alias("any_exact")
    )
    return (
        agents.join(any_exact, "host")
        .filter(
            ((F.col("any_exact") == 1) & (F.col("has_agent") == 1))
            | ((F.col("any_exact") == 0) & (F.col("has_star") == 1))
        )
        .select("host", "grp")
    )


def robots_policy(
    df: DataFrame,
    host_col: str,
    txt_col: str,
    agent: str,
) -> DataFrame:
    """Per-host crawl POLICY beyond allow/disallow ->
    DataFrame[host, crawl_delay, sitemaps, n_sitemaps]:

    - ``crawl_delay`` (double, NULL when absent): the de-facto
      standard ``Crawl-delay:`` record most crawlers honor (NOT part
      of RFC 9309 — unlike ``*``/``$``, this one really is an
      extension), group-scoped under the same exact-agent-beats-star
      selection as :func:`robots_rules`. When several matching groups
      carry delays they merge to the MAX — the polite reading of the
      RFC's group-combine rule. Non-numeric or negative values are
      dropped (``try_cast`` semantics, same posture as the ETL's
      dirty-numeric handling).
    - ``sitemaps`` (sorted, comma-joined) + ``n_sitemaps``: the
      sitemaps.org ``Sitemap:`` records, which are group-INDEPENDENT
      by that protocol — valid anywhere in the file, including before
      any group (where allow/disallow would be ignored).

    Same scale posture as the rule parse: everything shuffles
    O(hosts), never O(documents)."""
    # same exchange-reuse posture as robots_rules (r13: r12's cache
    # removed — leak without measured win)
    g = _robots_grouped(df, host_col, txt_col, ("crawl-delay", "sitemap"))
    hosts = df.select(F.col(host_col).alias("host")).distinct()
    chosen = _robots_chosen_groups(g, agent)
    delay_val = F.col("val").try_cast("double")
    delays = (
        g.filter(F.col("key") == "crawl-delay")
        .join(chosen, ["host", "grp"])
        .withColumn("d", delay_val)
        .filter(F.col("d") >= 0)
        .groupBy("host")
        .agg(F.max("d").alias("crawl_delay"))
    )
    sitemaps = (
        g.filter((F.col("key") == "sitemap") & (F.col("val") != ""))
        .groupBy("host")
        .agg(
            F.array_join(F.array_sort(F.collect_set("val")), ",").alias(
                "sitemaps"
            ),
            F.size(F.collect_set("val")).alias("n_sitemaps"),
        )
    )
    return (
        hosts.join(delays, "host", "left")
        .join(sitemaps, "host", "left")
        .select(
            "host",
            "crawl_delay",
            F.coalesce("sitemaps", F.lit("")).alias("sitemaps"),
            F.coalesce("n_sitemaps", F.lit(0)).alias("n_sitemaps"),
        )
    )


def robots_allowed(
    df: DataFrame,
    url_col: str,
    rules: DataFrame,
    out_col: str = "allowed",
) -> DataFrame:
    """Append a boolean ``out_col``: may ``agent`` (already baked into
    ``rules`` by :func:`robots_rules`) fetch each URL?

    RFC 9309 matching: both sides are percent-normalized (§2.2.2, via
    :func:`pct_normalize`), each rule is translated to an anchored
    regex implementing the §2.2.3 special characters (``*`` -> any
    sequence, trailing ``$`` -> end anchor, everything else literal —
    so ``Disallow: /*.pdf$`` blocks exactly the PDFs), and the
    longest rule wins, measured in octets of the normalized pattern
    per the RFC's most-specific-match order; on a length tie Allow
    wins (the standard tie-break). No matching rule (or no rules for
    the host at all) defaults to allowed. Matching runs per DISTINCT
    (host, path+query) and maps back with one equi-join, so the rule
    machinery — including the per-(path, rule) regex evaluation —
    never scales with corpus rows. The selector is
    max(struct(octets, allow)) — max skips the NULL non-matches, so
    "no rule matched" falls out as NULL -> default-allow.
    """
    if out_col in df.columns:
        raise ValueError(
            f"robots_allowed would overwrite existing column {out_col!r}"
        )
    host = url_host(F.col(url_col))
    raw_path = F.regexp_extract(F.col(url_col), _PATH_QUERY_RE, 1)
    path = F.when(raw_path == "", "/").otherwise(raw_path)
    keyed = df.select(host.alias("__rh"), path.alias("__rp")).distinct()
    cand = (
        keyed.join(rules, keyed["__rh"] == rules["host"], "left")
        .withColumn("__pn", pct_normalize(F.col("__rp")))
        .withColumn("__prefn", pct_normalize(F.col("prefix")))
        .withColumn("__rx", robots_rule_regex(F.col("__prefn")))
    )
    match = F.when(
        F.col("prefix").isNotNull() & F.expr("__pn rlike __rx"),
        F.struct(
            F.octet_length("__prefn").alias("l"),
            F.col("allow").cast("int").alias("a"),
        ),
    )
    decided = (
        cand.withColumn("__m", match)
        .groupBy("__rh", "__rp")
        .agg(F.max("__m").alias("__b"))
        .select(
            "__rh",
            "__rp",
            F.coalesce(F.col("__b.a") == 1, F.lit(True)).alias("__allowed"),
        )
    )
    out = df.join(
        decided,
        (host == decided["__rh"]) & (path == decided["__rp"]),
        "left",
    ).drop("__rh", "__rp")
    return out.withColumnRenamed("__allowed", out_col)


def robots_allowed_rowwise(
    df: DataFrame,
    url_col: str,
    rules: DataFrame,
    out_col: str = "allowed",
) -> DataFrame:
    """Streaming-safe :func:`robots_allowed`: identical RFC 9309
    decision (same normalization, same ``*``/``$`` regexes, same
    longest-match-octets + Allow tie-break), restructured so a
    STREAMING DataFrame can flow through it.

    The batch variant's per-DISTINCT-(host, path) machinery needs a
    ``distinct`` and a ``groupBy`` — stateful operations Structured
    Streaming cannot run in append mode mid-pipeline. Here the rule
    set (static, O(hosts)) is pre-aggregated ONCE into one row per
    host carrying an array<struct{l, a, rx}> of compiled rules; the
    stream then takes one stream-static equi-join on host and decides
    each row with stateless higher-order functions (filter + a
    struct-ordering aggregate over the array). Tradeoff, documented:
    the regex evaluation runs per DOCUMENT row instead of per distinct
    (host, path) — the stateless form a per-event admission gate
    needs; batch re-caps should keep using :func:`robots_allowed`.
    Agreement between the two forms is asserted in tests/test_web.py.
    """
    if out_col in df.columns:
        raise ValueError(
            f"robots_allowed_rowwise would overwrite existing column "
            f"{out_col!r}"
        )
    prefn = pct_normalize(F.col("prefix"))
    per_host = (
        rules.select(
            "host",
            F.struct(
                F.octet_length(prefn).alias("l"),
                F.col("allow").cast("int").alias("a"),
                robots_rule_regex(prefn).alias("rx"),
            ).alias("r"),
        )
        .groupBy("host")
        .agg(F.collect_list("r").alias("__rules"))
        .withColumnRenamed("host", "__rh")
    )
    host = url_host(F.col(url_col))
    raw_path = F.regexp_extract(F.col(url_col), _PATH_QUERY_RE, 1)
    path = F.when(raw_path == "", "/").otherwise(raw_path)
    joined = (
        df.withColumn("__pn", pct_normalize(path))
        .withColumn("__h", host)
        .join(per_host, F.col("__h") == per_host["__rh"], "left")
    )
    # Longest match then Allow-wins, as one stateless expression:
    # filter the host's rules to the matching ones, take the
    # struct-ordering max of (octets, allow); no match -> NULL ->
    # default-allow.
    best = F.array_max(
        F.expr("filter(__rules, r -> __pn rlike r.rx)")
    )
    decided = joined.withColumn(
        out_col,
        F.when(F.col("__rules").isNull(), F.lit(True)).otherwise(
            F.coalesce(best["a"] == 1, F.lit(True))
        ),
    )
    return decided.drop("__pn", "__h", "__rh", "__rules")


# ---------------------------------------------------------------------------
# Public-suffix-list registrable domains (the production path the
# last-two-labels approximation above documents)
# ---------------------------------------------------------------------------

# Demo subset of the public suffix list (publicsuffix.org, MPL-2.0 —
# rule SYNTAX reproduced, not the 9k-row dataset): enough to exercise
# every rule kind. Production loads the real file via parse_psl_rules.
PSL_DEMO_RULES = (
    "com", "org", "net", "io", "de", "us",
    "uk", "co.uk", "org.uk", "gov.uk",
    "jp", "co.jp",
    "au", "com.au",
    "br", "com.br",
    "ck", "*.ck", "!www.ck",
)


# Bundled real public suffix list (publicsuffix.org, MPL-2.0 public
# data, as shipped by the OS `publicsuffix` package, version
# 2023-02-09): ~9.5k rules. Loaded lazily ONCE per process and used by
# default in registrable_domain_psl; the demo subset above stays for
# the committed oracle's determinism (ORACLE_WEB_PSL_DOMAINS embeds
# its parsed rules as literal VALUES).
_PSL_DATA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)
_REAL_PSL_RULES: list[tuple[str, int, int]] | None = None


def _puny_twin(body: str) -> str | None:
    """Punycode twin of an IDN rule body ('公司.cn' -> 'xn--55qx5d.cn'),
    None for pure-ASCII rules. The PSL file is published in unicode but
    crawl hosts arrive in either form; emitting both spellings of each
    IDN rule makes matching encoding-agnostic without an IDNA
    dependency (label-wise RFC 3492 punycode, which is exactly how
    compliant hosts are encoded; hosts using non-compliant mixed forms
    fall through to the implicit-'*' rule, the algorithm's documented
    unknown-suffix behavior)."""
    try:
        labels = body.split(".")
        out, changed = [], False
        for lab in labels:
            if any(ord(ch) > 127 for ch in lab):
                out.append("xn--" + lab.encode("punycode").decode("ascii"))
                changed = True
            else:
                out.append(lab)
        return ".".join(out) if changed else None
    except UnicodeError:
        return None


def load_psl_rules(path: str | None = None) -> list[tuple[str, int, int]]:
    """Parse a public-suffix-list file (default: the bundled real
    list) into the rule tuples ``registrable_domain_psl`` consumes.
    The parsed default is cached per process — the file is ~250 KB and
    every query would otherwise re-read it at plan-build time."""
    global _REAL_PSL_RULES
    if path is None:
        if _REAL_PSL_RULES is None:
            with open(_PSL_DATA_PATH, encoding="utf-8") as f:
                _REAL_PSL_RULES = parse_psl_rules(f)
        return _REAL_PSL_RULES
    with open(path, encoding="utf-8") as f:
        return parse_psl_rules(f)


def parse_psl_rules(lines) -> list[tuple[str, int, int]]:
    """Parse public-suffix-list rule lines into
    (match_key, kind, suffix_labels) tuples; kind: 0 normal,
    1 wildcard, 2 exception.

    - normal rule 'co.uk'  -> ('co.uk', 0, 2): the suffix is the rule
    - wildcard '*.ck'      -> ('ck', 1, 2): match key is the tail, the
      effective suffix is ONE label deeper than the key — the kind must
      stay explicit, because a wildcard key must NEVER match a
      candidate equal to the key itself ('*.ck' does not make bare
      'ck'-depth claims; inferring wildcardness from sfx != labels is
      exactly the bug that would)
    - exception '!www.ck'  -> ('www.ck', 2, 1): the rule's own host is
      registrable, so the suffix is the rule MINUS its leftmost label
    Comments (//) and blanks are skipped; ICANN/PRIVATE section markers
    are comments, so the real file feeds straight through. IDN rules
    additionally emit their punycode twin (see ``_puny_twin``) so both
    host spellings resolve identically.
    """
    out = []

    def emit(line: str) -> None:
        if line.startswith("!"):
            key = line[1:]
            out.append((key, 2, key.count(".")))  # n_labels(key) - 1
        elif line.startswith("*."):
            key = line[2:]
            out.append((key, 1, key.count(".") + 2))
        else:
            out.append((line, 0, line.count(".") + 1))

    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        emit(line)
        prefix = "!" if line.startswith("!") else ""
        twin = _puny_twin(line[len(prefix):])
        if twin is not None:
            emit(prefix + twin)
    return out


def registrable_domain_psl(
    df: DataFrame,
    host_col: str,
    rules: list[tuple[str, int, int]] | None = None,
    out_col: str = "registrable",
) -> DataFrame:
    """Exact PSL registrable domain via a broadcast rules join —
    correct where the last-two-labels approximation is not
    ('news.bbc.co.uk' -> 'bbc.co.uk', not 'co.uk'). ``rules=None``
    loads the BUNDLED REAL public suffix list (~9.5k rules, validated
    against the PSL project's published test vectors in
    tests/test_web.py); pass ``parse_psl_rules(...)`` output to pin a
    specific rule set (the committed oracle query does, for
    determinism).

    Rule resolution follows the PSL algorithm: among matching rules an
    EXCEPTION always prevails, else the longest suffix; no match falls
    back to the implicit '*' rule (the bare TLD is the suffix). A host
    that IS a public suffix gets NULL (nothing registrable there — a
    crawl quota must not treat 'co.uk' as one site). Hosts are
    lowercased before matching, and malformed hosts with empty labels
    (leading/trailing/consecutive dots) resolve to NULL — both per the
    official checkPublicSuffix vectors.

    Plan: DISTINCT hosts -> posexplode of the O(labels) suffix
    candidates -> ONE broadcast equi-join against the rules (wildcards
    join on the candidate's tail, a second broadcast of the same tiny
    table) -> per-host max-struct aggregation -> map back onto the
    corpus with a host equi-join. Everything per-corpus-row is the
    final join; the rule machinery runs once per DISTINCT host, which
    is what makes this viable at crawl scale (hosts << documents).
    The full real-world list is ~9k rows — a broadcast at any scale.
    """
    spark = df.sparkSession
    parsed = rules if rules is not None else load_psl_rules()
    rules_df = spark.createDataFrame(parsed, ["match_key", "kind", "suffix_labels"])

    hosts = df.select(F.lower(F.col(host_col)).alias("host")).filter(
        F.col("host").isNotNull()
        & (F.col("host") != "")
        & ~F.array_contains(F.split(F.col("host"), r"\."), "")
    ).distinct()
    labels = F.split(F.col("host"), r"\.")
    n = F.size(labels)
    # candidate suffixes: labels i..n for every i (longest first is not
    # required — the aggregate picks the winner)
    cand = hosts.select(
        "host",
        n.alias("n_labels"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.array_join(F.slice(labels, i + 1, n), "."),
            )
        ).alias("pos", "suffix"),
    )
    tail = F.regexp_replace(F.col("suffix"), r"^[^.]+\.", "")
    has_tail = F.instr(F.col("suffix"), ".") > 0
    direct = cand.join(
        F.broadcast(rules_df.filter("kind != 1")),
        F.col("suffix") == F.col("match_key"),
    ).select("host", "n_labels", (F.col("kind") == 2).cast("int").alias("is_exc"),
             "suffix_labels")
    wild = (
        cand.filter(has_tail)
        .join(
            F.broadcast(rules_df.filter("kind = 1")),
            tail == F.col("match_key"),
        )
        # a wildcard rule '*.X' (stored: key X, suffix_labels = labels(X)+1)
        # matches ONLY candidates exactly one label deeper than the key
        .filter(
            F.size(F.split(F.col("suffix"), r"\.")) == F.col("suffix_labels")
        )
        .select("host", "n_labels", F.lit(0).alias("is_exc"), "suffix_labels")
    )
    matched = direct.union(wild)
    # exception prevails, else longest suffix; implicit '*' fallback = 1
    best = (
        matched.groupBy("host", "n_labels")
        .agg(
            F.max(
                F.struct(F.col("is_exc"), F.col("suffix_labels"))
            ).alias("b")
        )
        # struct max orders by is_exc FIRST, so an exception rule
        # prevails over any longer wildcard/normal match (PSL rule 2),
        # and suffix_labels breaks ties by length (PSL rule 3).
        .select("host", "n_labels", F.col("b.suffix_labels").alias("sfx"))
    )
    mapping = (
        hosts.join(best.drop("n_labels"), "host", "left")
        .select(
            "host",
            F.coalesce(F.col("sfx"), F.lit(1)).alias("sfx"),
            F.size(F.split(F.col("host"), r"\.")).alias("n_labels"),
        )
        .select(
            "host",
            F.when(
                F.col("n_labels") > F.col("sfx"),
                F.array_join(
                    F.slice(
                        F.split(F.col("host"), r"\."),
                        F.col("n_labels") - F.col("sfx"),
                        F.col("sfx") + 1,
                    ),
                    ".",
                ),
            ).alias(out_col),
        )
    )
    # reserved join-key name: if the caller's column is itself named
    # "host", drop("host") would remove BOTH sides' columns
    mapping = mapping.withColumnRenamed("host", "__psl_host")
    return df.join(
        mapping, F.lower(df[host_col]) == mapping["__psl_host"], "left"
    ).drop("__psl_host")
