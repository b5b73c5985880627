"""Web/URL operators — the front half of a web-crawl training-data
pipeline (CommonCrawl-style), end to end: URL canonicalization and
registered-domain extraction, domain rollups, leakage-safe
domain-hash splits, crawl-frontier incremental dedup, robots.txt
Disallow filtering, and HTML visible-text extraction.

Canonicalization collapses trivially-distinct spellings of the same
page (scheme case, ``www.``, userinfo, default ports, tracking
parameters, parameter order, fragments, trailing slash) to one key;
everything downstream (dedup, splits, politeness) keys on that.

Scale posture: every per-page function is a pure Catalyst ``Column``
expression (regexp + array ops, whole-stage codegen) — zero-shuffle
narrow maps at any corpus size; the rollup is one hash aggregation on
the domain key, the frontier dedup an anti-join that shuffles only
URL strings, and the robots filter a broadcast anti-join.

The reference repo has no web stage (it ingests curated taxi CSVs,
etl_raw_to_conformed.py:1); this is part of the declared Tier-E
LLM-pipeline surface (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that identify a *click*, not a *page* — dropped
# during normalization.  Prefix match for the utm_ family, exact match
# for the rest.
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "ref")

# Minimal embedded public-suffix excerpt: second-level suffixes under
# which the registered domain is three labels, not two.  A real
# deployment would broadcast the full Mozilla PSL (a ~10k-row dim
# table, trivially broadcastable); the *algorithm* — longest-matching
# suffix, then one more label — is what this implements.
MULTI_LABEL_SUFFIXES = (
    "co.uk",
    "org.uk",
    "gov.uk",
    "ac.uk",
    "co.jp",
    "ne.jp",
    "com.au",
    "net.au",
    "com.br",
    "co.in",
    "co.kr",
    "com.mx",
    "co.nz",
    "com.sg",
    "com.cn",
)


def _auth(url: Column) -> Column:
    """authority (host[:port]) of a ``scheme://`` URL, userinfo
    stripped (``user:pass@host`` would otherwise corrupt the host
    parse — dropping it is also the canonical-URL choice: credentials
    never identify a *page*).  Bracketed IPv6 hosts are out of scope
    (vanishingly rare in crawl data; ``registered_domain`` is
    meaningless for them anyway)."""
    a = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    return F.regexp_replace(a, r"^[^@]*@", "")


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme (``https``), '' if the URL has none."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column) -> Column:
    """Lower-cased host with any leading ``www.`` stripped."""
    host = F.lower(F.regexp_extract(_auth(url), r"^([^:]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def url_port(url: Column) -> Column:
    """Explicit port as a string ('' when absent)."""
    return F.regexp_extract(_auth(url), r":(\d+)$", 1)


def url_path(url: Column) -> Column:
    """Path component, one trailing slash stripped — INCLUDING the
    root: ``https://a.com`` and ``https://a.com/`` both canonicalize
    to an empty path, so the two spellings of a site root share one
    frontier-dedup key (ADVICE r6: the old non-root-only strip kept
    '' and '/' distinct)."""
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.regexp_replace(p, r"/$", "")


def url_query_normalized(url: Column) -> Column:
    """Query string with tracking params dropped and the remaining
    ``k=v`` pairs sorted; '' when nothing survives."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    parts = F.when(q == "", F.array().cast("array<string>")).otherwise(
        F.split(q, "&")
    )
    kept = F.filter(
        parts,
        lambda p: ~(
            _any_prefix(p, TRACKING_PREFIXES)
            | F.split(p, "=").getItem(0).isin(*TRACKING_EXACT)
        ),
    )
    return F.array_join(F.array_sort(kept), "&")


def _any_prefix(col: Column, prefixes: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for pre in prefixes:
        out = out | col.startswith(pre)
    return out


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url``.

    Steps (each SQL-expressible, mirrored verbatim by the DuckDB
    oracle): lower-case scheme and host; strip leading ``www.``; drop
    the port when it is the scheme default (443/https, 80/http), keep
    any other; strip a trailing slash from a non-root path; drop
    tracking query params (utm_* prefix + fbclid/gclid/msclkid/ref),
    sort the survivors; drop the fragment.  Idempotent (property-
    tested in tests/test_web.py).
    """
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("https")) & (port == "443"))
        & ~((scheme == F.lit("http")) & (port == "80"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path = url_path(url)
    q = url_query_normalized(url)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a host: the public suffix plus
    one label.  Two labels normally; three when the trailing two
    labels are a known second-level suffix (``example.co.uk``)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return F.when(n <= 2, host).otherwise(
        F.when(last2.isin(*MULTI_LABEL_SUFFIXES), last3).otherwise(last2)
    )


def url_normalize(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Append ``out_col`` (canonical URL) and ``domain`` (registered
    domain) columns.  Pure narrow map — zero shuffle."""
    u = F.col(url_col)
    return df.withColumn(out_col, normalize_url(u)).withColumn(
        "domain", registered_domain(url_host(u))
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Domain-level rollup after URL canonicalization: pages seen,
    distinct canonical URLs (the URL-dedup survivor count), and the
    canonical min id per domain.  One hash aggregation on the domain
    key; partial aggregation map-side."""
    d = url_normalize(df, url_col)
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("url_norm").alias("n_unique_urls"),
        F.min(id_col).alias("first_id"),
    )


def domain_split(
    df: DataFrame,
    url_col: str = "url",
    val_sixteenths: int = 1,
    test_sixteenths: int = 1,
) -> DataFrame:
    """Leakage-safe train/val/test split: route every page by the
    first hex digit of ``md5(registered_domain)`` so ALL pages of a
    domain land in the same split — the property that prevents
    near-duplicate pages of one site straddling the train/eval
    boundary (the classic benchmark-contamination vector that a
    row-level split cannot prevent).

    Same deterministic md5-bucket device as
    ``sampling.train_val_test_split`` (engine-portable, stable under
    corpus growth: adding pages never moves an existing domain);
    grouping is free — the hash of the domain IS the group key, so
    the split stays a zero-shuffle narrow map even though it is
    group-consistent.  Appends ``domain`` and ``split`` columns.
    """
    if val_sixteenths + test_sixteenths >= 16:
        raise ValueError("val+test must leave room for train")
    dom = registered_domain(url_host(F.col(url_col)))
    bucket = F.substring(F.md5(dom), 1, 1)
    hex_digits = "0123456789abcdef"
    test_d = list(hex_digits[:test_sixteenths])
    val_d = list(hex_digits[test_sixteenths : test_sixteenths + val_sixteenths])
    split = (
        F.when(bucket.isin(test_d), "test")
        .when(bucket.isin(val_d), "val")
        .otherwise("train")
    )
    return df.withColumn("domain", dom).withColumn("split", split)


# Entities decoded during HTML text extraction; ``&amp;`` MUST be
# last or '&amp;lt;' would double-decode to '<'.
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

# Tag boundaries that end a text block — replaced by a space so words
# from adjacent blocks don't concatenate when tags are stripped.
_BLOCK_BREAK = r"(?i)<br\s*/?>|</(?:p|div|h[1-6]|li|tr|td|table|ul|ol|section|article)\s*>"


def html_text(html: Column) -> Column:
    """Visible text of an HTML document as a Column expression.

    The standard crawl extraction pipeline, every step a codegen
    ``regexp_replace`` (no parser, no Python): drop ``<script>`` /
    ``<style>`` elements INCLUDING their content (dotall non-greedy —
    a ``1 < 2`` inside JS must not survive as text); break block
    boundaries with a space; strip all remaining tags; decode the
    six core entities (``&amp;`` last); collapse whitespace.

    Deliberately regex-only: RE2-compatible (no backreferences — the
    script/style patterns are written out separately), so the DuckDB
    oracle replays the identical algorithm.  A full HTML5 tree parser
    is out of scope for the hot path — this is the same trade
    CCNet/trafilatura's fallback paths make.
    """
    c = html
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, _BLOCK_BREAK, " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", "")
    for ent, ch in HTML_ENTITIES:
        c = F.regexp_replace(c, ent, ch)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def html_extract(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Append ``out_col`` = visible text of ``html_col``.  Pure
    narrow map — zero shuffle at any corpus size."""
    return df.withColumn(out_col, html_text(F.col(html_col)))


def url_frontier_dedup(
    batch: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-frontier dedup: drop batch pages whose CANONICAL URL was
    already crawled, collapse canonical duplicates within the batch.

    The URL twin of ``dedup.incremental_fingerprint_dedup`` (same
    first-seen-wins contract): ``seen`` is the persisted frontier —
    in a real deployment a single-column parquet of canonical URLs
    appended per crawl — and only canonical-URL strings shuffle, never
    page payloads.  Within the batch, the min-id page represents each
    canonical URL (deterministic), with ``n_batch_copies`` counting
    the collapsed spellings.  Repeated runs compose: frontier +
    survivors after run N equals the full recompute over all crawls.

    Cost per run is O(|batch| + |frontier|) anti-join on one string
    key; the frontier column is broadcast-able while small and an
    ordinary shuffled anti-join at scale (AQE decides).
    """
    b = url_normalize(batch, url_col)
    s = (
        url_normalize(seen.select(url_col), url_col)
        .select("url_norm")
        .distinct()
    )
    fresh = b.join(s, "url_norm", "left_anti")
    return fresh.groupBy("url_norm").agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_batch_copies"),
        F.min("domain").alias("domain"),
    )


def robots_disallow_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    prefix_col: str = "disallow_prefix",
) -> DataFrame:
    """Crawl-politeness filter: drop pages whose canonical path starts
    with a Disallow prefix for their registered domain (the effective
    semantics of a ``User-agent: *`` robots.txt rule set, longest-match
    subtleties deliberately out of scope — prefix match is what the
    original robots.txt spec defines).

    ``rules`` is ``(domain, disallow_prefix)`` — the parsed robots
    corpus, inherently tiny relative to pages (one row per rule, not
    per page), so Catalyst broadcasts it and the filter is a
    broadcast LEFT ANTI join with the prefix test inside the join
    condition: zero shuffle of the page side, no per-rule pass.
    Appends nothing: returns surviving pages with ``url_norm`` and
    ``domain`` attached (the canonicalization is shared work).

    Slash-terminated rules match SEGMENT-WISE (ADVICE r7): page
    paths are canonical (trailing slash stripped), so for a rule
    ``Disallow: /dir/`` a page is blocked iff its canonical path
    equals ``/dir`` (the directory page itself — deliberate
    over-block: the sibling FILE ``/dir`` is indistinguishable after
    canonicalization) or starts with ``/dir/`` (a descendant).
    Unrelated siblings like ``/dirty`` are NOT blocked (the r6
    strip-then-prefix form over-blocked them).  Rules WITHOUT a
    trailing slash keep the original-spec plain prefix match
    (``/p/1`` blocks ``/p/10``).  ``Disallow: /`` blocks the whole
    domain: the root's canonical path is '' and every other
    canonical path starts with '/'.
    """
    p = url_normalize(pages, url_col)
    path = url_path(F.col("url_norm"))
    raw = rules[prefix_col]
    stripped = F.regexp_replace(raw, r"/$", "")
    blocked = F.when(
        raw.endswith("/"), (path == stripped) | path.startswith(raw)
    ).otherwise(path.startswith(raw))
    cond = (p[domain_col] == rules[domain_col]) & blocked
    return p.join(F.broadcast(rules), cond, "left_anti")
