"""URL canonicalization and host-level gating — the FineWeb /
CommonCrawl curation moves: web-scale corpora key deduplication,
provenance, and quality gates on the CANONICAL url and its host, so
`HTTPS://WWW.Site.com:443/a/?utm_source=x#top` and
`https://site.com/a` count as one page and one host.

Everything here is pure column expressions (regexp parse + array ops
over the query string) — no UDFs, fully pushdown-friendly, and exactly
reproducible in ANSI-ish SQL, so the canonicalizer itself can sit
under the DuckDB differential gate.

Canonical form (the standard normalization set):
- fragment stripped;
- scheme and host lowercased; leading ``www.`` dropped;
- default port dropped (``:443`` for https, ``:80`` for http); other
  ports kept;
- tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``);
  surviving parameters SORTED (order-insensitive equivalence) and
  re-joined; empty query dropped;
- trailing slashes stripped from the path (root collapses to none).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (=|$) so a VALUELESS tracking param (bare `fbclid`, `utm_x`) is
# dropped too, not just the `key=value` form (r8 ADVICE).
_TRACKING_RE = "^(utm_[^=]*|fbclid|gclid)(=|$)"


def url_parts(url: Column) -> Column:
    """Struct(scheme, host, port, path, query) parsed from a URL column
    (fragment discarded). Hosts are lowercased here; everything else
    is preserved verbatim for the canonicalizer to normalize."""
    u = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path.alias("path"),
        query.alias("query"),
    )


def canonical_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped — the
    host-gating key."""
    return F.regexp_replace(url_parts(url)["host"], r"^www\.", "")


def canonicalize_url(url: Column) -> Column:
    """The canonical URL string (see module docstring for the rule
    set). Pure expressions: one regexp parse + one split/filter/sort
    pass over the query params."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    default_port = F.when(p["scheme"] == "https", "443").otherwise(
        F.when(p["scheme"] == "http", "80").otherwise("")
    )
    port = F.when(
        (p["port"] == "") | (p["port"] == default_port), ""
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.regexp_replace(p["path"], "/+$", "")
    kept = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda kv: (kv != "") & ~kv.rlike(_TRACKING_RE),
        )
    )
    query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(p["scheme"], F.lit("://"), host, port, path, query)


def synth_dirty_urls(docs: DataFrame) -> DataFrame:
    """Deterministic dirty-URL fixture derived from ``documents`` —
    the same construction any engine can compute from (doc_id, source),
    mirroring the repo's dirty-name fixtures: mixed-case hosts, www.
    prefixes, default and non-default ports, tracking params, unsorted
    param order, fragments, trailing slashes. Returns (doc_id, url)."""
    d = F.col("doc_id")
    base_host = F.concat(F.col("source"), F.lit(".example.com"))
    host = F.when(d % 3 == 0, F.concat(F.lit("www."), base_host)).otherwise(
        base_host
    )
    host = F.when(d % 2 == 0, F.upper(host)).otherwise(host)
    port = F.when(d % 5 == 0, F.lit(":443")).otherwise(
        F.when(d % 7 == 0, F.lit(":8080")).otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/docs/"),
        (d % 50).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.when(
        d % 2 == 0,
        F.concat(F.lit("?utm_source=feed&id="), (d % 10).cast("string")),
    ).otherwise(
        F.when(
            d % 3 == 1,
            F.concat(
                F.lit("?id="),
                (d % 10).cast("string"),
                F.lit("&utm_campaign=x&b=2"),
            ),
        ).otherwise(F.lit(""))
    )
    frag = F.when(d % 6 == 0, F.lit("#sec")).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), host, port, path, query, frag
        ).alias("url"),
    )


def host_gate(
    urls: DataFrame,
    url_col: str = "url",
    min_docs: int = 2,
    max_dup_frac: float = 0.5,
) -> DataFrame:
    """Host-level quality gate over a (.., url) table: canonicalize,
    aggregate per canonical host, and flag hosts that pass the gate —
    the FineWeb-style move where heavily-duplicated or
    too-thin hosts are dropped WHOLE (provenance-level curation,
    upstream of per-document filters).

    Returns one row per host: (host, n_docs, n_canonical,
    dup_frac [6dp], gated) with ``gated`` true when the host has at
    least ``min_docs`` docs AND its canonical-URL duplicate fraction
    (1 - distinct/total) is at most ``max_dup_frac``.

    ONE projection computes host + canonical url at the scan (no
    shuffle), then one hash aggregate per host — the gate table is
    tiny and broadcast-joins back onto the corpus for the actual drop.
    """
    u = F.col(url_col)
    per_host = (
        urls.select(
            canonical_host(u).alias("host"),
            canonicalize_url(u).alias("curl"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("curl").alias("n_canonical"),
        )
    )
    dup_frac = F.round(
        1.0 - F.col("n_canonical") / F.col("n_docs").cast("double"), 6
    )
    return per_host.select(
        "host",
        "n_docs",
        "n_canonical",
        dup_frac.alias("dup_frac"),
        (
            (F.col("n_docs") >= min_docs) & (dup_frac <= max_dup_frac)
        ).alias("gated"),
    )


def url_template_traps(
    urls: DataFrame,
    url_col: str = "url",
    max_per_template: int = 20,
) -> DataFrame:
    """Crawler-trap detection by path templating — the web-curation
    screen that catches calendars, paginators, session-id mazes, and
    faceted-search explosions: collapse every digit run in the URL
    path to ``N`` and count how many distinct canonical URLs each
    (host, template) mints. A template whose URL count exceeds
    ``max_per_template`` is a trap candidate: the crawl is enumerating
    a generator, not discovering content (the common-crawl seed-list
    hygiene move).

    Per (host, template)::

        (host, template, n_urls, frac_of_host, is_trap)

    with ``n_urls`` the DISTINCT canonical-URL count under the
    template, ``frac_of_host`` = n_urls / host total (6dp — one exact
    division of two counts), and host = the canonical (lowercased,
    www-stripped) gate key. Deterministic: regex + integer counts.

    Scale shape: one map-side parse/template pass, one (host,
    template) hash aggregate over skinny keys, one host window sharing
    the same exchange prefix. At 100 TB this runs on the URL frontier
    (bytes of key per page, not page content) and its trap verdicts
    prune the CRAWL, the cheapest place to cut.
    """
    from pyspark.sql.window import Window

    u = F.col(url_col)
    parts = url_parts(u)
    host = F.regexp_replace(parts["host"], r"^www\.", "")
    # template over the canonical path (trailing slashes stripped, as
    # canonicalize_url does) so /docs/3 and /docs/4/ share a template
    template = F.regexp_replace(
        F.regexp_replace(parts["path"], "/+$", ""), "[0-9]+", "N"
    )
    per_tpl = (
        urls.select(
            host.alias("host"),
            template.alias("template"),
            canonicalize_url(u).alias("__cu"),
        )
        .groupBy("host", "template")
        .agg(F.count_distinct("__cu").alias("n_urls"))
    )
    wh = Window.partitionBy("host")
    return per_tpl.select(
        "host",
        "template",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.round(
            F.col("n_urls").cast("double")
            / F.sum("n_urls").over(wh).cast("double"),
            6,
        ).alias("frac_of_host"),
        (F.col("n_urls") > max_per_template).alias("is_trap"),
    )
