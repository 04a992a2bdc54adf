"""Sitemap ingestion: sitemap.xml bodies -> frontier seed relation.

The reference seeds its crawl from hard-coded catalog URLs
(PaginatedResourceCatalogUrlsGraph.scala:12-28); an open-web crawl also
seeds from sitemaps (sitemaps.org protocol). Like the distributed robots
pipeline (operators/politeness.parse_robots_rules_distributed), sitemap
BODIES arrive as a DataFrame relation — fetched by the normal fetch
stage — and are parsed entirely in the plan: `regexp_extract_all` pulls
the `<url>`/`<sitemap>` blocks, per-block fields come out with one
anchored regex each, and nothing (bodies, entries, decisions) ever
transits the driver. At 10^6 hosts x 50k URLs per sitemap that is a
50-billion-row relation built by a single explode over the body scan.

Hostile-input caps, same discipline as the robots caps (politeness.py)
and the catalog-total cap (frontier.py): the protocol limits a sitemap
to 50,000 URLs and 50 MB uncompressed; bodies are sliced before the
regex pass and the per-sitemap entry array is `slice`d to the cap, so
one hostile 10^9-entry body cannot OOM an executor.

XML subtleties handled without an XML parser (the protocol's structure
is flat by spec — url blocks cannot nest): (?s) DOTALL regexes across
newlines, whitespace-trimmed `<loc>`, and the five standard XML entities
decoded (&amp; LAST so `&amp;lt;` decodes to `&lt;` not `<`). The spec
requires entity-escaped URLs, so this is the exact inverse of a
conforming generator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.canonicalize import host_of

# protocol limits (sitemaps.org): 50k URLs, 50 MB uncompressed per file
MAX_SITEMAP_URLS = 50_000
MAX_SITEMAP_CHARS = 50 * 1024 * 1024

_VALID_CHANGEFREQ = ("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")


def _xml_unescape(c: Column) -> Column:
    """The five predefined XML entities; &amp; last (spec-conforming
    escapers double-escape, so `&amp;lt;` must yield `&lt;`)."""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _inflate_if_binary(bodies: DataFrame, body_col: str, max_chars: int) -> DataFrame:
    """Auto-inflate a BINARY body column (gunzip_bodies) so the parse
    entry points accept .xml.gz relations directly — the product wiring
    for gzipped sitemaps; string relations pass through untouched."""
    from pyspark.sql import types as T

    if isinstance(bodies.schema[body_col].dataType, T.BinaryType):
        return gunzip_bodies(bodies, binary_col=body_col, out_col=body_col, max_chars=max_chars)
    return bodies


def _field(block: Column, tag: str) -> Column:
    """<tag>value</tag> within one block -> trimmed value, NULL if absent."""
    raw = F.regexp_extract(block, f"(?s)<{tag}[^>]*>\\s*(.*?)\\s*</{tag}>", 1)
    return F.nullif(raw, F.lit(""))


def parse_sitemap_entries(
    bodies: DataFrame,
    url_col: str = "sitemap_url",
    body_col: str = "body",
    max_urls: int = MAX_SITEMAP_URLS,
    max_chars: int = MAX_SITEMAP_CHARS,
) -> DataFrame:
    """<urlset> bodies -> one row per <url> entry:
    (sitemap_url, loc, lastmod, changefreq, priority).

    loc is entity-decoded and trimmed; entries without a loc drop (the
    protocol makes loc mandatory); changefreq is lowercased and nulled
    unless it is one of the seven spec values; priority try_casts to
    double (the spec range is 0.0-1.0; out-of-range values clamp, the
    spec default 0.5 fills absent/unparsable ones). All other columns of
    `bodies` pass through. A BINARY body column is inflated first
    (gunzip_bodies) — .xml.gz relations parse without a separate call."""
    bodies = _inflate_if_binary(bodies, body_col, max_chars)
    body = F.substring(F.col(body_col), 1, max_chars)
    blocks = F.slice(
        F.regexp_extract_all(body, F.lit("(?s)<url>(.*?)</url>"), 1),
        1,
        max_urls,
    )
    passthrough = [c for c in bodies.columns if c != body_col]
    exploded = bodies.select(*passthrough, F.explode(blocks).alias("_block"))
    b = F.col("_block")
    cf = F.lower(_field(b, "changefreq"))
    pr = F.expr(
        "try_cast(regexp_extract(_block, '(?s)<priority[^>]*>\\\\s*(.*?)\\\\s*</priority>', 1) as double)"
    )
    out = exploded.select(
        *passthrough,
        _xml_unescape(_field(b, "loc")).alias("loc"),
        _field(b, "lastmod").alias("lastmod"),
        F.when(cf.isin(*_VALID_CHANGEFREQ), cf).alias("changefreq"),
        F.greatest(F.least(F.coalesce(pr, F.lit(0.5)), F.lit(1.0)), F.lit(0.0)).alias("priority"),
    )
    return out.filter(F.col("loc").isNotNull())


def sitemap_index_children(
    bodies: DataFrame,
    url_col: str = "sitemap_url",
    body_col: str = "body",
    max_urls: int = MAX_SITEMAP_URLS,
    max_chars: int = MAX_SITEMAP_CHARS,
) -> DataFrame:
    """<sitemapindex> bodies -> one row per child sitemap:
    (passthrough cols..., child_url). One level only, BY SPEC: an index
    file must not list other index files, so child expansion is a single
    extra fetch round, never a recursion. A BINARY body column is
    inflated first (gunzip_bodies)."""
    bodies = _inflate_if_binary(bodies, body_col, max_chars)
    body = F.substring(F.col(body_col), 1, max_chars)
    blocks = F.slice(
        F.regexp_extract_all(body, F.lit("(?s)<sitemap>(.*?)</sitemap>"), 1),
        1,
        max_urls,
    )
    passthrough = [c for c in bodies.columns if c != body_col]
    exploded = bodies.select(*passthrough, F.explode(blocks).alias("_block"))
    out = exploded.select(
        *passthrough,
        _xml_unescape(_field(F.col("_block"), "loc")).alias("child_url"),
    )
    return out.filter(F.col("child_url").isNotNull())


def sitemap_frontier(entries: DataFrame, next_round: int = 0) -> DataFrame:
    """Parsed sitemap entries -> FRONTIER_SCHEMA candidate rows. The
    sitemap priority (1.0 = most important) maps onto the scheduler's
    integer priority (0 = most urgent): priority_int = round((1-p)*10).
    Dedup against url_seen stays the round loop's J1 anti-join, identical
    to link discovery; resource metadata is unknown until fetch."""
    return entries.select(
        F.col("loc").alias("url"),
        host_of(F.col("loc")).alias("host"),
        F.lit(None).cast("string").alias("resource_type"),
        F.lit(None).cast("string").alias("resource_id"),
        F.lit(0).cast("int").alias("crawl_depth"),
        F.round((1.0 - F.col("priority")) * 10).cast("int").alias("priority"),
        F.lit(next_round).cast("int").alias("discovered_round"),
    )


def gunzip_bodies(
    bodies: DataFrame,
    binary_col: str = "body_gz",
    out_col: str = "body",
    max_chars: int = MAX_SITEMAP_CHARS,
) -> DataFrame:
    """Gzipped sitemap payloads -> text bodies (the protocol allows
    .xml.gz up to 50 MB UNCOMPRESSED — sitemaps.org). This is the one
    sitemap stage that cannot be pure Catalyst (no gzip expression), so
    it is an Arrow-batched mapInPandas kernel, the same boundary class as
    the fetch stage. Bounded against zip bombs: decompression stops at
    max_chars + 1 bytes via zlib's max_length, so a 40 KB body that
    inflates to 10 GB costs max_chars of memory and gets sliced by the
    downstream parse cap like any oversized plain body. Plain (non-gzip)
    bytes pass through utf-8-decoded — one relation can mix .xml and
    .xml.gz; undecodable/corrupt payloads yield NULL (the parse drops
    them, the quarantine discipline of every hostile-input path). All
    other columns pass through; the binary column is consumed."""
    import pyspark.sql.types as T

    passthrough = [f for f in bodies.schema.fields if f.name != binary_col]
    schema = T.StructType(passthrough + [T.StructField(out_col, T.StringType(), True)])
    limit = int(max_chars)

    def kernel(batches):
        import zlib

        def one(raw) -> str | None:
            if raw is None:
                return None
            b = bytes(raw)
            if b[:2] == b"\x1f\x8b":  # gzip magic
                try:
                    # wbits=47: gzip or zlib headers; max_length caps the
                    # inflate — the +1 makes over-limit detectable yet
                    # still just gets sliced downstream
                    d = zlib.decompressobj(47)
                    b = d.decompress(b, limit + 1)
                except zlib.error:
                    return None
            truncated = len(b) > limit + 1
            b = b[: limit + 1]
            try:
                return b.decode("utf-8")
            except UnicodeDecodeError:
                if not truncated:
                    return None  # genuinely undecodable payload
                # OUR byte cut may have landed inside a multi-byte
                # character (a umlaut at exactly the limit) — stripping at
                # most 3 trailing bytes recovers the valid prefix; an
                # over-limit body must SLICE, not drop (review r5 #2)
                for k in (1, 2, 3):
                    try:
                        return b[:-k].decode("utf-8")
                    except UnicodeDecodeError:
                        continue
                return None

        for pdf in batches:
            out = pdf.drop(columns=[binary_col])
            out[out_col] = [one(raw) for raw in pdf[binary_col]]
            yield out[[f.name for f in schema.fields]]

    return bodies.mapInPandas(kernel, schema=schema)


def sitemap_urls_from_robots(
    bodies: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt bodies -> (host, sitemap_url) rows, one per `Sitemap:`
    line (RFC 9309 §2.3 / sitemaps.org: the field is independent of
    user-agent groups, so it parses file-wide — unlike Allow/Disallow,
    which politeness.parse_robots_rules_distributed scopes per group).
    Field name matches case-insensitively, the value must be an absolute
    URL by spec (non-URL values drop), and the body is sliced to the same
    500 KiB hostile-input cap as the rules parse. Pure Catalyst: fuses
    into whatever scan produced the bodies relation. Output feeds the
    normal fetch stage; fetched sitemap bodies then flow through
    parse_sitemap_entries -> engine.seed_urls_df — the full
    robots -> sitemap -> frontier pipeline with nothing on the driver."""
    from ba_gepris_crawler_spark.operators.politeness import _MAX_ROBOTS_BODY

    body = F.substring(F.col(body_col), 1, _MAX_ROBOTS_BODY)
    urls = F.regexp_extract_all(
        body, F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)[ \t\r]*$"), 1
    )
    return (
        bodies.select(F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"))
    )
