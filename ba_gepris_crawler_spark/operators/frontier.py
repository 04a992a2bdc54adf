"""Frontier construction and link discovery — native expressions only.

Seeds (stage-0 analog), detail-link discovery from fetched pages, and
catalog pagination (F9 count parse + W5 ceil-div page windows,
PaginatedResourceCatalogUrlsGraph.scala:12-28) all produce FRONTIER_SCHEMA
rows; the round loop dedups them against url_seen (J1 anti-join).

Host assignment for a discovered resource is site configuration (the
reference hard-codes one host into every URL template,
CrawledResourceDetailDataGraph.scala:27); here it is the tiny broadcast
literal `hosts[id % n]`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.politeness import priority_for_type
from ba_gepris_crawler_spark.schema import FRONTIER_SCHEMA
from ba_gepris_crawler_spark.sources.synthetic_site import (
    RESOURCE_TYPES,
    SiteConfig,
    catalog_url,
)

_TYPE_FROM_URL_SQL = "map('projekt','project','person','person','institution','institution')"

# Hostile-input cap, same discipline as the robots caps (politeness.py):
# the catalog pagination total is PAGE-SUPPLIED data, and an unbounded
# sequence() over ceil(total/hits) would let one bogus/hostile 'out of
# 2,000,000,000 on' page materialize a 40M-element struct array inside a
# single row's projection (executor OOM). 100k pages x hits_per_page is
# generous for any real catalog; anything above is a trap by definition.
MAX_CATALOG_PAGES = 100_000

# F9 catalog-total parse, THE single source of truth for "what counts as a
# parsable result total": regex miss -> '' and a lone comma strips to '' —
# both try_cast to NULL. Format `{text}` with the text-bearing expression.
# Shared by both discovery kernels below, the DQ population-coverage check
# (plans/dq.py q8), AND the registry query that pins the null-guard
# semantics (queries/crawl.py crawl_catalog_null_guard) — a hand-copied
# fragment there would silently stop pinning the kernel the moment this
# parse is tweaked (review r5 tail).
# bigint, not int: the cap comment below advertises 'out of 2,000,000,000
# on' handling, and an int cast made any declared total above 2^31-1 NULL
# (silently unparsable — zero pages, cap never engaged). With bigint the
# only remaining unparsable-by-overflow class is >9.2e18 (20 digits),
# which no real catalog declares; that class stays NULL by design.
CATALOG_TOTAL_SQL = (
    "try_cast(replace(regexp_extract({text},"
    " 'out of ([\\\\d,]*) on', 1), ',', '') AS bigint)"
)
# the engine's text-span accessor: first 'text'-kind span, '' when absent
SPANS_TEXT_SQL = "coalesce(get(filter(spans, s -> s.kind = 'text'), 0).text, '')"

# Detail-link recognizer. The id run is bounded at 18 digits, not \d+:
# media_ref is PAGE-SUPPLIED data and the id is later cast to long for
# host assignment — under ANSI mode (Spark 4 default) a plain cast of a
# 19+-digit run crashes the task and, after stage retries, the round
# (the same one-hostile-row-kills-the-crawl mode the catalog-total cap
# guards). 18 digits always fits int64; a longer run is a trap/bogus link
# by definition and simply doesn't match (same outcome as any other
# non-detail href). testing/golden_crawl.py pins the identical bound.
_LINK_RE_SQL = "^/gepris/(projekt|person|institution)/(\\d{1,18})$"

# absolute-URL splitter (scheme, authority, path) + the detail-path form,
# shared by frontier_rows_from_urls and operators/redirects.py
_URL_PARTS = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)"
_DETAIL_PATH_RE = _LINK_RE_SQL


def seed_frontier(spark, cfg: SiteConfig) -> DataFrame:
    """Stage-0 seeds: catalog page 0 for every (type, host) — built from
    the same (rtype, host) pairs catalog_url takes, not reverse-parsed out
    of the URL strings (which silently coupled this to the URL template's
    parameter spelling)."""
    rows = [
        (catalog_url(cfg, rtype, host, 0), host, rtype, None, 0, 0, 0)
        for rtype in RESOURCE_TYPES
        for host in cfg.hosts
    ]
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def _with_priority(df: DataFrame) -> DataFrame:
    return df.withColumn("priority", priority_for_type())


def discovered_detail_urls(docs: DataFrame, cfg: SiteConfig, next_round: int) -> DataFrame:
    """All /gepris/<type>/<id> links on fetched pages -> detail frontier rows
    at depth = parent_depth + 1."""
    hosts_arr = F.array(*[F.lit(h) for h in cfg.hosts])
    links = (
        docs.select(
            F.col("crawl_depth").alias("parent_depth"),
            F.explode("spans").alias("s"),
        )
        .filter(F.col("s.kind") == "link")
        .select(
            "parent_depth",
            F.regexp_extract("s.media_ref", _LINK_RE_SQL, 1).alias("urltype"),
            F.regexp_extract("s.media_ref", _LINK_RE_SQL, 2).alias("rid"),
        )
        .filter(F.col("rid") != "")
    )
    links = links.select(
        F.element_at(hosts_arr, (F.col("rid").cast("long") % len(cfg.hosts)).cast("int") + 1).alias("host"),
        F.expr(f"element_at({_TYPE_FROM_URL_SQL}, urltype)").alias("resource_type"),
        F.col("rid").alias("resource_id"),
        (F.col("parent_depth") + 1).alias("crawl_depth"),
        F.col("urltype"),
    )
    links = links.withColumn(
        "url",
        F.format_string("https://%s/gepris/%s/%s?language=en", "host", "urltype", "resource_id"),
    )
    out = _with_priority(links).withColumn("discovered_round", F.lit(next_round).cast("int"))
    return out.select(
        "url", "host", "resource_type", "resource_id",
        F.col("crawl_depth").cast("int"), F.col("priority").cast("int"), "discovered_round",
    )


def discovered_catalog_urls(docs: DataFrame, cfg: SiteConfig, next_round: int) -> DataFrame:
    """From each fetched catalog page: parse total (F9), emit ALL page URLs
    for that (host, type) via ceil-div page windows (W5). Dedup happens in
    the round loop's anti-joins."""
    catalogs = docs.filter(F.col("resource_id").isNull())
    totals = catalogs.withColumn(
        "total", F.expr(CATALOG_TOTAL_SQL.format(text=SPANS_TEXT_SQL))
    ).filter(F.col("total").isNotNull() & (F.col("total") > 0))
    hits = cfg.hits_per_page
    # cap the page-supplied total BEFORE the sequence explode (see
    # MAX_CATALOG_PAGES: one hostile total must not OOM an executor)
    totals = totals.withColumn("total", F.least(F.col("total"), F.lit(hits * MAX_CATALOG_PAGES)))
    pages = totals.select(
        "host",
        "resource_type",
        F.col("crawl_depth"),
        F.explode(F.sequence(F.lit(0), (F.ceil(F.col("total") / hits) - 1).cast("int"))).alias("page"),
    )
    urltype = F.expr(
        "element_at(map('project','projekt','person','person','institution','institution'), resource_type)"
    )
    pages = pages.withColumn(
        "url",
        F.format_string(
            "https://%s/gepris/OCTOPUS?context=%s&hitsPerPage=" + str(hits)
            + "&index=%s&task=doSearchExtended&resourceTypeQuery=%s&language=en",
            "host", urltype, (F.col("page") * hits).cast("string"), urltype,
        ),
    )
    out = pages.select(
        "url",
        "host",
        "resource_type",
        F.lit(None).cast("string").alias("resource_id"),
        F.col("crawl_depth").cast("int"),
        F.lit(0).cast("int").alias("priority"),
        F.lit(next_round).cast("int").alias("discovered_round"),
    )
    return out


def discovered_urls(docs: DataFrame, cfg: SiteConfig, next_round: int) -> DataFrame:
    """Single-pass link + catalog-pagination discovery.

    One scan of the documents parquet, one explode: each doc projects a
    combined array of frontier-candidate structs — its /gepris/<type>/<id>
    links (detail discovery) plus, for catalog pages, the ceil-div page
    window expansion of the parsed result total (W5+F9). The two-branch
    union formulation (discovered_detail_urls ∪ discovered_catalog_urls)
    decodes the span column twice; at 100 TB the spans decode IS the cost
    of this stage, so halving scans halves the stage."""
    hosts_arr = "array(" + ",".join(f"'{h}'" for h in cfg.hosts) + ")"
    nh = len(cfg.hosts)
    hits = cfg.hits_per_page
    # the link regex runs ONCE per span (full match, group 0): HOF lambdas
    # are interpreted per element with no common-subexpression elimination,
    # so extracting urltype/rid as separate regexp_extract calls doubled
    # the regex work of the whole stage; split_part over the one match is
    # string slicing, not regex
    link_structs = f"""
      transform(
        filter(transform(
          filter(spans, s -> s.kind = 'link'),
          s -> regexp_extract(s.media_ref, '^/gepris/(projekt|person|institution)/(\\\\d{{1,18}})$', 0)),
          m -> m != ''),
        m -> named_struct(
          'url', concat('https://', element_at({hosts_arr}, cast(cast(split_part(m, '/', 4) as long) % {nh} as int) + 1),
                        '/gepris/', split_part(m, '/', 3), '/', split_part(m, '/', 4), '?language=en'),
          'host', element_at({hosts_arr}, cast(cast(split_part(m, '/', 4) as long) % {nh} as int) + 1),
          'resource_type', element_at({_TYPE_FROM_URL_SQL}, split_part(m, '/', 3)),
          'resource_id', split_part(m, '/', 4),
          'crawl_depth', cast(crawl_depth + 1 as int)))
    """
    total_expr = CATALOG_TOTAL_SQL.format(text=SPANS_TEXT_SQL)
    urltype_expr = "element_at(map('project','projekt','person','person','institution','institution'), resource_type)"
    # total_expr (a regex over the page's FULL text span) is bound ONCE via
    # a one-element transform (t = the RAW total, possibly NULL) instead of
    # being evaluated in both the CASE condition and the sequence bound.
    # The MAX_CATALOG_PAGES cap is applied INSIDE the null guard: Spark's
    # least() SKIPS nulls (least(NULL, cap) = cap), so capping before the
    # guard turned every unparsable total into a 100k-page phantom fan-out
    # — the exact hostile-page injection the cap exists to prevent
    # (review r5 tail #1; politeness.py documents the same least/greatest
    # null pitfall for budget clamps).
    catalog_structs = f"""
      CASE WHEN resource_id IS NULL THEN
        flatten(transform(array({total_expr}), t ->
          CASE WHEN coalesce(t, 0) > 0 THEN
            transform(sequence(0, cast(ceil(least(t, {hits * MAX_CATALOG_PAGES}) / {hits}.0) as int) - 1),
              p -> named_struct(
                'url', concat('https://', host, '/gepris/OCTOPUS?context=', {urltype_expr},
                              '&hitsPerPage={hits}&index=', cast(p * {hits} as string),
                              '&task=doSearchExtended&resourceTypeQuery=', {urltype_expr}, '&language=en'),
                'host', host,
                'resource_type', resource_type,
                'resource_id', cast(NULL as string),
                'crawl_depth', cast(crawl_depth as int)))
          ELSE array() END))
      ELSE array() END
    """
    cand = docs.select(
        F.explode(F.expr(f"concat({link_structs}, {catalog_structs})")).alias("c")
    ).select("c.url", "c.host", "c.resource_type", "c.resource_id", "c.crawl_depth")
    return _with_priority(cand).select(
        "url", "host", "resource_type", "resource_id",
        F.col("crawl_depth").cast("int"),
        F.col("priority").cast("int"),
        F.lit(next_round).cast("int").alias("discovered_round"),
    )


def frontier_rows_from_urls(
    urls: DataFrame, next_round: int, url_col: str = "url", depth_col: str | None = None
) -> DataFrame:
    """Bare URL strings -> FRONTIER_SCHEMA rows, for feeds that supply
    URLs without resource metadata (sitemap <loc> entries, redirect
    Location targets): the detail form yields (type, id) from the path,
    the catalog form yields type from resourceTypeQuery; anything else is
    outside the site model and drops. depth_col (if given) carries the
    SOURCE depth — rows come out one deeper (a redirect hop is one more
    discovery step); absent, rows seed at depth 0. One projection, no
    UDF, no shuffle (merge_frontier dedups downstream)."""
    src = urls.select(
        F.col(url_col).alias("_u"),
        (F.col(depth_col) + 1).cast("int").alias("_d")
        if depth_col
        else F.lit(0).cast("int").alias("_d"),
    )
    host = F.regexp_extract("_u", _URL_PARTS, 2)
    path = F.regexp_extract("_u", _URL_PARTS, 3)
    d_type = F.regexp_extract(path, _DETAIL_PATH_RE, 1)
    d_id = F.regexp_extract(path, _DETAIL_PATH_RE, 2)
    c_type = F.when(
        path == "/gepris/OCTOPUS",
        F.regexp_extract("_u", "[?&]resourceTypeQuery=(projekt|person|institution)(&|$)", 1),
    ).otherwise(F.lit(""))
    urltype = F.when(d_type != "", d_type).otherwise(c_type)
    cand = src.select(
        F.col("_u").alias("url"),
        host.alias("host"),
        F.element_at(F.expr(_TYPE_FROM_URL_SQL), urltype).alias("resource_type"),
        F.when(d_id != "", d_id).alias("resource_id"),
        F.col("_d").alias("crawl_depth"),
    ).filter(F.col("resource_type").isNotNull() & (F.col("host") != ""))
    return _with_priority(cand).select(
        "url", "host", "resource_type", "resource_id", "crawl_depth",
        F.col("priority").cast("int"),
        F.lit(int(next_round)).cast("int").alias("discovered_round"),
    )


def merge_frontier(*parts: DataFrame) -> DataFrame:
    """Union frontier candidates keeping, per url, the minimum
    (crawl_depth, priority, discovered_round) — a deterministic groupBy,
    not dropDuplicates (which keeps an arbitrary row)."""
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.groupBy("url").agg(
        F.min_by(F.struct("host", "resource_type", "resource_id", "crawl_depth", "priority", "discovered_round"),
                 F.struct("crawl_depth", "priority", "discovered_round")).alias("m")
    ).select("url", "m.host", "m.resource_type", "m.resource_id", "m.crawl_depth", "m.priority", "m.discovered_round")


def trap_heuristics(
    df: DataFrame,
    url_col: str = "url",
    max_len: int = 512,
    max_depth: int = 12,
    max_params: int = 8,
    max_seg_repeat: int = 3,
) -> DataFrame:
    """Crawler-trap scoring over a URL column — frontier hygiene an open-web
    10^10-URL crawl needs but the single-site reference never did (new
    design, documented): infinite calendars, session-id loops, and
    mirror-of-mirror paths manifest as over-long URLs, over-deep paths,
    parameter explosions, and repeated path segments. All heuristics are
    Catalyst higher-order functions over the split path — no UDF, no
    shuffle — so the filter fuses straight into the frontier scan.

    Adds: url_len, path_depth, n_params, seg_repeat (max multiplicity of
    one path segment — the /a/b/a/b/a loop detector), is_trap.
    """
    url = F.col(url_col)
    path = F.regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    qs = F.regexp_extract(url, "\\?([^#]*)", 1)
    n_params = F.when(qs == "", F.lit(0)).otherwise(F.size(F.split(qs, "&")))
    # max multiplicity of any one segment: O(k^2) over a tiny array beats a
    # per-row sort; k is bounded by max_depth in practice
    seg_repeat = F.coalesce(
        F.array_max(F.transform(segs, lambda s: F.size(F.filter(segs, lambda x: x == s)))),
        F.lit(0),
    )
    out = (
        df.withColumn("url_len", F.length(url).cast("int"))
        .withColumn("path_depth", F.size(segs).cast("int"))
        .withColumn("n_params", n_params.cast("int"))
        .withColumn("seg_repeat", seg_repeat.cast("int"))
    )
    return out.withColumn(
        "is_trap",
        (F.col("url_len") > max_len)
        | (F.col("path_depth") > max_depth)
        | (F.col("n_params") > max_params)
        | (F.col("seg_repeat") >= max_seg_repeat),
    )


def drop_traps(frontier: DataFrame, **limits) -> DataFrame:
    """Frontier candidates minus trap URLs (trap_heuristics thresholds via
    **limits); projection restored to the input columns."""
    scored = trap_heuristics(frontier, **limits)
    return scored.filter(~F.col("is_trap")).select(*frontier.columns)
