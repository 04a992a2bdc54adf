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
from ba_gepris_crawler_spark.sources.synthetic_site import URL_TYPE, SiteConfig, seed_urls

_TYPE_FROM_URL_SQL = "map('projekt','project','person','person','institution','institution')"


def seed_frontier(spark, cfg: SiteConfig) -> DataFrame:
    rows = []
    for url in seed_urls(cfg):
        host = url.split("/")[2]
        rtype = url.split("context=")[1].split("&")[0]
        rows.append((url, host, {v: k for k, v in URL_TYPE.items()}[rtype], None, 0, 0, 0))
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
            F.regexp_extract("s.media_ref", "^/gepris/(projekt|person|institution)/(\\d+)$", 1).alias("urltype"),
            F.regexp_extract("s.media_ref", "^/gepris/(projekt|person|institution)/(\\d+)$", 2).alias("rid"),
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
        "total",
        F.expr(
            "try_cast(replace(regexp_extract("
            "  coalesce(get(filter(spans, s -> s.kind = 'text'), 0).text, ''),"
            "  'out of ([\\\\d,]*) on', 1), ',', '') AS int)"
        ),
    ).filter(F.col("total").isNotNull() & (F.col("total") > 0))
    hits = cfg.hits_per_page
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
