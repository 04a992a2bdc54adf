"""Helpers to materialize the synthetic site as Spark DataFrames for tests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ba_gepris_crawler_spark.schema import CRAWLED_DOCUMENTS_SCHEMA
from ba_gepris_crawler_spark.sources.synthetic_site import (
    RESOURCE_TYPES,
    SiteConfig,
    catalog_url,
    detail_url,
    expected_page_count,
    render_page,
)


def site_detail_documents(cfg: SiteConfig) -> list[tuple]:
    rows = []
    for rtype in RESOURCE_TYPES:
        for rid in cfg.ids(rtype):
            url = detail_url(cfg, rtype, rid)
            status, spans = render_page(cfg, url)
            rows.append(
                (
                    f"{rtype}/{rid}",
                    url,
                    cfg.host_of(rtype, rid),
                    rtype,
                    rid,
                    1,
                    0,
                    status,
                    [tuple(s) for s in spans],
                )
            )
    return rows


def site_catalog_documents(cfg: SiteConfig) -> list[tuple]:
    rows = []
    for rtype in RESOURCE_TYPES:
        for host in cfg.hosts:
            for page in range(expected_page_count(cfg, rtype, host)):
                url = catalog_url(cfg, rtype, host, page * cfg.hits_per_page)
                status, spans = render_page(cfg, url)
                rows.append(
                    (
                        f"catalog/{rtype}/{host}/{page}",
                        url,
                        host,
                        rtype,
                        None,
                        0,
                        0,
                        status,
                        [tuple(s) for s in spans],
                    )
                )
    return rows


def site_documents_df(spark: SparkSession, cfg: SiteConfig, include_catalog: bool = False) -> DataFrame:
    rows = site_detail_documents(cfg)
    if include_catalog:
        rows += site_catalog_documents(cfg)
    return spark.createDataFrame(rows, CRAWLED_DOCUMENTS_SCHEMA)
