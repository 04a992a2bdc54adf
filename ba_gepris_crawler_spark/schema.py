"""Engine table schemas.

The authoritative input shape (BASELINE.json `input_hint`) is the
interleaved text+media span document:

    doc_id: string, spans: array<struct<kind,text,media_ref,offset>>

which models the parsed GEPRIS pages the reference stores as per-id HTML
files (reference: stage1/crawlresourcedetails/CrawlResourceDetailsGraph.scala:71-77)
and parses with jsoup. Span kinds:

    h3 | name | value | link | img | text | tab_label | tab_text

`media_ref` carries the href for 'link' spans and the src for 'img' spans
(e.g. the @-symbol image used for e-mail obfuscation, reference:
stage2/extractpersons/personextractor/PersonExtractorGraph.scala:46-51).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

SPANS_TYPE = T.ArrayType(SPAN_STRUCT, containsNull=False)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPANS_TYPE, True),
    ]
)

# Fetched-page table written into each round snapshot (superset of DOCUMENTS:
# carries crawl provenance columns).
CRAWLED_DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("resource_type", T.StringType(), True),
        T.StructField("resource_id", T.StringType(), True),
        T.StructField("crawl_depth", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("spans", SPANS_TYPE, True),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("resource_type", T.StringType(), True),
        T.StructField("resource_id", T.StringType(), True),
        T.StructField("crawl_depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
    ]
)

# The consolidated per-round crawl log: exact URL-seen set + deterministic
# fetch-order trace (round, seq) + status (non-200 = quarantined error).
URL_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
    ]
)

EAV_SCHEMA = T.StructType(
    [
        T.StructField("resource_type", T.StringType(), False),
        T.StructField("resource_id", T.StringType(), False),
        T.StructField("field_name", T.StringType(), False),
        T.StructField("field_value", T.StringType(), True),
        T.StructField("ord", T.IntegerType(), False),
    ]
)

# Final published relational tables — columns per the reference CSV headers
# (DTOs.scala:39-47, :66-75, :94-102); all strings like the reference.
PROJECTS_COLUMNS = [
    "project_id",
    "title",
    "project_description",
    "dfg_programme",
    "funding_start_year",
    "funding_end_year",
    "parent_project_id",
]
PERSONS_COLUMNS = [
    "person_id",
    "name",
    "institution_name",
    "address",
    "phone",
    "fax",
    "email",
    "internet",
]
INSTITUTIONS_COLUMNS = [
    "institution_id",
    "name",
    "address",
    "phone",
    "fax",
    "email",
    "internet",
]
