"""Driver-contract query registry: every operator family of SURVEY.md §2
(plus the training-data-pipeline operators) expressed over the driver's
testdata tables, each with a DuckDB oracle twin.

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql|None).
Column names are aliased identically on both sides (the driver sorts columns
by name before value-hashing). Floats are rounded and cast to double on
both sides; counts are cast to bigint (DuckDB sum() returns HUGEINT).

Query families:
  crawl_*   - the crawl-engine kernels (frontier anti-join, canonicalize,
              pagination windows, funding-term regex cascade, multivalue
              split, e-mail de-obfuscation, link-id extraction, politeness
              priority queue, dedup rate, catalog count parse)
  dq_*      - the reference R-notebook DQ query shapes (SURVEY.md §2.11)
  tpch_*    - classic relational workloads (agg/join/top-k credibility)
  text_*    - text analysis: token stats, quality score, lang-id heuristic,
              rolling-hash fingerprint
  dedup_*   - exact + near-duplicate detection
  emb_*     - embedding similarity search (brute-force + IVF-style)
  events_*  - event-stream shapes (tumbling windows, sessionization)
  mm_*      - multimodal metadata plumbing (binary-ish features)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.canonicalize import canonical_url

SparkFn = Callable[[SparkSession, str], DataFrame]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _span(kind: str, text: F.Column | str | None, media_ref: F.Column | str | None, offset: int) -> F.Column:
    """One (kind, text, media_ref, offset) span struct for module-path
    fixtures (schema.SPAN_STRUCT)."""
    def _c(v):
        if v is None:
            return F.lit(None).cast("string")
        return F.lit(v) if isinstance(v, str) else v
    return F.struct(
        F.lit(kind).alias("kind"),
        _c(text).alias("text"),
        _c(media_ref).alias("media_ref"),
        F.lit(offset).cast("int").alias("offset"),
    )


# 60-bit portable string hash: identical in Spark and DuckDB.
def _h60_spark(col: str) -> str:
    return f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"


def _h60_duck(col: str) -> str:
    return f"(('0x' || substr(md5({col}), 1, 15))::BIGINT)"


REGISTRY: dict[str, tuple[SparkFn, str | None]] = {}


def _q(name: str, oracle: str | None):
    def deco(fn: SparkFn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# --------------------------------------------------------------------------
# crawl_* — engine kernels
# --------------------------------------------------------------------------

@_q(
    "crawl_frontier_anti_join",
    """
    WITH urls AS (
      SELECT doc_id,
             'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents),
    seen AS (SELECT url FROM urls WHERE doc_id % 3 = 0)
    SELECT regexp_extract(url, '^https://([^/]*)/', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_new
    FROM urls WHERE url NOT IN (SELECT url FROM seen)
    GROUP BY 1 ORDER BY 1
    """,
)
def crawl_frontier_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: frontier minus seen (left_anti), grouped by host."""
    urls = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    seen = urls.filter(F.col("doc_id") % 3 == 0).select("url")
    new = urls.join(seen, "url", "left_anti")
    return (
        new.groupBy(F.regexp_extract("url", "^https://([^/]*)/", 1).alias("host"))
        .agg(F.count("*").alias("n_new"))
        .orderBy("host")
    )


@_q(
    "crawl_url_canonicalize",
    """
    SELECT doc_id,
      CASE
        WHEN doc_id % 4 = 0 THEN 'https://host' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/path/' || CAST(doc_id AS VARCHAR)
        WHEN doc_id % 4 = 1 THEN 'http://host' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/path/' || CAST(doc_id AS VARCHAR) || '?x=1'
        WHEN doc_id % 8 = 2 THEN 'https://host' || CAST(doc_id % 5 AS VARCHAR) || '.example.org:80/path/' || CAST(doc_id AS VARCHAR)
        WHEN doc_id % 8 = 6 THEN 'http://host' || CAST(doc_id % 5 AS VARCHAR) || '.example.org:443/path/' || CAST(doc_id AS VARCHAR)
        ELSE 'https://host' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/'
      END AS canonical
    FROM documents ORDER BY doc_id
    """,
)
def crawl_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine canonicalizer vs independently-constructed expected URLs.
    Adversarial rows: https://h:80 and http://h:443 carry NON-default ports
    that must survive canonicalization (only the scheme's own default port
    is stripped)."""
    d = _t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 5).cast("string")
    i = F.col("doc_id").cast("string")
    messy = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("HTTPS://Host"), k, F.lit(".Example.ORG:443/path/"), i, F.lit("#frag")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("http://host"), k, F.lit(".example.org:80/path/"), i, F.lit("?x=1")))
        .when(F.col("doc_id") % 8 == 2,
              F.concat(F.lit("https://Host"), k, F.lit(".example.org:80/path/"), i, F.lit("?")))
        .when(F.col("doc_id") % 8 == 6,
              F.concat(F.lit("http://host"), k, F.lit(".example.org:443/path/"), i))
        .otherwise(F.concat(F.lit("https://host"), k, F.lit(".example.org")))
    )
    return d.select("doc_id", canonical_url(messy).alias("canonical")).orderBy("doc_id")


@_q(
    "crawl_pagination_windows",
    """
    WITH p AS (SELECT unnest(generate_series(0,
        (SELECT CAST(ceil(count(*) / 50.0) AS BIGINT) - 1 FROM documents))) AS page)
    SELECT CAST(page AS BIGINT) AS page, CAST(page * 50 AS BIGINT) AS idx
    FROM p ORDER BY page
    """,
)
def crawl_pagination_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: total count -> ceil-div page windows (PaginatedResourceCatalogUrlsGraph)."""
    total = _t(spark, sf_dir, "documents").agg(F.count("*").alias("total"))
    return (
        total.select(F.explode(F.sequence(F.lit(0), (F.ceil(F.col("total") / 50.0) - 1).cast("int"))).alias("p"))
        .select(F.col("p").cast("bigint").alias("page"), (F.col("p") * 50).cast("bigint").alias("idx"))
        .orderBy("page")
    )


_TERM_DUCK = """
      CASE CAST(doc_id % 6 AS INT)
        WHEN 0 THEN 'Funded from ' || CAST(1998 + doc_id % 20 AS VARCHAR) || ' to ' || CAST(1998 + doc_id % 20 + doc_id % 7 AS VARCHAR)
        WHEN 1 THEN 'Funded since ' || CAST(1998 + doc_id % 20 AS VARCHAR)
        WHEN 2 THEN 'Funded in ' || CAST(1998 + doc_id % 20 AS VARCHAR)
        WHEN 3 THEN 'Funded until ' || CAST(1998 + doc_id % 20 + doc_id % 7 AS VARCHAR)
        WHEN 4 THEN 'Currently being funded'
        ELSE 'Funding period unclear'
      END
"""


@_q(
    "crawl_funding_term_cascade",
    f"""
    WITH t AS (SELECT doc_id, {_TERM_DUCK} AS term FROM documents)
    SELECT doc_id, term,
      CASE
        WHEN regexp_matches(term, 'from ([0-9]+) to ([0-9]+)') THEN regexp_extract(term, 'from ([0-9]+) to ([0-9]+)', 1)
        WHEN regexp_matches(term, 'since ([0-9]+)') THEN regexp_extract(term, 'since ([0-9]+)', 1)
        WHEN regexp_matches(term, 'Funded in ([0-9]+)') THEN regexp_extract(term, 'Funded in ([0-9]+)', 1)
        WHEN regexp_matches(term, 'until ([0-9]+)') THEN ''
        WHEN regexp_matches(term, 'Currently being funded') THEN 'ongoing'
        ELSE '' END AS start_year,
      CASE
        WHEN regexp_matches(term, 'from ([0-9]+) to ([0-9]+)') THEN regexp_extract(term, 'from ([0-9]+) to ([0-9]+)', 2)
        WHEN regexp_matches(term, 'since ([0-9]+)') THEN ''
        WHEN regexp_matches(term, 'Funded in ([0-9]+)') THEN regexp_extract(term, 'Funded in ([0-9]+)', 1)
        WHEN regexp_matches(term, 'until ([0-9]+)') THEN regexp_extract(term, 'until ([0-9]+)', 1)
        WHEN regexp_matches(term, 'Currently being funded') THEN 'ongoing'
        ELSE '' END AS end_year
    FROM t ORDER BY doc_id
    """,
)
def crawl_funding_term_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 through the REAL extraction module (functions/extraction.py
    funding_range_cols — ExtractorHelpers.scala:25-38): the fixture builds
    span sequences with a 'Term' label + content span, runs with_fields,
    and the module's five-regex first-match-wins cascade produces the
    years. The oracle replays the cascade in SQL."""
    from ba_gepris_crawler_spark.functions.extraction import (
        field_text,
        funding_range_cols,
        with_fields,
    )

    d = _t(spark, sf_dir, "documents")
    y1 = (F.lit(1998) + F.col("doc_id") % 20).cast("string")
    y2 = (F.lit(1998) + F.col("doc_id") % 20 + F.col("doc_id") % 7).cast("string")
    term = (
        F.when(F.col("doc_id") % 6 == 0, F.concat(F.lit("Funded from "), y1, F.lit(" to "), y2))
        .when(F.col("doc_id") % 6 == 1, F.concat(F.lit("Funded since "), y1))
        .when(F.col("doc_id") % 6 == 2, F.concat(F.lit("Funded in "), y1))
        .when(F.col("doc_id") % 6 == 3, F.concat(F.lit("Funded until "), y2))
        .when(F.col("doc_id") % 6 == 4, F.lit("Currently being funded"))
        .otherwise(F.lit("Funding period unclear"))
    )
    docs = d.select(
        "doc_id",
        F.array(_span("name", "Term", None, 0), _span("text", term, None, 1)).alias("spans"),
    )
    start, end = funding_range_cols()
    return (
        with_fields(docs)
        .select(
            "doc_id",
            field_text("Term").alias("term"),
            start.alias("start_year"),
            end.alias("end_year"),
        )
        .orderBy("doc_id")
    )


@_q(
    "crawl_multivalue_split",
    """
    WITH v AS (SELECT doc_id, lang || ', ' || source || '<br> ' || lang || ', zz' AS value FROM documents)
    SELECT DISTINCT doc_id, trim(u2) AS value_item
    FROM v, unnest(string_split(value, '<br>')) AS t(u), unnest(string_split(u, ', ')) AS t2(u2)
    WHERE trim(u2) <> ''
    ORDER BY doc_id, value_item
    """,
)
def crawl_multivalue_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 through the REAL extraction module (functions/extraction.py
    multivalues): label+content span fixture -> with_fields -> the module's
    '<br>' then ', ' split with trim/drop-empty/distinct (comma-trap
    semantics reproduced from the reference)."""
    from ba_gepris_crawler_spark.functions.extraction import multivalues, with_fields

    value = F.concat(
        F.col("lang"), F.lit(", "), F.col("source"), F.lit("<br> "), F.col("lang"), F.lit(", zz")
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array(_span("name", "Subject Area", None, 0), _span("text", value, None, 1)).alias("spans"),
    )
    return (
        with_fields(docs)
        .select("doc_id", F.explode(multivalues(["Subject Area"])).alias("value_item"))
        .distinct()
        .orderBy("doc_id", "value_item")
    )


@_q(
    "crawl_email_deobfuscate",
    """
    SELECT doc_id,
           regexp_replace('user' || CAST(doc_id AS VARCHAR) || '<img src="/img/at.png">' || source || '.example',
                          '<img[^<]*>', '@', 'g') AS email
    FROM documents ORDER BY doc_id
    """,
)
def crawl_email_deobfuscate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 through the REAL extraction module (functions/extraction.py
    deobfuscated_email — PersonExtractorGraph.scala:46-51): the fixture
    interleaves text spans with an img span under an 'E-Mail' label; the
    module renders the field html ('<img src=...>' piece) and replaces
    every img with '@'."""
    from ba_gepris_crawler_spark.functions.extraction import deobfuscated_email, with_fields

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array(
            _span("name", "E-Mail", None, 0),
            _span("text", F.concat(F.lit("user"), F.col("doc_id").cast("string")), None, 1),
            _span("img", None, "/img/at.png", 2),
            _span("text", F.concat(F.col("source"), F.lit(".example")), None, 3),
        ).alias("spans"),
    )
    return with_fields(docs).select("doc_id", deobfuscated_email().alias("email")).orderBy("doc_id")


@_q(
    "crawl_link_extract",
    """
    WITH h AS (SELECT doc_id,
      CASE CAST(doc_id % 3 AS INT)
        WHEN 0 THEN '/gepris/projekt/' || CAST(doc_id AS VARCHAR)
        WHEN 1 THEN '/gepris/person/' || CAST(doc_id AS VARCHAR)
        ELSE '/other/' || CAST(doc_id AS VARCHAR) END AS href
      FROM documents)
    SELECT doc_id, regexp_extract(href, '^/gepris/projekt/([0-9]+)$', 1) AS project_id
    FROM h WHERE regexp_extract(href, '^/gepris/projekt/([0-9]+)$', 1) <> ''
    ORDER BY doc_id
    """,
)
def crawl_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 through the REAL extraction module (functions/extraction.py
    link_ids): link spans under an anchored label -> /gepris/projekt/(\\d*)
    ids in document order, non-matching hrefs dropped."""
    from ba_gepris_crawler_spark.functions.extraction import link_ids, with_fields

    href = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("/gepris/projekt/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("/gepris/person/"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("/other/"), F.col("doc_id").cast("string")))
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array(
            _span("name", "Subproject of", None, 0), _span("link", "ref", href, 1)
        ).alias("spans"),
    )
    d = with_fields(docs).select(
        "doc_id",
        F.coalesce(
            F.try_element_at(link_ids("projekt", ["Subproject of"]), F.lit(1)), F.lit("")
        ).alias("project_id"),
    )
    return d.filter(F.col("project_id") != "").orderBy("doc_id")


@_q(
    "crawl_host_priority_queue",
    """
    WITH f AS (SELECT doc_id, 'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
                      CAST(n_chars % 3 AS INT) AS priority,
                      CAST(doc_id % 4 AS INT) AS host_bucket FROM documents)
    SELECT host, priority, doc_id, rnk FROM (
      SELECT host, priority, doc_id,
             CAST(row_number() OVER (PARTITION BY host ORDER BY priority, host_bucket, doc_id) AS BIGINT) AS rnk
      FROM f) WHERE rnk <= 10
    ORDER BY host, rnk
    """,
)
def crawl_host_priority_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted priority queue through the REAL scheduler
    (operators/politeness.py schedule_round): two-level rank — local rank
    within (host, host_bucket) lifted to the exact global per-host rank via
    broadcast group offsets — then the per-host budget cut. The oracle is a
    flat window over (priority, host_bucket, url), i.e. the engine-defined
    total order; equality certifies the offset composition. The fixture
    pins a portable host_bucket (doc_id % 4) and a zero-padded url so SQL
    integer order == engine string order."""
    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig, schedule_round

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("url"),
        F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string")).alias("host"),
        F.lit(0).cast("int").alias("crawl_depth"),
        (F.col("n_chars") % 3).cast("int").alias("priority"),
        (F.col("doc_id") % 4).cast("int").alias("host_bucket"),
    )
    cfg = PolitenessConfig(per_host_rate=10, round_seconds=1.0, max_in_flight=5)
    fetch_now, _deferred = schedule_round(d, cfg, n_buckets=4)
    return (
        fetch_now.select("host", "priority", "doc_id", F.col("host_rank").cast("bigint").alias("rnk"))
        .orderBy("host", "rnk")
    )


@_q(
    "crawl_seen_dedup_rate",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id % 97) AS BIGINT) AS n_unique,
           round(CAST(1.0 - count(DISTINCT doc_id % 97) * 1.0 / count(*) AS DOUBLE), 6) AS dedup_rate
    FROM documents
    """,
)
def crawl_seen_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-style ratio: frontier-dedup rate metric."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_urls"),
        F.countDistinct(F.col("doc_id") % 97).alias("n_unique"),
        F.round(1.0 - F.countDistinct(F.col("doc_id") % 97) / F.count("*"), 6).alias("dedup_rate"),
    )


@_q(
    "crawl_catalog_count_parse",
    """
    WITH l AS (SELECT doc_id,
      'Results 1 to 50 out of ' ||
      CASE WHEN doc_id % 2 = 0 THEN '1,234' ELSE CAST(doc_id % 999 AS VARCHAR) END || ' on 2018-10-20' AS line
      FROM documents)
    SELECT doc_id, CAST(replace(regexp_extract(line, 'out of ([0-9,]*) on', 1), ',', '') AS BIGINT) AS total
    FROM l ORDER BY doc_id
    """,
)
def crawl_catalog_count_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: 'out of ([\\d,]*) on' -> strip commas -> int."""
    d = _t(spark, sf_dir, "documents")
    line = F.concat(
        F.lit("Results 1 to 50 out of "),
        F.when(F.col("doc_id") % 2 == 0, F.lit("1,234")).otherwise((F.col("doc_id") % 999).cast("string")),
        F.lit(" on 2018-10-20"),
    )
    total = F.regexp_replace(F.regexp_extract(line, "out of ([0-9,]*) on", 1), ",", "").cast("bigint")
    return d.select("doc_id", total.alias("total")).orderBy("doc_id")


# --------------------------------------------------------------------------
# dq_* — the reference DQ workload shapes (SURVEY.md §2.11) over TPC-H
# --------------------------------------------------------------------------

@_q(
    "dq_referential_integrity",
    """
    WITH present AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 <> 0)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orphans
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM present)
    GROUP BY 1 ORDER BY 1
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/Q5 shape: relation rows whose key is missing from the primary
    table (left_anti), counted per status."""
    orders = _t(spark, sf_dir, "orders")
    present = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 != 0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return (
        orders.join(present, "o_custkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orphans"))
        .orderBy("o_orderstatus")
    )


@_q(
    "dq_semantic_date_order",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           round(CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) * 1.0 / count(*) AS DOUBLE), 6) AS violation_rate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def dq_semantic_date_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: semantic rule 'ship after order' violation ratio."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    viol = F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0))
    return j.agg(
        F.count("*").alias("n_checked"),
        viol.alias("n_violations"),
        F.round(viol / F.count("*"), 6).alias("violation_rate"),
    )


@_q(
    "dq_schema_coverage",
    """
    SELECT * FROM (
      SELECT DISTINCT 'events' AS src_table, event_type AS name FROM events
      UNION
      SELECT DISTINCT 'documents' AS src_table, source AS name FROM documents)
    ORDER BY src_table, name
    """,
)
def dq_schema_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: distinct 'field names' per source, sorted union."""
    ev = _t(spark, sf_dir, "events").select(F.lit("events").alias("src_table"), F.col("event_type").alias("name")).distinct()
    dc = _t(spark, sf_dir, "documents").select(F.lit("documents").alias("src_table"), F.col("source").alias("name")).distinct()
    return ev.unionByName(dc).distinct().orderBy("src_table", "name")


@_q(
    "dq_population_coverage",
    """
    WITH t AS (SELECT count(*) AS total FROM orders)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(count(*) * 1.0 / (SELECT total FROM t) AS DOUBLE), 6) AS coverage
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def dq_population_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: per-class counts vs population total — ONE scan: the total
    is summed from the (tiny) per-class aggregate and broadcast back,
    instead of a driver-side count() baked in as a literal (which costs an
    extra full scan + a collect in the hot path)."""
    o = _t(spark, sf_dir, "orders")
    per_class = o.groupBy("o_orderstatus").agg(F.count("*").alias("n_orders"))
    total = per_class.agg(F.sum("n_orders").alias("_total"))
    return (
        per_class.crossJoin(F.broadcast(total))
        .select(
            "o_orderstatus",
            "n_orders",
            F.round(F.col("n_orders") / F.col("_total"), 6).alias("coverage"),
        )
        .orderBy("o_orderstatus")
    )


@_q(
    "dq_year_validity",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           round(CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 ELSE 0 END) * 1.0 / count(*) AS DOUBLE), 6) AS dq_value
    FROM orders
    """,
)
def dq_year_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape: regex syntactic-validity ratio (rlike find semantics)."""
    o = _t(spark, sf_dir, "orders")
    valid = F.sum(F.when(F.col("o_orderpriority").rlike("^[0-9]-"), 1).otherwise(0))
    return o.agg(
        F.count("*").alias("n_checked"),
        valid.alias("n_valid"),
        F.round(valid / F.count("*"), 6).alias("dq_value"),
    )


# --------------------------------------------------------------------------
# tpch_* — relational credibility workloads
# --------------------------------------------------------------------------

@_q(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
      round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
      round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
      round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
      round(CAST(avg(l_discount) AS DOUBLE), 4) AS avg_disc,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_q(
    "tpch_q3_top10_revenue",
    """
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3_top10_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")).select("o_orderkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_q(
    "tpch_top_customers_per_nation",
    """
    WITH rev AS (
      SELECT c_nationkey, c_custkey, round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_nationkey, c_custkey)
    SELECT n_name, c_custkey, revenue, rnk FROM (
      SELECT n_name, c_custkey, revenue,
             CAST(row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rnk
      FROM rev JOIN nation ON c_nationkey = n_nationkey)
    WHERE rnk <= 3 ORDER BY n_name, rnk
    """,
)
def tpch_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family: ranking window over a join+agg (top-3 customers/nation);
    nation is broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), "c_custkey")
    return (
        rev.join(F.broadcast(n), rev.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "revenue")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .orderBy("n_name", "rnk")
    )


@_q(
    "tpch_region_revenue",
    """
    SELECT r_name, round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def tpch_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# text_* — text-analysis pipeline operators over `documents`
# --------------------------------------------------------------------------

_TOKS_SPARK = "filter(split(trim(text), '\\\\s+'), t -> t != '')"
_TOKS_DUCK = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


@_q(
    "text_token_stats",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS_DUCK}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokenizer + regex word tokenizer."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(f"cast(size({_TOKS_SPARK}) as bigint)").alias("n_ws_tokens"),
        F.expr("cast(size(regexp_extract_all(text, '[a-z]+', 0)) as bigint)").alias("n_word_tokens"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    ).orderBy("doc_id")


@_q(
    "text_quality_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    s AS (SELECT doc_id,
            len(toks) AS n_tokens,
            len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'a', 'to', 'in'))) AS stop_hits,
            list_aggregate(list_transform(toks, x -> strlen(x)), 'sum') AS char_sum
          FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(stop_hits * 1.0 / n_tokens AS DOUBLE), 6) AS stopword_ratio,
           round(CAST(char_sum * 1.0 / n_tokens AS DOUBLE), 6) AS avg_token_len,
           round(CAST(least(n_tokens / 50.0, 1.0) * 0.5
                 + (stop_hits * 1.0 / n_tokens) * 0.25
                 + least((char_sum * 1.0 / n_tokens) / 8.0, 1.0) * 0.25 AS DOUBLE), 6) AS quality_score
    FROM s ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/token-shape heuristics (a training
    -data filter stage)."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    n = F.expr("size(toks)")
    stop = F.expr("size(filter(toks, x -> x IN ('the', 'and', 'of', 'a', 'to', 'in')))")
    chars = F.expr("aggregate(toks, 0, (acc, x) -> acc + length(x))")
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.round(stop / n, 6).alias("stopword_ratio"),
        F.round(chars / n, 6).alias("avg_token_len"),
        F.round(
            F.least(n / 50.0, F.lit(1.0)) * 0.5 + (stop / n) * 0.25 + F.least((chars / n) / 8.0, F.lit(1.0)) * 0.25,
            6,
        ).alias("quality_score"),
    ).orderBy("doc_id")


@_q(
    "text_lang_id",
    f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
            len(list_filter(toks, x -> x IN ('the', 'and', 'of'))) AS en_hits,
            len(list_filter(toks, x -> x IN ('der', 'und', 'das'))) AS de_hits,
            len(list_filter(toks, x -> x IN ('le', 'et', 'la'))) AS fr_hits
          FROM t)
    SELECT doc_id, lang, CAST(en_hits AS BIGINT) AS en_hits, CAST(de_hits AS BIGINT) AS de_hits,
           CAST(fr_hits AS BIGINT) AS fr_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
                WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
                WHEN fr_hits > 0 THEN 'fr'
                ELSE 'unknown' END AS predicted_lang
    FROM s ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-marker counting (n-gram heuristic
    class; the fixture corpus is English-wordlist text, the heuristic is the
    operator under test, not the fixture's labels)."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    en = F.expr("size(filter(toks, x -> x IN ('the', 'and', 'of')))")
    de = F.expr("size(filter(toks, x -> x IN ('der', 'und', 'das')))")
    fr = F.expr("size(filter(toks, x -> x IN ('le', 'et', 'la')))")
    d = d.select(
        "doc_id", "lang",
        en.cast("bigint").alias("en_hits"), de.cast("bigint").alias("de_hits"), fr.cast("bigint").alias("fr_hits"),
    )
    pred = (
        F.when((F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")) & (F.col("en_hits") > 0), "en")
        .when((F.col("de_hits") >= F.col("fr_hits")) & (F.col("de_hits") > 0), "de")
        .when(F.col("fr_hits") > 0, "fr")
        .otherwise("unknown")
    )
    return d.withColumn("predicted_lang", pred).orderBy("doc_id")


@_q(
    "text_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> {_h60_duck('x')} % 1000000007)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM t ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: rolling polynomial hash over the token stream
    (order-sensitive, portable 60-bit md5 token hash)."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    fp = F.expr(
        f"aggregate(toks, cast(0 as bigint), (a, x) -> (a * 31 + {_h60_spark('x')} % 1000000007) % 1000000007)"
    )
    return d.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


# --------------------------------------------------------------------------
# dedup_* — exact and near-duplicate detection (training-data pipeline)
# --------------------------------------------------------------------------

# Planted duplicates: doc_id % 10 == 0 rows share one sentinel text.
_DTEXT_DUCK = "CASE WHEN doc_id % 10 = 0 THEN 'duplicate sentinel text body' ELSE text END"
_DTEXT_SPARK = "CASE WHEN doc_id % 10 = 0 THEN 'duplicate sentinel text body' ELSE text END"


@_q(
    "dedup_exact",
    f"""
    WITH t AS (SELECT doc_id, {_DTEXT_DUCK} AS body FROM documents)
    SELECT md5(body) AS text_md5, CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM t GROUP BY 1 HAVING count(*) > 1 ORDER BY text_md5
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep min doc_id."""
    d = _t(spark, sf_dir, "documents").withColumn("body", F.expr(_DTEXT_SPARK))
    return (
        d.groupBy(F.md5("body").alias("text_md5"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .orderBy("text_md5")
    )


_SHINGLES_DUCK = """
    WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim({body}), '\\s+'), x -> x <> '') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
           FROM t, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS s(i))
"""


@_q(
    "dedup_ngram_jaccard",
    _SHINGLES_DUCK.format(body="CASE WHEN doc_id % 10 = 0 THEN 'duplicate sentinel text body extended for shingling purposes' ELSE text END")
    + """
    , sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           round(CAST(n_common * 1.0 / (sa.n + sb.n - n_common) AS DOUBLE), 6) AS jaccard
    FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram (3-shingle) Jaccard near-dup pairs >= 0.5."""
    body = "CASE WHEN doc_id % 10 = 0 THEN 'duplicate sentinel text body extended for shingling purposes' ELSE text END"
    d = _t(spark, sf_dir, "documents").withColumn(
        "toks", F.expr(f"filter(split(trim({body}), '\\\\s+'), x -> x != '')")
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 2, 0)),"
                " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
            )
        ).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = pairs.join(sa, "doc_a").join(sb, "doc_b")
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        j.filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@_q(
    "dedup_simhash",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    h AS (SELECT doc_id, {_h60_duck('tok')} AS hv FROM tok),
    bits AS (
      SELECT doc_id, b.b AS bit,
             CASE WHEN sum(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END AS v
      FROM h, (SELECT unnest(generate_series(0, 15)) AS b) b
      GROUP BY doc_id, b.b)
    SELECT doc_id, CAST(sum(v * (1 << bit)) AS BIGINT) AS simhash16
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash through the REAL module (operators/dedup.py simhash —
    16-bit here with a portable md5 token hash injected; 64-bit xxhash64
    is the module's scale default): per-bit majority vote over token
    hashes."""
    from ba_gepris_crawler_spark.operators.dedup import simhash

    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    tok = d.select("doc_id", F.explode("toks").alias("tok"))
    h = tok.select("doc_id", F.expr(_h60_spark("tok")).alias("hv"))
    return (
        simhash(d, bits=16, hashed_tokens=h)
        .select("doc_id", F.col("simhash").alias("simhash16"))
        .orderBy("doc_id")
    )


_MINHASH_P = 2147483647
_MINHASH_FUNCS = [(2 * j + 1, 7 * j + 3) for j in range(8)]


def _minhash_cols_spark() -> list:
    cols = []
    for j, (a, b) in enumerate(_MINHASH_FUNCS):
        cols.append(F.min(F.expr(f"(({a} * hv + {b}) % {_MINHASH_P} + {_MINHASH_P}) % {_MINHASH_P}")).alias(f"m{j}"))
    return cols


@_q(
    "dedup_minhash_lsh",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM t),
    h AS (SELECT doc_id, {_h60_duck('tok')} % {_MINHASH_P} AS hv FROM tok),
    sig AS (SELECT doc_id,
      {', '.join(f'min(({a} * hv + {b}) % {_MINHASH_P}) AS m{j}' for j, (a, b) in enumerate(_MINHASH_FUNCS))}
      FROM h GROUP BY doc_id),
    bands AS (
      SELECT doc_id, 0 AS band, md5(CAST(m0 AS VARCHAR) || '_' || CAST(m1 AS VARCHAR)) AS bkey FROM sig
      UNION ALL SELECT doc_id, 1, md5(CAST(m2 AS VARCHAR) || '_' || CAST(m3 AS VARCHAR)) FROM sig
      UNION ALL SELECT doc_id, 2, md5(CAST(m4 AS VARCHAR) || '_' || CAST(m5 AS VARCHAR)) FROM sig
      UNION ALL SELECT doc_id, 3, md5(CAST(m6 AS VARCHAR) || '_' || CAST(m7 AS VARCHAR)) FROM sig),
    anch AS (SELECT doc_id, band, bkey, min(doc_id) OVER (PARTITION BY band, bkey) AS anchor FROM bands),
    cand AS (SELECT DISTINCT anchor AS doc_a, doc_id AS doc_b FROM anch WHERE doc_id > anchor),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
    common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
               FROM cand c JOIN tok a ON a.doc_id = c.doc_a JOIN tok b ON b.doc_id = c.doc_b AND b.tok = a.tok
               GROUP BY 1, 2)
    SELECT CAST(co.doc_a AS BIGINT) AS doc_a, CAST(co.doc_b AS BIGINT) AS doc_b,
           round(CAST(n_common * 1.0 / (sa.n + sb.n - n_common) AS DOUBLE), 6) AS jaccard
    FROM common co
      JOIN sizes sa ON co.doc_a = sa.doc_id JOIN sizes sb ON co.doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.7
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (8 perms) + LSH banding (4 bands x 2 rows) through the REAL
    module (operators/dedup.py minhash_signatures + lsh_candidate_pairs +
    verified_near_dups): candidates are (bucket-anchor, member) pairs —
    LINEAR in bucket size, never the full clique — then verified by true
    token Jaccard >= 0.7; the anchor pairing keeps the candidate join
    bounded at 100 TB. The portable md5 token hash is injected as a
    precomputed `hv` so DuckDB replays the identical signatures; band-key
    hash differences (md5 vs xxhash64) don't matter — only the grouping
    does.

    tok is persisted (it feeds the signature, both verify-join sides, and
    the size table; Spark re-runs unpersisted shared subplans). The bounded
    pair output is eagerly checkpointed so the cache can be dropped INSIDE
    this call — no lingering executor storage for the caller to clear."""
    from ba_gepris_crawler_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verified_near_dups,
    )

    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    tok = d.select("doc_id", F.explode("toks").alias("tok")).distinct().persist()
    h = tok.withColumn("hv", F.expr(f"{_h60_spark('tok')} % {_MINHASH_P}"))
    sig = minhash_signatures(tok, id_col="doc_id", unit_col="tok", num_perm=8, hashed_units=h)
    cand = lsh_candidate_pairs(sig, id_col="doc_id", num_perm=8, bands=4)
    pairs = verified_near_dups(cand, tok, id_col="doc_id", unit_col="tok", threshold=0.7)
    out = (
        pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    tok.unpersist()
    return out


@_q(
    "dedup_clusters",
    """
    WITH RECURSIVE e0 AS (
      SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 10 IN (0, 1, 2, 3)
      UNION ALL
      SELECT doc_id, doc_id + 2 FROM documents WHERE doc_id % 10 = 6),
    e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    reach(node, r) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.node)
    SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup clustering through the REAL module
    (operators/dedup.py connected_components — alternating large/small
    star): chains (i..i+4 for i%10=0) and skip pairs (i, i+2 for i%10=6)
    derived from doc_ids; the oracle computes components via a recursive
    CTE (transitive closure + min label). This is the step between
    near-dup pair generation and 'keep one doc per duplicate cluster'."""
    from ba_gepris_crawler_spark.operators.dedup import connected_components

    d = _t(spark, sf_dir, "documents")
    chain = d.filter(F.col("doc_id") % 10 < 4).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
    )
    skip = d.filter(F.col("doc_id") % 10 == 6).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 2).alias("doc_b")
    )
    comp = connected_components(chain.unionByName(skip), "doc_a", "doc_b")
    return comp.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component_id").cast("bigint").alias("component_id"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# emb_* — similarity search over the embedding column
# --------------------------------------------------------------------------

_DOT_DUCK = (
    "list_aggregate(list_transform(list_zip({a}, {b}), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
)
_NORM_DUCK = "sqrt(list_aggregate(list_transform({a}, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))"
_DOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"
_NORM_SPARK = "sqrt(aggregate({a}, cast(0 as double), (acc, y) -> acc + cast(y as double) * cast(y as double)))"


@_q(
    "emb_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    s AS (SELECT q.qid, e.vec_id,
            round(CAST({_DOT_DUCK.format(a='e.embedding', b='q.qe')}
              / ({_NORM_DUCK.format(a='e.embedding')} * {_NORM_DUCK.format(a='q.qe')}) AS DOUBLE), 4) AS cosine
          FROM embeddings e, q WHERE e.vec_id <> q.qid)
    SELECT qid, vec_id, cosine, rnk FROM (
      SELECT qid, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
      FROM s) WHERE rnk <= 10
    ORDER BY qid, rnk
    """,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: broadcast the query set,
    JVM-side fold for the dot product (zip_with/aggregate — no Python)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    cos = F.round(
        F.expr(_DOT_SPARK.format(a="embedding", b="qe"))
        / (F.expr(_NORM_SPARK.format(a="embedding")) * F.expr(_NORM_SPARK.format(a="qe"))),
        4,
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        pairs.select("qid", "vec_id", cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .orderBy("qid", "rnk")
    )


@_q(
    "emb_ivf_assign",
    f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % 50 = 0),
    s AS (SELECT e.vec_id, c.cid,
            round(CAST({_DOT_DUCK.format(a='e.embedding', b='c.ce')}
              / ({_NORM_DUCK.format(a='e.embedding')} * {_NORM_DUCK.format(a='c.ce')}) AS DOUBLE), 4) AS cosine
          FROM embeddings e, c),
    best AS (SELECT vec_id, cid, cosine,
               row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, cid) AS rn FROM s)
    SELECT cid AS centroid_id, CAST(count(*) AS BIGINT) AS n_assigned,
           round(CAST(avg(cosine) AS DOUBLE), 3) AS avg_cosine
    FROM best WHERE rn = 1 GROUP BY cid ORDER BY cid
    """,
)
def emb_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse quantization: assign every vector to its nearest
    centroid (the scale path for ANN — search only the probed cell)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c = e.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    pairs = e.crossJoin(F.broadcast(c))
    cos = F.round(
        F.expr(_DOT_SPARK.format(a="embedding", b="ce"))
        / (F.expr(_NORM_SPARK.format(a="embedding")) * F.expr(_NORM_SPARK.format(a="ce"))),
        4,
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "cid")
    best = (
        pairs.select("vec_id", "cid", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        best.groupBy(F.col("cid").alias("centroid_id"))
        .agg(F.count("*").alias("n_assigned"), F.round(F.avg("cosine"), 3).alias("avg_cosine"))
        .orderBy("centroid_id")
    )


_LSH_BITS_DUCK = " + ".join(
    "(CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1), i -> embedding[i] * "
    f"(CASE WHEN ('0x' || substr(md5('{p}_' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 "
    f"THEN 1.0 ELSE -1.0 END)), 'sum') >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(8)
)


@_q(
    "emb_lsh_bucket_pairs",
    f"""
    WITH sk AS (SELECT vec_id, CAST({_LSH_BITS_DUCK} AS BIGINT) AS lsh_sketch FROM embeddings),
    a AS (SELECT vec_id, lsh_sketch, min(vec_id) OVER (PARTITION BY lsh_sketch) AS anchor FROM sk)
    SELECT CAST(anchor AS BIGINT) AS vec_a, CAST(vec_id AS BIGINT) AS vec_b,
           CAST(lsh_sketch AS BIGINT) AS sketch
    FROM a WHERE vec_id > anchor ORDER BY vec_a, vec_b
    """,
)
def emb_lsh_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH candidate pairs through the REAL module
    (operators/similarity.py portable_hyperplane_sketch +
    sketch_bucket_pairs): 8 sign bits from md5-parity +-1 hyperplanes,
    bucket-anchor pairing (linear in bucket size). The oracle replays the
    identical double-precision fold and hash in DuckDB."""
    from ba_gepris_crawler_spark.operators.similarity import (
        portable_hyperplane_sketch,
        sketch_bucket_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sk = portable_hyperplane_sketch(emb, n_planes=8)
    return sketch_bucket_pairs(sk).orderBy("vec_a", "vec_b")


@_q(
    "emb_lsh_near_dups",
    f"""
    WITH sk AS (SELECT vec_id, CAST({_LSH_BITS_DUCK} AS BIGINT) AS lsh_sketch FROM embeddings),
    a AS (SELECT vec_id, lsh_sketch, min(vec_id) OVER (PARTITION BY lsh_sketch) AS anchor FROM sk),
    cand AS (SELECT anchor AS vec_a, vec_id AS vec_b FROM a WHERE vec_id > anchor)
    SELECT CAST(c.vec_a AS BIGINT) AS vec_a, CAST(c.vec_b AS BIGINT) AS vec_b,
           round(CAST({_DOT_DUCK.format(a='ea.embedding', b='eb.embedding')}
             / ({_NORM_DUCK.format(a='ea.embedding')} * {_NORM_DUCK.format(a='eb.embedding')}) AS DOUBLE), 4) AS cosine
    FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b
    WHERE {_DOT_DUCK.format(a='ea.embedding', b='eb.embedding')}
          / ({_NORM_DUCK.format(a='ea.embedding')} * {_NORM_DUCK.format(a='eb.embedding')}) >= 0.3
    ORDER BY vec_a, vec_b
    """,
)
def emb_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup SCALE path through the REAL module: hyperplane
    sketch -> bucket-anchor candidates -> exact cosine verify over
    candidates only (operators/similarity.py verify_pairs_cosine). The
    brute-force emb_neardup_pairs is the bounded-slice baseline; this is
    the shape that survives 100 TB (no all-pairs join anywhere)."""
    from ba_gepris_crawler_spark.operators.similarity import (
        portable_hyperplane_sketch,
        sketch_bucket_pairs,
        verify_pairs_cosine,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sk = portable_hyperplane_sketch(emb, n_planes=8)
    cand = sketch_bucket_pairs(sk).select("vec_a", "vec_b")
    out = verify_pairs_cosine(cand, emb, threshold=0.3)
    return out.select("vec_a", "vec_b", F.round("cosine", 4).alias("cosine")).orderBy("vec_a", "vec_b")


@_q(
    "emb_neardup_pairs",
    f"""
    WITH n AS (SELECT vec_id, embedding, {_NORM_DUCK.format(a='embedding')} AS nrm FROM embeddings WHERE vec_id < 200)
    SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
           round(CAST({_DOT_DUCK.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) AS DOUBLE), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_DOT_DUCK.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) > 0.4
    ORDER BY vec_a, vec_b
    """,
)
def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (pairwise on
    a bounded slice; the LSH/IVF variants above are the scale path)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200).select(
        "vec_id", "embedding", F.expr(_NORM_SPARK.format(a="embedding")).alias("nrm")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos_raw = F.expr(_DOT_SPARK.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("cos_raw", cos_raw)
        .filter(F.col("cos_raw") > 0.4)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


# --------------------------------------------------------------------------
# events_* — event-stream shapes (batch equivalents of the streaming ops)
# --------------------------------------------------------------------------

@_q(
    "events_tumbling_window",
    """
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_epoch, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(avg(value) AS DOUBLE), 3) AS avg_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation (batch twin of the streaming
    window op in streaming/events.py)."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("bigint")
    return (
        ev.groupBy(bucket.alias("bucket_epoch"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 3).alias("avg_value"))
        .orderBy("bucket_epoch", "event_type")
    )


@_q(
    "events_sessionize",
    """
    WITH o AS (SELECT user_id, floor(epoch(ts))::BIGINT AS te,
                      lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_te
               FROM events),
    f AS (SELECT user_id, te,
                 CASE WHEN prev_te IS NULL OR te - prev_te > 1800 THEN 1 ELSE 0 END AS brk
          FROM o),
    s AS (SELECT user_id, te,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY te
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM f)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(te) AS BIGINT) AS start_epoch, CAST(max(te) AS BIGINT) AS end_epoch
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag -> break flags -> running sum
    -> per-session aggregates. The batch twin of stateful streaming
    sessionization."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").cast("bigint").alias("te"), "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.withColumn("prev_te", F.lag("te").over(w))
    f = o.withColumn(
        "brk", F.when(F.col("prev_te").isNull() | (F.col("te") - F.col("prev_te") > 1800), 1).otherwise(0)
    )
    ws = Window.partitionBy("user_id").orderBy("te").rowsBetween(Window.unboundedPreceding, 0)
    s = f.withColumn("session_id", F.sum("brk").over(ws).cast("bigint"))
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("te").alias("start_epoch"),
            F.max("te").alias("end_epoch"),
        )
        .orderBy("user_id", "session_id")
    )


@_q(
    "events_rolling_avg",
    """
    SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
           round(CAST(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
             AS rolling_avg_5,
           round(CAST(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
             AS running_sum
    FROM events ORDER BY event_id
    """,
)
def events_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded window frames: per-user 5-event rolling average + running
    sum (ROWS frames, deterministic tiebreak on event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), 4).alias("rolling_avg_5"),
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias("running_sum"),
    ).orderBy("event_id")


@_q(
    "events_asof_join",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    r AS (SELECT user_id, ts, event_id AS purchase_id, value FROM events WHERE event_type = 'purchase')
    SELECT CAST(l.event_id AS BIGINT) AS event_id, CAST(l.user_id AS BIGINT) AS user_id,
           CAST(floor(epoch(l.ts)) AS BIGINT) AS click_epoch,
           CAST(r.purchase_id AS BIGINT) AS purchase_id,
           round(CAST(r.value AS DOUBLE), 3) AS purchase_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join through the REAL custom operator (operators/asof.py):
    each click matched to the user's latest at-or-before purchase. Spark
    has no native as-of join; the operator encodes it as union + ordered
    window with last(ignorenulls) — one key shuffle, no range cross join.
    The oracle is DuckDB's native ASOF LEFT JOIN."""
    from ba_gepris_crawler_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
    )
    out = asof_join(clicks, purchases, key="user_id", right_cols=("purchase_id", "value"))
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("click_epoch"),
        F.col("purchase_id_asof").cast("bigint").alias("purchase_id"),
        F.round("value_asof", 3).alias("purchase_value"),
    ).orderBy("event_id")


@_q(
    "events_range_join",
    """
    WITH s AS (SELECT event_id AS signup_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t0
               FROM events WHERE event_type = 'signup'),
    c AS (SELECT event_id AS click_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tc
          FROM events WHERE event_type = 'click')
    SELECT CAST(s.signup_id AS BIGINT) AS signup_id, CAST(c.click_id AS BIGINT) AS click_id,
           CAST(c.tc - s.t0 AS BIGINT) AS secs_after_signup
    FROM s JOIN c ON s.user_id = c.user_id AND c.tc BETWEEN s.t0 AND s.t0 + 7200
    ORDER BY signup_id, click_id
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join through the REAL custom operator
    (operators/asof.py range_join): clicks within 2 h of each signup by
    the same user. The operator bins intervals so the join is an
    equi-join on (key, bin) + exact BETWEEN — never a conditional cross
    join. The oracle is DuckDB's native range join (IEJoin)."""
    from ba_gepris_crawler_spark.operators.asof import range_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("t0"),
    ).withColumn("t1", F.col("t0") + 7200)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("tc"),
    )
    out = range_join(clicks, signups, key="user_id", ts_col="tc", start_col="t0", end_col="t1")
    return out.select(
        "signup_id", "click_id", (F.col("tc") - F.col("t0")).cast("bigint").alias("secs_after_signup")
    ).orderBy("signup_id", "click_id")


# --------------------------------------------------------------------------
# mm_* — multimodal metadata plumbing (binary columns + typed metadata)
# --------------------------------------------------------------------------

@_q(
    "mm_binary_meta",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST((doc_id % 16) * 40 + 320 AS BIGINT) AS fake_width,
           CAST((doc_id % 9) * 40 + 240 AS BIGINT) AS fake_height,
           CAST(n_chars % 30 + 1 AS BIGINT) AS fake_n_frames
    FROM documents ORDER BY doc_id
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata over an opaque payload: byte length + digest +
    deterministic fake decode features (the real decoder is stubbed in
    operators/multimodal.py — no image/audio libs in this container; the
    Spark-side plumbing is what is under test)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5("text").alias("digest"),
        ((F.col("doc_id") % 16) * 40 + 320).cast("bigint").alias("fake_width"),
        ((F.col("doc_id") % 9) * 40 + 240).cast("bigint").alias("fake_height"),
        (F.col("n_chars") % 30 + 1).cast("bigint").alias("fake_n_frames"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# round-2 additions: the remaining SURVEY.md §2 query shapes
# --------------------------------------------------------------------------

@_q(
    "dq_taxonomy_consistency",
    """
    WITH sa AS (SELECT 'sa' || CAST(doc_id % 40 AS VARCHAR) AS subject_area FROM documents),
    official AS (SELECT 'sa' || CAST(unnest(generate_series(0, 19)) AS VARCHAR) AS subject_area)
    SELECT CAST((SELECT count(*) FROM sa) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_unmatched,
           round(CAST(1.0 - count(*) * 1.0 / (SELECT count(*) FROM sa) AS DOUBLE), 6) AS dq_value
    FROM sa WHERE subject_area NOT IN (SELECT subject_area FROM official)
    """,
)
def dq_taxonomy_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4/J2: project subject areas anti-joined against the official taxonomy
    (broadcast — 213 rows in the reference, README.md:134; Scala twin
    ProjectSubjectAreasHaveMatchesInOfficialSubjectAreaSet.scala:22-47,
    R twin dataquality-checks.Rmd:236-255). The official set is broadcast;
    the anti-join is the O(n·m) reference loop done hash-side."""
    sa = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("sa"), (F.col("doc_id") % 40).cast("string")).alias("subject_area")
    )
    official = spark.createDataFrame([(f"sa{i}",) for i in range(20)], "subject_area string").withColumn(
        "_m", F.lit(1)
    )
    # ONE scan: broadcast left join + conditional aggregate replaces the
    # driver-side count() literal (count + anti-join was two scans).
    unmatched = F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0))
    return (
        sa.join(F.broadcast(official), "subject_area", "left")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            unmatched.cast("bigint").alias("n_unmatched"),
            F.round(1.0 - unmatched / F.count(F.lit(1)), 6).alias("dq_value"),
        )
    )


@_q(
    "dq_source_evidence_coverage",
    """
    SELECT CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_ids,
           CAST(count(*) AS BIGINT) AS n_without_evidence,
           round(CAST(1.0 - count(*) * 1.0 / (SELECT count(*) FROM customer) AS DOUBLE), 6) AS coverage
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def dq_source_evidence_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: id list anti-joined against the evidence table (reference checks
    file-existence per id, dataquality-checks.Rmd:194-223; in Spark the
    evidence is a table, so existence = left_anti)."""
    c = _t(spark, sf_dir, "customer")
    ev = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    # ONE scan of each table: deduped evidence keys left-joined +
    # conditional aggregate (was: count() literal + anti-join = two
    # customer scans and a driver collect in the hot path).
    missing = F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0))
    return c.join(ev, "c_custkey", "left").agg(
        F.count(F.lit(1)).alias("n_ids"),
        missing.cast("bigint").alias("n_without_evidence"),
        F.round(1.0 - missing / F.count(F.lit(1)), 6).alias("coverage"),
    )


@_q(
    "dq_sample_audit",
    """
    WITH agg AS (SELECT o_custkey, count(*) AS n_orders,
                        round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_spent
                 FROM orders GROUP BY o_custkey)
    SELECT c_custkey, c_name, n_name, r_name,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(total_spent, 0.0) AS DOUBLE) AS total_spent
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey
    LEFT JOIN region ON n_regionkey = r_regionkey
    LEFT JOIN agg ON c_custkey = o_custkey
    WHERE c_custkey IN (1, 7, 42, 99, 123)
    ORDER BY c_custkey
    """,
)
def dq_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7/J4: pinned-sample audit via a chained left-join denormalization
    (dataquality-checks.Rmd:401-412: filter isin -> 5-way left-join -> sort).
    Dims broadcast; the fact-side agg happens before the join."""
    sample = [1, 7, 42, 99, 123]
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey").isin(sample))
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("n_regionkey"), "r_name")
    agg = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(sample))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
    )
    return (
        c.join(F.broadcast(n), "c_nationkey", "left")
        .join(F.broadcast(r), "n_regionkey", "left")
        .join(agg, "c_custkey", "left")
        .select(
            "c_custkey", "c_name", "n_name", "r_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce(F.col("total_spent"), F.lit(0.0)).cast("double").alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@_q(
    "dq_hash_sample",
    f"""
    WITH s AS (SELECT * FROM orders WHERE {_h60_duck("CAST(o_orderkey AS VARCHAR)")} % 100 < 5)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_sampled,
           round(CAST(avg(o_totalprice) AS DOUBLE), 2) AS avg_price
    FROM s GROUP BY 1 ORDER BY 1
    """,
)
def dq_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (the reproducible alternative to
    RNG-based TABLESAMPLE for DQ audits): keep rows whose key hash lands
    in a fixed 5% band — the same rows on every engine and every run, so
    audit samples are re-examinable. Aggregated per class."""
    o = _t(spark, sf_dir, "orders")
    keep = F.expr(f"{_h60_spark('cast(o_orderkey as string)')} % 100") < 5
    return (
        o.filter(keep)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("o_orderstatus")
    )


@_q(
    "rel_dictionary_encode",
    """
    WITH dict AS (SELECT p_brand, row_number() OVER (ORDER BY p_brand) AS brand_id
                  FROM (SELECT DISTINCT p_brand FROM part))
    SELECT CAST(brand_id AS BIGINT) AS brand_id, p_brand,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM part JOIN dict USING (p_brand)
    GROUP BY brand_id, p_brand ORDER BY brand_id
    """,
)
def dq_dictionary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: distinct names -> deterministic surrogate ids (reference uses a
    driver-side autoincrement, SqliteAccess.scala:111-130; here a
    row_number over the sorted distinct set — same contract, distributed)."""
    p = _t(spark, sf_dir, "part")
    dict_df = (
        p.select("p_brand").distinct()
        .withColumn("brand_id", F.row_number().over(Window.orderBy("p_brand")).cast("bigint"))
    )
    return (
        p.join(F.broadcast(dict_df), "p_brand")
        .groupBy("brand_id", "p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("brand_id")
    )


@_q(
    "crawl_span_adjacency",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ')[1:40] AS ts FROM documents),
    s AS (SELECT doc_id, unnest(ts) AS tok,
                 unnest(range(1, len(ts) + 1)) AS span_off
          FROM toks),
    p AS (SELECT doc_id, span_off, tok,
                 lead(tok) OVER (PARTITION BY doc_id ORDER BY span_off) AS nxt
          FROM s)
    SELECT doc_id, CAST(span_off AS BIGINT) AS span_off,
           tok AS field_name, nxt AS field_value
    FROM p WHERE span_off % 2 = 1 AND nxt IS NOT NULL
    ORDER BY doc_id, span_off
    """,
)
def crawl_span_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+F4: ordered span sequence per document, label/value pairing by
    adjacency (GenericFieldExtractorGraph.scala:73-83: every `.name` span's
    value is the next sibling span). posexplode preserves array order; the
    pairing is a lead() window keyed on the span offset."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, 40).alias("ts")
    )
    s = d.select("doc_id", F.posexplode("ts").alias("pos", "tok")).select(
        "doc_id", (F.col("pos") + 1).cast("bigint").alias("span_off"), "tok"
    )
    w = Window.partitionBy("doc_id").orderBy("span_off")
    p = s.withColumn("nxt", F.lead("tok").over(w))
    return (
        p.filter((F.col("span_off") % 2 == 1) & F.col("nxt").isNotNull())
        .select("doc_id", "span_off", F.col("tok").alias("field_name"), F.col("nxt").alias("field_value"))
        .orderBy("doc_id", "span_off")
    )


@_q(
    "crawl_address_assembly",
    """
    WITH a AS (SELECT c_custkey,
        c_name || '<br> Street ' || CAST(c_custkey AS VARCHAR) || ' <br>City ' ||
        CAST(c_custkey % 50 AS VARCHAR) AS addr_html FROM customer),
    sp AS (SELECT c_custkey, string_split(addr_html, '<br>') AS parts FROM a)
    SELECT c_custkey, trim(parts[1]) AS institution_name,
           array_to_string(list_transform(parts[2:], x -> trim(x)), chr(10)) AS address
    FROM sp ORDER BY c_custkey
    """,
)
def crawl_address_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: Address field split on <br>; head = institution name, the rest
    re-joined with newlines (PersonExtractorGraph.scala:17-27)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.col("c_name"), F.lit("<br> Street "), F.col("c_custkey").cast("string"),
            F.lit(" <br>City "), (F.col("c_custkey") % 50).cast("string"),
        ).alias("addr_html"),
    )
    parts = F.split("addr_html", "<br>")
    return c.select(
        "c_custkey",
        F.trim(F.element_at(parts, 1)).alias("institution_name"),
        F.expr(
            "array_join(transform(slice(split(addr_html, '<br>'), 2, size(split(addr_html, '<br>')) - 1),"
            " x -> trim(x)), '\\n')"
        ).alias("address"),
    ).orderBy("c_custkey")


@_q(
    "crawl_parent_hierarchy",
    """
    SELECT c.doc_id, CAST(c.doc_id // 10 AS BIGINT) AS parent_id,
           p.source AS parent_source
    FROM documents c JOIN documents p ON p.doc_id = c.doc_id // 10
    ORDER BY c.doc_id
    """,
)
def crawl_parent_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: parent_project_id self-join (extracted at
    ProjectExtractorGraph.scala:41-43; column DTOs.scala:46)."""
    d = _t(spark, sf_dir, "documents")
    child = d.select("doc_id", F.floor(F.col("doc_id") / 10).cast("bigint").alias("parent_id"))
    parent = d.select(F.col("doc_id").alias("parent_id"), F.col("source").alias("parent_source"))
    return child.join(parent, "parent_id").select("doc_id", "parent_id", "parent_source").orderBy("doc_id")


@_q(
    "tpch_stats_summary",
    """
    SELECT l_returnflag,
      round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS median_qty,
      round(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90_qty,
      round(CAST(stddev_samp(l_extendedprice) AS DOUBLE), 2) AS sd_price,
      round(CAST(corr(l_quantity, l_extendedprice) AS DOUBLE), 4) AS qty_price_corr
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def tpch_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: exact interpolated percentiles
    (percentile == DuckDB quantile_cont; computed on the integer-valued
    quantity column — float-price interpolation differs in the last cent
    between engines), sample stddev, Pearson
    correlation — all single-pass grouped aggregates with map-side partial
    state (percentile state is the value multiset; at 100 TB you'd switch
    to approx_percentile's fixed-size sketch and loosen the oracle)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        )
        .orderBy("l_returnflag")
    )


@_q(
    "tpch_rollup_revenue",
    """
    SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region, nation
    """,
)
def tpch_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region -> nation -> grand total) via grouping
    sets — partial aggregation map-side, dims broadcast."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("n_regionkey"), "r_name")
    j = (
        o.join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .join(F.broadcast(r), "n_regionkey")
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "revenue", "n_orders",
        )
        .orderBy("region", "nation")
    )


@_q(
    "tpch_pivot_status_by_priority",
    """
    SELECT o_orderpriority,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def tpch_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide cross-tab): order counts per priority pivoted by status.
    Pivot values are pinned explicitly so the plan is a single grouped
    conditional aggregate — no values-discovery pre-scan."""
    o = _t(spark, sf_dir, "orders")
    p = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(f"n_{c.lower()}") for c in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


@_q(
    "tpch_monthly_orders",
    """
    SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
           CAST(date_part('month', o_orderdate) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def tpch_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function family: calendar truncation (year/month extraction)
    over a pushed-down date filter."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("y", "m")
    )


@_q(
    "rel_string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           CAST(strlen(c_name) AS BIGINT) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, '#', '-') AS name_dashed,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS key_padded
    FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey
    """,
)
def rel_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family: case, length, substring, replace, position,
    padding — all JVM-side expressions inside one codegen stage."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
        F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("key_padded"),
    ).orderBy("c_custkey")


@_q(
    "tpch_cube_counts",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def tpch_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of the two dimensions) —
    one pass, partial aggregation map-side."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
        .orderBy("status", "priority")
    )


@_q(
    "rel_intersect_except",
    """
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
    b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
    SELECT 'both' AS bucket, CAST(count(*) AS BIGINT) AS n FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
    UNION ALL
    SELECT 'open_only', CAST(count(*) AS BIGINT) FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
    ORDER BY bucket
    """,
)
def rel_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (INTERSECT / EXCEPT distinct) over customer key sets."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k")).distinct()
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k")).distinct()
    both = a.intersect(b).agg(F.count(F.lit(1)).alias("n")).select(F.lit("both").alias("bucket"), "n")
    only = a.exceptAll(b).agg(F.count(F.lit(1)).alias("n")).select(F.lit("open_only").alias("bucket"), "n")
    return both.unionByName(only).orderBy("bucket")


@_q(
    "events_first_last_nav",
    """
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(min_by(event_id, ts) AS BIGINT) AS first_event_id,
           CAST(max_by(event_id, ts) AS BIGINT) AS last_event_id
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def events_first_last_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation aggregates: first/last event per user by time order
    (min_by/max_by — the single-pass alternative to first_value/
    last_value windows; (user_id, ts) is unique so no tiebreak needed)."""
    ev = _t(spark, sf_dir, "events")
    key = F.col("ts")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by("event_id", key).cast("bigint").alias("first_event_id"),
            F.max_by("event_id", key).cast("bigint").alias("last_event_id"),
        )
        .orderBy("user_id")
    )


@_q(
    "text_bigram_topk",
    """
    WITH toks AS (SELECT string_split(lower(text), ' ') AS ts FROM documents
                  WHERE len(string_split(lower(text), ' ')) >= 2),
    bg AS (SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])) AS bigram
           FROM toks)
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram top-k (training-pipeline n-gram stats): tokenized
    JVM-side, partial-aggregated map-side, deterministic tie-break."""
    d = _t(spark, sf_dir, "documents").select(F.split(F.lower("text"), " ").alias("ts"))
    d = d.filter(F.size("ts") >= 2)
    bigrams = F.expr("transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))")
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@_q(
    "text_lm_score",
    """
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
    bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])) AS bigram
           FROM toks WHERE len(ts) >= 2),
    model AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
    tot AS (SELECT sum(c) AS n FROM model),
    scored AS (
      SELECT b.doc_id, ln(m.c * 1.0 / (SELECT n FROM tot)) AS lp
      FROM bg b JOIN model m USING (bigram))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(avg(lp) AS DOUBLE), 6) AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram LM scoring — the train-stats-then-apply shape a
    training-data quality filter uses (perplexity-style): pass 1 counts
    corpus bigrams (map-side partial agg), pass 2 joins the model back to
    each doc's bigrams and averages log p(bigram). The model join is
    shuffle-on-bigram; at 100 TB the model table would be truncated to the
    top-K vocabulary and broadcast."""
    d = _t(spark, sf_dir, "documents").select("doc_id", F.split(F.lower("text"), " ").alias("ts"))
    # bg feeds the model, the total, and the scoring join — persist it so
    # the tokenize+explode runs once, not three times; the per-doc output
    # is eagerly checkpointed below so the cache is dropped in this call
    bg = d.filter(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))")
        ).alias("bigram"),
    ).persist()
    model = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    total = model.agg(F.sum("c").alias("n"))
    scored = (
        bg.join(model, "bigram")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("c") / F.col("n")).alias("lp"))
    )
    out = (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.round(F.avg("lp"), 6).alias("avg_logprob"))
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    bg.unpersist()
    return out


@_q(
    "mm_extract_features",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST(320 + (('0x' || substr(md5(text), 1, 2))::INT % 16) * 40 AS INT) AS width,
           CAST(240 + (('0x' || substr(md5(text), 3, 2))::INT % 9) * 40 AS INT) AS height,
           CAST(1 + (('0x' || substr(md5(text), 5, 2))::INT % 30) AS INT) AS n_frames
    FROM documents ORDER BY doc_id
    """,
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction through the REAL module path
    (operators/multimodal.py): binary payload column -> Arrow-batched
    mapInPandas decode (fake_decode stands in for codecs; same output
    contract). The oracle reproduces fake_decode's md5-derived features."""
    from ba_gepris_crawler_spark.operators.multimodal import documents_as_media, extract_features

    media = documents_as_media(_t(spark, sf_dir, "documents"))
    return extract_features(media).orderBy("doc_id")


@_q(
    "mm_frame_sample",
    """
    WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
    f AS (SELECT doc_id, text,
                 1 + (('0x' || substr(md5(text), 5, 2))::INT % 30) AS n_frames
          FROM v)
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(text || '#' || CAST(i AS VARCHAR)) AS frame_digest
    FROM f, unnest(range(0, n_frames, 10)) AS t(i)
    ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the REAL module path: row fan-out
    mapInPandas (one row per sampled frame). Decode stubbed; batch shape,
    fan-out and partitioning are what is under test."""
    from ba_gepris_crawler_spark.operators.multimodal import documents_as_media, sample_frames

    media = documents_as_media(_t(spark, sf_dir, "documents"))
    return sample_frames(media, every_nth=10).orderBy("doc_id", "frame_idx")


@_q(
    "crawl_json_api_parse",
    """
    WITH j AS (SELECT doc_id,
      '{"id": ' || CAST(doc_id AS VARCHAR) || ', "type": "' ||
      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'projekt' WHEN 1 THEN 'person' ELSE 'institution' END ||
      '", "title": "Resource ' || CAST(doc_id AS VARCHAR) || '"}' AS payload
      FROM documents)
    SELECT doc_id,
           CAST(json_extract(payload, '$.id') AS BIGINT) AS rid,
           json_extract_string(payload, '$.type') AS rtype,
           json_extract_string(payload, '$.title') AS title
    FROM j ORDER BY doc_id
    """,
)
def crawl_json_api_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: the reference's dormant JSON-API source
    (CrawledResourceDetailDataFromJsonAPIGraph.scala:15-46) — fetched JSON
    payload parsed with from_json into typed columns."""
    d = _t(spark, sf_dir, "documents")
    rtype = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("projekt"))
        .when(F.col("doc_id") % 3 == 1, F.lit("person"))
        .otherwise(F.lit("institution"))
    )
    payload = F.concat(
        F.lit('{"id": '), F.col("doc_id").cast("string"),
        F.lit(', "type": "'), rtype,
        F.lit('", "title": "Resource '), F.col("doc_id").cast("string"), F.lit('"}'),
    )
    parsed = F.from_json(payload, "id bigint, type string, title string")
    return d.select(
        "doc_id",
        parsed["id"].alias("rid"),
        parsed["type"].alias("rtype"),
        parsed["title"].alias("title"),
    ).orderBy("doc_id")


@_q(
    "crawl_robots_filter",
    """
    WITH f AS (SELECT doc_id, 'h' || CAST(doc_id % 4 AS VARCHAR) || '.example.org' AS host,
                      CASE WHEN doc_id % 5 = 0 THEN '/private/' ELSE '/public/' END ||
                      CAST(doc_id AS VARCHAR) AS path
               FROM documents)
    SELECT doc_id, host, path FROM f
    WHERE NOT (host = 'h1.example.org' AND regexp_matches(path, '^/private/'))
      AND NOT (host = 'h2.example.org' AND regexp_matches(path, '.*'))
    ORDER BY doc_id
    """,
)
def crawl_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness robots.txt disallow filter (operators/politeness.py
    apply_robots): per-host path-regex disallows compiled into the plan —
    h1 blocks /private/*, h2 blocks everything."""
    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig, apply_robots

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 4).cast("string"), F.lit(".example.org")).alias("host"),
        F.concat(
            F.when(F.col("doc_id") % 5 == 0, F.lit("/private/")).otherwise(F.lit("/public/")),
            F.col("doc_id").cast("string"),
        ).alias("path"),
    ).withColumn("url", F.col("path"))
    cfg = PolitenessConfig(disallow=(("h1.example.org", "^/private/"), ("h2.example.org", ".*")))
    return apply_robots(d, cfg).select("doc_id", "host", "path").orderBy("doc_id")


@_q(
    "dq_url_liveness",
    """
    WITH f AS (SELECT doc_id,
      CASE WHEN doc_id % 13 = 0 THEN 404 WHEN doc_id % 13 = 1 THEN 503 ELSE 200 END AS status,
      CASE WHEN doc_id % 9 = 0 THEN 'Error: The requested page was not found on this server'
           ELSE text END AS body
      FROM documents)
    SELECT CASE
        WHEN status = 200 AND contains(lower(body), 'requested page was not found') THEN 'false_200'
        WHEN status = 200 THEN 'live'
        WHEN status >= 400 AND status < 500 THEN 'client_error'
        WHEN status >= 500 THEN 'server_error'
        ELSE 'other' END AS liveness,
      CAST(count(*) AS BIGINT) AS n_urls
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def dq_url_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL liveness probe through the REAL module (plans/dq.py
    liveness_class — dataquality-checks.Rmd:484-570): classifies fetch
    outcomes incl. the reference's false-200 caveat, where a dead GEPRIS
    resource answers 200 with a 'requested page was not found' body."""
    from ba_gepris_crawler_spark.plans.dq import liveness_class

    f = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, 404)
        .when(F.col("doc_id") % 13 == 1, 503)
        .otherwise(200)
        .alias("status"),
        F.when(
            F.col("doc_id") % 9 == 0,
            F.lit("Error: The requested page was not found on this server"),
        )
        .otherwise(F.col("text"))
        .alias("body"),
    )
    return (
        f.groupBy(liveness_class("status", "body").alias("liveness"))
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy("liveness")
    )


@_q(
    "crawl_cookie_parse",
    """
    WITH h AS (SELECT doc_id,
      'JSESSIONID=tok' || CAST(doc_id AS VARCHAR) || '; Path=/gepris; HttpOnly' ||
      CASE WHEN doc_id % 2 = 0 THEN '; Secure' ELSE '' END AS header
      FROM documents)
    SELECT doc_id,
           regexp_extract(header, '^\\s*([^=;\\s]+)=', 1) AS cookie_name,
           regexp_extract(header, '^\\s*[^=;\\s]+=([^;]*)', 1) AS cookie_value,
           regexp_extract(header, '(?i);\\s*Path=([^;]*)', 1) AS cookie_path,
           regexp_matches(header, '(?i);\\s*HttpOnly(;|$)') AS http_only,
           regexp_matches(header, '(?i);\\s*Secure(;|$)') AS secure
    FROM h ORDER BY doc_id
    """,
)
def crawl_cookie_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/S9 through the REAL module (operators/cookies.py
    cookie_field_cols): native-expression Set-Cookie parse — name, value,
    Path, HttpOnly/Secure flags (reference parses the landing page's
    Set-Cookie header, CookieFlowGraph.scala:39-44)."""
    from ba_gepris_crawler_spark.operators.cookies import cookie_field_cols

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("JSESSIONID=tok"), F.col("doc_id").cast("string"),
            F.lit("; Path=/gepris; HttpOnly"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("; Secure")).otherwise(F.lit("")),
        ).alias("header"),
    )
    cols = cookie_field_cols("header")
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()]).orderBy("doc_id")


@_q(
    "crawl_robots_allow_filter",
    """
    WITH f AS (SELECT doc_id,
      'h' || CAST(doc_id % 2 AS VARCHAR) || '.example.org' AS host,
      'https://h' || CAST(doc_id % 2 AS VARCHAR) || '.example.org' ||
      CASE WHEN doc_id % 5 = 0 THEN '/private/' || CAST(doc_id AS VARCHAR)
           WHEN doc_id % 5 = 1 THEN '/private/press/' || CAST(doc_id AS VARCHAR)
           WHEN doc_id % 5 = 2 THEN '/docs/f' || CAST(doc_id AS VARCHAR) || '.pdf'
           WHEN doc_id % 5 = 3 THEN '/docs/f' || CAST(doc_id AS VARCHAR) || '.pdf?x=1'
           ELSE '/public/' || CAST(doc_id AS VARCHAR) END AS url
      FROM documents)
    SELECT doc_id, host, url FROM f
    WHERE NOT (host = 'h1.example.org' AND (
        (url LIKE '%.example.org/private/%' AND url NOT LIKE '%.example.org/private/press/%')
        OR url LIKE '%.pdf'))
    ORDER BY doc_id
    """,
)
def crawl_robots_allow_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-9309 Allow/wildcard robots evaluation end to end through the
    REAL modules (politeness.parse_robots_rules -> politeness_from_robots
    -> apply_robots): h1's robots Disallows /private/ but an Allow carves
    the /private/press/ hole (longest match wins), and a '/*.pdf$' pattern
    blocks by suffix — the trailing '$' anchors the URL end, so '.pdf?x=1'
    stays crawlable. h0 serves no robots and is untouched. Beyond the
    reference (which has no robots at all); the oracle replays the net
    keep-set with LIKE algebra."""
    from ba_gepris_crawler_spark.operators.politeness import (
        PolitenessConfig,
        apply_robots,
        politeness_from_robots,
    )

    txt = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/press/\n"
        "Disallow: /*.pdf$\n"
    )
    cfg = politeness_from_robots(PolitenessConfig(), {"h1.example.org": txt})
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 2).cast("string"), F.lit(".example.org")).alias("host"),
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 2).cast("string"), F.lit(".example.org"),
            F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/private/"), F.col("doc_id").cast("string")))
            .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/private/press/"), F.col("doc_id").cast("string")))
            .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/docs/f"), F.col("doc_id").cast("string"), F.lit(".pdf")))
            .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("/docs/f"), F.col("doc_id").cast("string"), F.lit(".pdf?x=1")))
            .otherwise(F.concat(F.lit("/public/"), F.col("doc_id").cast("string"))),
        ).alias("url"),
    )
    return apply_robots(d, cfg).select("doc_id", "host", "url").orderBy("doc_id")


@_q(
    "crawl_robots_distributed_parse",
    """
    WITH f AS (SELECT doc_id,
      'h' || CAST(doc_id % 3 AS VARCHAR) || '.example.org' AS host,
      CAST(doc_id % 3 AS VARCHAR) AS i,
      CASE WHEN doc_id % 5 = 0 THEN '/private' || CAST(doc_id % 3 AS VARCHAR) || '/' || CAST(doc_id AS VARCHAR)
           WHEN doc_id % 5 = 1 THEN '/private' || CAST(doc_id % 3 AS VARCHAR) || '/press/' || CAST(doc_id AS VARCHAR)
           WHEN doc_id % 5 = 2 THEN '/docs/f' || CAST(doc_id AS VARCHAR) || '.pdf'
           WHEN doc_id % 5 = 3 THEN '/docs/f' || CAST(doc_id AS VARCHAR) || '.pdf?x=1'
           ELSE '/public/' || CAST(doc_id AS VARCHAR) END AS path
      FROM documents)
    SELECT doc_id, host, 'https://' || host || path AS url FROM f
    WHERE NOT ((path LIKE '/private' || i || '/%' AND path NOT LIKE '/private' || i || '/press/%')
               OR path LIKE '%.pdf')
    ORDER BY doc_id
    """,
)
def crawl_robots_distributed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-scale robots transport end to end: robots.txt BODIES as a
    DataFrame -> parse_robots_rules_distributed (Arrow-batched mapInPandas
    over the same RFC-9309 state machine the driver path uses) ->
    apply_robots_rules (per-host sorted rule arrays joined onto the
    frontier, longest-match via one array HOF). Nothing — bodies, rules,
    or decisions — transits the driver, the regime for 10^6+ robots'd
    hosts where the cfg-literal path (crawl_robots_allow_filter) cannot
    hold. Each of 3 hosts Disallows /private{i}/ with an Allow carving
    /private{i}/press/ and a '/*.pdf$' suffix block; the oracle replays
    the keep-set with LIKE algebra."""
    from ba_gepris_crawler_spark.operators.politeness import (
        apply_robots_rules,
        parse_robots_rules_distributed,
    )

    robots = spark.range(3).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example.org")).alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /private"), F.col("id").cast("string"),
            F.lit("/\nAllow: /private"), F.col("id").cast("string"),
            F.lit("/press/\nDisallow: /*.pdf$\n"),
        ).alias("robots_txt"),
    )
    rules = parse_robots_rules_distributed(robots)
    i = (F.col("doc_id") % 3).cast("string")
    did = F.col("doc_id").cast("string")
    path = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/private"), i, F.lit("/"), did))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/private"), i, F.lit("/press/"), did))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/docs/f"), did, F.lit(".pdf")))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("/docs/f"), did, F.lit(".pdf?x=1")))
        .otherwise(F.concat(F.lit("/public/"), did))
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), i, F.lit(".example.org")).alias("host"),
        F.concat(F.lit("https://h"), i, F.lit(".example.org"), path).alias("url"),
    )
    return apply_robots_rules(d, rules).select("doc_id", "host", "url").orderBy("doc_id")


@_q(
    "crawl_robots_txt_parse",
    """
    WITH f AS (SELECT doc_id,
      'h' || CAST(doc_id % 4 AS VARCHAR) || '.example.org' AS host,
      'https://h' || CAST(doc_id % 4 AS VARCHAR) || '.example.org' ||
      CASE WHEN doc_id % 5 = 0 THEN '/private/' || CAST(doc_id AS VARCHAR)
           WHEN doc_id % 5 = 1 THEN '/tmp/f' || CAST(doc_id AS VARCHAR) || '.bak'
           ELSE '/public/' || CAST(doc_id AS VARCHAR) END AS url
      FROM documents)
    SELECT doc_id, host, url FROM f
    WHERE NOT (host = 'h1.example.org' AND (url LIKE '%/private/%' OR url LIKE '%.bak'))
      AND NOT (host = 'h2.example.org')
    ORDER BY doc_id
    """,
)
def crawl_robots_txt_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt text -> parsed disallow rules -> plan filter, end to end
    through the REAL module (politeness.parse_robots + apply_robots): h1
    serves a robots.txt disallowing /private/ and /tmp/*.bak for the
    wildcard agent (plus an inapplicable googlebot group), h2 disallows
    everything. The robots fetch+parse is driver-side once per host (the
    broadcast robots-cache analog); the oracle replays the net filter."""
    from ba_gepris_crawler_spark.operators.politeness import (
        PolitenessConfig,
        apply_robots,
        parse_robots,
    )

    h1_txt = (
        "User-agent: googlebot\nDisallow: /only-google/\n\n"
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp/*.bak\n"
    )
    h2_txt = "User-agent: *\nDisallow: /\n"
    cfg = PolitenessConfig(
        disallow=parse_robots("h1.example.org", h1_txt) + parse_robots("h2.example.org", h2_txt)
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 4).cast("string"), F.lit(".example.org")).alias("host"),
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 4).cast("string"), F.lit(".example.org"),
            F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/private/"), F.col("doc_id").cast("string")))
            .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/tmp/f"), F.col("doc_id").cast("string"), F.lit(".bak")))
            .otherwise(F.concat(F.lit("/public/"), F.col("doc_id").cast("string"))),
        ).alias("url"),
    )
    return apply_robots(d, cfg).select("doc_id", "host", "url").orderBy("doc_id")


@_q(
    "crawl_crawl_delay_budget",
    """
    WITH f AS (SELECT doc_id, 'h' || CAST(doc_id % 3 AS VARCHAR) AS host,
                      CAST(doc_id % 4 AS INT) AS host_bucket FROM documents),
    r AS (SELECT host, doc_id,
                 row_number() OVER (PARTITION BY host
                     ORDER BY host_bucket, lpad(CAST(doc_id AS VARCHAR), 10, '0')) AS rnk
          FROM f),
    b AS (SELECT host, CASE host WHEN 'h0' THEN 2 WHEN 'h1' THEN 4 ELSE 20 END AS budget, rnk
          FROM r)
    SELECT host, CAST(max(budget) AS BIGINT) AS budget,
           CAST(sum(CASE WHEN rnk <= budget THEN 1 ELSE 0 END) AS BIGINT) AS n_fetch_now,
           CAST(sum(CASE WHEN rnk > budget THEN 1 ELSE 0 END) AS BIGINT) AS n_deferred
    FROM b GROUP BY host ORDER BY host
    """,
)
def crawl_crawl_delay_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt Crawl-delay -> per-host token-bucket budgets, end to end
    through the REAL modules (politeness.parse_crawl_delay ->
    politeness_from_robots -> schedule_round): h0 serves Crawl-delay 0.5
    (rate 2/s -> budget 2; an inapplicable googlebot group says 9), h1
    serves 0.25 (budget 4), h2 serves no robots and keeps the default rate
    20 (budget 20). The budget is applied as a literal when-cascade — the
    broadcast robots-cache analog, no join. The oracle replays the per-host
    rank + CASE budget cut."""
    from ba_gepris_crawler_spark.operators.politeness import (
        PolitenessConfig,
        politeness_from_robots,
        schedule_round,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("url"),
        F.concat(F.lit("h"), (F.col("doc_id") % 3).cast("string")).alias("host"),
        F.lit(0).cast("int").alias("crawl_depth"),
        F.lit(0).cast("int").alias("priority"),
        (F.col("doc_id") % 4).cast("int").alias("host_bucket"),
    )
    base = PolitenessConfig(per_host_rate=20, round_seconds=1.0, max_in_flight=5)
    robots = {
        "h0": "User-agent: googlebot\nCrawl-delay: 9\n\n"
              "User-agent: *\nDisallow:\nCrawl-delay: 0.5\n",
        "h1": "User-agent: *\nCrawl-delay: 0.25\n",
    }
    cfg = politeness_from_robots(base, robots)
    fetch_now, deferred = schedule_round(d, cfg, n_buckets=4)
    fn = fetch_now.groupBy("host").agg(F.count(F.lit(1)).alias("n_fetch_now"))
    dn = deferred.groupBy("host").agg(F.count(F.lit(1)).alias("n_deferred"))
    return (
        fn.join(dn, "host", "full")
        .select(
            "host",
            cfg.budget_col("host").cast("bigint").alias("budget"),
            F.coalesce("n_fetch_now", F.lit(0)).alias("n_fetch_now"),
            F.coalesce("n_deferred", F.lit(0)).alias("n_deferred"),
        )
        .orderBy("host")
    )


@_q(
    "crawl_budget_relation_cut",
    """
    WITH f AS (SELECT doc_id, 'h' || CAST(doc_id % 3 AS VARCHAR) AS host,
                      CAST(doc_id % 4 AS INT) AS host_bucket FROM documents),
    r AS (SELECT host, doc_id,
                 row_number() OVER (PARTITION BY host
                     ORDER BY host_bucket, lpad(CAST(doc_id AS VARCHAR), 10, '0')) AS rnk
          FROM f),
    b AS (SELECT host,
                 CASE host WHEN 'h0' THEN 2 WHEN 'h1' THEN 4 ELSE 20 END AS budget,
                 CASE host WHEN 'h0' THEN 2.0 WHEN 'h1' THEN 4.0 ELSE 20.0 END AS rate,
                 rnk FROM r)
    SELECT host, CAST(max(rate) AS DOUBLE) AS host_rate,
           CAST(sum(CASE WHEN rnk <= budget THEN 1 ELSE 0 END) AS BIGINT) AS n_fetch_now,
           CAST(sum(CASE WHEN rnk > budget THEN 1 ELSE 0 END) AS BIGINT) AS n_deferred
    FROM b GROUP BY host ORDER BY host
    """,
)
def crawl_budget_relation_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The budgets RELATION end to end through the REAL modules
    (politeness.crawl_delay_budgets -> schedule_round(budgets_df=...)) —
    the web-scale form of Crawl-delay politeness where per-host budgets
    are data, not config literals. Pins the relation's hardening: h0
    appears TWICE in the robots relation (0.5s and 0.125s delays; the
    host dedup keeps the most conservative -> budget 2, rate 2/s), h2
    serves a hostile 'Crawl-delay: nan' (ignored like malformed -> the
    default budget 20), and the resolved pages/sec rides fetch_now as
    `host_rate` — the column fetch_pages prices virtual cost from. The
    oracle replays the per-host rank + CASE budget cut with the deduped
    budgets."""
    from ba_gepris_crawler_spark.operators.politeness import (
        PolitenessConfig,
        crawl_delay_budgets,
        schedule_round,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("url"),
        F.concat(F.lit("h"), (F.col("doc_id") % 3).cast("string")).alias("host"),
        F.lit(0).cast("int").alias("crawl_depth"),
        F.lit(0).cast("int").alias("priority"),
        (F.col("doc_id") % 4).cast("int").alias("host_bucket"),
    )
    base = PolitenessConfig(per_host_rate=20, round_seconds=1.0, max_in_flight=5)
    robots = spark.createDataFrame(
        [
            ("h0", "User-agent: *\nCrawl-delay: 0.5\n"),
            ("h0", "User-agent: *\nCrawl-delay: 0.125\n"),  # dup host: conservative wins
            ("h1", "User-agent: *\nCrawl-delay: 0.25\n"),
            ("h2", "User-agent: *\nCrawl-delay: nan\n"),  # hostile: ignored -> default
        ],
        "host string, robots_txt string",
    )
    fetch_now, deferred = schedule_round(
        d, base, n_buckets=4, budgets_df=crawl_delay_budgets(robots, base)
    )
    fn = fetch_now.groupBy("host").agg(
        F.max("host_rate").alias("host_rate"),
        F.count(F.lit(1)).alias("n_fetch_now"),
    )
    dn = deferred.groupBy("host").agg(F.count(F.lit(1)).alias("n_deferred"))
    return (
        fn.join(dn, "host", "full")
        .select(
            "host",
            "host_rate",
            F.coalesce("n_fetch_now", F.lit(0)).alias("n_fetch_now"),
            F.coalesce("n_deferred", F.lit(0)).alias("n_deferred"),
        )
        .orderBy("host")
    )


@_q(
    "emb_ivf_probe_topk",
    f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id >= 8 AND vec_id < 13),
    ac AS (SELECT e.vec_id, e.embedding, ct.cid,
             {_DOT_DUCK.format(a='e.embedding', b='ct.ce')}
               / ({_NORM_DUCK.format(a='e.embedding')} * {_NORM_DUCK.format(a='ct.ce')}) AS ccos
           FROM embeddings e, cent ct),
    assign AS (SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        FROM ac) WHERE rn = 1),
    qp AS (SELECT q.qid, q.qe, ct.cid,
             {_DOT_DUCK.format(a='q.qe', b='ct.ce')}
               / ({_NORM_DUCK.format(a='q.qe')} * {_NORM_DUCK.format(a='ct.ce')}) AS ccos
           FROM q, cent ct),
    probes AS (SELECT qid, qe, cid FROM (
        SELECT qid, qe, cid, row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, cid) AS rn
        FROM qp) WHERE rn <= 2),
    cand AS (SELECT p.qid, a.vec_id,
               {_DOT_DUCK.format(a='a.embedding', b='p.qe')}
                 / ({_NORM_DUCK.format(a='a.embedding')} * {_NORM_DUCK.format(a='p.qe')}) AS cosine
             FROM probes p JOIN assign a USING (cid))
    SELECT qid, vec_id, round(CAST(cosine AS DOUBLE), 4) AS cosine, rnk FROM (
      SELECT qid, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
      FROM cand) WHERE rnk <= 5
    ORDER BY qid, rnk
    """,
)
def emb_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF ANN search through the REAL module path
    (operators/similarity.py ivf_index + ivf_topk): coarse-quantize the
    corpus to 8 centroid cells, probe the nprobe=2 nearest cells per query,
    exact rank inside the probed cells. The scale story: the candidate join
    shrinks from |corpus|x|queries| to |cell|x|queries|, and at real scale
    the index is written partitioned BY cell for partition pruning."""
    from ba_gepris_crawler_spark.operators.similarity import ivf_index, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    index = ivf_index(emb, centroids)
    out = ivf_topk(index, centroids, queries, k=5, nprobe=2)
    return out.select(
        "qid", "vec_id", F.round("cosine", 4).alias("cosine"), F.col("rnk").cast("bigint").alias("rnk")
    ).orderBy("qid", "rnk")


@_q(
    "mm_caption_align",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ')[1:40] AS ts FROM documents),
    s AS (SELECT doc_id, unnest(ts) AS tok,
                 unnest(range(1, len(ts) + 1)) AS off
          FROM toks),
    sp AS (SELECT doc_id, off,
                  CASE WHEN off % 5 = 0 THEN 'img' ELSE 'text' END AS kind,
                  CASE WHEN off % 5 = 0 THEN NULL ELSE tok END AS txt,
                  CASE WHEN off % 5 = 0
                       THEN 'img://' || CAST(doc_id AS VARCHAR) || '/' || CAST(off AS VARCHAR)
                  END AS media_ref
           FROM s),
    al AS (SELECT doc_id, off, kind, media_ref,
                  last_value(CASE WHEN kind = 'text' THEN txt END IGNORE NULLS)
                    OVER w AS caption,
                  last_value(CASE WHEN kind = 'text' THEN off END IGNORE NULLS)
                    OVER w AS caption_off
           FROM sp
           WINDOW w AS (PARTITION BY doc_id ORDER BY off
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT doc_id, CAST(off AS BIGINT) AS span_off, media_ref, caption,
           CAST(off - caption_off AS BIGINT) AS caption_dist
    FROM al WHERE kind <> 'text' ORDER BY doc_id, span_off
    """,
)
def mm_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved text+media alignment through the REAL module
    (operators/multimodal.py caption_align): every 5th token of each
    document becomes a media span; each media span is paired with the
    nearest preceding text span (its caption candidate) by a per-document
    running window — the interleaved-document operator of the input_hint
    shape (doc_id, spans<kind,text,media_ref,offset>)."""
    from ba_gepris_crawler_spark.operators.multimodal import caption_align

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, 40).alias("ts")
    )
    spans = F.transform(
        "ts",
        lambda tok, i: F.struct(
            F.when((i + 1) % 5 == 0, F.lit("img")).otherwise(F.lit("text")).alias("kind"),
            F.when((i + 1) % 5 != 0, tok).alias("text"),
            F.when(
                (i + 1) % 5 == 0,
                F.concat(F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/"),
                         (i + 1).cast("string")),
            ).alias("media_ref"),
            (i + 1).cast("int").alias("offset"),
        ),
    )
    docs = d.select("doc_id", spans.alias("spans"))
    return caption_align(docs).orderBy("doc_id", "span_off")


@_q(
    "mm_interleave_stats",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ')[1:40] AS ts FROM documents),
    s AS (SELECT doc_id, unnest(range(1, len(ts) + 1)) AS off FROM toks),
    f AS (SELECT doc_id, count(*) AS n_spans,
                 sum(CASE WHEN off % 5 = 0 THEN 1 ELSE 0 END) AS n_media,
                 min(CASE WHEN off % 5 = 0 THEN off END) AS first_media
          FROM s GROUP BY doc_id)
    SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_media AS BIGINT) AS n_media,
           CAST(n_spans - n_media AS BIGINT) AS n_text,
           round(CAST(n_media AS DOUBLE) / n_spans, 6) AS media_ratio,
           CAST(first_media AS BIGINT) AS first_media_off
    FROM f ORDER BY doc_id
    """,
)
def mm_interleave_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interleaving profile through the REAL module
    (operators/multimodal.py interleave_stats): modality counts, media
    ratio, first-media offset — computed with higher-order array functions
    (no explode, no per-row Python), the curation-filter shape for
    interleaved corpora."""
    from ba_gepris_crawler_spark.operators.multimodal import interleave_stats

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, 40).alias("ts")
    )
    spans = F.transform(
        "ts",
        lambda tok, i: F.struct(
            F.when((i + 1) % 5 == 0, F.lit("img")).otherwise(F.lit("text")).alias("kind"),
            F.when((i + 1) % 5 != 0, tok).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (i + 1).cast("int").alias("offset"),
        ),
    )
    docs = d.select("doc_id", spans.alias("spans"))
    return interleave_stats(docs).orderBy("doc_id")


@_q(
    "text_inverted_index",
    """
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ')[1:40] AS ts FROM documents),
    s AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
    f AS (SELECT tok, count(DISTINCT doc_id) AS df, count(*) AS tf,
                 min(doc_id) AS first_doc
          FROM s WHERE tok <> '' GROUP BY tok)
    SELECT tok, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
           CAST(first_doc AS BIGINT) AS first_doc
    FROM f WHERE df >= 2 ORDER BY tok
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (training-data retrieval shape): token ->
    document frequency, total term frequency, first posting. Explode +
    one partial-aggregated groupBy — the map-side combine keeps the
    shuffle at |distinct tokens|, not |tokens|; at 100 TB the posting
    lists themselves would be collect_list per token bucketed by
    xxhash64(tok) (same plan shape)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.slice(F.split(F.lower("text"), " "), 1, 40)).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        d.groupBy("tok")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("df") >= 2)
        .orderBy("tok")
    )


@_q(
    "crawl_trap_filter",
    """
    WITH u AS (
      SELECT doc_id,
        CASE CAST(doc_id % 5 AS INT)
          WHEN 0 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/gepris/projekt/' || CAST(doc_id AS VARCHAR) || '?language=en'
          WHEN 1 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/cal/' || repeat('2024/', CAST(doc_id % 20 AS INT)) || 'index.html'
          WHEN 2 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/a/b' || repeat('/a', CAST(doc_id % 6 AS INT))
          WHEN 3 THEN 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/search?' || array_to_string(list_transform(range(1, CAST(doc_id % 12 AS BIGINT) + 2), i -> 'p' || CAST(i AS VARCHAR) || '=' || CAST(i AS VARCHAR)), '&')
          ELSE 'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/' || repeat('x', CAST(doc_id % 40 AS INT) * 20)
        END AS url
      FROM documents),
    s AS (
      SELECT doc_id, url,
        CAST(length(url) AS INT) AS url_len,
        CAST(len(list_filter(string_split(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*([^?#]*)', 1), '/'), x -> x <> '')) AS INT) AS path_depth,
        CAST(CASE WHEN regexp_extract(url, '\\?([^#]*)', 1) = '' THEN 0
             ELSE len(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&')) END AS INT) AS n_params,
        CAST(coalesce(list_max(list_transform(
               list_filter(string_split(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*([^?#]*)', 1), '/'), x -> x <> ''),
               s -> len(list_filter(
                 list_filter(string_split(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*([^?#]*)', 1), '/'), x -> x <> ''),
                 x -> x = s)))), 0) AS INT) AS seg_repeat
      FROM u)
    SELECT doc_id, url_len, path_depth, n_params, seg_repeat,
           (url_len > 120 OR path_depth > 6 OR n_params > 8 OR seg_repeat >= 3) AS is_trap
    FROM s ORDER BY doc_id
    """,
)
def crawl_trap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap heuristics through the REAL module
    (operators/frontier.py trap_heuristics — new open-web design, the
    reference crawls one known site and has no trap surface): synthesized
    URL families cover healthy detail pages, infinite-calendar paths,
    /a/b/a/a repeated-segment loops, parameter explosions, and over-long
    URLs; the operator scores url_len / path_depth / n_params /
    seg_repeat and flags is_trap, all in Catalyst higher-order functions
    (no UDF, no shuffle)."""
    from ba_gepris_crawler_spark.operators.frontier import trap_heuristics

    d = _t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 7).cast("string")
    i = F.col("doc_id").cast("string")
    url = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("https://h"), k, F.lit(".example.org/gepris/projekt/"), i, F.lit("?language=en")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("https://h"), k, F.lit(".example.org/cal/"),
                       F.repeat(F.lit("2024/"), (F.col("doc_id") % 20).cast("int")), F.lit("index.html")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("https://h"), k, F.lit(".example.org/a/b"),
                       F.repeat(F.lit("/a"), (F.col("doc_id") % 6).cast("int"))))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("https://h"), k, F.lit(".example.org/search?"),
                       F.array_join(F.transform(
                           F.sequence(F.lit(1), (F.col("doc_id") % 12 + 1).cast("int")),
                           lambda x: F.concat(F.lit("p"), x.cast("string"), F.lit("="), x.cast("string"))), "&")))
        .otherwise(F.concat(F.lit("https://h"), k, F.lit(".example.org/"),
                            F.repeat(F.lit("x"), ((F.col("doc_id") % 40) * 20).cast("int"))))
    )
    scored = trap_heuristics(
        d.select("doc_id", url.alias("url")),
        max_len=120, max_depth=6, max_params=8, max_seg_repeat=3,
    )
    return scored.select(
        "doc_id", "url_len", "path_depth", "n_params", "seg_repeat", "is_trap"
    ).orderBy("doc_id")


@_q(
    "crawl_cuckoo_gate",
    f"""
    WITH urls AS (
      SELECT doc_id,
             'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/doc/'
               || CAST(doc_id AS VARCHAR) AS url
      FROM documents),
    sl AS (
      SELECT doc_id, url,
             ({_h60_duck('url')} % 65535) + 1 AS fp,
             ({_h60_duck('url')} // 65536) % 4096 AS i1
      FROM urls),
    sl2 AS (
      SELECT doc_id, url, fp, i1,
             xor(i1, {_h60_duck('CAST(fp AS VARCHAR)')} % 4096) AS i2
      FROM sl),
    seen AS (SELECT * FROM sl2 WHERE doc_id % 3 = 0),
    mem AS (
      SELECT DISTINCT f.url FROM sl2 f JOIN seen s
        ON s.fp = f.fp AND (s.i1 = f.i1 OR s.i1 = f.i2))
    SELECT f.url, f.fp, f.i1, f.i2,
           (f.url IN (SELECT url FROM mem)) AS member,
           CASE WHEN f.url IN (SELECT url FROM mem) THEN 'skip' ELSE 'fetch' END AS action
    FROM sl2 f ORDER BY f.url
    """,
)
def crawl_cuckoo_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuckoo URL-seen gate with DuckDB-replayable membership (VERDICT r4
    missing #5): operators/cuckoo.portable_cuckoo_gate — the CuckooShard
    partial-key structure (nonzero 16-bit fp, i2 = i1 XOR H(fp), Fan et al.
    CoNEXT'14) over the portable md5-conv hash family, so the oracle
    replays every placement AND every fingerprint false positive exactly.
    Fixture mirrors crawl_frontier_anti_join: doc urls, every third one
    already seen."""
    from ba_gepris_crawler_spark.operators.cuckoo import portable_cuckoo_gate

    urls = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    seen = urls.filter(F.col("doc_id") % 3 == 0).select("url")
    gated = portable_cuckoo_gate(urls.select("url"), seen, m=4096)
    return gated.select("url", "fp", "i1", "i2", "member", "action").orderBy("url")


# --------------------------------------------------------------------------
# Registry ordering
# --------------------------------------------------------------------------
# The per-round driver gate emits CORRECTNESS rows for (at most) the first
# 50 registry entries in insertion order; rounds 2-3 therefore rowed only
# the first 50 names and never the 20 added later. Rotate those 20 to the
# head so they get driver rows (the displaced 20 keep two rounds of green
# rows plus the identical local DuckDB gate in tests/test_driver_contract.py
# as regression cover). New queries should be appended to _HEAD_FIRST until
# they have a green driver row.
_HEAD_FIRST = [
    "crawl_cuckoo_gate",  # new in round 5: needs its first driver row
    # Round-5 rotation: the 23 names rowed only in round 3 (the round-4 head
    # displaced them past the 50-row cap). Every other registry query has a
    # green round-4 row, so after this rotation every query has a driver row
    # at most two rounds old. New queries go at the very top.
    "dedup_clusters",
    "emb_cosine_topk",
    "emb_ivf_assign",
    "emb_lsh_bucket_pairs",
    "emb_lsh_near_dups",
    "emb_neardup_pairs",
    "events_tumbling_window",
    "events_sessionize",
    "events_rolling_avg",
    "events_asof_join",
    "events_range_join",
    "mm_binary_meta",
    "dq_taxonomy_consistency",
    "dq_source_evidence_coverage",
    "dq_sample_audit",
    "dq_hash_sample",
    "rel_dictionary_encode",
    "crawl_span_adjacency",
    "crawl_address_assembly",
    "crawl_parent_hierarchy",
    "tpch_stats_summary",
    "tpch_rollup_revenue",
    "tpch_pivot_status_by_priority",
]
assert all(n in REGISTRY for n in _HEAD_FIRST), "stale name in _HEAD_FIRST"
REGISTRY = {
    **{n: REGISTRY[n] for n in _HEAD_FIRST},
    **{n: v for n, v in REGISTRY.items() if n not in set(_HEAD_FIRST)},
}
