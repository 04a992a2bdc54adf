"""Data-quality query layer: the reference's analytical workload (R notebook
dataquality-checks.Rmd + the vestigial stage-4 Scala DQ framework) as Spark
SQL over the published crawl tables.

Q1-Q8 per SURVEY.md §2.11; each query cites its Rmd lines. All are plain
Catalyst plans: anti-joins broadcast the small side, ratios are single-pass
conditional aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q1_valid_funding_years(projects: DataFrame) -> DataFrame:
    """Syntactic validity of funding years (Rmd:93-135): among non-empty,
    non-'ongoing' values, a valid year contains a 4-digit run."""
    p = projects
    out = []
    for col in ("funding_start_year", "funding_end_year"):
        c = F.col(col)
        filtered = p.filter((c != "") & (c != "ongoing"))
        out.append(
            filtered.agg(
                F.lit(col).alias("field"),
                F.count("*").alias("n_checked"),
                F.sum(F.when(c.rlike("\\d{4}"), 1).otherwise(0)).alias("n_valid"),
                (F.sum(F.when(c.rlike("\\d{4}"), 1).otherwise(0)) / F.count("*")).alias("dq_value"),
            )
        )
    return out[0].unionByName(out[1])


def q2_start_le_end_violations(projects: DataFrame) -> DataFrame:
    """Semantic rule start<=end (Rmd:153-178): numeric years only; returns
    violating project ids (the reference found project 233526993)."""
    p = projects.filter(
        F.col("funding_start_year").rlike("\\d{4}") & F.col("funding_end_year").rlike("\\d{4}")
    )
    # try_cast: the rlike('\\d{4}') filter is UNANCHORED, so a malformed
    # value like '20202023999999999' (or '2020-2023' in an externally
    # loaded table) passes the filter but is not int-castable — a plain
    # cast aborts the query under ANSI mode instead of listing violations
    return (
        p.withColumn("s", F.expr("try_cast(funding_start_year AS int)"))
        .withColumn("e", F.expr("try_cast(funding_end_year AS int)"))
        .filter(F.col("s") > F.col("e"))
        .select("project_id", "funding_start_year", "funding_end_year")
        .orderBy("project_id")
    )


def q3_source_evidence_coverage(projects: DataFrame, documents: DataFrame) -> DataFrame:
    """Source coverage (Rmd:194-223): every extracted project must have its
    crawled page in the documents table (file-existence analog -> anti-join)."""
    docs = documents.filter(F.col("resource_type") == "project").select(
        F.col("resource_id").alias("project_id")
    )
    missing = projects.join(docs, "project_id", "left_anti")
    return projects.agg(F.count("*").alias("n_projects")).crossJoin(
        missing.agg(F.count("*").alias("n_missing"))
    ).select(
        "n_projects",
        "n_missing",
        # NULL (not a crash) on an empty projects table: 0/0 is a hard
        # DIVIDE_BY_ZERO under ANSI mode (the Spark 4 default)
        F.when(F.col("n_projects") > 0, 1 - F.col("n_missing") / F.col("n_projects")).alias("dq_value"),
    )


def q4_taxonomy_consistency(project_subject_areas: DataFrame, official: DataFrame) -> DataFrame:
    """Taxonomy consistency (Rmd:236-255; Scala twin
    ProjectSubjectAreasHaveMatchesInOfficialSubjectAreaSet.scala:22-47):
    distinct extracted (project_id, subject_area) anti-joined against the
    official 213-row set — broadcast the dimension, never shuffle the facts."""
    rel = project_subject_areas.dropDuplicates(["project_id", "subject_area"])
    unmatched = rel.join(F.broadcast(official.select("subject_area")), "subject_area", "left_anti")
    return rel.agg(F.count("*").alias("n_pairs")).crossJoin(
        unmatched.agg(F.count("*").alias("n_unmatched"))
    ).select(
        "n_pairs",
        "n_unmatched",
        # NULL on an empty relation table (ANSI-mode 0/0 guard, as in q3)
        F.when(F.col("n_pairs") > 0, 1 - F.col("n_unmatched") / F.col("n_pairs")).alias("dq_value"),
    )


def q5_referential_integrity(
    person_relations: DataFrame, persons: DataFrame,
    institution_relations: DataFrame, institutions: DataFrame,
) -> DataFrame:
    """Referential integrity (Rmd:279-304): relation ids must exist in the
    primary tables (the reference found 2 dangling person ids)."""
    miss_p = person_relations.join(persons.select("person_id"), "person_id", "left_anti")
    miss_i = institution_relations.join(
        institutions.select("institution_id"), "institution_id", "left_anti"
    )
    a = person_relations.agg(F.count("*").alias("n_relations")).crossJoin(
        miss_p.agg(F.countDistinct("person_id").alias("n_missing_ids"))
    ).select(F.lit("person").alias("relation_side"), "n_relations", "n_missing_ids")
    b = institution_relations.agg(F.count("*").alias("n_relations")).crossJoin(
        miss_i.agg(F.countDistinct("institution_id").alias("n_missing_ids"))
    ).select(F.lit("institution").alias("relation_side"), "n_relations", "n_missing_ids")
    return a.unionByName(b)


def q6_schema_coverage(eav: DataFrame, person_relations: DataFrame, institution_relations: DataFrame) -> DataFrame:
    """Schema coverage (Rmd:327-354): the distinct field names seen per
    resource type, plus distinct relation types, sorted."""
    fields = eav.select("resource_type", F.col("field_name").alias("name")).distinct()
    rels = (
        person_relations.select(F.lit("person_relation").alias("resource_type"), F.col("relation_type").alias("name"))
        .unionByName(
            institution_relations.select(
                F.lit("institution_relation").alias("resource_type"), F.col("relation_type").alias("name")
            )
        )
        .distinct()
    )
    return fields.unionByName(rels).orderBy("resource_type", "name")


def q7_sample_audit(
    projects: DataFrame, sample_ids: list[str],
    subject_areas: DataFrame, participating: DataFrame, intl: DataFrame,
    person_relations: DataFrame, institution_relations: DataFrame,
) -> DataFrame:
    """Manual sample audit (Rmd:393-412): pinned ids -> 5-way left-join
    denormalization, sorted by project_id."""
    p = projects.filter(F.col("project_id").isin(sample_ids))
    out = (
        p.join(subject_areas, "project_id", "left")
        .join(participating, "project_id", "left")
        .join(intl, "project_id", "left")
        .join(person_relations.withColumnRenamed("relation_type", "person_relation_type"), "project_id", "left")
        .join(
            institution_relations.withColumnRenamed("relation_type", "institution_relation_type"),
            "project_id",
            "left",
        )
        .orderBy("project_id", "subject_area", "person_id", "institution_id")
    )
    return out


def q8_population_coverage(documents: DataFrame) -> DataFrame:
    """Population coverage (Rmd:452-479): crawled detail pages vs the
    catalog-declared totals, per resource type. The total comes from the
    SAME parse fragment the discovery kernel paginates on
    (frontier.CATALOG_TOTAL_SQL) — a hand-copied regex here would let a
    future parse tweak change what the crawler fetches while this metric
    silently kept scoring against the old parse (review r5 final #4)."""
    from ba_gepris_crawler_spark.operators.frontier import (
        CATALOG_TOTAL_SQL,
        SPANS_TEXT_SQL,
    )

    catalogs = documents.filter(F.col("resource_id").isNull())
    totals = (
        catalogs.withColumn(
            "total", F.expr(CATALOG_TOTAL_SQL.format(text=SPANS_TEXT_SQL))
        )
        .groupBy("resource_type")
        .agg(F.sum(F.when(F.col("url").contains("index=0&"), F.col("total")).otherwise(0)).alias("declared_total"))
    )
    crawled = (
        documents.filter(F.col("resource_id").isNotNull())
        .groupBy("resource_type")
        .agg(F.countDistinct("resource_id").alias("n_crawled"))
    )
    return (
        totals.join(crawled, "resource_type", "left")
        .select(
            "resource_type",
            "declared_total",
            F.coalesce("n_crawled", F.lit(0)).alias("n_crawled"),
            # a resource type whose catalog count never parsed has
            # declared_total 0 — NULL coverage, not an ANSI 0/0 crash
            F.when(
                F.col("declared_total") != 0,
                F.coalesce("n_crawled", F.lit(0)) / F.col("declared_total"),
            ).alias("dq_value"),
        )
        .orderBy("resource_type")
    )


_NOT_FOUND_MARKER = "requested page was not found"


def liveness_class(status, body) -> F.Column:
    """URL liveness classification (dataquality-checks.Rmd:484-570): the
    reference probes URLs and flags the false-200 case — GEPRIS answers
    200 with a 'requested page was not found' body for dead resources —
    separately from genuine 4xx/5xx."""
    status = F.col(status) if isinstance(status, str) else status
    body = F.col(body) if isinstance(body, str) else body
    return (
        F.when((status == 200) & F.lower(F.coalesce(body, F.lit(""))).contains(_NOT_FOUND_MARKER), "false_200")
        .when(status == 200, "live")
        .when((status >= 400) & (status < 500), "client_error")
        .when(status >= 500, "server_error")
        .otherwise("other")
    )


def q9_url_liveness(url_seen: DataFrame, documents: DataFrame) -> DataFrame:
    """Per-class liveness counts over the crawl log, with the false-200
    body check against the fetched page text (first text span)."""
    from ba_gepris_crawler_spark.operators.frontier import SPANS_TEXT_SQL

    body = documents.select(
        "url",
        F.expr(SPANS_TEXT_SQL).alias("_body"),  # the engine's span accessor
    )
    return (
        url_seen.join(body, "url", "left")
        .groupBy(liveness_class("status", "_body").alias("liveness"))
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy("liveness")
    )


def run_all(spark: SparkSession, tables: dict[str, DataFrame], official: DataFrame, sample_ids: list[str] | None = None) -> dict[str, DataFrame]:
    sample_ids = sample_ids or [r.project_id for r in tables["projects"].select("project_id").orderBy("project_id").limit(5).collect()]
    return {
        "q1_valid_funding_years": q1_valid_funding_years(tables["projects"]),
        "q2_start_le_end_violations": q2_start_le_end_violations(tables["projects"]),
        "q3_source_evidence_coverage": q3_source_evidence_coverage(tables["projects"], tables["documents"]),
        "q4_taxonomy_consistency": q4_taxonomy_consistency(tables["project_ids_to_subject_areas"], official),
        "q5_referential_integrity": q5_referential_integrity(
            tables["project_person_relations"], tables["persons"],
            tables["project_institution_relations"], tables["institutions"],
        ),
        "q6_schema_coverage": q6_schema_coverage(
            tables["eav"], tables["project_person_relations"], tables["project_institution_relations"]
        ),
        "q7_sample_audit": q7_sample_audit(
            tables["projects"], sample_ids,
            tables["project_ids_to_subject_areas"],
            tables["project_ids_to_participating_subject_areas"],
            tables["projects_international_connections"],
            tables["project_person_relations"], tables["project_institution_relations"],
        ),
        "q8_population_coverage": q8_population_coverage(tables["documents"]),
        **(
            {"q9_url_liveness": q9_url_liveness(tables["url_seen"], tables["documents"])}
            if "url_seen" in tables
            else {}
        ),
    }
