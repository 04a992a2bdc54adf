"""DQ workload (Q1-Q8) over a full crawl's published tables.

Site traps verified: the start>end bad row (project index 13), dangling
person relation ids, unofficial subject areas, comma-trap split fragments.
"""

from __future__ import annotations

import pytest

from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
from ba_gepris_crawler_spark.plans import dq
from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
from ba_gepris_crawler_spark.plans.round_loop import (
    CrawlEngine,
    CrawlSettings,
    official_subject_areas,
    published_tables,
)
from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig


@pytest.fixture(scope="module")
def pub(spark, tmp_path_factory):
    cfg = SiteConfig(
        hosts=("gepris.example.org", "alt1.example.org"),
        n_projects=30,
        n_persons=18,
        n_institutions=6,
        hits_per_page=25,
        seed=42,
    )
    store = SnapshotStore(spark, tmp_path_factory.mktemp("dq_crawl"))
    settings = CrawlSettings(
        n_buckets=8,
        politeness=PolitenessConfig(per_host_rate=100, round_seconds=1.0),
        extract=True,
    )
    CrawlEngine(spark, cfg, store, settings).run(max_rounds=10)
    return published_tables(store)


@pytest.fixture(scope="module")
def results(spark, pub):
    out = dq.run_all(spark, pub, official_subject_areas(spark))
    return {k: v.collect() for k, v in out.items()}


def test_q1_year_validity(results):
    rows = {r.field: r for r in results["q1_valid_funding_years"]}
    assert set(rows) == {"funding_start_year", "funding_end_year"}
    for r in rows.values():
        assert r.n_valid == r.n_checked  # generator only emits 4-digit years
        assert r.dq_value == 1.0


def test_q2_finds_the_bad_row(results):
    # project index 13 -> id 100013 has Term "Funded from 2013 to 2012"
    rows = results["q2_start_le_end_violations"]
    assert [r.project_id for r in rows] == ["100013"]
    assert rows[0].funding_start_year == "2013"


def test_q3_full_source_coverage(results):
    r = results["q3_source_evidence_coverage"][0]
    assert r.n_missing == 0 and r.dq_value == 1.0


def test_q4_taxonomy_partially_consistent(results):
    r = results["q4_taxonomy_consistency"][0]
    # unofficial areas + comma-trap fragments guarantee 0 < dq < 1
    assert 0 < r.n_unmatched < r.n_pairs
    assert 0.0 < r.dq_value < 1.0


def test_q5_dangling_person_ids_found(results):
    rows = {r.relation_side: r for r in results["q5_referential_integrity"]}
    assert rows["person"].n_missing_ids > 0  # the planted dangling ids
    assert rows["institution"].n_missing_ids == 0


def test_q6_schema_coverage(results):
    rows = results["q6_schema_coverage"]
    names = {(r.resource_type, r.name) for r in rows}
    assert ("project", "Subject Area") in names
    assert ("person", "E-Mail") in names
    assert any(t == "person_relation" for t, _ in names)
    # sorted output
    assert [(r.resource_type, r.name) for r in rows] == sorted((r.resource_type, r.name) for r in rows)


def test_q7_sample_audit_shape(results):
    rows = results["q7_sample_audit"]
    assert len(rows) > 0
    assert len({r.project_id for r in rows}) <= 5


def test_q8_population_coverage_complete(results):
    rows = {r.resource_type: r for r in results["q8_population_coverage"]}
    for rtype, want in (("project", 30), ("person", 18), ("institution", 6)):
        assert rows[rtype].declared_total == want
        assert rows[rtype].n_crawled == want
        assert rows[rtype].dq_value == 1.0


def test_dq_hostile_inputs_do_not_abort(spark):
    """ANSI-mode edge hardening (review r5): q2 must LIST violations, not
    die on a 4-digit-containing but non-int-castable year; q3/q4/q8 must
    yield NULL dq_value on zero denominators, not DIVIDE_BY_ZERO."""
    from pyspark.sql import functions as F

    # q2: unanchored rlike('\d{4}') passes this row; cast('int') would abort
    p = spark.createDataFrame(
        [("a", "20202023999999999", "2021"), ("b", "2022", "2020"), ("c", "2020", "2021")],
        "project_id string, funding_start_year string, funding_end_year string",
    )
    viol = dq.q2_start_le_end_violations(p).collect()
    assert [r.project_id for r in viol] == ["b"]  # 'a' skipped, not a crash

    # q3: empty projects table -> NULL coverage
    empty_p = p.filter(F.lit(False))
    docs = spark.createDataFrame([], "resource_type string, resource_id string")
    r3 = dq.q3_source_evidence_coverage(empty_p, docs).first()
    assert r3.n_projects == 0 and r3.dq_value is None

    # q4: empty relation table -> NULL consistency
    rel = spark.createDataFrame([], "project_id string, subject_area string")
    official = spark.createDataFrame([("Biology",)], "subject_area string")
    r4 = dq.q4_taxonomy_consistency(rel, official).first()
    assert r4.n_pairs == 0 and r4.dq_value is None

    # q8: a resource type whose catalog total never parsed -> NULL coverage
    span = "array<struct<kind string, text string, media_ref string, offset int>>"
    d8 = spark.createDataFrame(
        [
            # a non-first catalog page only: the index=0& filter sums to 0
            ("person", None, "https://h/x?index=5&", [("text", "out of 9 on", None, 0)]),
            ("person", "p1", "https://h/p1", []),
        ],
        f"resource_type string, resource_id string, url string, spans {span}",
    )
    r8 = dq.q8_population_coverage(d8).first()
    assert r8.declared_total == 0 and r8.n_crawled == 1 and r8.dq_value is None
