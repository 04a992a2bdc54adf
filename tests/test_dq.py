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
