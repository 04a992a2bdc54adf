"""Extraction kernel vs the straight-line golden oracle.

Every assertion here pins a reference quirk (citations in testing/golden.py).
"""

from __future__ import annotations

import pytest

from ba_gepris_crawler_spark.functions import extraction as X
from ba_gepris_crawler_spark.sources.synthetic_site import (
    RESOURCE_TYPES,
    SiteConfig,
    detail_url,
    render_page,
)
from ba_gepris_crawler_spark.testing import golden
from ba_gepris_crawler_spark.testing.fixtures import site_documents_df


@pytest.fixture(scope="module")
def docs(spark, cfg):
    return X.with_fields(site_documents_df(spark, cfg)).cache()


def _golden_pages(cfg: SiteConfig, rtype: str):
    for rid in cfg.ids(rtype):
        _, spans = render_page(cfg, detail_url(cfg, rtype, rid))
        yield rid, spans


def test_eav_matches_golden(docs, cfg):
    got = {
        (r.resource_type, r.resource_id, r.ord): (r.field_name, r.field_value)
        for r in X.eav(docs).collect()
    }
    want = {}
    for rtype in RESOURCE_TYPES:
        for rid, spans in _golden_pages(cfg, rtype):
            for name, value, ord_ in golden.generic_fields(spans):
                want[(rtype, rid, ord_)] = (name, value)
    assert got == want
    assert len(got) > 200


def test_projects_match_golden(docs, cfg):
    got = {r["project_id"]: r.asDict() for r in X.projects(docs).collect()}
    for rid, spans in _golden_pages(cfg, "project"):
        g = golden.extract_project(rid, spans)
        e = got[rid]
        for k in (
            "title",
            "project_description",
            "dfg_programme",
            "funding_start_year",
            "funding_end_year",
            "parent_project_id",
        ):
            assert e[k] == g[k], (rid, k, e[k], g[k])
        # arrays: F1 distinct-across-labels order is label-major in the
        # reference; compare as ordered lists (engine preserves it too).
        assert e["subject_areas"] == g["subject_areas"], rid
        assert e["participating_subject_areas"] == g["participating_subject_areas"]
        assert e["international_connections"] == g["international_connections"]
        # relations: multiset equality (row order is meaningless in tables)
        assert sorted((x["related_id"], x["relation_type"]) for x in e["person_relations"]) == sorted(
            g["person_relations"]
        ), rid
        assert sorted((x["related_id"], x["relation_type"]) for x in e["institution_relations"]) == sorted(
            g["institution_relations"]
        ), rid


def test_persons_match_golden(docs, cfg):
    got = {r["person_id"]: r.asDict() for r in X.persons(docs).collect()}
    assert len(got) == cfg.n_persons
    for rid, spans in _golden_pages(cfg, "person"):
        g = golden.extract_person(rid, spans)
        e = got[rid]
        assert e == g, rid
        assert "@" in e["email"]  # de-obfuscation really happened
        assert "<img" not in e["email"]


def test_institutions_match_golden(docs, cfg):
    got = {r["institution_id"]: r.asDict() for r in X.institutions(docs).collect()}
    assert len(got) == cfg.n_institutions
    for rid, spans in _golden_pages(cfg, "institution"):
        g = golden.extract_institution(rid, spans)
        e = dict(got[rid])
        e["project_ids_on_page"] = list(e["project_ids_on_page"])
        assert e == g, rid


def test_comma_trap_reproduced(docs):
    """The reference's ', '-split mangles the comma-containing subject area
    (dataquality-checks.Rmd:258-272) — we must be bug-for-bug lossy."""
    rels = X.relation_tables(X.projects(docs))["project_ids_to_subject_areas"]
    areas = {r.subject_area for r in rels.collect()}
    assert "Hydrogeology" in areas  # split fragment, not the full name
    assert not any("Hydrogeology," in a for a in areas)


def test_funding_cascade_pinned(spark):
    """F2 first-match-wins over the five Term variants + garbage + the
    deliberate start>end bad row (ExtractorHelpers.scala:25-38)."""
    cases = [
        ("Funded from 2003 to 2008", ("2003", "2008")),
        ("Funded since 2019", ("2019", "")),
        ("Funded in 2015", ("2015", "2015")),
        ("Funded until 2012", ("", "2012")),
        ("Currently being funded", ("ongoing", "ongoing")),
        ("Funding period unclear", ("", "")),
        ("Funded from 2013 to 2012", ("2013", "2012")),  # bad row kept as-is
    ]
    rows = [
        (str(i), [("name", "Term", "", 0), ("value", txt, "", 1)])
        for i, (txt, _) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "resource_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    start, end = X.funding_range_cols()
    got = {
        r.resource_id: (r.s, r.e)
        for r in X.with_fields(df).select("resource_id", start.alias("s"), end.alias("e")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[str(i)] == want, cases[i]


def test_catalog_total_with_commas(spark):
    """F9: 'out of ([\\d,]*) on' with thousands separators
    (NumberOfResourcesGraph.scala:38-44)."""
    rows = [("c1", [("text", "Results 1 to 50 out of 116,261 on 2018-10-20", "", 0)])]
    df = spark.createDataFrame(rows, "resource_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    got = X.catalog_totals(X.with_fields(df)).select("total").first()[0]
    assert got == 116261


def test_extraction_plan_has_no_shuffle(docs):
    """Scale guard: the typed-extraction plan must be shuffle-free (no
    Exchange) and Python-free (no BatchEvalPython/ArrowEvalPython)."""
    plan = X.projects(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
