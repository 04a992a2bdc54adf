"""Golden oracle: straight-line Python port of the reference extraction
SEMANTICS over span documents. Test-only ground truth — the engine never
imports this module; pytest compares engine output (native Spark
expressions) against it.

Semantics pinned from the reference (citations into /root/reference/):
- F1 extractMultivaluesByFieldNames: helpers/ExtractorHelpers.scala:8-17
  (split '<br>' then ', ', trim, drop empties, distinct ACROSS labels —
  including the lossy comma-split, dataquality-checks.Rmd:258-272)
- F2 extractFundingDateRange: ExtractorHelpers.scala:20-41 (5 ordered
  regexes, first-match-wins)
- F3 extractResourceIdsFromLinkByResourceTypeAndRegex:
  ExtractorHelpers.scala:44-71 (anchored ^\\s*label\\s*$ full-match,
  next-sibling links, /gepris/<urltype>/(\\d*) id extraction, label-major
  then document order, duplicates preserved)
- F4 generic field pairing: stage2/GenericFieldExtractorGraph.scala:73-83
  (every .name text -> sibling html; Projektbeschreibung tab appended last)
- F5 e-mail de-obfuscation: split on '<img[^<]*>' re-joined with '@'
  (stage2/extractpersons/personextractor/PersonExtractorGraph.scala:46-51)
- F6 address assembly: PersonExtractorGraph.scala:17-27 (head segment =
  institution name), institution variant without head split
  (InstitutionExtractorGraph.scala:27-32)
- F8 institution->project links: InstitutionExtractorGraph.scala:47-57

Span-model conventions (documented in FIXTURES.md §1): a field is a 'name'
(or 'tab_label') span followed by its content spans up to the next label
span. A field's HTML rendering folds content spans in document order:
value -> text, img -> '<img src="{media_ref}">',
link -> '<a href="{media_ref}">{text}</a>'.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

Span = tuple[str, str, str, int]  # (kind, text, media_ref, offset)

LABEL_KINDS = {"name", "tab_label"}


@dataclass
class Field:
    name: str
    kind: str  # 'name' | 'tab_label'
    spans: list[Span]
    offset: int  # offset of the label span


def field_groups(spans: list[Span]) -> list[Field]:
    groups: list[Field] = []
    cur: Field | None = None
    for sp in sorted(spans, key=lambda s: s[3]):
        kind = sp[0]
        if kind in LABEL_KINDS:
            cur = Field(sp[1], kind, [], sp[3])
            groups.append(cur)
        elif cur is not None:
            cur.spans.append(sp)
    return groups


def render_html(spans: list[Span]) -> str:
    out = []
    for kind, text, media_ref, _ in spans:
        if kind == "img":
            out.append(f'<img src="{media_ref}">')
        elif kind == "link":
            out.append(f'<a href="{media_ref}">{text}</a>')
        else:
            out.append(text or "")
    return "".join(out)


def render_text(spans: list[Span]) -> str:
    """jsoup .text() analog: visible text only (imgs contribute nothing)."""
    return "".join(text or "" for kind, text, _, _ in spans if kind != "img")


def generic_fields(spans: list[Span]) -> list[tuple[str, str, int]]:
    """F4 EAV: (field_name, field_value_html, ord). The tab pair arrives
    last because the generator places it last (matching the reference's
    append-last quirk); ord is the per-document field sequence."""
    return [(g.name, render_html(g.spans), i) for i, g in enumerate(field_groups(spans))]


def _label_find(label: str, name: str) -> bool:
    # jsoup :matches() = Matcher.find on element text (substring regex).
    return re.search(label, name) is not None


def multivalues(spans: list[Span], labels: list[str]) -> list[str]:
    """F1: split html on '<br>' then ', ', trim, drop empties, distinct
    across all labels preserving first occurrence."""
    vals: list[str] = []
    for label in labels:
        for g in field_groups(spans):
            if g.kind == "name" and _label_find(label, g.name):
                html = render_html(g.spans)
                for part in html.split("<br>"):
                    for v in part.split(", "):
                        v = v.strip()
                        if v:
                            vals.append(v)
    out: list[str] = []
    for v in vals:
        if v not in out:
            out.append(v)
    return out


_FROM_TO = re.compile(r"^.*from ([0-9]+) to ([0-9]+).*$", re.DOTALL)
_SINCE = re.compile(r"^.*since ([0-9]+).*$", re.DOTALL)
_FUNDED_IN = re.compile(r"^.*Funded in ([0-9]+).*$", re.DOTALL)
_UNTIL = re.compile(r"^.*until ([0-9]+).*$", re.DOTALL)
_ONGOING = re.compile(r"^.*Currently being funded.*$", re.DOTALL)


def funding_range(spans: list[Span]) -> tuple[str, str]:
    """F2: first-match-wins cascade over the Term field's text."""
    text = ""
    for g in field_groups(spans):
        if g.kind == "name" and _label_find("Term", g.name):
            text = render_text(g.spans)
            break
    m = _FROM_TO.match(text)
    if m:
        return m.group(1), m.group(2)
    m = _SINCE.match(text)
    if m:
        return m.group(1), ""
    m = _FUNDED_IN.match(text)
    if m:
        return m.group(1), m.group(1)
    m = _UNTIL.match(text)
    if m:
        return "", m.group(1)
    if _ONGOING.match(text):
        return "ongoing", "ongoing"
    return "", ""


def link_ids(spans: list[Span], urltype: str, labels: list[str]) -> list[str]:
    """F3: anchored full-match labels -> link hrefs in the field group ->
    ids via /gepris/<urltype>/(\\d*); label-major order, dups preserved."""
    id_re = re.compile(rf"\/gepris\/{urltype}/(\d*)$")
    out: list[str] = []
    for label in labels:
        anchored = re.compile(rf"^\s*{label}\s*$")
        for g in field_groups(spans):
            if g.kind == "name" and anchored.match(g.name):
                for kind, _, media_ref, _ in g.spans:
                    if kind == "link":
                        m = id_re.match(media_ref)
                        if m and m.group(1):
                            out.append(m.group(1))
    return out


def person_relations(spans: list[Span]) -> list[tuple[str, str]]:
    from ba_gepris_crawler_spark.sources.synthetic_site import PERSON_RELATION_TYPES

    rels: list[tuple[str, str]] = []
    for rel_type, variants in PERSON_RELATION_TYPES:
        for pid in link_ids(spans, "person", variants):
            rels.append((pid, rel_type))
    return rels


def institution_relations(spans: list[Span]) -> list[tuple[str, str]]:
    from ba_gepris_crawler_spark.sources.synthetic_site import INSTITUTION_RELATION_TYPES

    rels: list[tuple[str, str]] = []
    for rel_type, variants in INSTITUTION_RELATION_TYPES:
        for iid in link_ids(spans, "institution", variants):
            rels.append((iid, rel_type))
    return rels


def _h3(spans: list[Span]) -> str:
    for kind, text, _, _ in sorted(spans, key=lambda s: s[3]):
        if kind == "h3":
            return text
    return ""


def _field_html(spans: list[Span], label: str) -> str:
    for g in field_groups(spans):
        if g.kind == "name" and _label_find(label, g.name):
            return render_html(g.spans)
    return ""


def _field_text(spans: list[Span], label: str) -> str:
    for g in field_groups(spans):
        if g.kind == "name" and _label_find(label, g.name):
            return render_text(g.spans)
    return ""


_IMG_SPLIT = re.compile(r"<img[^<]*>")


def deobfuscate_email(html: str) -> str:
    # Scala String.split drops trailing empties; generator never emits a
    # trailing img, so plain substitution is equivalent.
    return _IMG_SPLIT.sub("@", html) if html else ""


def extract_project(rid: str, spans: list[Span]) -> dict:
    start, end = funding_range(spans)
    return {
        "project_id": rid,
        "title": _h3(spans),
        "project_description": _field_text_tab(spans),
        "dfg_programme": _field_text(spans, "DFG Programme"),
        "funding_start_year": start,
        "funding_end_year": end,
        "parent_project_id": (link_ids(spans, "projekt", ["Subproject of"]) or [""])[0],
        "subject_areas": multivalues(spans, ["Subject Area"]),
        "participating_subject_areas": multivalues(spans, ["Participating subject areas"]),
        "international_connections": multivalues(spans, ["International Connection"]),
        "person_relations": person_relations(spans),
        "institution_relations": institution_relations(spans),
    }


def _field_text_tab(spans: list[Span]) -> str:
    for g in field_groups(spans):
        if g.kind == "tab_label":
            return render_text(g.spans)
    return ""


def extract_person(rid: str, spans: list[Span]) -> dict:
    addr_segments = [s.strip() for s in _field_html(spans, "Address").split("<br>")]
    return {
        "person_id": rid,
        "name": _h3(spans),
        "institution_name": addr_segments[0] if addr_segments else "",
        "address": "\n".join(addr_segments),
        "phone": _field_text(spans, "Telephone"),
        "fax": _field_text(spans, "Fax"),
        "email": deobfuscate_email(_field_html(spans, "E-Mail")),
        "internet": _field_text(spans, "Website"),
    }


def extract_institution(rid: str, spans: list[Span]) -> dict:
    addr_segments = [s.strip() for s in _field_html(spans, "Address").split("<br>")]
    proj_re = re.compile(r"\/gepris\/projekt/(\d*)$")
    proj_ids = []
    for kind, _, media_ref, _ in sorted(spans, key=lambda s: s[3]):
        if kind == "link" and media_ref.startswith("/gepris/projekt"):
            m = proj_re.match(media_ref)
            if m and m.group(1):
                proj_ids.append(m.group(1))
    return {
        "institution_id": rid,
        "name": _h3(spans),
        "address": "\n".join(addr_segments),
        "phone": _field_text(spans, "Telephone"),
        "fax": _field_text(spans, "Fax"),
        "email": deobfuscate_email(_field_html(spans, "E-Mail")),
        "internet": _field_text(spans, "Website"),
        "project_ids_on_page": proj_ids,
    }


_COUNT_RE = re.compile(r".*out of ([\d,]*) on.*", re.DOTALL)


def catalog_total(spans: list[Span]) -> int | None:
    """F9 count parse (NumberOfResourcesGraph.scala:38-44)."""
    for kind, text, _, _ in sorted(spans, key=lambda s: s[3]):
        if kind == "text":
            m = _COUNT_RE.match(text)
            if m:
                return int(m.group(1).replace(",", ""))
    return None
