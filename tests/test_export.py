"""Final-artifact export (plans/export.py): CSV quoting contract, nested
column dropping (reference toCsvRow), and unique-key dedup
(SqliteDBCreator unique indexes)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ba_gepris_crawler_spark.plans.export import UNIQUE_KEYS, dedup_for_export, export_tables


def _projects(spark):
    rows = [
        ("p1", "Title A", ["X", "Y"]),
        ("p1", "Title A dup", ["X"]),  # violates unique(project_id)
        ("p2", 'He said "hi"', []),
    ]
    return spark.createDataFrame(rows, "project_id string, title string, subject_areas array<string>")


def test_unique_key_dedup(spark):
    out = dedup_for_export("projects", _projects(spark))
    assert out.count() == 2
    assert out.filter(F.col("project_id") == "p1").count() == 1


def test_parquet_export_keeps_nested(spark, tmp_path):
    counts = export_tables({"projects": _projects(spark)}, str(tmp_path), fmt="parquet")
    assert counts == {"projects": 2}
    back = spark.read.parquet(str(tmp_path / "projects"))
    assert "subject_areas" in back.columns


def test_csv_export_flat_and_quoted(spark, tmp_path):
    counts = export_tables({"projects": _projects(spark)}, str(tmp_path), fmt="csv")
    assert counts == {"projects": 2}
    files = glob.glob(str(tmp_path / "projects" / "part-*.csv"))
    body = "".join(open(f).read() for f in files)
    # nested Seq-column dropped (DTOs.scala:35 toCsvRow contract)
    assert "subject_areas" not in body
    # QUOTE_ALL: every field quoted, embedded quotes escaped
    assert '"project_id","title"' in body
    assert '"He said ""hi"""' in body


def test_dedup_winner_is_deterministic(spark):
    """The kept row per unique key must not depend on partitioning or input
    order (dropDuplicates keeps an arbitrary row; the export uses a
    lexicographic-min winner instead)."""
    rows = [("p1", "B title", ["Y"]), ("p1", "A title", ["X"]), ("p2", "C", [])]
    schema = "project_id string, title string, subject_areas array<string>"
    a = dedup_for_export("projects", spark.createDataFrame(rows, schema).repartition(7))
    b = dedup_for_export("projects", spark.createDataFrame(list(reversed(rows)), schema).repartition(2))
    got_a = {(r.project_id, r.title) for r in a.collect()}
    got_b = {(r.project_id, r.title) for r in b.collect()}
    assert got_a == got_b == {("p1", "A title"), ("p2", "C")}


def test_sqlite_export(spark, tmp_path):
    """SqliteDBCreator analog: one db file, unique indexes on the
    constraint keys, dedup applied, duplicate re-inserts ignored."""
    import sqlite3

    from ba_gepris_crawler_spark.plans.export import export_sqlite

    rel = spark.createDataFrame(
        [("p1", "h1", "APPLICANT"), ("p1", "h1", "APPLICANT"), ("p1", "h2", "LEADER")],
        "project_id string, person_id string, relation_type string",
    )
    counts = export_sqlite(
        {"projects": _projects(spark), "project_person_relations": rel},
        str(tmp_path / "gepris.sqlite"),
    )
    assert counts == {"projects": 2, "project_person_relations": 2}
    con = sqlite3.connect(tmp_path / "gepris.sqlite")
    assert con.execute("SELECT count(*) FROM projects").fetchone()[0] == 2
    idx = con.execute("PRAGMA index_list('projects')").fetchall()
    assert any(row[2] == 1 for row in idx)  # a UNIQUE index exists
    cols = [r[1] for r in con.execute("PRAGMA table_info('projects')").fetchall()]
    assert cols == ["project_id", "title"]  # nested Seq-column dropped
    # the unique index actually enforces: OR IGNORE drops a re-insert
    con.execute("INSERT OR IGNORE INTO projects VALUES ('p1', 'again')")
    assert con.execute("SELECT count(*) FROM projects").fetchone()[0] == 2
    con.close()


def test_tables_without_key_pass_through(spark):
    df = spark.range(5).select(F.col("id").alias("x"))
    assert dedup_for_export("no_such_table", df).count() == 5
    assert set(UNIQUE_KEYS) >= {"projects", "persons", "institutions"}


def test_null_key_rows_stay_distinct(spark):
    """SQLite UNIQUE indexes treat NULLs as DISTINCT: rows with a NULL key
    column never collide, so the export dedup must pass every one through
    unchanged instead of collapsing them into a single groupBy group
    (review r5 engine #6 — the 'same end state as the reference's UNIQUE
    index' contract)."""
    df = spark.createDataFrame(
        [("p1", None, "A"), ("p1", None, "B"), ("p1", "x1", "A"), ("p1", "x1", "A"), ("p2", "x2", "C")],
        "project_id string, person_id string, relation_type string",
    )
    key = lambda t: tuple("" if x is None else x for x in t)  # noqa: E731
    out = [(r.project_id, r.person_id, r.relation_type)
           for r in dedup_for_export("project_person_relations", df).collect()]
    # both NULL-key rows survive; the duplicated real key collapses to one
    assert sorted(out, key=key) == sorted(
        [("p1", None, "A"), ("p1", None, "B"), ("p1", "x1", "A"), ("p2", "x2", "C")], key=key
    )
    # and a keyed table WITH payload columns keeps NULL-key rows too
    p = spark.createDataFrame(
        [(None, "t1"), (None, "t2"), ("id1", "t3"), ("id1", "t4")],
        "project_id string, title string",
    )
    got = sorted(((r.project_id, r.title) for r in dedup_for_export("projects", p).collect()), key=key)
    assert got == [(None, "t1"), (None, "t2"), ("id1", "t3")]


def test_sqlite_reexport_drops_stale_tables(spark, tmp_path):
    """A re-export into an existing db must publish EXACTLY this export's
    table set: a table present only in the previous export (renamed, or
    conditional like fetch_errors) used to survive with the prior crawl's
    rows — a stale artifact downstream consumers would silently read
    (review r5 store #8)."""
    import sqlite3

    from ba_gepris_crawler_spark.plans.export import export_sqlite

    db = str(tmp_path / "gepris.sqlite")
    rel = spark.createDataFrame(
        [("p1", "h1", "APPLICANT")],
        "project_id string, person_id string, relation_type string",
    )
    export_sqlite({"projects": _projects(spark), "project_person_relations": rel}, db)
    export_sqlite({"projects": _projects(spark)}, db)  # shrunken table set
    con = sqlite3.connect(db)
    names = {r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type = 'table'")}
    con.close()
    assert names == {"projects"}


# ---------------------------------------------------------------------------
# WARC/1.0 archive export
# ---------------------------------------------------------------------------

def _parse_warc(blob: bytes) -> list[tuple[dict, bytes]]:
    """Strict mini-reader: length-driven (seeks by Content-Length, never
    scans for boundaries), so a wrong octet count or missing CRLF breaks
    the parse loudly."""
    records, i = [], 0
    while i < len(blob):
        head_end = blob.index(b"\r\n\r\n", i)
        lines = blob[i:head_end].decode("utf-8").split("\r\n")
        assert lines[0] == "WARC/1.0", lines[0]
        headers = dict(l.split(": ", 1) for l in lines[1:])
        n = int(headers["Content-Length"])
        body = blob[head_end + 4 : head_end + 4 + n]
        assert blob[head_end + 4 + n : head_end + 4 + n + 4] == b"\r\n\r\n"
        records.append((headers, body))
        i = head_end + 4 + n + 4
    return records


def test_export_warc_roundtrip(spark, tmp_path):
    import glob
    import json as _json

    from ba_gepris_crawler_spark.plans.export import export_warc

    mk = lambda k, t: [{"kind": k, "text": t, "media_ref": "", "offset": 0}]
    rows = [
        ("u1", "https://h0/x/1", 0, 200, mk("title", "Straßen-Ökologie")),  # non-ASCII
        ("u2", "https://h0/x/2", 0, 200, mk("title", "plain")),
        ("u2", "https://h0/x/2", 3, 200, mk("title", "recrawled")),  # distinct record id
        ("u3", "https://h0/x/3", 0, 503, None),  # quarantined: not a capture
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, url string, round int, status int, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = str(tmp_path / "warc")
    n = export_warc(docs, out, date_iso="2026-01-02T03:04:05Z")
    assert n == 3

    blob = b"".join(
        open(p, "rb").read() for p in sorted(glob.glob(f"{out}/part-*"))
    )
    recs = _parse_warc(blob)
    assert len(recs) == 3
    ids = set()
    by_uri: dict[str, list[bytes]] = {}
    for headers, body in recs:
        # `resource`, not `response`: the block is extracted content, not
        # an application/http protocol message (ISO 28500 §6.5 vs §6.3)
        assert headers["WARC-Type"] == "resource"
        assert headers["WARC-Date"] == "2026-01-02T03:04:05Z"
        assert headers["Content-Type"] == "application/json"
        assert headers["WARC-Record-ID"].startswith("<urn:uuid:")
        ids.add(headers["WARC-Record-ID"])
        by_uri.setdefault(headers["WARC-Target-URI"], []).append(body)
        # Content-Length drove the parse; the body must also BE the page
        spans = _json.loads(body.decode("utf-8"))["spans"]
        assert spans and spans[0]["kind"] == "title"
    assert len(ids) == 3  # (url, round) makes the recrawled capture distinct
    assert len(by_uri["https://h0/x/2"]) == 2
    assert "Straßen-Ökologie" in by_uri["https://h0/x/1"][0].decode("utf-8")

    # deterministic: a re-export is byte-identical
    export_warc(docs, out, date_iso="2026-01-02T03:04:05Z")
    blob2 = b"".join(
        open(p, "rb").read() for p in sorted(glob.glob(f"{out}/part-*"))
    )
    assert sorted(blob.split(b"WARC/1.0")) == sorted(blob2.split(b"WARC/1.0"))


def test_warc_source_roundtrips_sink(spark, tmp_path):
    """sources/warc.read_warc is the sink's inverse: export the documents
    table, read the archive back, get the same (doc_id, url, host, round,
    status, spans) rows — the source/sink symmetry that lets an archived
    corpus re-enter the analysis pipelines."""
    from ba_gepris_crawler_spark.plans.export import export_warc
    from ba_gepris_crawler_spark.sources.warc import read_warc

    mk = lambda t: [{"kind": "title", "text": t, "media_ref": "", "offset": 0},
                    {"kind": "text", "text": t + " körper", "media_ref": None, "offset": 1}]
    rows = [
        ("doc/1", "https://h0.example.org/x/1", 0, 200, mk("eins")),
        ("doc/2", "https://h1.example.org/x/2", 3, 200, mk("zwei")),
        ("doc/2", "https://h1.example.org/x/2", 7, 200, mk("zwei v2")),  # recrawl capture
        ("doc/3", "https://h0.example.org/x/3", 0, 503, None),  # not archived
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, url string, round int, status int, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = str(tmp_path / "rt")
    assert export_warc(docs, out, date_iso="2026-01-02T03:04:05Z") == 3

    back = read_warc(spark, f"{out}/part-*")
    got = sorted(
        (r["doc_id"], r["url"], r["host"], r["round"], r["status"],
         tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]))
        for r in back.collect()
    )
    # media_ref None vs '' conflate across the json wire (documented wire
    # behavior everywhere in the engine); normalize for comparison
    want = sorted(
        (d, u, u.split("/")[2], rnd, st,
         tuple((s["kind"], s["text"], s["media_ref"] or "", s["offset"]) for s in spans))
        for d, u, rnd, st, spans in rows if st == 200
    )
    got = [(d, u, h, rnd, st, tuple((k, t, m or "", o) for k, t, m, o in sp))
           for d, u, h, rnd, st, sp in got]
    assert got == want

    # a foreign record without the engine's extension headers still ingests
    foreign = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:0>\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: https://f.example.org/page\r\n"
        b"Content-Type: text/plain\r\nContent-Length: 9\r\n\r\nnot spans\r\n\r\n"
    )
    fdir = tmp_path / "foreign"; fdir.mkdir()
    (fdir / "part-0000").write_bytes(foreign)
    f = read_warc(spark, str(fdir / "part-*"), include_body=True).collect()[0]
    assert f["url"] == "https://f.example.org/page" and f["round"] is None
    assert f["doc_id"] == f["url"] and f["spans"] is None and f["body"] == "not spans"
