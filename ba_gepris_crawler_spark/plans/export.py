"""Final-artifact export (stage-3 analog).

The reference packs stage CSVs + count files into `final/`
(stage3/CreateFinalArtefacts.scala:22-62) and batch-inserts 9 relational
tables into SQLite with dedup + unique indexes
(stage3/sqliteexport/SqliteAccess.scala:11-156, SqliteDBCreator.scala:29-200).

Here the published tables are exported per snapshot-store state:

- parquet (default): full fidelity, nested columns kept.
- csv: the reference's interchange contract — QUOTE-ALL quoting
  (CrawlerHelpers.scala:50-65), nested Seq-columns DROPPED from the
  primary tables exactly like `Project.toCsvRow` (DTOs.scala:35) — the
  nested data lives in the exploded relation tables instead (§2.6).

The SQLite uniqueness constraints become deterministic dropDuplicates on
the constraint keys (SqliteDBCreator.scala:163-191) — same end state, but
distributed and idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (table, unique key) per SqliteDBCreator.scala:163-200; tables without an
# entry are exported as-is.
UNIQUE_KEYS: dict[str, list[str]] = {
    "projects": ["project_id"],
    "persons": ["person_id"],
    "institutions": ["institution_id"],
    "project_person_relations": ["project_id", "person_id", "relation_type"],
    "project_institution_relations": ["project_id", "institution_id", "relation_type"],
    "project_ids_to_subject_areas": ["project_id", "subject_area"],
    "project_ids_to_participating_subject_areas": ["project_id", "participating_subject_area"],
    "projects_international_connections": ["project_id", "country"],
}


def _flat_columns(df: DataFrame) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def dedup_for_export(name: str, df: DataFrame) -> DataFrame:
    """Deterministic winner per unique key: the lexicographic min over the
    remaining columns (dropDuplicates keeps an ARBITRARY row per key, so a
    re-crawled page could flip the export between runs; the reference's
    SQLite unique index keeps the first INSERT, which is crawl-order
    stable — this is the distributed equivalent of 'stable winner')."""
    key = UNIQUE_KEYS.get(name)
    if not key:
        return df
    # SQLite UNIQUE indexes treat NULLs as DISTINCT: a NULL-key row never
    # collides, so the reference keeps every one. groupBy would collapse
    # them into a single group — split them out and pass them through
    # unchanged so the 'same end state' contract holds for malformed rows.
    null_key = F.lit(False)
    for c in key:
        null_key = null_key | F.col(c).isNull()
    keyed, nullkeyed = df.filter(~null_key), df.filter(null_key)
    others = sorted(c for c in df.columns if c not in key)
    if not others:
        return keyed.dropDuplicates(key).unionByName(nullkeyed)
    win = keyed.groupBy(*key).agg(F.min(F.struct(*[F.col(c) for c in others])).alias("_w"))
    deduped = win.select(*key, *[F.col(f"_w.{c}").alias(c) for c in others]).select(*df.columns)
    return deduped.unionByName(nullkeyed.select(*df.columns))


_SQLITE_AFFINITY = {
    "tinyint": "INTEGER", "smallint": "INTEGER", "int": "INTEGER",
    "bigint": "INTEGER", "boolean": "INTEGER",
    "float": "REAL", "double": "REAL",
}


def export_sqlite(tables: dict[str, DataFrame], db_path: str, batch_size: int = 5000) -> dict[str, int]:
    """The reference's one true final artifact (SqliteDBCreator.scala:29-200
    / SqliteAccess.scala:11-156): one SQLite file, one table per published
    table with a UNIQUE index on the reference's constraint keys, rows
    batch-inserted with INSERT OR IGNORE. Nested Seq-columns are dropped
    (toCsvRow contract; they live in the exploded relation tables). Rows
    stream through toLocalIterator in batches — driver memory stays
    O(batch), and the FINAL exports are small by construction (typed rows,
    no spans). Rows are pre-deduped with the deterministic export winner,
    so OR IGNORE is a belt-and-braces constraint, not the dedup mechanism."""
    import sqlite3

    con = sqlite3.connect(db_path)
    counts: dict[str, int] = {}
    try:
        # one export == exactly this table set: a re-export into an
        # existing db must not leave STALE tables from a previous export
        # behind (e.g. fetch_errors exists only when url_seen is present —
        # a consumer querying the leftover would read the prior crawl's
        # rows). Dropping only what we rewrite missed that case.
        existing = [
            r[0] for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type = 'table'"
            )
        ]
        for stale in set(existing) - set(tables):
            con.execute(f'DROP TABLE IF EXISTS "{stale}"')
        for name, df in tables.items():
            out = dedup_for_export(name, df)
            flat = _flat_columns(out)
            out = out.select(*flat)
            ddl_cols = ", ".join(
                f'"{f.name}" {_SQLITE_AFFINITY.get(f.dataType.simpleString(), "TEXT")}'
                for f in out.schema.fields
            )
            con.execute(f'DROP TABLE IF EXISTS "{name}"')
            con.execute(f'CREATE TABLE "{name}" ({ddl_cols})')
            key = UNIQUE_KEYS.get(name)
            if key:
                key_cols = ", ".join(f'"{k}"' for k in key)
                con.execute(
                    f'CREATE UNIQUE INDEX "ux_{name}" ON "{name}" ({key_cols})'
                )
            placeholders = ", ".join("?" for _ in flat)
            ins = f'INSERT OR IGNORE INTO "{name}" VALUES ({placeholders})'
            batch: list[tuple] = []
            n = 0
            for row in out.toLocalIterator():
                batch.append(tuple(None if v is None else v if isinstance(v, (int, float, str, bytes)) else str(v) for v in row))
                if len(batch) >= batch_size:
                    con.executemany(ins, batch)
                    n += len(batch)
                    batch = []
            if batch:
                con.executemany(ins, batch)
                n += len(batch)
            con.commit()
            counts[name] = con.execute(f'SELECT count(*) FROM "{name}"').fetchone()[0]
    finally:
        con.close()
    return counts


def export_tables(
    tables: dict[str, DataFrame], out_dir: str, fmt: str = "parquet"
) -> dict[str, int]:
    """Write every published table under <out_dir>/<name>; returns row
    counts. CSV mode drops nested columns (reference toCsvRow contract) and
    quotes every value (QUOTE_NONNUMERIC analog). sqlite mode writes ONE
    <out_dir>/gepris.sqlite file via export_sqlite."""
    if fmt == "sqlite":
        import os

        os.makedirs(out_dir, exist_ok=True)
        return export_sqlite(tables, f"{out_dir}/gepris.sqlite")
    counts: dict[str, int] = {}
    for name, df in tables.items():
        out = dedup_for_export(name, df)
        path = f"{out_dir}/{name}"
        obs = Observation(f"export-{name}")
        out = out.observe(obs, F.count(F.lit(1)).alias("n"))
        if fmt == "csv":
            out = out.select(*_flat_columns(out))
            (
                out.write.mode("overwrite")
                .option("header", True)
                .option("quoteAll", True)
                # RFC-4180 quote doubling (Spark defaults to backslash
                # escaping, which Python csv / the reference writer doesn't)
                .option("escape", '"')
                .csv(path)
            )
        else:
            out.write.mode("overwrite").parquet(path)
        counts[name] = int(obs.get["n"])
    return counts


def export_warc(
    documents: DataFrame,
    out_dir: str,
    date_iso: str,
    software: str = "ba-gepris-crawler-spark",
) -> int:
    """Archive the crawled corpus as WARC/1.0 `resource` records (ISO
    28500 — the interchange format every crawl consumer reads; NOT
    `response`, which must carry a full protocol message
    (application/http) — our block is the extracted span payload, and
    `resource` is the record type the spec assigns to captured content
    without its protocol envelope), entirely
    in the plan: record assembly is Catalyst string concat, Content-Length
    is `octet_length` of the UTF-8 block (NOT character length — a German
    title would corrupt the offset math otherwise), WARC-Record-ID is a
    deterministic UUID-shaped digest of (url, round) so re-exports are
    byte-identical, and the writer emits one valid WARC file per
    partition (records are self-delimiting, so per-partition files
    concatenate into one archive). The record block is the page's span
    payload as the canonical JSON body the wire formats already use;
    quarantined rows carry no body and are not captures, so only 200s
    (and their metadata) are archived. No warcinfo record: it is optional
    per spec and would make per-partition files non-identical.

    Returns the record count. The caller supplies the mandatory
    WARC-Date (the CLI uses the store's commit timestamp, keeping exports
    a pure function of store state)."""
    crlf = "\r\n"
    body = F.to_json(F.struct(F.col("spans").alias("spans")))
    digest = F.md5(F.concat_ws("#", F.col("url"), F.col("round").cast("string")))
    rec_id = F.concat(
        F.lit("<urn:uuid:"),
        F.substring(digest, 1, 8), F.lit("-"),
        F.substring(digest, 9, 4), F.lit("-"),
        F.substring(digest, 13, 4), F.lit("-"),
        F.substring(digest, 17, 4), F.lit("-"),
        F.substring(digest, 21, 12),
        F.lit(">"),
    )
    record = F.concat_ws(
        crlf,
        F.lit("WARC/1.0"),
        F.lit("WARC-Type: resource"),
        F.concat(F.lit("WARC-Record-ID: "), rec_id),
        F.lit(f"WARC-Date: {date_iso}"),
        F.concat(F.lit("WARC-Target-URI: "), F.col("url")),
        F.lit(f"X-Crawler-Software: {software}"),  # extension fields (§4, grammar allows)
        # round + doc id ride extension headers so sources/warc.read_warc
        # reconstructs the documents shape losslessly (readers that don't
        # know them skip them, per spec)
        F.concat(F.lit("X-Crawl-Round: "), F.col("round").cast("string")),
        F.concat(F.lit("X-Doc-ID: "), F.col("doc_id")),
        F.lit("Content-Type: application/json"),
        F.concat(F.lit("Content-Length: "), F.octet_length(body).cast("string")),
        F.lit(""),
        # block + ONE of the two record-terminating CRLFs; the text
        # writer's lineSep supplies the second, so the bytes on disk are
        # exactly block + CRLF CRLF (ISO 28500 §4)
        F.concat(body, F.lit(crlf)),
    )
    out = documents.filter(F.col("status") == 200).select(record.alias("value"))
    obs = Observation("warc-export")
    out = out.observe(obs, F.count(F.lit(1)).alias("n"))
    out.write.mode("overwrite").option("lineSep", crlf).text(out_dir)
    return int(obs.get["n"])
