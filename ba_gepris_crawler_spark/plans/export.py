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
    key = UNIQUE_KEYS.get(name)
    return df.dropDuplicates(key) if key else df


def export_tables(
    tables: dict[str, DataFrame], out_dir: str, fmt: str = "parquet"
) -> dict[str, int]:
    """Write every published table under <out_dir>/<name>; returns row
    counts. CSV mode drops nested columns (reference toCsvRow contract) and
    quotes every value (QUOTE_NONNUMERIC analog)."""
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
