"""WARC source: re-ingest an archived corpus as documents-shaped rows.

The sink twin of plans/export.export_warc (and its strict inverse for
archives that sink wrote): length-driven record parsing — seek by
Content-Length, never scan for boundaries, so a corrupt octet count
fails loudly per file instead of silently splitting records. Reading is
distributed per WARC file (`binaryFile` source; one task per file, and
the writer emits one partition-sized file per task, so the shapes
match); the Python boundary extracts (headers, body) only, and the span
payload is parsed JVM-side via from_json — the same split as the fetch
stage's json transport. Bound: `binaryFile` materializes one file per
row, so a single FOREIGN archive file must fit a byte array (< 2 GiB —
engine-written archives are partition-sized by construction); split
oversized foreign archives at record boundaries first.

Foreign WARCs: any `resource`/`response` record with a Target-URI is
ingested; records whose block is not the engine's span JSON get a NULL
spans column (callers can still run text analysis over the raw block via
the `body` they can keep with include_body=True). The engine's own
extension headers (X-Crawl-Round, X-Doc-ID) reconstruct round/doc_id
losslessly; absent, round is NULL and doc_id falls back to the record's
Target-URI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ba_gepris_crawler_spark.schema import SPANS_TYPE

_RAW_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("round", T.IntegerType(), True),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("warc_date", T.StringType(), True),
    T.StructField("body", T.StringType(), True),
])


def parse_warc_bytes(blob: bytes) -> list[tuple[dict, bytes]]:
    """One WARC file's bytes -> [(headers, block)]. Length-driven (ISO
    28500 §4: block length is EXACTLY Content-Length, records end with
    CRLF CRLF); raises ValueError on malformed framing."""
    records, i = [], 0
    n = len(blob)
    while i < n:
        head_end = blob.find(b"\r\n\r\n", i)
        if head_end < 0:
            if blob[i:].strip() == b"":
                break  # trailing padding
            raise ValueError(f"unterminated record header at byte {i}")
        lines = blob[i:head_end].decode("utf-8", errors="replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {i}: {lines[0][:40]!r}")
        headers = {}
        for line in lines[1:]:
            k, sep, v = line.partition(": ")
            if sep:
                headers[k] = v
        length = int(headers["Content-Length"])
        block = blob[head_end + 4 : head_end + 4 + length]
        if blob[head_end + 4 + length : head_end + 4 + length + 4] != b"\r\n\r\n":
            raise ValueError(f"missing record terminator at byte {head_end + 4 + length}")
        records.append((headers, block))
        i = head_end + 4 + length + 4
    return records


def read_warc(spark: SparkSession, path: str, include_body: bool = False) -> DataFrame:
    """WARC dir/glob -> documents-shaped rows: (doc_id, url, host, round,
    status, spans[, body]). status is 200 by construction — WARC archives
    captures, and the engine's sink only archives successful pages."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "url", "round", "warc_type", "warc_date", "body")}
            for content in pdf["content"]:
                for headers, block in parse_warc_bytes(bytes(content)):
                    wt = headers.get("WARC-Type", "")
                    uri = headers.get("WARC-Target-URI")
                    if wt not in ("resource", "response") or uri is None:
                        continue  # warcinfo/metadata/request records
                    rnd = headers.get("X-Crawl-Round")
                    out["doc_id"].append(headers.get("X-Doc-ID", uri))
                    out["url"].append(uri)
                    out["round"].append(int(rnd) if rnd is not None else None)
                    out["warc_type"].append(wt)
                    out["warc_date"].append(headers.get("WARC-Date"))
                    out["body"].append(block.decode("utf-8", errors="replace"))
            yield pd.DataFrame(out, columns=[f.name for f in _RAW_SCHEMA.fields])

    raw = files.select("content").mapInPandas(kernel, schema=_RAW_SCHEMA)
    body_schema = T.StructType([T.StructField("spans", SPANS_TYPE, True)])
    out = raw.select(
        "doc_id",
        "url",
        F.expr("try_parse_url(url, 'HOST')").alias("host"),  # NULL, not ANSI error, on junk URIs
        F.col("round"),
        F.lit(200).cast("int").alias("status"),
        F.from_json(F.col("body"), body_schema).getField("spans").alias("spans"),
        *(["body"] if include_body else []),
    )
    return out
