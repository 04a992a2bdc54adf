"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

This container has no image/audio libraries, so the DECODERS are stubbed
(deterministic fake features, or NotImplementedError for the real codec
path) — what is real and tested here is the Spark-side contract:

- schema: (doc_id, media_type, payload: binary, meta: struct)
- partition shape: mapInPandas over Arrow record batches (decode cost is
  per-batch amortized; payloads never round-trip through the driver)
- batch signature: Iterator[pd.DataFrame] -> Iterator[pd.DataFrame],
  output rows may fan out (frame sampling) or contract (corrupt payloads)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def real_decode(payload: bytes) -> dict:
    """The actual codec hook. Image/audio libs are not in this container —
    wire PIL/torchaudio/decord here on a real cluster."""
    raise NotImplementedError("no media codecs in this environment; use fake_decode for tests")


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in with the same output contract as real_decode."""
    h = hashlib.md5(payload or b"").digest()
    return {"width": 320 + h[0] % 16 * 40, "height": 240 + h[1] % 9 * 40, "n_frames": 1 + h[2] % 30}


def documents_as_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Treat document text as an opaque payload (fixture adapter)."""
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative id
    # would hit element_at index 0 (a runtime error) or wrap from the end
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), F.pmod(F.col(id_col), F.lit(3)).cast("int") + 1
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def extract_features(media: DataFrame, decoder=fake_decode) -> DataFrame:
    """Arrow-batched feature extraction; decode runs per batch in the
    executor python worker, never on the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "digest": [hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 10, decoder=fake_decode) -> DataFrame:
    """Row fan-out shape: one output row per sampled frame (video -> frames).
    Frame payload decode is stubbed; the batch fan-out plumbing is real."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_digest", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = decoder(payload)["n_frames"]
                for i in range(0, n, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    # digest layout payload#idx keeps the fake path oracle-
                    # checkable in plain SQL (md5(text || '#' || idx))
                    digs.append(hashlib.md5((payload or b"") + b"#" + str(i).encode()).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_digest": digs})

    return media.filter(F.col("media_type") == "video").mapInPandas(run, schema=out_schema)


def caption_align(docs: DataFrame) -> DataFrame:
    """Interleaved-document alignment: for every media span, the nearest
    PRECEDING text span in document order (the caption candidate a
    multimodal training pipeline pairs with each image/audio/video clip).
    Input: (doc_id, spans: array<struct<kind,text,media_ref,offset>>) —
    the engine's authoritative interleaved shape (BASELINE.json
    input_hint). Pure Catalyst: posexplode carries the array position so
    spans SHARING an offset order deterministically by document position
    (offset alone left the tie to Spark's unstable sort — whether a
    tied text span fell inside a media row's preceding-frame flipped
    between runs; review r5 ops #5). The alignment is one running
    last-ignorenulls window per document — no Python, no cross-document
    shuffle beyond the per-doc partition."""
    from pyspark.sql import Window

    s = docs.select("doc_id", F.posexplode("spans").alias("pos", "sp")).select(
        "doc_id",
        "pos",
        F.col("sp.kind").alias("kind"),
        F.col("sp.text").alias("text"),
        F.col("sp.media_ref").alias("media_ref"),
        F.col("sp.offset").alias("span_off"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("span_off", "pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cap = F.last(F.when(F.col("kind") == "text", F.col("text")), ignorenulls=True).over(w)
    cap_off = F.last(
        F.when(F.col("kind") == "text", F.col("span_off")), ignorenulls=True
    ).over(w)
    return (
        s.withColumn("caption", cap)
        .withColumn("caption_off", cap_off)
        .filter(F.col("kind") != "text")
        .select(
            "doc_id",
            F.col("span_off").cast("bigint").alias("span_off"),
            "media_ref",
            "caption",
            (F.col("span_off") - F.col("caption_off")).cast("bigint").alias("caption_dist"),
        )
    )


def interleave_stats(docs: DataFrame) -> DataFrame:
    """Per-document interleaving profile over the spans column: span
    counts by modality, media ratio, offset of the first media span —
    the curation signal (text-only? media-leading? media-dense?) training
    pipelines filter on. One aggregate over higher-order functions on the
    array — no explode, no shuffle beyond the final (tiny) aggregation."""
    spans = F.col("spans")
    n_spans = F.size(spans)
    n_media = F.size(F.filter(spans, lambda s: s["kind"] != "text"))
    first_media = F.array_min(
        F.transform(F.filter(spans, lambda s: s["kind"] != "text"), lambda s: s["offset"])
    )
    return docs.select(
        "doc_id",
        n_spans.cast("bigint").alias("n_spans"),
        n_media.cast("bigint").alias("n_media"),
        (n_spans - n_media).cast("bigint").alias("n_text"),
        # NULL ratio for an empty spans array (a fetched-but-content-free
        # page): 0/0 is a hard DIVIDE_BY_ZERO under ANSI mode (the Spark 4
        # default), and NULL matches the DuckDB oracle twin's division
        F.when(n_spans > 0, F.round(n_media / n_spans, 6)).alias("media_ratio"),
        first_media.cast("bigint").alias("first_media_off"),
    )
