"""Multimodal driver queries: binary metadata, feature extraction, frame sampling, caption alignment.

Split out of plans/driver_queries.py (round 5); query bodies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.plans.queries._base import (
    _q,
    _t,
)

# --------------------------------------------------------------------------
# mm_* — multimodal metadata plumbing (binary columns + typed metadata)
# --------------------------------------------------------------------------

@_q(
    "mm_binary_meta",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST((doc_id % 16) * 40 + 320 AS BIGINT) AS fake_width,
           CAST((doc_id % 9) * 40 + 240 AS BIGINT) AS fake_height,
           CAST(n_chars % 30 + 1 AS BIGINT) AS fake_n_frames
    FROM documents ORDER BY doc_id
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata over an opaque payload: byte length + digest +
    deterministic fake decode features (the real decoder is stubbed in
    operators/multimodal.py — no image/audio libs in this container; the
    Spark-side plumbing is what is under test)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5("text").alias("digest"),
        ((F.col("doc_id") % 16) * 40 + 320).cast("bigint").alias("fake_width"),
        ((F.col("doc_id") % 9) * 40 + 240).cast("bigint").alias("fake_height"),
        (F.col("n_chars") % 30 + 1).cast("bigint").alias("fake_n_frames"),
    ).orderBy("doc_id")


@_q(
    "mm_extract_features",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST(320 + (('0x' || substr(md5(text), 1, 2))::INT % 16) * 40 AS INT) AS width,
           CAST(240 + (('0x' || substr(md5(text), 3, 2))::INT % 9) * 40 AS INT) AS height,
           CAST(1 + (('0x' || substr(md5(text), 5, 2))::INT % 30) AS INT) AS n_frames
    FROM documents ORDER BY doc_id
    """,
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction through the REAL module path
    (operators/multimodal.py): binary payload column -> Arrow-batched
    mapInPandas decode (fake_decode stands in for codecs; same output
    contract). The oracle reproduces fake_decode's md5-derived features."""
    from ba_gepris_crawler_spark.operators.multimodal import documents_as_media, extract_features

    media = documents_as_media(_t(spark, sf_dir, "documents"))
    return extract_features(media).orderBy("doc_id")


@_q(
    "mm_frame_sample",
    """
    WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
    f AS (SELECT doc_id, text,
                 1 + (('0x' || substr(md5(text), 5, 2))::INT % 30) AS n_frames
          FROM v)
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(text || '#' || CAST(i AS VARCHAR)) AS frame_digest
    FROM f, unnest(range(0, n_frames, 10)) AS t(i)
    ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the REAL module path: row fan-out
    mapInPandas (one row per sampled frame). Decode stubbed; batch shape,
    fan-out and partitioning are what is under test."""
    from ba_gepris_crawler_spark.operators.multimodal import documents_as_media, sample_frames

    media = documents_as_media(_t(spark, sf_dir, "documents"))
    return sample_frames(media, every_nth=10).orderBy("doc_id", "frame_idx")


@_q(
    "mm_caption_align",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ')[1:40] AS ts FROM documents),
    s AS (SELECT doc_id, unnest(ts) AS tok,
                 unnest(range(1, len(ts) + 1)) AS off
          FROM toks),
    sp AS (SELECT doc_id, off,
                  CASE WHEN off % 5 = 0 THEN 'img' ELSE 'text' END AS kind,
                  CASE WHEN off % 5 = 0 THEN NULL ELSE tok END AS txt,
                  CASE WHEN off % 5 = 0
                       THEN 'img://' || CAST(doc_id AS VARCHAR) || '/' || CAST(off AS VARCHAR)
                  END AS media_ref
           FROM s),
    al AS (SELECT doc_id, off, kind, media_ref,
                  last_value(CASE WHEN kind = 'text' THEN txt END IGNORE NULLS)
                    OVER w AS caption,
                  last_value(CASE WHEN kind = 'text' THEN off END IGNORE NULLS)
                    OVER w AS caption_off
           FROM sp
           WINDOW w AS (PARTITION BY doc_id ORDER BY off
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT doc_id, CAST(off AS BIGINT) AS span_off, media_ref, caption,
           CAST(off - caption_off AS BIGINT) AS caption_dist
    FROM al WHERE kind <> 'text' ORDER BY doc_id, span_off
    """,
)
def mm_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved text+media alignment through the REAL module
    (operators/multimodal.py caption_align): every 5th token of each
    document becomes a media span; each media span is paired with the
    nearest preceding text span (its caption candidate) by a per-document
    running window — the interleaved-document operator of the input_hint
    shape (doc_id, spans<kind,text,media_ref,offset>)."""
    from ba_gepris_crawler_spark.operators.multimodal import caption_align

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, 40).alias("ts")
    )
    spans = F.transform(
        "ts",
        lambda tok, i: F.struct(
            F.when((i + 1) % 5 == 0, F.lit("img")).otherwise(F.lit("text")).alias("kind"),
            F.when((i + 1) % 5 != 0, tok).alias("text"),
            F.when(
                (i + 1) % 5 == 0,
                F.concat(F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/"),
                         (i + 1).cast("string")),
            ).alias("media_ref"),
            (i + 1).cast("int").alias("offset"),
        ),
    )
    docs = d.select("doc_id", spans.alias("spans"))
    return caption_align(docs).orderBy("doc_id", "span_off")


@_q(
    "mm_interleave_stats",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ')[1:40] AS ts FROM documents),
    s AS (SELECT doc_id, unnest(range(1, len(ts) + 1)) AS off FROM toks),
    f AS (SELECT doc_id, count(*) AS n_spans,
                 sum(CASE WHEN off % 5 = 0 THEN 1 ELSE 0 END) AS n_media,
                 min(CASE WHEN off % 5 = 0 THEN off END) AS first_media
          FROM s GROUP BY doc_id)
    SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_media AS BIGINT) AS n_media,
           CAST(n_spans - n_media AS BIGINT) AS n_text,
           round(CAST(n_media AS DOUBLE) / n_spans, 6) AS media_ratio,
           CAST(first_media AS BIGINT) AS first_media_off
    FROM f ORDER BY doc_id
    """,
)
def mm_interleave_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interleaving profile through the REAL module
    (operators/multimodal.py interleave_stats): modality counts, media
    ratio, first-media offset — computed with higher-order array functions
    (no explode, no per-row Python), the curation-filter shape for
    interleaved corpora."""
    from ba_gepris_crawler_spark.operators.multimodal import interleave_stats

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, 40).alias("ts")
    )
    spans = F.transform(
        "ts",
        lambda tok, i: F.struct(
            F.when((i + 1) % 5 == 0, F.lit("img")).otherwise(F.lit("text")).alias("kind"),
            F.when((i + 1) % 5 != 0, tok).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (i + 1).cast("int").alias("offset"),
        ),
    )
    docs = d.select("doc_id", spans.alias("spans"))
    return interleave_stats(docs).orderBy("doc_id")
