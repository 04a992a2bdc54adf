"""Driver-contract query registry: every operator family of SURVEY.md §2
(plus the training-data-pipeline operators) expressed over the driver's
testdata tables, each with a DuckDB oracle twin.

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql|None).
Column names are aliased identically on both sides (the driver sorts columns
by name before value-hashing). Floats are rounded and cast to double on
both sides; counts are cast to bigint (DuckDB sum() returns HUGEINT).

Query families:
  crawl_*   - the crawl-engine kernels (frontier anti-join, canonicalize,
              pagination windows, funding-term regex cascade, multivalue
              split, e-mail de-obfuscation, link-id extraction, politeness
              priority queue, dedup rate, catalog count parse)
  dq_*      - the reference R-notebook DQ query shapes (SURVEY.md §2.11)
  tpch_*    - classic relational workloads (agg/join/top-k credibility)
  text_*    - text analysis: token stats, quality score, lang-id heuristic,
              rolling-hash fingerprint
  dedup_*   - exact + near-duplicate detection
  emb_*     - embedding similarity search (brute-force + IVF-style)
  events_*  - event-stream shapes (tumbling windows, sessionization)
  mm_*      - multimodal metadata plumbing (binary-ish features)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.functions.textkit import TOKENIZE
from ba_gepris_crawler_spark.operators.canonicalize import canonical_url

SparkFn = Callable[[SparkSession, str], DataFrame]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _span(kind: str, text: F.Column | str | None, media_ref: F.Column | str | None, offset: int) -> F.Column:
    """One (kind, text, media_ref, offset) span struct for module-path
    fixtures (schema.SPAN_STRUCT)."""
    def _c(v):
        if v is None:
            return F.lit(None).cast("string")
        return F.lit(v) if isinstance(v, str) else v
    return F.struct(
        F.lit(kind).alias("kind"),
        _c(text).alias("text"),
        _c(media_ref).alias("media_ref"),
        F.lit(offset).cast("int").alias("offset"),
    )


# 60-bit portable string hash: identical in Spark and DuckDB.
def _h60_spark(col: str) -> str:
    return f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"


def _h60_duck(col: str) -> str:
    return f"(('0x' || substr(md5({col}), 1, 15))::BIGINT)"


REGISTRY: dict[str, tuple[SparkFn, str | None]] = {}


def _q(name: str, oracle: str | None):
    def deco(fn: SparkFn):
        # loud duplicate guard: registration is spread across 9 family
        # modules now, so a copy-pasted name would silently shadow the
        # first registration (and its oracle) without this.
        assert name not in REGISTRY, f"duplicate query name: {name}"
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# --------------------------------------------------------------------------
# Shared tokenization expressions (used by the text_* AND dedup_* families)
# --------------------------------------------------------------------------

# Spark side DERIVES from the one shared tokenizer definition (textkit) —
# a third verbatim copy here drifted-by-construction out of the module
# whose docstring promises a single definition (review r5 tail #4).
# _TOKS_DUCK is the DuckDB twin of that same fragment: it cannot be
# shared (different engine dialect), so it lives next to the oracle SQL
# that uses it.
_TOKS_SPARK = TOKENIZE.format(col="text")
_TOKS_DUCK = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"
