"""Training-data analysis over the crawl's OWN corpus.

The operator families already exist in isolation (operators/dedup.py,
operators/text_analysis.py — each DuckDB-oracled over the driver's test
tables); this plan composes them over the engine's crawled documents, so
one command turns a finished crawl into the tables an LLM-data pipeline
starts from:

- `doc_metrics`: per-document language id, quality score, token/byte
  counts, rolling-hash fingerprint — one pass of chained Catalyst HOF
  expressions, no Python;
- `exact_dup_groups`: exact duplicates by double-salted content hash
  (one 64-bit hash expects real collisions at 10^10 docs);
- `near_dups`: MinHash + LSH banding candidates verified by true token
  Jaccard — bucketed candidate generation, candidate-only verification,
  never all-pairs.

Everything is derived from the CURRENT corpus (latest version per
document), so a recrawled page is analyzed once, at its newest content.
Scale shape: one shuffle per aggregate, the LSH path is the bench-pinned
dedup pipeline, and outputs are written back under the store root —
nothing transits the driver but the count summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# all spans' text joined in document order — richer than the first-span
# accessor the catalog parser uses; analysis wants the whole page
DOC_TEXT_SQL = (
    "array_join(transform(filter(spans, s -> s.text is not null and s.text <> ''),"
    " s -> s.text), ' ')"
)


def analysis_tables(
    documents: DataFrame,
    near_dup_threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 8,
) -> dict[str, DataFrame]:
    """Current documents (doc_id, url, host, spans) -> the analysis
    tables. Caller persists/writes; the returned frames share one
    tokenized subplan per family."""
    from ba_gepris_crawler_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verified_near_dups,
    )
    from ba_gepris_crawler_spark.operators.text_analysis import (
        fingerprint,
        language_id,
        quality_score,
        token_counts,
    )

    corpus = documents.select(
        "doc_id", "url", "host", F.expr(DOC_TEXT_SQL).alias("text")
    )
    metrics = fingerprint(token_counts(quality_score(language_id(corpus)))).drop("text")

    groups = (
        corpus.select("doc_id", F.xxhash64("text").alias("h1"),
                      F.xxhash64(F.concat(F.lit("s2:"), F.col("text"))).alias("h2"))
        .groupBy("h1", "h2")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
             F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("doc_ids", "n_docs")
    )

    tok = (
        corpus.select(
            "doc_id",
            F.explode(F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")).alias("tok"),
        )
        .distinct()
    )
    sig = minhash_signatures(tok, id_col="doc_id", unit_col="tok", num_perm=num_perm)
    cand = lsh_candidate_pairs(sig, id_col="doc_id", num_perm=num_perm, bands=bands)
    near = verified_near_dups(
        cand, tok, id_col="doc_id", unit_col="tok", threshold=near_dup_threshold
    )

    return {
        "doc_metrics": metrics,
        "exact_dup_groups": groups,
        "near_dups": near,
    }
