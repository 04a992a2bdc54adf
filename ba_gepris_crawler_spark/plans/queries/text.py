"""Text-analysis driver queries: token stats, quality, lang-id, fingerprints, inverted index, LM scores.

Split out of plans/driver_queries.py (round 5); query bodies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.plans.queries._base import (
    _TOKS_DUCK,
    _TOKS_SPARK,
    _h60_duck,
    _h60_spark,
    _q,
    _t,
)

@_q(
    "text_token_stats",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS_DUCK}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokenizer + regex word tokenizer."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(f"cast(size({_TOKS_SPARK}) as bigint)").alias("n_ws_tokens"),
        F.expr("cast(size(regexp_extract_all(text, '[a-z]+', 0)) as bigint)").alias("n_word_tokens"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    ).orderBy("doc_id")


@_q(
    "text_quality_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    s AS (SELECT doc_id,
            len(toks) AS n_tokens,
            len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'a', 'to', 'in'))) AS stop_hits,
            list_aggregate(list_transform(toks, x -> strlen(x)), 'sum') AS char_sum
          FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(stop_hits * 1.0 / n_tokens AS DOUBLE), 6) AS stopword_ratio,
           round(CAST(char_sum * 1.0 / n_tokens AS DOUBLE), 6) AS avg_token_len,
           round(CAST(least(n_tokens / 50.0, 1.0) * 0.5
                 + (stop_hits * 1.0 / n_tokens) * 0.25
                 + least((char_sum * 1.0 / n_tokens) / 8.0, 1.0) * 0.25 AS DOUBLE), 6) AS quality_score
    FROM s ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/token-shape heuristics (a training
    -data filter stage)."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    n = F.expr("size(toks)")
    stop = F.expr("size(filter(toks, x -> x IN ('the', 'and', 'of', 'a', 'to', 'in')))")
    chars = F.expr("aggregate(toks, 0, (acc, x) -> acc + length(x))")
    nonempty = n > 0  # ANSI 0/0 guard; NULL matches DuckDB's division
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.when(nonempty, F.round(stop / n, 6)).alias("stopword_ratio"),
        F.when(nonempty, F.round(chars / n, 6)).alias("avg_token_len"),
        F.when(
            nonempty,
            F.round(
                F.least(n / 50.0, F.lit(1.0)) * 0.5 + (stop / n) * 0.25 + F.least((chars / n) / 8.0, F.lit(1.0)) * 0.25,
                6,
            ),
        ).alias("quality_score"),
    ).orderBy("doc_id")


@_q(
    "text_lang_id",
    f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
            len(list_filter(toks, x -> x IN ('the', 'and', 'of'))) AS en_hits,
            len(list_filter(toks, x -> x IN ('der', 'und', 'das'))) AS de_hits,
            len(list_filter(toks, x -> x IN ('le', 'et', 'la'))) AS fr_hits
          FROM t)
    SELECT doc_id, lang, CAST(en_hits AS BIGINT) AS en_hits, CAST(de_hits AS BIGINT) AS de_hits,
           CAST(fr_hits AS BIGINT) AS fr_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
                WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
                WHEN fr_hits > 0 THEN 'fr'
                ELSE 'unknown' END AS predicted_lang
    FROM s ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-marker counting (n-gram heuristic
    class; the fixture corpus is English-wordlist text, the heuristic is the
    operator under test, not the fixture's labels)."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    en = F.expr("size(filter(toks, x -> x IN ('the', 'and', 'of')))")
    de = F.expr("size(filter(toks, x -> x IN ('der', 'und', 'das')))")
    fr = F.expr("size(filter(toks, x -> x IN ('le', 'et', 'la')))")
    d = d.select(
        "doc_id", "lang",
        en.cast("bigint").alias("en_hits"), de.cast("bigint").alias("de_hits"), fr.cast("bigint").alias("fr_hits"),
    )
    pred = (
        F.when((F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")) & (F.col("en_hits") > 0), "en")
        .when((F.col("de_hits") >= F.col("fr_hits")) & (F.col("de_hits") > 0), "de")
        .when(F.col("fr_hits") > 0, "fr")
        .otherwise("unknown")
    )
    return d.withColumn("predicted_lang", pred).orderBy("doc_id")


@_q(
    "text_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> {_h60_duck('x')} % 1000000007)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM t ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: rolling polynomial hash over the token stream
    (order-sensitive, portable 60-bit md5 token hash)."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    fp = F.expr(
        f"aggregate(toks, cast(0 as bigint), (a, x) -> (a * 31 + {_h60_spark('x')} % 1000000007) % 1000000007)"
    )
    return d.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


@_q(
    "text_bigram_topk",
    """
    WITH toks AS (SELECT string_split(lower(text), ' ') AS ts FROM documents
                  WHERE len(string_split(lower(text), ' ')) >= 2),
    bg AS (SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])) AS bigram
           FROM toks)
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram top-k (training-pipeline n-gram stats): tokenized
    JVM-side, partial-aggregated map-side, deterministic tie-break."""
    d = _t(spark, sf_dir, "documents").select(F.split(F.lower("text"), " ").alias("ts"))
    d = d.filter(F.size("ts") >= 2)
    bigrams = F.expr("transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))")
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@_q(
    "text_lm_score",
    """
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
    bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])) AS bigram
           FROM toks WHERE len(ts) >= 2),
    model AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
    tot AS (SELECT sum(c) AS n FROM model),
    scored AS (
      SELECT b.doc_id, ln(m.c * 1.0 / (SELECT n FROM tot)) AS lp
      FROM bg b JOIN model m USING (bigram))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(avg(lp) AS DOUBLE), 6) AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram LM scoring — the train-stats-then-apply shape a
    training-data quality filter uses (perplexity-style): pass 1 counts
    corpus bigrams (map-side partial agg), pass 2 joins the model back to
    each doc's bigrams and averages log p(bigram). The model join is
    shuffle-on-bigram; at 100 TB the model table would be truncated to the
    top-K vocabulary and broadcast."""
    d = _t(spark, sf_dir, "documents").select("doc_id", F.split(F.lower("text"), " ").alias("ts"))
    # bg feeds the model, the total, and the scoring join — persist it so
    # the tokenize+explode runs once, not three times; the per-doc output
    # is eagerly checkpointed below so the cache is dropped in this call
    bg = d.filter(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))")
        ).alias("bigram"),
    ).persist()
    model = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    total = model.agg(F.sum("c").alias("n"))
    scored = (
        bg.join(model, "bigram")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("c") / F.col("n")).alias("lp"))
    )
    out = (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.round(F.avg("lp"), 6).alias("avg_logprob"))
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    bg.unpersist()
    return out


@_q(
    "text_inverted_index",
    """
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ')[1:40] AS ts FROM documents),
    s AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
    f AS (SELECT tok, count(DISTINCT doc_id) AS df, count(*) AS tf,
                 min(doc_id) AS first_doc
          FROM s WHERE tok <> '' GROUP BY tok)
    SELECT tok, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
           CAST(first_doc AS BIGINT) AS first_doc
    FROM f WHERE df >= 2 ORDER BY tok
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (training-data retrieval shape): token ->
    document frequency, total term frequency, first posting. Explode +
    one partial-aggregated groupBy — the map-side combine keeps the
    shuffle at |distinct tokens|, not |tokens|; at 100 TB the posting
    lists themselves would be collect_list per token bucketed by
    xxhash64(tok) (same plan shape)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.slice(F.split(F.lower("text"), " "), 1, 40)).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        d.groupBy("tok")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("df") >= 2)
        .orderBy("tok")
    )
