"""Text-analysis operators for training-data pipelines — all native
Catalyst expressions (array HOFs over the tokenized column, no Python).

- language_id: stopword-marker n-gram heuristic
- quality_score: length / stopword-ratio / token-shape heuristics
- token_counts: whitespace + regex tokenizers
- fingerprint: order-sensitive rolling polynomial hash over tokens
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.functions.textkit import TOKENIZE

# tiny marker lists per language — the operator shape matters, the lists are
# swappable config
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "fr": ("le", "et", "la"),
}

STOPWORDS = ("the", "and", "of", "a", "to", "in")


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("_toks", F.expr(TOKENIZE.format(col=text_col)))


def _hits(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"size(filter(_toks, x -> x IN ({lst})))"


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-language marker hit counts + `predicted_lang` (argmax with
    deterministic tie order = LANG_MARKERS insertion order)."""
    d = _with_tokens(df, text_col)
    for lang, words in LANG_MARKERS.items():
        d = d.withColumn(f"{lang}_hits", F.expr(_hits(words)).cast("bigint"))
    langs = list(LANG_MARKERS)
    pred: Column = F.lit("unknown")
    for lang in reversed(langs):
        cond = (F.col(f"{lang}_hits") > 0)
        for other in langs[: langs.index(lang)]:
            cond = cond & (F.col(f"{lang}_hits") > F.col(f"{other}_hits"))
        for other in langs[langs.index(lang) + 1 :]:
            cond = cond & (F.col(f"{lang}_hits") >= F.col(f"{other}_hits"))
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return d.withColumn("predicted_lang", pred).drop("_toks")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """0..1 quality score: 0.5*min(n_tokens/50,1) + 0.25*stopword_ratio +
    0.25*min(avg_token_len/8,1).

    Empty / whitespace-only docs (n_tokens = 0) get NULL ratios and a NULL
    score instead of killing the job: 0/0 is a hard DIVIDE_BY_ZERO under
    ANSI mode (the Spark 4 default), and blank pages are routine in any
    crawl. NULL (not 0.0) matches what DuckDB's division returns, keeping
    the oracle twins byte-identical on the edge."""
    d = _with_tokens(df, text_col)
    n = F.expr("size(_toks)")
    stop = F.expr(_hits(STOPWORDS))
    chars = F.expr("aggregate(_toks, 0, (acc, x) -> acc + length(x))")
    nonempty = n > 0
    return (
        d.withColumn("n_tokens", n.cast("bigint"))
        .withColumn("stopword_ratio", F.when(nonempty, F.round(stop / n, 6)))
        .withColumn("avg_token_len", F.when(nonempty, F.round(chars / n, 6)))
        .withColumn(
            "quality_score",
            F.when(
                nonempty,
                F.round(
                    F.least(n / 50.0, F.lit(1.0)) * 0.5
                    + (stop / n) * 0.25
                    + F.least((chars / n) / 8.0, F.lit(1.0)) * 0.25,
                    6,
                ),
            ),
        )
        .drop("_toks")
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    d = _with_tokens(df, text_col)
    return (
        d.withColumn("n_ws_tokens", F.expr("size(_toks)").cast("bigint"))
        .withColumn(
            "n_word_tokens",
            F.expr(f"size(regexp_extract_all({text_col}, '[a-z]+', 0))").cast("bigint"),
        )
        .withColumn("n_bytes", F.octet_length(text_col).cast("bigint"))
        .drop("_toks")
    )


def fingerprint(df: DataFrame, text_col: str = "text", p: int = 1_000_000_007) -> DataFrame:
    """Order-sensitive rolling hash: h = (31*h + xxhash64(tok) mod p) mod p."""
    d = _with_tokens(df, text_col)
    fp = F.expr(
        f"aggregate(_toks, cast(0 as bigint),"
        f" (a, x) -> (a * 31 + pmod(xxhash64(x), {p})) % {p})"
    )
    return d.withColumn("fingerprint", fp).drop("_toks")
