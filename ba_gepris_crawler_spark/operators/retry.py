"""Transient-error retry scheduling: exponential backoff over the quarantine.

The reference treats any non-200 as fatal (the stream dies,
CrawledResourceDetailDataGraph.scala:43-46); this engine quarantines the
row and marks the URL seen, which stops refetch storms but also means a
URL that happened to 503 once is lost forever. This operator schedules
retries for the TRANSIENT error classes with exponential backoff, the
standard crawler policy (and the Cho & Garcia-Molina-style counterpart of
operators/recrawl.py for the failure side of the ledger):

- retryable: 408/429/5xx plus the engine's network-error statuses
  (598 undecodable/malformed body, 599 no-HTTP-response). 4xx content
  errors (404/410/...) and redirects are NOT retried — they are answers,
  not failures.
- a URL is a candidate only while its NEWEST observation is a retryable
  error (a later 200/304/redirect resolution ends the retry lineage);
- n_attempts = the CURRENT failure streak: retryable-error observations
  since the last non-retryable one (a success resets the count — a URL
  that fails, recovers, and fails again months later starts a fresh
  lineage, it does not inherit decade-old attempts). The next try is due
  `backoff_base ** n_attempts` rounds after the last observation
  (clamped to max_backoff), and after max_attempts consecutive failures
  the URL is `exhausted` — reported, never due again (permanent
  quarantine, the round loop's original behavior).

Shape: one shuffle on url (two aggregates share the partition); output is
per-URL metadata rows, the same scale class as url_seen. The due set
rejoins the frontier through the engine's staged-recrawl path
(CrawlEngine.enqueue_error_retries), so the seen-tombstone replay,
politeness budgets, and resume semantics are identical to a content
recrawl. No driver state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RETRYABLE_STATUSES = (408, 429, 500, 502, 503, 504, 598, 599)


def error_retry_schedule(
    history: DataFrame,
    now_round: int,
    max_attempts: int = 4,
    backoff_base: int = 2,
    max_backoff: int = 64,
    retryable: tuple[int, ...] = RETRYABLE_STATUSES,
    url_col: str = "url",
    round_col: str = "round",
    status_col: str = "status",
) -> DataFrame:
    """history (url, round, status; one row per fetch observation) ->
    one row per url whose NEWEST observation is a retryable error:
    (url, n_attempts, last_round, last_status, delay, next_due, due,
    exhausted); n_attempts is the failure streak SINCE the last
    non-retryable observation. Duplicate (url, round) rows are tolerated
    (idempotent re-run: max status per (url, round) wins
    deterministically)."""
    if max_attempts < 1 or backoff_base < 1 or max_backoff < 1:
        raise ValueError(
            f"need max_attempts/backoff_base/max_backoff >= 1, got "
            f"{max_attempts}, {backoff_base}, {max_backoff}"
        )
    obs = history.groupBy(
        F.col(url_col).alias("url"), F.col(round_col).cast("int").alias("rnd")
    ).agg(F.max(F.col(status_col)).cast("int").alias("st"))
    is_retry = F.col("st").isin(*retryable)
    # current failure STREAK, not lifetime failure count: attempts since
    # the last non-retryable observation (window + groupBy share the url
    # partition — still one shuffle). Lifetime counting would let a URL
    # that failed, recovered, and failed again inherit its ancient
    # attempts and exhaust prematurely.
    w = Window.partitionBy("url")
    last_ok = F.max(F.when(~is_retry, F.col("rnd"))).over(w)
    marked = obs.withColumn("_after_ok", F.col("rnd") > F.coalesce(last_ok, F.lit(-(1 << 31))))
    per_url = marked.groupBy("url").agg(
        F.max_by("st", F.col("rnd")).alias("last_status"),
        F.max("rnd").alias("last_round"),
        F.sum(F.when(is_retry & F.col("_after_ok"), 1).otherwise(0))
        .cast("int")
        .alias("n_attempts"),
    )
    cand = per_url.filter(F.col("last_status").isin(*retryable))
    # delay after the n-th failure: backoff_base^n, clamped. pow() is
    # double-valued; rounding keeps it exact for the integer bases the
    # policy uses and the clamp bounds any float drift.
    delay = F.least(
        F.round(F.pow(F.lit(float(backoff_base)), F.col("n_attempts"))).cast("int"),
        F.lit(int(max_backoff)),
    )
    exhausted = F.col("n_attempts") >= F.lit(int(max_attempts))
    return cand.select(
        "url",
        "n_attempts",
        "last_round",
        "last_status",
        delay.alias("delay"),
        (F.col("last_round") + delay).cast("int").alias("next_due"),
        exhausted.alias("exhausted"),
        (~exhausted & ((F.col("last_round") + delay) <= F.lit(int(now_round)))).alias("due"),
    )


def due_retry_urls(schedule: DataFrame) -> DataFrame:
    """The (url) relation a staged retry round should refetch."""
    return schedule.filter(F.col("due")).select("url")
