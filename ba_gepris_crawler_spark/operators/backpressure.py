"""Per-host circuit breaker: failure backpressure for the scheduler.

Politeness (operators/politeness.py) spaces requests to HEALTHY hosts; it
says nothing about hosts that are answering — with errors. A host that is
down, rate-limiting, or returning garbage burns the crawl's politeness
budget on fetches that will quarantine anyway, and a real crawler backs
off the whole host, not just the failing URL (the per-URL side is
operators/retry.py). This is the classic circuit-breaker shape:

- TRIP: after a round, any host with >= min_fetches attempts whose
  transient-failure rate (the retry.RETRYABLE_STATUSES classes; 404s and
  redirects are answers, not failures) reaches error_rate is suspended
  for the next suspend_rounds rounds.
- OPEN: while suspended, the host's frontier candidates are NOT fetched
  and NOT dropped — they defer into the next round's frontier, exactly
  like budget-cut overflow, so nothing is lost and politeness state stays
  exact.
- HALF-OPEN/CLOSE: when the suspension lapses, candidates flow again; a
  still-broken host re-trips on fresh evidence (each trip re-evaluates
  that round's fetches only — old errors never re-trip a host).

Scale: the trip decision reads the round's per-host stats aggregate
(already computed for lineage — no extra pass over documents);
suspensions are (host, until_round) rows, the same metadata class as
robots budgets, persisted per round so resume replays them. The
candidate split is one join on host; the suspensions side is
tripped-hosts-sized, so AQE broadcasts it in any sane configuration.
Reference has no analog (one host, fail-fast:
CrawledResourceDetailDataGraph.scala:43-46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.retry import RETRYABLE_STATUSES

# counters the round loop already aggregates per host: n fetches, errs.
# errs counts every non-200/304; the breaker must NOT trip on content
# answers (404) or redirects, so it re-derives transient failures from
# the status mix — hence this operator takes the documents-grain frame.


def tripped_hosts(
    docs_round: DataFrame,
    next_round: int,
    min_fetches: int = 8,
    error_rate: float = 0.5,
    suspend_rounds: int = 4,
    host_col: str = "host",
    status_col: str = "status",
) -> DataFrame:
    """One round's fetched rows -> (host, until_round) suspensions for
    hosts whose transient-failure rate this round crossed the threshold.
    until_round is INCLUSIVE: the host is skipped while
    round <= until_round."""
    if min_fetches < 1 or not (0.0 < error_rate <= 1.0) or suspend_rounds < 1:
        raise ValueError(
            f"need min_fetches >= 1, 0 < error_rate <= 1, suspend_rounds >= 1; "
            f"got {min_fetches}, {error_rate}, {suspend_rounds}"
        )
    fail = F.col(status_col).isin(*RETRYABLE_STATUSES)
    per_host = docs_round.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(fail, 1).otherwise(0)).alias("n_fail"),
    )
    return per_host.filter(
        (F.col("n") >= F.lit(int(min_fetches)))
        & ((F.col("n_fail") / F.col("n")) >= F.lit(float(error_rate)))
    ).select(
        "host",
        F.lit(int(next_round + suspend_rounds - 1)).cast("int").alias("until_round"),
    )


def active_suspensions(suspensions: DataFrame, rnd: int) -> DataFrame:
    """Union of all committed suspension deltas -> the hosts suspended AT
    round rnd (one row per host; overlapping suspensions take the max)."""
    return (
        suspensions.groupBy("host")
        .agg(F.max("until_round").alias("until_round"))
        .filter(F.col("until_round") >= F.lit(int(rnd)))
        .select("host")
    )


def split_suspended(
    candidates: DataFrame, active: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Frontier candidates -> (schedulable, suspended). Suspended rows
    keep full frontier shape — the round loop defers them into the next
    frontier, the same non-lossy path as budget-cut overflow."""
    return (
        candidates.join(active, "host", "left_anti"),
        candidates.join(active, "host", "left_semi"),
    )
