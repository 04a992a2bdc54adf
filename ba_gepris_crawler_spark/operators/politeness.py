"""Per-host politeness scheduling + salted priority queue.

The reference's politeness is a fixed set of mapAsync() in-flight caps
against a single host (catalog 20 / detail 10 / taxonomy 6 / JSON 2 /
count 1 — SURVEY.md §2.8). Generalization mandated by the north rule:

- token bucket per host: a crawl round may fetch at most
  `budget = per_host_rate * round_seconds` pages of one host, at most
  `max_in_flight` concurrently; the budget is derived from GLOBAL config,
  never from partition counts, so scheduling decisions are identical at
  local[8] and local[32] (partition-count invariance is what makes the
  two-cluster-size scaling-efficiency comparison meaningful).
- salted priority queue: fetch order per host is the deterministic key
  (crawl_depth, priority, url); the host itself is spread over
  `n_buckets` partitions via host_bucket = xxhash64(url) % B, so one hot
  host (GEPRIS is the degenerate single-host worst case) cannot create a
  hot partition. Per-host rank is a window over host — the only shuffle in
  the scheduler, on exactly the key the politeness semantics require.
- robots/session state: broadcast to executors once per round
  (reference: the cookie cache in CookieFlowGraph.scala:30-58).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PolitenessConfig:
    per_host_rate: float = 10.0  # pages/sec a host will tolerate
    round_seconds: float = 60.0  # wall-clock modeled per crawl round
    max_in_flight: int = 10  # reference detail-page cap (mapAsync(10))
    # robots.txt analog: paths a host forbids (regex), broadcast to executors
    disallow: tuple[tuple[str, str], ...] = ()  # (host, path_regex)

    @property
    def per_host_budget(self) -> int:
        return max(1, int(self.per_host_rate * self.round_seconds))


def priority_for_type() -> F.Column:
    """Engine-defined priority: catalog pages first (they widen the
    frontier), then projects, persons, institutions. The reference has no
    priority queue (SURVEY.md §2.10#4) — this is new, documented design."""
    return (
        F.when(F.col("resource_id").isNull(), F.lit(0))
        .when(F.col("resource_type") == "project", F.lit(1))
        .when(F.col("resource_type") == "person", F.lit(2))
        .otherwise(F.lit(3))
    )


def apply_robots(frontier: DataFrame, cfg: PolitenessConfig) -> DataFrame:
    """Drop disallowed URLs. The disallow list is tiny (a per-host dimension)
    and is compiled into the plan as literals — the Catalyst equivalent of
    broadcasting a robots cache."""
    out = frontier
    for host, path_regex in cfg.disallow:
        out = out.filter(~((F.col("host") == host) & F.col("url").rlike(path_regex)))
    return out


def schedule_round(
    frontier: DataFrame,
    cfg: PolitenessConfig,
    n_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Split the deduplicated frontier into (fetch_now, deferred).

    fetch_now rows carry:
      host_rank   - deterministic per-host fetch order (1-based)
      host_bucket - salted partition key for the fetch stage
      slot        - simulated politeness wave: ceil(host_rank / max_in_flight);
                    wave w may start only after wave w-1 (token bucket)
    """
    f = apply_robots(frontier, cfg)
    f = f.withColumn("url_hash", F.xxhash64("url"))
    # NOTE: ordering is (depth, priority, url) — fully deterministic and
    # reproducible by the straight-line golden crawl simulator (the
    # reference's own fetch order is nondeterministic Set iteration,
    # CrawlResourceDetailsGraph.scala:52; we define and persist this order
    # instead, per SURVEY.md §2.10#4).
    w = Window.partitionBy("host").orderBy("crawl_depth", "priority", "url")
    f = f.withColumn("host_rank", F.row_number().over(w))
    fetch_now = (
        f.filter(F.col("host_rank") <= cfg.per_host_budget)
        .withColumn("host_bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))
        .withColumn("slot", F.ceil(F.col("host_rank") / cfg.max_in_flight).cast("int"))
    )
    deferred = f.filter(F.col("host_rank") > cfg.per_host_budget).drop("host_rank", "url_hash")
    return fetch_now, deferred
