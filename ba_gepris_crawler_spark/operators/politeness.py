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
  (crawl_depth, priority, host_bucket, url); the host is spread over
  `n_buckets` partitions via host_bucket = crc32(url) % B, so one hot
  host (GEPRIS is the degenerate single-host worst case) cannot create a
  hot partition. crc32 (not xxhash64) because the golden simulator and the
  DuckDB oracle must reproduce the bucket in pure Python/SQL.

  TWO-LEVEL RANKING (the 100 TB shape): ranking the whole frontier of one
  host through Window.partitionBy(host) would funnel that host's frontier
  through ONE task — the scale-killer for the reference's own single-host
  workload (CrawledResourceDetailDataGraph.scala:27 hard-codes one host).
  Instead the rank is computed within (host, host_bucket) partitions and
  lifted to the exact global per-host rank with broadcast per-group
  offsets: for the group key g = (crawl_depth, priority, host_bucket),
  rows of one g are contiguous in the global (depth, priority, bucket,
  url) order, so host_rank = rows_before_group(g) + (local_rank -
  rows_before_group_in_bucket(g)). Both offset tables are metadata-sized
  (hosts x depths x priorities x buckets) and computed from one tiny
  groupBy-count — the same offset trick the crawl-log `seq` uses
  (plans/round_loop.py). No Exchange ever partitions by bare `host`.
- robots/session state: broadcast to executors once per round
  (reference: the cookie cache in CookieFlowGraph.scala:30-58).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Host-cardinality crossover for schedule_round's offsets-join strategy:
# at or below this many hosts the offsets frame is tiny and a forced
# broadcast wins (AQE alone plans sort-merge and the data side pays its
# shuffle write first — measured regression); above it, the broadcast
# round-trips millions of metadata rows through the driver and the
# co-keyed shuffle join wins (1.4-2.8x at 10^6 hosts, BENCH/many_hosts.py).
MANY_HOSTS_THRESHOLD = 2000

# Above this many per-host rate overrides, schedule_round stops compiling
# the budget as a literal when-cascade (O(n_overrides) expression depth
# blows up Catalyst plan size/codegen at 10^5+ robots Crawl-delay hosts)
# and instead joins a (host, budget) frame onto the metadata-sized offsets
# relation — riding the offsets join that happens anyway, so the data side
# pays no extra shuffle either way.
BUDGET_CASCADE_MAX = 64

# Same crossover for robots rules: apply_robots compiles one filter per
# ruled host (a when-cascade inside), so 10^5 robots'd hosts would mean
# 10^5 chained Filter nodes — Catalyst plan size, not data, becomes the
# bottleneck. Above this many ruled hosts (or under many_hosts) the rules
# become a (host, sorted rule array) relation joined onto the frontier and
# longest-match is evaluated by a single array-HOF expression.
ROBOTS_CASCADE_MAX = 64

# Budgets are carried in int32 columns (offsets join, budgets_df); a
# hostile robots.txt ("Crawl-delay: 1e-9") must clamp, not overflow.
_INT32_MAX = 2**31 - 1


def _budget_from_rate(rate: float, round_seconds: float) -> int:
    """pages/sec x seconds -> int32-safe token-bucket budget. Clamps to
    [1, INT32_MAX] so web-derived rates (1/Crawl-delay of an untrusted
    body can be huge or inf) can never overflow the int32 budget columns
    or raise mid-job. NaN is rejected loudly at plan-build time — the
    comparison guards below are all False for NaN and int(nan) would
    raise a confusing error deep in the plan (callers already filter it:
    parse_crawl_delay and PolitenessConfig.__post_init__)."""
    if math.isnan(rate):
        raise ValueError("rate must be a finite number, got nan")
    budget = rate * round_seconds
    if budget >= _INT32_MAX:
        return _INT32_MAX
    if budget < 1:  # also catches -inf, where int() would overflow
        return 1
    return int(budget)


@dataclass(frozen=True)
class PolitenessConfig:
    per_host_rate: float = 10.0  # pages/sec a host will tolerate (default)
    round_seconds: float = 60.0  # wall-clock modeled per crawl round
    max_in_flight: int = 10  # reference detail-page cap (mapAsync(10))
    # robots.txt analog: paths a host forbids (regex), broadcast to executors
    disallow: tuple[tuple[str, str], ...] = ()  # (host, path_regex)
    # per-host rate OVERRIDES (host, pages/sec) — fed by robots.txt
    # Crawl-delay (rate = 1/delay); hosts not listed use per_host_rate
    host_rates: tuple[tuple[str, float], ...] = ()
    # RFC-9309-style robots rules (host, path_regex, specificity, is_allow)
    # from parse_robots_rules: longest-match decides, Allow wins ties, no
    # match = allowed. Lets an Allow carve a hole in a Disallow prefix —
    # `disallow` above cannot express that (any-match, drop-only).
    robots_rules: tuple[tuple[str, str, int, bool], ...] = ()

    def __post_init__(self) -> None:
        # rates are divisors downstream (budget cut, fetch virtual cost):
        # a hand-written 0/negative override would clamp to budget 1 here
        # but produce an inf virtual_cost_sec in fetch_pages — reject once.
        # NaN passes a bare `<= 0` guard (comparison False), so require
        # finite explicitly
        if not math.isfinite(self.per_host_rate) or self.per_host_rate <= 0:
            raise ValueError(f"per_host_rate must be a finite number > 0, got {self.per_host_rate}")
        for h, r in self.host_rates:
            if not math.isfinite(r) or r <= 0:
                raise ValueError(f"host_rates[{h!r}] must be a finite number > 0, got {r}")
        # normalize host_rates to one entry per host, FIRST occurrence wins
        # (defined precedence: explicit overrides precede robots-derived
        # appends). Without this, rate_for/budget_for (first match) and
        # fetch_pages' dict(host_rates) (last wins) could give the SAME
        # host a different scheduler budget and fetch virtual cost.
        seen: set[str] = set()
        deduped = tuple(
            (h, r) for h, r in self.host_rates
            if not (h in seen or seen.add(h))
        )
        if len(deduped) != len(self.host_rates):
            object.__setattr__(self, "host_rates", deduped)

    @property
    def per_host_budget(self) -> int:
        return _budget_from_rate(self.per_host_rate, self.round_seconds)

    def rate_for(self, host: str) -> float:
        for h, r in self.host_rates:
            if h == host:
                return r
        return self.per_host_rate

    def budget_for(self, host: str) -> int:
        """Token-bucket page budget for ONE round of `host`."""
        return _budget_from_rate(self.rate_for(host), self.round_seconds)

    def budget_col(self, host_col: str = "host", base: F.Column | None = None) -> F.Column:
        """The per-host budget as a literal when-cascade over the (tiny)
        host_rates dimension — the Catalyst equivalent of broadcasting the
        robots crawl-delay cache; no join, no shuffle. `base` overrides
        the no-override branch (schedule_round passes a null literal to
        build an override-ONLY cascade that coalesces ahead of a joined
        budgets_df column without masking its rows)."""
        c: F.Column = F.lit(self.per_host_budget) if base is None else base
        for h, _r in self.host_rates:
            c = F.when(F.col(host_col) == h, F.lit(self.budget_for(h))).otherwise(c)
        return c

    def rate_col(self, host_col: str = "host", base: F.Column | None = None) -> F.Column:
        """Same cascade for the RATE (pages/sec) — fetch_pages' virtual
        cost uses rates, the scheduler uses budgets; one source of truth
        for both when schedule_round resolves them as columns."""
        c: F.Column = F.lit(self.per_host_rate) if base is None else base
        for h, r in self.host_rates:
            c = F.when(F.col(host_col) == h, F.lit(float(r))).otherwise(c)
        return c


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


# Hostile-robots parsing caps (RFC 9309 §2.4 requires processing at least
# 500 KiB and allows ignoring the rest; per-rule length is the de-facto
# crawler limit). These bound the regex work a hostile body can schedule
# onto EXECUTORS — rules evaluate per frontier URL, so an unbounded
# pattern is a distributed-CPU DoS, not just a parse cost. The wildcard
# cap exists because backtracking cost grows with the number of '.*'
# groups even after star-RUN collapse: '/a*b*c*...' with ~1000 separated
# stars still explores combinatorially many partitions of a hostile URL.
_MAX_ROBOTS_BODY = 500 * 1024
_MAX_RULE_LEN = 2048
_MAX_RULE_WILDCARDS = 16


def _capped_body(robots_txt: str) -> str:
    """First 500 KiB of a robots body, with any truncated PARTIAL line
    dropped — a sliced 'Crawl-delay: 600' must not parse as a valid
    'Crawl-delay: 6', and a sliced 'Allow: /private-archive' must not
    become a broad 'Allow: /p'."""
    if len(robots_txt) <= _MAX_ROBOTS_BODY:
        return robots_txt
    body = robots_txt[:_MAX_ROBOTS_BODY]
    return body.rsplit("\n", 1)[0] if "\n" in body else ""


def _path_pattern_to_regex(value: str) -> str:
    """robots.txt path pattern -> anchored regex: '*' matches any char
    sequence, a TRAILING '$' anchors the end of the URL (RFC 9309 §2.2.3);
    an optional scheme://host prefix is accepted so bare-path and full-URL
    inputs both match. Consecutive '*'s collapse to one — semantically
    identical, and it defuses the cheapest hostile pattern ('/a' + '*'*500
    would otherwise compile to a chain of 500 '.*'s whose backtracking cost
    is superlinear in URL length, paid per frontier URL on executors)."""
    import re as _re

    anchored_end = value.endswith("$")
    core = value[:-1] if anchored_end else value
    core = _re.sub(r"\*+", "*", core)
    rx = (
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)?"
        + _re.escape(core).replace("\\*", ".*")
    )
    return rx + "$" if anchored_end else rx


def parse_robots_rules(
    host: str, robots_txt: str, user_agent: str = "*"
) -> tuple[tuple[str, str, int, bool], ...]:
    """Full RFC-9309 rule parse -> (host, path_regex, specificity,
    is_allow) tuples for `apply_robots`'s longest-match evaluation:
    the matching rule with the LONGEST raw pattern decides; on a tie
    Allow wins; no matching rule = allowed. '*' and trailing '$' per
    `_path_pattern_to_regex`. Group semantics identical to parse_robots
    (consecutive User-agent lines open a group; rules count from groups
    matching `user_agent` or '*'). Empty Allow/Disallow values are
    skipped (an empty Disallow is allow-all already). Hostile-input caps:
    only the first 500 KiB of the body is parsed (RFC 9309 §2.4) and
    rules longer than _MAX_RULE_LEN are ignored (the de-facto crawler
    limit; an unbounded pattern is executor-side regex work per URL)."""
    rules: list[tuple[str, str, int, bool]] = []
    group_agents: list[str] = []
    in_group_body = False
    for raw in _capped_body(robots_txt).splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_body:
                group_agents = []
                in_group_body = False
            group_agents.append(value.lower())
        elif key in ("disallow", "allow"):
            in_group_body = True
            if not value or len(value) > _MAX_RULE_LEN:
                continue
            # count star RUNS (i.e. after run-collapse): '/a****b' is one
            # wildcard's work, '/a*b*c*...' with many separated stars is
            # the backtracking-DoS shape the run-collapse cannot defuse
            star_runs = sum(
                1 for i, ch in enumerate(value)
                if ch == "*" and (i == 0 or value[i - 1] != "*")
            )
            if star_runs > _MAX_RULE_WILDCARDS:
                continue
            if "*" in group_agents or user_agent.lower() in group_agents:
                rules.append(
                    (host, _path_pattern_to_regex(value), len(value), key == "allow")
                )
        else:
            in_group_body = True  # crawl-delay etc.: group body continues
    return tuple(rules)


def parse_robots(host: str, robots_txt: str, user_agent: str = "*") -> tuple[tuple[str, str], ...]:
    """Minimal robots.txt parse -> (host, path_regex) disallow rules for
    `apply_robots`. Standard group semantics: consecutive User-agent lines
    open a group, Disallow lines apply to the open group; rules are taken
    from groups matching `user_agent` or '*'. Empty Disallow = allow-all
    (skipped). '*' wildcards in paths become '.*'; the prefix is anchored.
    Like the reference's one-time cookie fetch, the robots fetch+parse is
    a driver-side, once-per-host operation whose result is compiled into
    the plan (the broadcast-robots-cache analog).

    Exactly the is_allow=False projection of parse_robots_rules — ONE
    group-semantics state machine exists; keep it that way (a tweak
    applied to only one parser would silently diverge the legacy
    disallow path from the rules path)."""
    return tuple(
        (h, rx)
        for h, rx, _spec, allow in parse_robots_rules(host, robots_txt, user_agent)
        if not allow
    )


def parse_crawl_delay(robots_txt: str, user_agent: str = "*") -> float | None:
    """Crawl-delay (seconds between requests) from robots.txt, honoring the
    same group semantics as parse_robots: the directive counts only inside
    a group matching `user_agent` or '*'. A specific-agent group's value
    wins over a wildcard group's; malformed / non-positive values are
    ignored. Returns None when no applicable directive exists. Only the
    first 500 KiB of the body is parsed (RFC 9309 §2.4, same cap as
    parse_robots_rules)."""
    wildcard: float | None = None
    specific: float | None = None
    group_agents: list[str] = []
    in_group_body = False
    for raw in _capped_body(robots_txt).splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_body:
                group_agents = []
                in_group_body = False
            group_agents.append(value.lower())
        else:
            in_group_body = True
            if key != "crawl-delay":
                continue
            try:
                delay = float(value)
            except ValueError:
                continue
            # web input: "Crawl-delay: nan"/"inf" parse as floats but are
            # not delays — nan even passes a `delay <= 0` guard (False)
            # and would crash int() downstream; treat like malformed
            if not math.isfinite(delay) or delay <= 0:
                continue
            if user_agent.lower() != "*" and user_agent.lower() in group_agents:
                specific = delay
            elif "*" in group_agents or user_agent.lower() in group_agents:
                wildcard = delay
    return specific if specific is not None else wildcard


def politeness_from_robots(
    cfg: PolitenessConfig,
    robots_by_host: dict[str, str],
    user_agent: str = "*",
) -> PolitenessConfig:
    """Fold fetched robots.txt bodies into the politeness config: Disallow
    rules extend cfg.disallow, Crawl-delay becomes a per-host rate override
    (rate = 1/delay pages/sec). Driver-side, once per host — the
    broadcast-robots-cache shape (the per-host dimension is tiny; the
    resulting config is compiled into the plan as literals)."""
    from dataclasses import replace

    rules = list(cfg.robots_rules)
    ruled = {h for h, _rx, _s, _a in rules}
    rates = list(cfg.host_rates)
    overridden = {h for h, _ in rates}
    for host, txt in sorted(robots_by_host.items()):
        # full Allow/Disallow rules with longest-match semantics; a host
        # whose rules are already folded in is skipped (idempotent calls)
        if host not in ruled:
            new_rules = parse_robots_rules(host, txt, user_agent)
            if new_rules:
                rules.extend(new_rules)
                ruled.add(host)
        delay = parse_crawl_delay(txt, user_agent)
        # an explicit config override outranks the robots Crawl-delay;
        # repeated calls are idempotent (no duplicate accumulation)
        if delay is not None and host not in overridden:
            # a subnormal-tiny delay makes 1/delay inf — clamp so the
            # resulting config passes its own finite-rate validation
            rates.append((host, min(1.0 / delay, float(_INT32_MAX))))
            overridden.add(host)
    return replace(cfg, robots_rules=tuple(rules), host_rates=tuple(rates))


def apply_robots(
    frontier: DataFrame,
    cfg: PolitenessConfig,
    many_hosts: bool = False,
    n_buckets: int = 32,
) -> DataFrame:
    """Drop disallowed URLs.

    - cfg.disallow: legacy any-match drops (explicit config regexes; tiny
      by construction — compiled into the plan as literal filters).
    - cfg.robots_rules: RFC-9309 longest-match — per host the rules are
      sorted by (pattern length desc, Allow-first on ties) and the FIRST
      hit decides; no hit = allowed. This is what lets an Allow carve a
      hole inside a Disallow prefix.

    SIZE-AWARE strategy for robots_rules (mirrors the offsets/budget
    joins): at or below ROBOTS_CASCADE_MAX ruled hosts the rules compile
    to per-host when-cascade filters (no join, no shuffle — the broadcast-
    robots-cache shape). Above it — a 10^5-10^7-host open-web frontier
    where every host has a robots.txt — that would be 10^5 chained Filter
    nodes, so the rules become a (host, sorted-rule-array) relation and
    longest-match is ONE array-HOF expression after a join: broadcast for
    a small ruled-host universe under the cap with many_hosts=True, else
    salted co-keyed shuffle on (host, crc32(url) % n_buckets) so a hot
    host's frontier spreads over n_buckets tasks (the rules side is
    metadata-sized: ruled_hosts x n_buckets rows; never a bare-host
    Exchange on the data side). Decisions are identical across the three
    paths (pinned by test_politeness)."""
    out = frontier
    for host, path_regex in cfg.disallow:
        out = out.filter(~((F.col("host") == host) & F.col("url").rlike(path_regex)))
    if not cfg.robots_rules:
        return out
    by_host: dict[str, list[tuple[str, int, bool]]] = {}
    for h, rx, spec, allow in cfg.robots_rules:
        by_host.setdefault(h, []).append((rx, spec, allow))
    if len(by_host) <= ROBOTS_CASCADE_MAX and not many_hosts:
        for h, rules in sorted(by_host.items()):
            ordered = sorted(rules, key=lambda r: (-r[1], not r[2]))
            decision: F.Column = F.lit(True)  # no matching rule -> allowed
            for rx, _spec, allow in reversed(ordered):
                decision = F.when(F.col("url").rlike(rx), F.lit(allow)).otherwise(decision)
            out = out.filter((F.col("host") != h) | decision)
        return out
    rules = frontier.sparkSession.createDataFrame(
        list(cfg.robots_rules), ROBOTS_RULES_SCHEMA
    )
    return apply_robots_rules(out, rules, many_hosts=many_hosts, n_buckets=n_buckets)


# rule rows as a RELATION — the web-scale robots shape: at 10^6+ hosts
# neither the robots bodies nor their parsed rules fit driver literals,
# so they live as DataFrames end to end (parse_robots_rules_distributed
# -> apply_robots_rules / crawl_delay_budgets -> schedule_round).
ROBOTS_RULES_SCHEMA = "host string, rx string, spec int, allow boolean"


def parse_robots_rules_distributed(
    robots: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Distributed robots parse: (host, robots_txt) rows -> RFC-9309 rule
    rows, Arrow-batched mapInPandas calling THE parse_robots_rules state
    machine per body — one parser, two transports. The bodies (fetched by
    the crawl itself at open-web scale) and the resulting rules never
    transit the driver; feed the output to apply_robots_rules."""
    import pandas as pd

    ua = user_agent

    def parse(batches):
        for pdf in batches:
            out: list[tuple[str, str, int, bool]] = []
            for h, txt in zip(pdf[host_col], pdf[txt_col]):
                out.extend(parse_robots_rules(h, txt or "", ua))
            # ONE construction for empty and non-empty batches — the
            # astype map is the only dtype statement, so the two branches
            # cannot drift apart (an all-object empty frame would only
            # fail on the partition that happened to have no rules)
            yield pd.DataFrame(out, columns=["host", "rx", "spec", "allow"]).astype(
                {"spec": "int32", "allow": bool}
            )

    return robots.mapInPandas(parse, schema=ROBOTS_RULES_SCHEMA)


def crawl_delay_budgets(
    robots: DataFrame,
    cfg: PolitenessConfig,
    user_agent: str = "*",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Distributed Crawl-delay parse: (host, robots_txt) rows -> (host,
    budget int, rate double) rows for schedule_round's budgets_df — the
    web-scale replacement for politeness_from_robots' driver-side
    host_rates tuples (10^6 robots'd hosts cannot be config literals),
    covering BOTH of that path's consumers: `budget` drives the
    scheduler's token-bucket cut and `rate` (pages/sec = 1/delay) rides
    fetch_now as the `host_rate` column fetch_pages prices virtual cost
    from. Same group semantics (parse_crawl_delay); hosts without an
    applicable directive emit no row and fall back to cfg's defaults.
    Budgets clamp to int32 (a hostile 'Crawl-delay: 1e-9' among 10^6
    bodies must not kill the job with an int32 overflow)."""
    import pandas as pd

    ua, rs = user_agent, cfg.round_seconds

    def parse(batches):
        for pdf in batches:
            hosts: list[str] = []
            budgets: list[int] = []
            rates: list[float] = []
            for h, txt in zip(pdf[host_col], pdf[txt_col]):
                delay = parse_crawl_delay(txt or "", ua)
                if delay is not None:
                    rate = 1.0 / delay
                    hosts.append(h)
                    budgets.append(_budget_from_rate(rate, rs))
                    rates.append(min(rate, float(_INT32_MAX)))
            yield pd.DataFrame(
                {"host": pd.Series(hosts, dtype=object),
                 "budget": pd.Series(budgets, dtype="int32"),
                 "rate": pd.Series(rates, dtype="float64")}
            )

    return robots.mapInPandas(parse, schema="host string, budget int, rate double")


def apply_robots_rules(
    frontier: DataFrame,
    rules: DataFrame,
    many_hosts: bool = False,
    n_buckets: int = 32,
) -> DataFrame:
    """Joined robots evaluation over a rules RELATION (ROBOTS_RULES_SCHEMA
    rows — from parse_robots_rules_distributed, or cfg literals via
    apply_robots). Per host the rules are packed into ONE array sorted by
    (-specificity, Disallow-after-Allow) — the same precedence the cascade
    compiles — and the decision is `get(filter(rules, r -> url rlike
    r.rx), 0).allow` with null (no match / unruled host) meaning allowed.
    The per-URL work is identical to the cascade's (each regex tried once,
    first hit wins); only the plan shape changes from O(hosts) Filter
    nodes to one join + one HOF."""
    per_host = rules.groupBy("host").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("spec")).alias("nspec"),
                    F.when(F.col("allow"), F.lit(0)).otherwise(F.lit(1)).alias("dis"),
                    F.col("rx").alias("rx"),
                    F.col("allow").alias("allow"),
                )
            )
        ).alias("_rules")
    )
    if many_hosts:
        # salt the metadata side x n_buckets so the data-side join key is
        # (host, bucket) — a hot host's frontier never funnels into one task
        per_host = per_host.withColumn(
            "_rsalt", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
        )
        joined = frontier.withColumn("_rsalt", salt_bucket("url", n_buckets)).join(
            per_host, ["host", "_rsalt"], "left"
        )
    else:
        joined = frontier.join(F.broadcast(per_host), "host", "left")
    first = F.get(
        F.filter(F.col("_rules"), lambda r: F.regexp_like(F.col("url"), r["rx"])),
        F.lit(0),
    )
    decision = F.when(first.isNull(), F.lit(True)).otherwise(first["allow"])
    # the join moves key columns first; restore the caller's column order
    return joined.filter(decision).select(*frontier.columns)


def salt_bucket(url_col: str = "url", n_buckets: int = 32) -> F.Column:
    """host_bucket = crc32(url) % B — deterministic, partition-count
    invariant, and reproducible outside Spark (zlib.crc32 in the golden
    simulator; no DuckDB twin needed because oracle fixtures provide the
    bucket column directly)."""
    return F.pmod(F.crc32(F.col(url_col).cast("binary")), F.lit(n_buckets)).cast("int")


def schedule_round(
    frontier: DataFrame,
    cfg: PolitenessConfig,
    n_buckets: int = 32,
    many_hosts: bool = False,
    budgets_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the deduplicated frontier into (fetch_now, deferred).

    budgets_df: optional (host, budget int[, rate double]) relation of
    per-host budgets — the web-scale form of robots Crawl-delay overrides
    (crawl_delay_budgets), for host universes where driver-side
    cfg.host_rates tuples cannot hold. Precedence matches
    politeness_from_robots: an explicit cfg.host_rates entry outranks a
    budgets_df row; hosts in neither use cfg.per_host_budget. Duplicate
    host rows are deduplicated (most-conservative wins) before joining.
    The relation rides the offsets join (size-aware: broadcast, or
    co-keyed shuffle under many_hosts), so the data side pays no extra
    shuffle. When present, fetch_now additionally carries the resolved
    pages/sec as `host_rate` — fetch_pages prices virtual cost from that
    column, so the relation replaces BOTH consumers of host_rates.

    fetch_now rows carry:
      host_rank   - deterministic per-host fetch order (1-based) under the
                    engine-defined total order (crawl_depth, priority,
                    host_bucket, url)
      host_bucket - salted partition key (rank AND fetch stage)
      slot        - simulated politeness wave: ceil(host_rank / max_in_flight);
                    wave w may start only after wave w-1 (token bucket)

    NOTE: the order is fully deterministic and reproducible by the
    straight-line golden crawl simulator (the reference's own fetch order
    is nondeterministic Set iteration, CrawlResourceDetailsGraph.scala:52;
    we define and persist this order instead, per SURVEY.md §2.10#4).
    A frontier that already carries a host_bucket column keeps it (lets
    oracle fixtures pin portable buckets).

    Engine-defined priority note: catalog pages of EVERY resource type rank
    at priority 0 (priority_for_type keys on resource_id IS NULL), so a
    person/institution catalog page outranks project detail pages — by
    design, catalogs widen the frontier fastest.
    """
    f = apply_robots(frontier, cfg, many_hosts=many_hosts, n_buckets=n_buckets)
    added_bucket = "host_bucket" not in f.columns
    if added_bucket:
        f = f.withColumn("host_bucket", salt_bucket("url", n_buckets))
    # Level 2: metadata-sized per-group counts -> window-cumsum offsets,
    # entirely distributed (no driver collect — at 10^6-10^7 hosts the old
    # collect materialized O(hosts x depths x priorities x B) rows on the
    # driver, the exact pattern the reference's driver-side toSet has,
    # CrawlResourceDetailsGraph.scala:47-53). The counts frame holds at
    # most depths x priorities x B rows PER HOST — a constant — so the
    # per-host cumsum window below moves a bounded number of metadata rows
    # per task no matter how large one host's frontier is; the data-sized
    # frontier itself is never partitioned by bare host.
    counts = f.groupBy("host", "crawl_depth", "priority", "host_bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_host = (
        Window.partitionBy("host")
        .orderBy("crawl_depth", "priority", "host_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_in_bucket = (
        Window.partitionBy("host", "host_bucket")
        .orderBy("crawl_depth", "priority")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = counts.select(
        "host",
        "crawl_depth",
        "priority",
        "host_bucket",
        F.coalesce(F.sum("n").over(w_host), F.lit(0)).alias("grp_off"),
        F.coalesce(F.sum("n").over(w_in_bucket), F.lit(0)).alias("lrank_before"),
        # total frontier rows for the host this round — metadata-sized
        # window (bounded rows/host), carried onto fetch_now so the fetch
        # stage can price the host's GLOBAL politeness cost without a
        # bare-host shuffle or a per-Arrow-batch local max (which
        # understates cost whenever a host spans buckets/batches)
        F.sum("n").over(Window.partitionBy("host")).alias("host_total"),
    )
    # Size-aware per-host budget: few overrides compile to a literal
    # when-cascade (no join at all); many overrides (10^5+ robots
    # Crawl-delay hosts) ride the offsets relation as a joined column —
    # the cascade's Catalyst expression depth would dominate planning
    # long before the many-hosts join strategy helps.
    budget_joined = len(cfg.host_rates) > BUDGET_CASCADE_MAX
    if budget_joined:
        budgets = f.sparkSession.createDataFrame(
            # host_rates is deduped per host (first wins, enforced in
            # __post_init__), so the comprehension's own rate IS the
            # resolved rate — calling budget_for/rate_for here would make
            # each a linear scan, O(n^2) driver work in exactly the
            # 10^5+-override regime this joined path exists for.
            [
                (h, _budget_from_rate(r, cfg.round_seconds), float(r))
                for h, r in cfg.host_rates
            ],
            "host string, _budget int, _rate double",
        )
        off = off.join(
            budgets if many_hosts else F.broadcast(budgets), "host", "left"
        )
    has_ext_rate = budgets_df is not None and "rate" in budgets_df.columns
    if budgets_df is not None:
        # dedup by host BEFORE the join: crawl_delay_budgets emits one row
        # per input robots row, so a bodies relation accumulated across
        # re-fetch rounds/redirects can carry a host twice — joined
        # un-deduped, each duplicate would MULTIPLY that host's frontier
        # rows through the offsets join. Most-conservative wins (smallest
        # budget / slowest rate), the relation analog of cfg's
        # first-occurrence-wins host_rates dedup.
        # clamp at the boundary: schedule_round accepts ARBITRARY relations,
        # so restore the cfg-path invariant budget in [1, INT32_MAX] here —
        # a zero/negative row (or a long value a non-ANSI cast('int') would
        # wrap negative) must not starve its host forever, and a
        # non-positive/NaN rate falls back to the default rate (null)
        # least/greatest SKIP nulls (they return the least/greatest of the
        # non-null args), so an unguarded clamp would turn a null or
        # uncastable budget into greatest(1, INT32_MAX) = INT32_MAX — an
        # unlimited grant, the opposite of the invariant. Guard explicitly:
        # null budgets stay null, min() skips them, and an all-null host
        # falls through the coalesce to cfg defaults.
        # try_cast, NOT cast: the budget/rate columns of an arbitrary
        # relation can be string-typed with unparsable values, and under
        # ANSI mode (Spark 4 default) a plain cast THROWS on 'abc' instead
        # of yielding the NULL this guard is built around — one malformed
        # row killing the schedule is exactly what the clamp exists to
        # prevent (review r5 final, same class as the link-id cast).
        budget_long = F.col("budget").try_cast("long")
        budget_clamped = F.when(
            budget_long.isNotNull(),
            F.greatest(
                F.lit(1).cast("long"),
                F.least(budget_long, F.lit(_INT32_MAX).cast("long")),
            ),
        )
        agg = [F.min(budget_clamped).cast("int").alias("_budget_df")]
        if has_ext_rate:
            rate_double = F.col("rate").try_cast("double")
            rate_valid = F.when(
                # NaN must be excluded EXPLICITLY: Spark orders NaN greater
                # than any number, so NaN > 0 is true and least(NaN, MAX)
                # returns MAX — a NaN rate silently granted the fastest
                # possible rate instead of falling back to the default
                (rate_double > 0) & ~F.isnan(rate_double),
                F.least(rate_double, F.lit(float(_INT32_MAX))),
            )
            agg.append(F.min(rate_valid).alias("_rate_df"))
        ext = budgets_df.groupBy("host").agg(*agg)
        off = off.join(ext if many_hosts else F.broadcast(ext), "host", "left")
    # Level 1: rank within the salted partition — the only data-sized
    # shuffle, keyed (host, host_bucket) so a hot host spreads over B tasks.
    w = Window.partitionBy("host", "host_bucket").orderBy("crawl_depth", "priority", "url")
    # The offsets join strategy is SIZE-AWARE (many_hosts): off scales with
    # host cardinality (hosts x depths x priorities x B rows). For a small
    # host universe (GEPRIS: <=16 hosts; anything under a few thousand) a
    # broadcast hint is strictly best — AQE without the hint plans a
    # sort-merge join and the data side pays its shuffle WRITE before AQE
    # can convert, a measured regression on the steady bench. For a
    # 10^5-10^7-host open-web frontier the broadcast itself becomes a
    # multi-million-row driver round-trip — there the caller passes
    # many_hosts=True and the join runs as a co-keyed shuffle (the join key
    # is a superset of the rank window's (host, host_bucket) partitioning,
    # so no bare-host exchange either way; 1.4-2.8x faster at 10^6 hosts,
    # BENCH/many_hosts.py).
    f = (
        f.withColumn("_lrank", F.row_number().over(w))
        .join(off if many_hosts else F.broadcast(off),
              ["host", "crawl_depth", "priority", "host_bucket"])
        .withColumn("host_rank", (F.col("grp_off") + F.col("_lrank") - F.col("lrank_before")).cast("int"))
        .drop("_lrank", "grp_off", "lrank_before")
    )
    # Per-host token-bucket cut: budget is the literal when-cascade (few
    # overrides; no join, no shuffle), the _budget column the offsets join
    # carried in, and/or the external budgets_df column — resolved with
    # cfg-outranks-external precedence; partition-count independent.
    helper_cols: list[str] = []
    parts: list[F.Column] = []
    rate_parts: list[F.Column] = []
    if budget_joined:
        parts.append(F.col("_budget"))
        rate_parts.append(F.col("_rate"))
        helper_cols += ["_budget", "_rate"]
    elif cfg.host_rates and budgets_df is not None:
        # override-only cascades (null for unlisted hosts) so explicit
        # cfg rates outrank budgets_df without masking its rows — the
        # SAME cascade builders the cfg-only path compiles (budget_col /
        # rate_col with a null base), so the two paths cannot drift
        parts.append(cfg.budget_col("host", base=F.lit(None).cast("int")))
        rate_parts.append(cfg.rate_col("host", base=F.lit(None).cast("double")))
    if budgets_df is not None:
        parts.append(F.col("_budget_df"))
        helper_cols.append("_budget_df")
        if has_ext_rate:
            rate_parts.append(F.col("_rate_df"))
            helper_cols.append("_rate_df")
        else:
            # budget-only relation: recover pages/sec from the budget
            rate_parts.append(
                F.col("_budget_df").cast("double") / F.lit(float(cfg.round_seconds))
            )
    if parts:
        budget = F.coalesce(*parts, F.lit(cfg.per_host_budget))
        f = f.withColumn("_budget_resolved", budget)
        if budgets_df is not None:
            # resolved pages/sec rides fetch_now as `host_rate`, which
            # fetch_pages prefers over its driver-dict overrides — so a
            # budgets relation replaces BOTH host_rates consumers (the
            # scheduler's budget cut AND the fetch virtual-cost model)
            f = f.withColumn(
                "host_rate", F.coalesce(*rate_parts, F.lit(float(cfg.per_host_rate)))
            )
        f = f.drop(*helper_cols)
        helper_cols = ["_budget_resolved"]
        budget = F.col("_budget_resolved")
    else:
        budget = cfg.budget_col("host")
    fetch_now = (
        f.filter(F.col("host_rank") <= budget)
        .withColumn("slot", F.ceil(F.col("host_rank") / cfg.max_in_flight).cast("int"))
        # the host's LAST wave this round: fetched count = min(frontier
        # rows, budget). fetch_pages prices every row of the host at
        # max_slot/rate from this column — exact regardless of how the
        # host's rows split across salted buckets and Arrow batches
        .withColumn(
            "host_max_slot",
            F.ceil(F.least(F.col("host_total"), budget.cast("long")) / cfg.max_in_flight).cast("int"),
        )
        .drop("host_total")
    )
    deferred = f.filter(F.col("host_rank") > budget).drop("host_rank", "host_total")
    if parts:
        fetch_now = fetch_now.drop(*helper_cols)
        deferred = deferred.drop(*helper_cols)
        if budgets_df is not None:
            # deferred rows rejoin the frontier; the resolved rate is a
            # fetch-stage concern only
            deferred = deferred.drop("host_rate")
    if added_bucket:
        deferred = deferred.drop("host_bucket")
    return fetch_now, deferred
