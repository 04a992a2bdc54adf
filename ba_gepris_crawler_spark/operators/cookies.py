"""Session-cookie source (S9/F13): Set-Cookie parse + cached jar.

Reference semantics (helpers/CookieFlowGraph.scala:30-58): fetch the landing
page once, parse the Set-Cookie header, cache the cookie, zip it into every
request; re-fetch on demand when the server rejects the session.

Two layers here:
- CookieJar (driver): fetches the session endpoint once per EPOCH
  (epoch = round // session_rounds), parses the Set-Cookie header, caches;
  the token is broadcast to executors by fetch_pages. The cached value is
  reused within the epoch — the reference's cache-with-refresh contract.
- executor-side refresh (operators/fetch.py): a 401 inside a fetch batch
  re-fetches the session header ON THE WORKER and retries once — the
  re-fetch-on-demand path, without a driver round-trip.

cookie_field_cols parses Set-Cookie-shaped header COLUMNS natively
(regexp_extract — no Python) for header tables at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig, fetch_session_header

_NAME_RE = r"^\s*([^=;\s]+)="
_VALUE_RE = r"^\s*[^=;\s]+=([^;]*)"
_ATTR_RE = "(?i);\\s*{attr}=([^;]*)"


def parse_set_cookie(header: str) -> tuple[str, str, dict[str, str | bool]]:
    """(name, value, attrs) from one Set-Cookie header value. Flag
    attributes (HttpOnly, Secure) map to True."""
    parts = [p.strip() for p in header.split(";")]
    name, _, value = parts[0].partition("=")
    attrs: dict[str, str | bool] = {}
    for p in parts[1:]:
        if not p:
            continue
        k, eq, v = p.partition("=")
        attrs[k.strip().lower()] = v if eq else True
    return name.strip(), value, attrs


def cookie_field_cols(header: Column | str) -> dict[str, Column]:
    """Native-expression Set-Cookie parse for header columns: cookie name,
    value, Path attribute, HttpOnly/Secure flags."""
    c = F.col(header) if isinstance(header, str) else header
    return {
        "cookie_name": F.regexp_extract(c, _NAME_RE, 1),
        "cookie_value": F.regexp_extract(c, _VALUE_RE, 1),
        "cookie_path": F.regexp_extract(c, _ATTR_RE.format(attr="Path"), 1),
        "http_only": c.rlike("(?i);\\s*HttpOnly(;|$)"),
        "secure": c.rlike("(?i);\\s*Secure(;|$)"),
    }


@dataclass
class CookieJar:
    """Driver-side cached session cookie, one fetch per epoch."""

    _cache: dict[int, str] = field(default_factory=dict)
    fetches: int = 0  # observability: how often the endpoint was hit

    def get(self, cfg: SiteConfig, epoch: int = 0, transport=None) -> str:
        if epoch not in self._cache:
            # the 'HTTP' call: through the pluggable transport when the
            # engine fetches over real sockets, else in-process
            if transport is not None:
                header = transport.fetch_session_header(cfg, epoch)
            else:
                header = fetch_session_header(cfg, epoch)
            _name, value, _attrs = parse_set_cookie(header)
            self._cache[epoch] = value
            self.fetches += 1
        return self._cache[epoch]
