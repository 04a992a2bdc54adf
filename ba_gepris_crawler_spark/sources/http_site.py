"""The synthetic GEPRIS site served over REAL HTTP (stdlib http.server).

Test-harness twin of the pure-function server in ``synthetic_site``: the
same routing, session gating and error semantics, but reached through real
sockets, real status codes and a real ``Set-Cookie`` header — so the
``HttpTransport`` fetch path (operators/transport.py) exercises an actual
network round-trip end to end with zero external dependencies.

Conventions (documented in HttpTransport too):
- the logical host (``h0.example.org``) rides the ``Host`` request header;
  the listener itself is 127.0.0.1:ephemeral
- the session epoch rides ``X-Epoch`` (the in-process model's session
  clock is the crawl round counter, which only the engine knows; a real
  deployment would use wall-clock expiry)
- ``GET /gepris/session`` answers 200 with the epoch's ``Set-Cookie``
  header (the reference reads Set-Cookie off the landing page,
  CookieFlowGraph.scala:39-44)
- every other path routes through ``render_page_json`` with the request's
  JSESSIONID cookie: same body bytes, same 200/401/404/503 statuses as
  the in-process path, so a crawl through this server is byte-equal to
  one through SyntheticTransport.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ba_gepris_crawler_spark.operators.revalidate import span_etag_py
from ba_gepris_crawler_spark.sources.synthetic_site import (
    SiteConfig,
    fetch_session_header,
    render_page,
    spans_to_json_body,
)

SESSION_PATH = "/gepris/session"


def _make_handler(cfg: SiteConfig):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt: str, *args) -> None:  # keep test output clean
            pass

        def _cookie_token(self) -> str | None:
            raw = self.headers.get("Cookie", "")
            for part in raw.split(";"):
                name, _, value = part.strip().partition("=")
                if name == "JSESSIONID":
                    return value
            return None

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            epoch = int(self.headers.get("X-Epoch", "0") or 0)
            if self.path == SESSION_PATH:
                self.send_response(200)
                self.send_header("Set-Cookie", fetch_session_header(cfg, epoch))
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            host = (self.headers.get("Host") or "").split(":")[0]
            logical_url = f"https://{host}{self.path}"
            status, spans = render_page(cfg, logical_url, self._cookie_token(), epoch)
            if 300 <= status < 400:
                # a REAL redirect: the in-process model carries the target
                # as a 'location' span (synthetic_site.render_page); on the
                # wire it is the Location header and an empty body, which
                # HttpTransport maps back to the same span shape
                loc = next((m for k, _t, m, _o in spans if k == "location"), None)
                self.send_response(status)
                if loc:
                    self.send_header("Location", loc)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            etag = span_etag_py(spans) if status == 200 else None
            if etag is not None:
                # conditional GET (RFC 9110 §13.1.2): the published strong
                # validator is the content-addressed etag; a matching
                # If-None-Match answers 304 with no body. Weak-compare and
                # `*` are irrelevant for this server (every etag is strong
                # and every resource exists), so bare string compare of the
                # unquoted values suffices.
                inm = self.headers.get("If-None-Match")
                if inm is not None and etag in [v.strip().strip('"') for v in inm.split(",")]:
                    self.send_response(304)
                    self.send_header("ETag", f'"{etag}"')
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
            payload = spans_to_json_body(spans).encode("utf-8")
            self.send_response(status)
            if etag is not None:
                self.send_header("ETag", f'"{etag}"')
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    return Handler


class SyntheticSiteHTTPServer:
    """Context-managed threaded HTTP server on 127.0.0.1:ephemeral.

    ThreadingHTTPServer gives one thread per connection, so the
    HttpTransport's per-batch thread pool (max_in_flight concurrent
    requests) is actually exercised concurrently.
    """

    def __init__(self, cfg: SiteConfig):
        self._server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(cfg))
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @property
    def base_url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def __enter__(self) -> "SyntheticSiteHTTPServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
