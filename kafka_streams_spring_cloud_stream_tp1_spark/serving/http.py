"""HTTP/SSE serving layer — the reference's controller + live chart
(V1/S1/Q1 serving shell around the engine).

Reproduces the reference's web surface (reference:
controllers/PageEventController.java:34-58, static/index.html:17-37):

- ``GET /analytics`` — Server-Sent Events: one ``{page -> count}``
  JSON map per poll interval (1 Hz like the reference's
  ``Flux.interval(Duration.ofSeconds(1))``), each snapshot produced by
  the injected ``fetch`` callable (normally `CountStore.range_fetch`,
  the Q1 latest-window-per-key query).
- ``GET /publish?name=X&topic=T`` — the S1 ingest endpoint: delegates
  to the injected ``publish`` callable and echoes the produced event
  as the JSON response body, exactly like the reference's
  ``streamBridge.send(topic, event); return pageEvent``.
- ``GET /`` — a minimal live view subscribing to ``/analytics`` with
  ``EventSource``. The reference renders a Smoothie.js chart from a
  CDN; this stays dependency-free (a rolling text log of snapshots) —
  the serving contract (SSE wire format, 1 Hz cadence) is identical.

Engine boundary note (SURVEY.md §2.1 V1): everything here is a THIN
shell over driver-local queries — stdlib ``http.server`` only, no
framework. The serving thread reads the store while the streaming
query's executor threads write it: the same store-writer vs
store-reader split as the reference's InteractiveQueryService. At
cluster scale this process would sit next to the external KV that
`streaming/sinks.py` upserts into, not next to the driver.
"""

from __future__ import annotations

import json
import threading
import time
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_INDEX_HTML = """<!doctype html>
<html>
<head><title>page analytics</title></head>
<body>
<h3>page view counts (5 s windows, live)</h3>
<pre id="log"></pre>
<script>
  const log = document.getElementById("log");
  new EventSource("/analytics").onmessage = (e) => {
    log.textContent = new Date().toISOString() + "  " + e.data + "\\n"
                      + log.textContent.split("\\n").slice(0, 19).join("\\n");
  };
</script>
</body>
</html>
"""


class AnalyticsServer:
    """Tiny threaded HTTP server exposing the reference's endpoints.

    ``fetch``   — zero-arg callable returning the current analytics
                  snapshot as a plain ``{name: count}`` dict (wrap a
                  `CountStore.range_fetch().collect()`; kept callable-
                  shaped so any store backend serves unchanged).
    ``publish`` — optional ``(name, topic) -> dict`` ingest hook
                  returning the produced event for the HTTP echo; the
                  endpoint answers 503 when absent.
    ``interval``— SSE poll cadence (reference: 1 s).
    """

    def __init__(
        self,
        fetch: Callable[[], dict],
        publish: Callable[[str, str | None], dict] | None = None,
        interval: float = 1.0,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self.fetch = fetch
        self.publish = publish
        self.interval = interval
        self._host, self._port = host, port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._stopping = threading.Event()

    @classmethod
    def for_store(cls, store, anchor=None, span: str = "5 seconds", **kwargs) -> "AnalyticsServer":
        """Serve a `CountStore`: each SSE tick runs the Q1 range fetch
        (latest window per page over [anchor − span, anchor])."""

        def fetch() -> dict:
            rows = store.range_fetch(anchor=anchor, span=span).collect()
            return {r["name"]: r["cnt"] for r in rows}

        return cls(fetch, **kwargs)

    # -- lifecycle ---------------------------------------------------

    def start(self) -> "AnalyticsServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:  # silence per-request stderr
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                url = urlparse(self.path)
                q = parse_qs(url.query)
                try:
                    if url.path == "/":
                        body = _INDEX_HTML.encode()
                        self.send_response(200)
                        self.send_header("Content-Type", "text/html")
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                    elif url.path == "/publish":
                        if outer.publish is None:
                            self._json(503, {"error": "no publish hook configured"})
                            return
                        name = q.get("name", ["page"])[0]
                        topic = q.get("topic", [None])[0]
                        self._json(200, outer.publish(name, topic))
                    elif url.path == "/analytics":
                        # ?n=K closes after K events (test hook); the
                        # reference streams until the client disconnects
                        limit = int(q.get("n", ["0"])[0]) or None
                        self.send_response(200)
                        self.send_header("Content-Type", "text/event-stream")
                        self.send_header("Cache-Control", "no-cache")
                        self.end_headers()
                        sent = 0
                        while not outer._stopping.is_set():
                            snap = outer.fetch()
                            self.wfile.write(f"data: {json.dumps(snap)}\n\n".encode())
                            self.wfile.flush()
                            sent += 1
                            if limit is not None and sent >= limit:
                                break
                            time.sleep(outer.interval)
                    else:
                        self._json(404, {"error": f"no route {url.path}"})
                except (BrokenPipeError, ConnectionResetError):
                    return  # client went away mid-stream — normal for SSE

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        return f"http://{self._host}:{self.port}"

    def stop(self) -> None:
        self._stopping.set()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
