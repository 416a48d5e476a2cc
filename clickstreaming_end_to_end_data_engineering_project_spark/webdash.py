"""Dashboard web UI — stdlib HTTP server over the dashboard read layer.

The reference README promises a visualization dashboard but ships a
0-byte ``dashboard/app.py``.  This is the working equivalent with
zero dependencies beyond the Python standard library: a threaded
HTTP server exposing the README-promised analyses as JSON endpoints
plus a single self-contained HTML page that renders them as tables
(auto-refreshing, so it is a live view of the growing sinks).

Endpoints (computed over the parquet sinks at most once per
``cache_ttl_seconds`` — default 5 s, the page's refresh interval — so a
dashboard open in N tabs costs one Spark job per analysis per interval,
not N; the page still tracks a running ``app.py --sink-dir`` session):

- ``/``                        HTML dashboard
- ``/api/top_pages``           README "Page popularity"
- ``/api/busiest_windows``     top minutes by view volume
- ``/api/revenue_over_time``   README "Revenue tracking"
- ``/api/event_mix``           README "User activity" shares

Serving is driver-side by design — the payload is the already-reduced
analysis (top-k rows), never raw events, so response size is O(k)
regardless of corpus scale.

Usage::

    python -m clickstreaming_end_to_end_data_engineering_project_spark.webdash \
        --sink-dir /tmp/sinks --port 8080
"""

from __future__ import annotations

import datetime as _dt
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession

from . import dashboard

_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>clickstream dashboard</title>
<style>
 body { font-family: sans-serif; margin: 2em; }
 table { border-collapse: collapse; margin: 1em 0 2em; }
 td, th { border: 1px solid #999; padding: 4px 10px; text-align: left; }
 th { background: #eee; }
</style></head><body>
<h1>Clickstream dashboard</h1>
<div id="panels"></div>
<script>
const SECTIONS = ["top_pages", "busiest_windows", "revenue_over_time", "event_mix"];
async function refresh() {
  // build off-DOM, swap once: a slow refresh never shows a half-page
  const next = document.createElement("div");
  for (const s of SECTIONS) {
    const rows = await (await fetch("/api/" + s)).json();
    const h = document.createElement("h2"); h.textContent = s; next.appendChild(h);
    const t = document.createElement("table");
    if (Array.isArray(rows) && rows.length) {
      const head = t.insertRow();
      Object.keys(rows[0]).forEach(c => { const th = document.createElement("th"); th.textContent = c; head.appendChild(th); });
      rows.forEach(r => { const tr = t.insertRow(); Object.values(r).forEach(v => tr.insertCell().textContent = v); });
    }
    next.appendChild(t);
  }
  const root = document.getElementById("panels");
  root.replaceChildren(...next.children);
}
// re-arm only after the previous refresh finishes: overlapping refreshes
// would interleave DOM writes and stack concurrent Spark jobs
async function loop() {
  try { await refresh(); } catch (e) { /* endpoint may 503 while sinks warm up */ }
  setTimeout(loop, 5000);
}
loop();
</script></body></html>"""


def _json_cell(v):
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return v


def _df_json(df: DataFrame) -> bytes:
    rows = [{k: _json_cell(v) for k, v in r.asDict().items()} for r in df.collect()]
    return json.dumps(rows).encode()


class _TTLCache:
    """Per-endpoint payload cache with single-flight semantics: within
    one TTL window the first request computes, every concurrent and
    subsequent request gets the cached bytes.  Concurrency is handled
    with one lock per endpoint, held across the compute — waiters block
    briefly, then read the entry the leader just filled, so N tabs
    polling the dashboard cost ONE Spark job per analysis per interval.
    Failures are never cached: a 503 while the sinks warm up clears on
    the next request, not after a TTL."""

    def __init__(self, ttl_seconds: float, clock=time.monotonic):
        self.ttl = ttl_seconds
        self._clock = clock
        self._entries: dict[str, tuple[float, bytes]] = {}
        self._locks: dict[str, threading.Lock] = {}
        self._guard = threading.Lock()

    def get(self, name: str, compute) -> bytes:
        with self._guard:
            lock = self._locks.setdefault(name, threading.Lock())
        with lock:
            entry = self._entries.get(name)
            if entry is not None and entry[0] > self._clock():
                return entry[1]
            payload = compute()
            self._entries[name] = (self._clock() + self.ttl, payload)
            return payload


class DashboardServer:
    """Threaded HTTP server over a sink directory.  ``port=0`` picks an
    ephemeral port; read it from ``.port`` after ``start()``.

    ``cache_ttl_seconds`` bounds driver load: each analysis is computed
    at most once per TTL window regardless of how many clients poll
    (the HTML page refreshes every 5 s, so the default TTL of 5 s means
    the steady-state cost is one Spark job per analysis per refresh)."""

    ROUTES = {
        "top_pages": dashboard.top_pages,
        "busiest_windows": dashboard.busiest_windows,
        "revenue_over_time": dashboard.revenue_over_time,
        "event_mix": dashboard.event_mix,
    }

    def __init__(
        self,
        spark: SparkSession,
        sink_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        cache_ttl_seconds: float = 5.0,
    ):
        self.spark = spark
        self.sink_dir = sink_dir
        self.routes = dict(self.ROUTES)
        self._cache = _TTLCache(cache_ttl_seconds)
        routes = self.routes

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - stdlib API name
                if self.path == "/" or self.path == "/index.html":
                    body, ctype, code = _HTML.encode(), "text/html; charset=utf-8", 200
                elif self.path.startswith("/api/"):
                    name = self.path[len("/api/") :].split("?", 1)[0]
                    fn = routes.get(name)
                    if fn is None:
                        body, ctype, code = b'{"error": "unknown endpoint"}', "application/json", 404
                    else:
                        try:
                            body = outer._cache.get(
                                name, lambda: _df_json(fn(outer.spark, outer.sink_dir))
                            )
                            ctype, code = "application/json", 200
                        except Exception as exc:  # sink table may not exist yet
                            body = json.dumps({"error": str(exc)[:300]}).encode()
                            ctype, code = "application/json", 503
                else:
                    body, ctype, code = b"not found", "text/plain", 404
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # quiet test output
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "DashboardServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def main() -> None:  # pragma: no cover - CLI wrapper
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sink-dir", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    server = DashboardServer(get_spark("webdash"), args.sink_dir, args.host, args.port).start()
    print(f"dashboard serving on http://{args.host}:{server.port}/")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
