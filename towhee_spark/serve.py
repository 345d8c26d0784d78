"""Minimal serving surface — parity with towhee.serve.api_service.APIService
(ref serve/api_service.py:28-99: declare routes with @service.api(path=...),
then run an HTTP server over them) using ONLY the stdlib http.server.

Scope: the DECLARATION + HTTP dispatch layer. Routes are plain callables
(typically closing over a Pipeline + SparkSession and calling ``run_rows``
or ``apply``); bodies are JSON in, JSON out, POST only — the reference's
http client contract (``requests.post(url, json=[...]).json()``). The
gRPC / Triton transports stay out of scope (SURVEY §3.3): at cluster scale
model serving belongs to a serving tier, not the batch engine; this server
exists for the reference's local-service workflow and for tests.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class APIService:
    """Route registry + stdlib HTTP server.

    >>> service = APIService(desc="demo")
    >>> @service.api(path="/double")
    ... def double(params):
    ...     return [x * 2 for x in params]
    >>> service(  "/double", [1, 2])     # direct dispatch (no server)
    [2, 4]
    """

    def __init__(self, desc: str = ""):
        self.desc = desc
        self._routes: dict[str, Callable] = {}

    def api(self, path: str):
        def decorator(fn: Callable) -> Callable:
            self.add_api(fn, path)
            return fn

        return decorator

    def add_api(self, fn: Callable, path: str) -> None:
        if not path.startswith("/"):
            path = "/" + path
        self._routes[path] = fn

    @property
    def routes(self) -> list[str]:
        return sorted(self._routes)

    def __call__(self, path: str, payload):
        """Dispatch without a server — the testable core."""
        return self.resolve(path)(payload)

    def resolve(self, path: str) -> Callable:
        """Route lookup alone — lets the server distinguish 'no such route'
        (404) from a handler's OWN KeyError (500)."""
        if path not in self._routes:
            raise KeyError(f"no route {path!r}; have {self.routes}")
        return self._routes[path]


class HTTPServer:
    """ThreadingHTTPServer over an APIService: POST <path> with a JSON body
    → JSON response; GET / lists routes. start() runs on a daemon thread
    (the Spark driver stays the process)."""

    def __init__(self, service: APIService):
        self.service = service
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def _handler(self):
        service = self.service

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: D102
                pass

            def _send(self, code: int, obj) -> None:
                body = json.dumps(obj).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                self._send(200, {"desc": service.desc, "routes": service.routes})

            def do_POST(self):  # noqa: N802
                from urllib.parse import urlsplit  # noqa: PLC0415

                n = int(self.headers.get("Content-Length") or 0)
                # strip the query string so POST /route?x=1 still routes;
                # resolve OUTSIDE the handler try so a handler's own
                # KeyError reports as 500, not a bogus 404
                try:
                    fn = service.resolve(urlsplit(self.path).path)
                except KeyError as e:
                    self._send(404, {"error": str(e)})
                    return
                try:
                    payload = json.loads(self.rfile.read(n) or b"null")
                    self._send(200, fn(payload))
                except Exception as e:  # noqa: BLE001
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Bind and serve on a daemon thread; returns the bound port
        (port=0 → ephemeral)."""
        self._httpd = ThreadingHTTPServer((host, port), self._handler())
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def run(self, host: str = "0.0.0.0", port: int = 8000) -> None:  # noqa: S104
        """Foreground serve — the reference's HTTPServer(service).run()."""
        ThreadingHTTPServer((host, port), self._handler()).serve_forever()

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
