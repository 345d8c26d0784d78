"""APIService + stdlib HTTPServer (ref serve/api_service.py parity): route
declaration, direct dispatch, and a real localhost round-trip serving a
Pipeline."""

import json
import urllib.request

from towhee_spark.pipeline import Pipeline
from towhee_spark.serve import APIService, HTTPServer


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_api_service_http_roundtrip(spark):
    service = APIService(desc="demo")
    p = Pipeline.input("a").map("a", "b", lambda x: x + 1).output("b")

    @service.api(path="/plus1")
    def plus1(params):
        return [r[0] for r in p.run_rows(spark, [(v,) for v in params])]

    @service.api(path="/echo")
    def echo(item):
        return item

    # direct dispatch (no server)
    assert service("/plus1", [1, 5]) == [2, 6]

    srv = HTTPServer(service)
    port = srv.start()
    try:
        status, body = _post(port, "/plus1", [1, 2, 3])
        assert (status, body) == (200, [2, 3, 4])
        status, body = _post(port, "/echo", {"url": 1, "ids": [1, 2]})
        assert (status, body) == (200, {"url": 1, "ids": [1, 2]})
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30) as r:
            idx = json.loads(r.read())
        assert idx["routes"] == ["/echo", "/plus1"]
        try:
            _post(port, "/missing", [])
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # review fixes: query strings route; a handler's OWN KeyError is a
        # 500 handler error, not a bogus 'no such route' 404
        status, body = _post(port, "/plus1?trace=1", [7])
        assert (status, body) == (200, [8])

        @service.api("/needs_text")
        def needs_text(params):
            return params["text"]

        try:
            _post(port, "/needs_text", {"txt": "oops"})
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        srv.stop()
