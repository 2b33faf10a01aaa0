"""sources.fetch over a REAL socket: requests_transport + fetch_urls
against a localhost http.server — the live-HTTP path that fixture
transports can't exercise (round 6: previously import-gated dead code;
`requests` is present and loopback needs no egress). Covers the
User-Agent header actually hitting the wire, retry-on-503 over TCP,
exhaustion dropping the row, and the Spark mapInPandas crossing
(the transport closure — a requests.Session — must survive pickling
to the worker)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from sports_stats_data_pipeline_spark.sources.fetch import (
    FetchConfig,
    fetch_urls,
    requests_transport,
    safe_fetch,
)


@pytest.fixture(scope="module")
def live_server():
    hits: dict[str, int] = {}
    seen_agents: list[str] = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib contract)
            hits[self.path] = hits.get(self.path, 0) + 1
            seen_agents.append(self.headers.get("User-Agent", ""))
            if self.path.startswith("/flaky") and hits[self.path] < 3:
                self.send_response(503)
                self.end_headers()
                return
            if self.path.startswith("/gone"):
                self.send_response(404)
                self.end_headers()
                return
            body = f"<html><body>page:{self.path}</body></html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", hits, seen_agents
    finally:
        srv.shutdown()


def test_requests_transport_over_real_socket(live_server):
    base, hits, agents = live_server
    cfg = FetchConfig(sleep=lambda s: None)
    transport = requests_transport(cfg)
    status, body = transport(f"{base}/ok/1")
    assert status == 200 and "page:/ok/1" in body
    # the branded User-Agent actually reached the wire
    assert any(a == cfg.user_agent for a in agents)


def test_retry_on_503_and_exhaustion_over_socket(live_server):
    base, hits, _ = live_server
    cfg = FetchConfig(sleep=lambda s: None, retries=3)
    transport = requests_transport(cfg)
    import random

    # /flaky answers 503 twice then 200: attempt 3 must succeed
    body = safe_fetch(f"{base}/flaky/a", transport, cfg, random.Random(1))
    assert body is not None and "page:" in body
    assert hits["/flaky/a"] == 3
    # a permanent 404 exhausts retries -> row dropped (None), after
    # exactly `retries` real requests
    assert safe_fetch(f"{base}/gone/x", transport, cfg, random.Random(1)) is None
    assert hits["/gone/x"] == 3


def test_fetch_urls_end_to_end_through_spark(spark, live_server):
    """The full distributed path: url relation -> mapInPandas workers
    -> real TCP fetches (Session pickled to the worker) -> (url, html)
    rows; the failing URL is dropped, not errored."""
    base, hits, _ = live_server
    cfg = FetchConfig(sleep=lambda s: None, retries=2)
    urls = [f"{base}/doc/{i}" for i in range(6)] + [f"{base}/gone/zz"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {
        r["url"]: r["html"]
        for r in fetch_urls(
            df, requests_transport(cfg), cfg, concurrency=2
        ).collect()
    }
    assert len(out) == 6  # the 404 row dropped
    for i in range(6):
        assert f"page:/doc/{i}" in out[f"{base}/doc/{i}"]


@pytest.fixture()
def fighter_server():
    """A per-test server (own hit log) serving synthetic fighter pages:
    /fighter/<i> -> a parseable detail page, /fighter/5 503s twice then
    recovers (retry over the wire), /fighter/9 404s forever."""
    from . import fixtures_html as fx

    hits: dict[str, int] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib contract)
            with lock:
                hits[self.path] = hits.get(self.path, 0) + 1
                n = hits[self.path]
            i = int(self.path.rsplit("/", 1)[-1])
            if i == 9 or (i == 5 and n < 3):
                self.send_response(404 if i == 9 else 503)
                self.end_headers()
                return
            body = fx.fighter_page(f"Fighter {i}", record=f"{i}-1-0").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", hits
    finally:
        srv.shutdown()


def test_full_ingest_through_live_transport(spark, fighter_server, tmp_path):
    """Round-10 verdict #6: the ENTIRE reference pipeline — discover ->
    anti-join resume skip -> distributed fetch with retry over a real
    TCP socket -> parse -> first-wins merge -> staged-promote sink —
    green through requests_transport against a localhost http.server.
    The fixture-transport twin of this is test_ingest.py's
    test_ingest_end_to_end_and_resume_safety; values must line up the
    same way here with requests on the wire."""
    from sports_stats_data_pipeline_spark.sources.scrape_pipeline import (
        ingest,
    )

    base, hits = fighter_server
    cfg = FetchConfig(sleep=lambda s: None, retries=3)
    transport = requests_transport(cfg)
    urls = [f"{base}/fighter/{i}" for i in range(10)]
    sink = str(tmp_path / "live_sink")

    # run 1: a prefix ("crash" after 6) — /fighter/5's two 503s are
    # retried through the real socket inside the Spark fetch stage
    df1 = ingest(spark, urls[:6], transport, sink, cfg=cfg, concurrency=2)
    assert df1.count() == 6
    assert hits["/fighter/5"] == 3  # 503, 503, 200 — over the wire

    # run 2: full set — already-sunk URLs must not touch the server
    # again; the permanent 404 retries then drops its row, not the job
    before = dict(hits)
    df2 = ingest(spark, urls, transport, sink, cfg=cfg, concurrency=2)
    assert df2.count() == 9  # 10 minus the permanent 404
    for i in range(6):
        assert hits[f"/fighter/{i}"] == before[f"/fighter/{i}"], (
            "already-sunk URL re-fetched through the live transport"
        )
    assert hits["/fighter/9"] == cfg.retries
    names = sorted(r["Name"] for r in df2.select("Name").collect())
    assert names == sorted(f"Fighter {i}" for i in range(9))
    # parsed field values survived the wire round-trip
    rec = {r["Name"]: r["Record"] for r in df2.collect()}
    assert rec["Fighter 3"] == "3-1-0"
