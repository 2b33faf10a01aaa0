"""Retry / rate-limit fetch infrastructure (SURVEY.md §2.12 I1–I3).

Reproduces the reference's ``safe_request`` semantics
(scrapers/fighters_scraper.py:26-38, scrapers/fights_scraper.py:28-40):
N attempts, fixed-delay + uniform-jitter backoff, bounded timeout,
non-200 → retry, exhaustion → **row dropped, job continues** — the
per-URL failure tolerance that Spark's task-level ``maxFailures`` is too
coarse to express, so it lives inside the fetch function.

Design departures for a distributed engine:
- the transport is injected (``Callable[[url], (status, body)]``) so
  tests run hermetically and production can plug requests/httpx;
- randomness comes from a seeded per-partition RNG → deterministic tests;
- rate limiting is per partition: cap global request concurrency by
  ``repartition(n)`` on the key list, not by a global lock (there is no
  cross-executor clock at cluster scale — n_partitions × per-partition
  rate is the throughput contract, matching the reference's single-loop
  sleep pattern when n=1).
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame

#: transport contract: url -> (status_code, body). Exceptions are treated
#: as transient failures (retried like non-200s).
Transport = Callable[[str], tuple[int, str]]


@dataclass
class FetchConfig:
    retries: int = 3
    delay_s: float = 5.0
    jitter_s: tuple[float, float] = (1.0, 3.0)
    rate_limit_s: tuple[float, float] = (1.0, 2.0)
    user_agent: str = "sports-stats-data-pipeline-spark/0.1 (research)"
    seed: int = 42
    #: sleep hook — injectable so tests run instantly.
    sleep: Callable[[float], None] = field(default=time.sleep)


def requests_transport(cfg: FetchConfig | None = None) -> Transport:
    """Real HTTP transport mirroring the reference's ``safe_request``
    session setup (fighters_scraper.py:26-38: requests.get with a 15 s
    timeout and a branded User-Agent; retry/backoff live in
    :func:`safe_fetch`, not here).

    Import-guarded against a missing ``requests``; most tests inject
    fixture transports for hermeticity, and tests/test_live_transport.py
    exercises THIS transport over a real loopback socket (header on the
    wire, 503 retry, exhaustion drop, and the mapInPandas worker
    crossing with the pickled Session) — no external egress needed. A
    production deployment passes ``requests_transport(cfg)`` anywhere a
    ``Transport`` is accepted.
    """
    cfg = cfg or FetchConfig()
    try:
        import requests
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "the 'requests' package is required for the live HTTP "
            "transport; tests use injected fixture transports"
        ) from e

    session = requests.Session()
    session.headers["User-Agent"] = cfg.user_agent

    def transport(url: str) -> tuple[int, str]:
        resp = session.get(url, timeout=15)
        return resp.status_code, resp.text

    return transport


def safe_fetch(
    url: str, transport: Transport, cfg: FetchConfig, rng: random.Random
) -> str | None:
    """One URL with retry/backoff; None on exhaustion (row dropped)."""
    for attempt in range(cfg.retries):
        try:
            status, body = transport(url)
            if status == 200:
                return body
        except Exception:
            pass
        if attempt < cfg.retries - 1:
            cfg.sleep(cfg.delay_s + rng.uniform(*cfg.jitter_s))
    return None


def fetch_urls(
    url_df: DataFrame,
    transport: Transport,
    cfg: FetchConfig | None = None,
    url_col: str = "url",
    concurrency: int | None = None,
) -> DataFrame:
    """url DataFrame -> (url, html) DataFrame via Arrow-batched
    mapInPandas; failed URLs are dropped, not errored (reference
    semantics, fighters_scraper.py:66-67 / 181-182).

    ``concurrency`` bounds parallel fetch streams by repartitioning the
    key list (rate limit I2 applies within each partition).
    """
    from .tables import ensure_session_confs

    ensure_session_confs(url_df.sparkSession)
    cfg = cfg or FetchConfig()
    if concurrency:
        url_df = url_df.repartition(concurrency)

    def fetch_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        rng = random.Random(
            (cfg.seed, ctx.partitionId() if ctx else 0).__hash__()
        )
        first = True
        for pdf in batches:
            out_urls, out_html = [], []
            for url in pdf[url_col]:
                if not first:
                    cfg.sleep(rng.uniform(*cfg.rate_limit_s))
                first = False
                body = safe_fetch(url, transport, cfg, rng)
                if body is not None:
                    out_urls.append(url)
                    out_html.append(body)
            yield pd.DataFrame({"url": out_urls, "html": out_html})

    return url_df.select(url_col).mapInPandas(
        fetch_batches, schema="url string, html string"
    )
