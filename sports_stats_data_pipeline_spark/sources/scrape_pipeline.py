"""End-to-end scraper-parity ingestion: the reference's two entry points
(SURVEY.md §3) as one incremental, resume-safe Spark pipeline.

Dataflow (mirrors fighters_scraper.py:159-211 / fights_scraper.py:217-267):

    discover keys -> anti-join sink (J1: skip processed) -> fetch
    (I1 retry + I2 rate limit, sources.fetch) -> parse (S4 UDF,
    sources.html_source) -> insert-if-absent merge (A5/U1 first-wins,
    operators.merge) -> overwrite parquet sink (S5, Parquet not CSV)

Key upgrades over the reference, same semantics:
- the sink is Parquet with an explicit schema (not inference-on-read CSV);
- the merge is O(existing + Δ) once per run, not an O(total) CSV rewrite
  every N rows — periodic checkpointing belongs to Structured Streaming
  (streaming.pipeline.run_streaming_upsert) where the state store does it
  transactionally;
- fetch parallelism is explicit (``concurrency`` partitions), the
  reference is single-threaded.

Resume-safety invariant (tested in tests/test_ingest.py): running any
prefix of the URL set, then the full set, produces byte-identical sink
contents to one full run — the reference's core guarantee (R14-15).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import insert_if_absent
from ..operators.sinks import promote_staging, recover_sink
from ..schemas import (
    FIGHTERS_RAW,
    FIGHTS_RAW,
    fighters_raw_ddl,
    fights_raw_ddl,
)
from .fetch import FetchConfig, Transport, fetch_urls
from .html_source import parse_pages


def _load_sink(spark: SparkSession, sink_path: str, ddl: str) -> DataFrame:
    if os.path.exists(sink_path):
        return spark.read.parquet(sink_path)
    return spark.createDataFrame([], schema=ddl)


def _replace_sink(df: DataFrame, sink_path: str) -> None:
    # stage → rename-aside → promote (never rmtree the live sink before
    # the promote): a crash at any point leaves a recoverable complete
    # sink — operators.sinks documents the protocol.
    df.write.mode("overwrite").parquet(sink_path + ".staging")
    promote_staging(sink_path)


def ingest(
    spark: SparkSession,
    urls: list[str],
    transport: Transport,
    sink_path: str,
    kind: str = "fighter",
    cfg: FetchConfig | None = None,
    concurrency: int = 4,
) -> DataFrame:
    """One incremental ingestion run; returns the merged sink DataFrame."""
    if kind == "fighter":
        ddl, struct, key = fighters_raw_ddl(), FIGHTERS_RAW, "URL"
    else:
        ddl, struct, key = fights_raw_ddl(), FIGHTS_RAW, "fight_url"
    field_names = [f.name for f in struct if f.name != key]
    recover_sink(sink_path)
    existing = _load_sink(spark, sink_path, ddl)

    url_df = spark.createDataFrame(
        [(u,) for u in urls], schema="url string"
    ).dropDuplicates(["url"])
    # J1: the incremental anti-join BEFORE the expensive fetch — predicate
    # placement the optimizer cannot do through an opaque UDF, so the
    # program orders it explicitly (SURVEY.md §4.1 UDF-barrier note).
    todo = url_df.join(existing.select("url"), on="url", how="left_anti")

    pages = fetch_urls(todo, transport, cfg, concurrency=concurrency)
    parsed = parse_pages(pages, kind=kind, schema=ddl, field_names=field_names)

    merged = insert_if_absent(existing, parsed, keys=["url"])
    _replace_sink(merged, sink_path)
    return spark.read.parquet(sink_path)


def discover_fighter_urls(
    index_pages: dict[str, str], marker: str = "fighter-details"
) -> list[str]:
    """S1 discovery: per-letter index pages -> deduped child URLs (the
    reference's get_fighter_links, fighters_scraper.py:42-62). Driver-side
    because the key space (26 pages) is trivially small; the fetched
    *details* are the distributed part."""
    from .html_source import extract_links

    seen, out = set(), []
    for html in index_pages.values():
        for u in extract_links(html, marker):
            if u not in seen:
                seen.add(u)
                out.append(u)
    return out


def discover_fight_urls(
    spark: SparkSession,
    event_urls: list[str],
    transport: Transport,
    cfg: FetchConfig | None = None,
    concurrency: int = 4,
    marker: str = "fight-details",
) -> DataFrame:
    """S2+S3 two-level fan-out (the reference's get_event_links →
    get_fight_links nesting, fights_scraper.py:43-66): fetch each event
    page distributed, explode its child fight links — unlike the
    reference's sequential double loop, level 2 is a single distributed
    explode over the level-1 fetch results."""
    from pyspark.sql import functions as F

    event_df = spark.createDataFrame(
        [(u,) for u in event_urls], schema="url string"
    ).dropDuplicates(["url"])
    pages = fetch_urls(event_df, transport, cfg, concurrency=concurrency)
    from .html_source import _HREF_RE

    # pure-expression link extraction reusing the parser's href pattern
    # ((?i) replaces the re.I flag, which the string form can't carry) —
    # stays inside whole-stage codegen; a row-at-a-time Python UDF here
    # was the only one in the package and cost a worker round-trip per
    # page for what a regexp_extract_all + filter expresses directly.
    hrefs = F.regexp_extract_all(
        "html", F.lit("(?i)" + _HREF_RE.pattern), 1
    )
    return (
        pages.select(
            F.explode(
                F.filter(hrefs, lambda u: u.contains(marker))
            ).alias("url")
        )
        .dropDuplicates(["url"])
    )
