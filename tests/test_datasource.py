"""Python Data Source tests: the alphabet-partitioned connector (S1) and
its composition with the parse layer into a full bronze ingest."""

from __future__ import annotations

from sports_stats_data_pipeline_spark.schemas import fighters_raw_ddl
from sports_stats_data_pipeline_spark.schemas import FIGHTERS_RAW
from sports_stats_data_pipeline_spark.sources.html_source import parse_pages
from sports_stats_data_pipeline_spark.sources.synthetic_pages import (
    FighterPagesDataSource,
    synth_fighter_page,
)


def test_datasource_partitioned_by_letter(spark):
    spark.dataSource.register(FighterPagesDataSource)
    df = (
        spark.read.format("fighter_pages")
        .option("letters", "abc")
        .option("perLetter", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one partition per letter
    rows = df.collect()
    assert len(rows) == 12
    assert {r["letter"] for r in rows} == {"a", "b", "c"}
    assert all("fighter-details" in r["url"] for r in rows)


def test_datasource_is_deterministic(spark):
    assert synth_fighter_page("a", 0) == synth_fighter_page("a", 0)
    spark.dataSource.register(FighterPagesDataSource)

    def load():
        return sorted(
            map(
                tuple,
                spark.read.format("fighter_pages")
                .option("letters", "xy")
                .load()
                .collect(),
            )
        )

    assert load() == load()


def test_datasource_feeds_parse_pipeline(spark):
    spark.dataSource.register(FighterPagesDataSource)
    pages = (
        spark.read.format("fighter_pages")
        .option("letters", "ab")
        .option("perLetter", "3")
        .load()
        .select("url", "html")
    )
    field_names = [f.name for f in FIGHTERS_RAW if f.name != "URL"]
    parsed = parse_pages(
        pages, kind="fighter", schema=fighters_raw_ddl(), field_names=field_names
    )
    rows = parsed.collect()
    assert len(rows) == 6
    by_url = {r["url"]: r for r in rows}
    assert all(r["Name"] for r in rows)
    assert all(r["Record"] for r in rows)
    # silver-layer parse of a generated record round-trips
    url, _ = synth_fighter_page("a", 0)
    assert "-" in by_url[url]["Record"]
