"""Silver-transform tests: bronze page-parse output → typed rows per the
FIXTURES.md §A3 contract, end-to-end from HTML fixtures."""

from __future__ import annotations

import datetime

from sports_stats_data_pipeline_spark.schemas import (
    FIGHTERS_RAW,
    FIGHTS_RAW,
    fighters_raw_ddl,
    fights_raw_ddl,
)
from sports_stats_data_pipeline_spark.sources.html_source import parse_pages
from sports_stats_data_pipeline_spark.transforms.silver import (
    fighters_silver,
    fights_silver,
)

from . import fixtures_html as fx

AS_OF = "2026-08-13"


def _bronze(spark, pages, kind, ddl, struct, key):
    pages_df = spark.createDataFrame(pages, schema="url string, html string")
    names = [f.name for f in struct if f.name != key]
    return parse_pages(pages_df, kind=kind, schema=ddl, field_names=names)


def test_fighter_html_to_silver(spark):
    bronze = _bronze(
        spark,
        [("u1", fx.FIGHTER_PAGE), ("u2", fx.FIGHTER_PAGE_SPARSE)],
        "fighter",
        fighters_raw_ddl(),
        FIGHTERS_RAW,
        "URL",
    )
    silver = {r["url"]: r for r in fighters_silver(bronze, AS_OF).collect()}
    full, sparse = silver["u1"], silver["u2"]

    assert full["name"] == "Jon Example"
    assert (full["wins"], full["losses"], full["draws"]) == (28, 1, 0)
    assert full["height_cm"] == (5 * 12 + 11) * 2.54
    assert full["weight_kg"] == 155 * 0.45359237
    assert full["str_acc"] == 0.58
    assert full["dob"] == datetime.date(1987, 7, 19)
    assert full["last_fight_date"] == datetime.date(2025, 3, 5)
    assert full["active_status"] == "Active"

    assert (sparse["wins"], sparse["losses"], sparse["draws"]) == (15, 3, None)
    assert sparse["nickname"] is None
    assert sparse["reach_cm"] is None
    assert sparse["last_fight_date"] is None
    assert sparse["active_status"] == "Inactive"


def test_fight_html_to_silver(spark):
    bronze = _bronze(
        spark,
        [("f1", fx.FIGHT_PAGE)],
        "fight",
        fights_raw_ddl(),
        FIGHTS_RAW,
        "fight_url",
    )
    row = fights_silver(bronze).collect()[0]
    assert row["fight_url"] == "f1"
    assert row["end_round"] == 3
    assert row["end_time_s"] == 4 * 60 + 15
    assert row["scheduled_rounds"] == 3
    assert row["fighter_a_sig_str_landed"] == 45
    assert row["fighter_a_sig_str_attempted"] == 112
    assert row["fighter_b_sig_str_landed"] == 38
    assert row["fighter_a_ctrl_s"] == 222
    assert row["fighter_b_ctrl_s"] == 0
    assert row["fighter_a_sub_att"] == 1
    # single-<p> cell -> N/A -> NULL after silver
    assert row["fighter_b_body_landed"] is None
