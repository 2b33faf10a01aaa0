"""Main-content extraction: hand-anchored pages (nav/footer/sidebar
dropped, article paragraphs kept), link-density and length cut-offs,
script/style removal, and plain-text idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.boilerplate import (
    extract_main_text,
    main_text_blocks,
)

PARA1 = (
    "The championship bout ran the full five rounds with both athletes "
    "landing significant strikes throughout the contest."
)
PARA2 = (
    "Judges scored the fight narrowly, and the split decision drew a "
    "loud reaction from the sold-out arena crowd."
)

PAGE = f"""
<html><head><title>x</title>
<style>body {{ color: red }}</style>
<script>var nav = "Home About Contact";</script>
</head><body>
<nav><ul>
<li><a href="/">Home</a></li>
<li><a href="/news">News and other stories from around the league</a></li>
<li><a href="/contact">Contact the editorial desk directly here</a></li>
</ul></nav>
<div id="content">
<p>{PARA1}</p>
<p>{PARA2}</p>
<p>Short note.</p>
</div>
<footer><a href="/tos">Terms of service and privacy policy page</a> |
<a href="/jobs">Careers at the company, openings listed</a></footer>
</body></html>
"""


def _one(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        extract_main_text("html", **kw).alias("t"),
        main_text_blocks("html", **kw).alias("blocks"),
    ).collect()[0]


def test_keeps_paragraphs_drops_nav_footer_script(spark):
    r = _one(spark, PAGE)
    assert r["blocks"] == [PARA1, PARA2]
    assert r["t"] == PARA1 + "\n" + PARA2
    for junk in ("Home", "Terms of service", "var nav", "color: red"):
        assert junk not in r["t"]


def test_short_blocks_drop_and_min_chars_dial(spark):
    r = _one(spark, PAGE, min_chars=5)
    assert "Short note." in r["blocks"]  # survives a lower cut-off
    r2 = _one(spark, PAGE, min_chars=40)
    assert "Short note." not in r2["blocks"]


def test_link_density_cut(spark):
    # a long block that is almost entirely one link: dropped despite its
    # length; the same text unlinked: kept.
    linked = f"<p><a href='/x'>{PARA1}</a> extra</p>"
    plain = f"<p>{PARA1} extra</p>"
    assert _one(spark, linked)["blocks"] == []
    assert _one(spark, plain)["blocks"] == [PARA1 + " extra"]


def test_plain_text_passes_through(spark):
    # tag-free input is one block: survives iff long enough, unchanged.
    r = _one(spark, PARA1)
    assert r["t"] == PARA1
    assert _one(spark, "tiny")["t"] == ""


def test_null_and_empty_are_safe(spark):
    df = spark.createDataFrame([(None,), ("",)], "html string")
    rows = df.select(extract_main_text("html").alias("t")).collect()
    assert [r["t"] for r in rows] == [None, ""]


def test_map_only_no_shuffle(spark):
    """The extraction must stay a map-side projection — no Exchange in
    the plan (the property that makes it safe at 100 TB)."""
    import contextlib
    import io

    df = spark.range(10).select(
        F.concat(F.lit("<p>"), F.lit(PARA1), F.lit("</p>")).alias("html")
    )
    out = df.select(extract_main_text("html").alias("t"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    assert "Exchange" not in buf.getvalue()
