"""Main-content extraction: strip navigation / menu / footer boilerplate
from raw HTML and keep the article text — the first filter every
web-crawl training corpus applies (the trafilatura / jusText / Readability
family), as pure Spark expressions (no UDF, no external parser).

The workhorse heuristic is the jusText one (Pomikálek 2011): split the
page into BLOCKS at block-level tags, then score each block by

- text length — boilerplate blocks ("Home", "Log in", "© 2026") are
  short, content paragraphs are long;
- link density — the fraction of a block's text that sits inside
  ``<a>`` tags; navigation is nearly all links, prose nearly none;
- stopword/punctuation structure is already available downstream via
  functions.text (quality scoring) — this operator only does the
  structural split, so the two passes compose.

Everything is expression-level: one regexp pass drops ``<script>`` /
``<style>`` / comments, one split on block-close tags yields the block
array, and per-block length + link-text length come from
``transform`` / ``filter`` / ``aggregate`` HOFs — per-row cost is
O(page size), no Python in the hot path, Arrow never crosses. The
outer HTML column is :func:`~..functions.text.let1`-bound everywhere it
feeds a lambda (the HOF scope trap — NOTES.md perf lessons).

Scale note: this runs as a map-only projection — no shuffle, perfectly
partition-parallel, the ideal 100-TB shape. Tune ``min_chars`` /
``max_link_density`` per corpus; the defaults match the jusText
"short block" / "high link density" cut-offs in spirit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.text import let1

#: tags whose closing form ends a text block (block-level elements).
_BLOCK_SPLIT_RE = (
    r"(?i)</(?:p|div|li|ul|ol|h[1-6]|td|tr|table|section|article|"
    r"header|footer|nav|blockquote|pre|br)\s*>|<br\s*/?>"
)
#: non-content subtrees removed wholesale before splitting.
_DROP_SUBTREE_RE = (
    r"(?is)<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->"
)
_TAG_RE = r"<[^>]+>"
_ANCHOR_TEXT_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"
_WS_RE = r"\s+"


def _block_text(block: Column) -> Column:
    """Visible text of a raw-html block: tags stripped, whitespace
    collapsed, trimmed."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(block, F.lit(_TAG_RE), F.lit(" ")),
            F.lit(_WS_RE),
            F.lit(" "),
        )
    )


def _link_text_len(block: Column) -> Column:
    """Total visible-text length inside the block's <a> elements."""
    return F.aggregate(
        F.regexp_extract_all(block, F.lit(_ANCHOR_TEXT_RE), F.lit(1)),
        F.lit(0),
        lambda acc, a: acc + F.length(_block_text(a)),
    )


def main_text_blocks(
    html: str | Column = "html",
    min_chars: int = 40,
    max_link_density: float = 0.33,
) -> Column:
    """Array of content-block texts: blocks shorter than ``min_chars``
    visible characters or with link density above ``max_link_density``
    are dropped as boilerplate."""
    c = F.col(html) if isinstance(html, str) else html
    cleaned = F.regexp_replace(c, F.lit(_DROP_SUBTREE_RE), F.lit(" "))
    blocks = F.split(cleaned, _BLOCK_SPLIT_RE)
    return let1(
        blocks,
        lambda bs: F.transform(
            F.filter(
                F.transform(
                    bs,
                    lambda b: F.struct(
                        _block_text(b).alias("t"),
                        _link_text_len(b).alias("l"),
                    ),
                ),
                lambda s: (F.length(s["t"]) >= min_chars)
                & (
                    s["l"]
                    <= F.length(s["t"]) * F.lit(float(max_link_density))
                ),
            ),
            lambda s: s["t"],
        ),
    )


def extract_main_text(
    html: str | Column = "html",
    min_chars: int = 40,
    max_link_density: float = 0.33,
) -> Column:
    """Boilerplate-stripped page text: the kept blocks joined with
    newlines (empty string when nothing survives — filter on
    ``length > 0`` downstream to drop nav-only pages)."""
    return F.array_join(
        main_text_blocks(
            html, min_chars=min_chars, max_link_density=max_link_density
        ),
        "\n",
    )
