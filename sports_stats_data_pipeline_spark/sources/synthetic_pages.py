"""Spark 4 Python Data Source implementing the reference's S1 shape:
an alphabet-partitioned page source (SURVEY.md §2.1 — one InputPartition
per letter, `FIGHTERS_URL.format(letter)` at fighters_scraper.py:42-62).

This connector *generates* deterministic synthetic fighter pages (no
network, seeded per letter), so the full ingest pipeline — custom source →
parse UDF → silver casts → merge — runs hermetically in tests and demos.
A live deployment swaps the page generator for an HTTP fetch inside
``read`` while keeping the same partitioning contract: each letter is an
independent task, retried independently, exactly the reference's crawl
topology distributed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

LETTERS = "abcdefghijklmnopqrstuvwxyz"

_PAGE_TEMPLATE = """
<html><body>
<span class="b-content__title-highlight">{name}</span>
<span class="b-content__title-record">Record: {w}-{l}-{d}</span>
<ul>
<li class="b-list__box-list-item"><i>Height:</i> {feet}' {inches}"</li>
<li class="b-list__box-list-item"><i>Weight:</i> {weight} lbs.</li>
</ul>
</body></html>
"""


def synth_fighter_page(letter: str, idx: int) -> tuple[str, str]:
    """Deterministic (url, html) for fighter ``idx`` under ``letter``."""
    h = hashlib.md5(f"{letter}:{idx}".encode()).hexdigest()
    url = f"http://example.com/fighter-details/{letter}{idx}-{h[:6]}"
    html = _PAGE_TEMPLATE.format(
        name=f"{letter.upper()}ighter {letter.upper()}{idx}",
        w=int(h[0:2], 16) % 40,
        l=int(h[2:4], 16) % 15,
        d=int(h[4:5], 16) % 3,
        feet=5 + int(h[5], 16) % 2,
        inches=int(h[6:8], 16) % 12,
        weight=115 + 10 * (int(h[8:10], 16) % 16),
    )
    return url, html


class _LetterPartition(InputPartition):
    def __init__(self, letter: str, per_letter: int):
        self.letter = letter
        self.per_letter = per_letter


class FighterPagesReader(DataSourceReader):
    def __init__(self, options):
        self.letters = options.get("letters", LETTERS)
        self.per_letter = int(options.get("perLetter", "5"))

    def partitions(self):
        # one InputPartition per letter — the reference's crawl topology.
        return [_LetterPartition(ch, self.per_letter) for ch in self.letters]

    def read(self, partition: _LetterPartition):
        for i in range(partition.per_letter):
            url, html = synth_fighter_page(partition.letter, i)
            yield (partition.letter, url, html)


class FighterPagesDataSource(DataSource):
    """Register with ``spark.dataSource.register(FighterPagesDataSource)``
    then ``spark.read.format("fighter_pages").option("letters", "abc")
    .load()``."""

    @classmethod
    def name(cls) -> str:
        return "fighter_pages"

    def schema(self) -> str:
        return "letter string, url string, html string"

    def reader(self, schema) -> FighterPagesReader:
        return FighterPagesReader(self.options)
