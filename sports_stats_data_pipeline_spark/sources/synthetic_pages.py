"""Spark 4 Python Data Sources implementing the reference's source shapes:
S1 — an alphabet-partitioned fighter-page source (SURVEY.md §2.1, one
InputPartition per letter, `FIGHTERS_URL.format(letter)` at
fighters_scraper.py:42-62) — and S2/S3 — an event-partitioned fight-page
source (one InputPartition per event, the get_event_links →
get_fight_links fan-out at fights_scraper.py:43-66).

These connectors *generate* deterministic synthetic pages (no network,
seeded per key), so the full ingest pipeline — custom source → parse UDF
→ silver casts → merge — runs hermetically in tests and demos. A live
deployment swaps the page generator for an HTTP fetch inside ``read``
while keeping the same partitioning contract: each letter/event is an
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


# --------------------------------------------------------------------------
# Fight pages (S2/S3): one partition per EVENT, each yielding that event's
# fight pages — the reference's two-level fan-out as source partitioning.
# --------------------------------------------------------------------------
_FIGHT_PAGE_TEMPLATE = """
<html><body>
<h2 class="b-content__title">{event_name}</h2>
<div class="b-fight-details__person">
  <i class="b-fight-details__person-status">{result_a}</i>
  <h3 class="b-fight-details__person-name"><a href="#">{fighter_a}</a></h3>
</div>
<div class="b-fight-details__person">
  <i class="b-fight-details__person-status">{result_b}</i>
  <h3 class="b-fight-details__person-name"><a href="#">{fighter_b}</a></h3>
</div>
<p class="b-fight-details__text">
  <i class="b-fight-details__label">Method:</i> {method}
  <i class="b-fight-details__label">Round:</i> {end_round}
  <i class="b-fight-details__label">Time:</i> {end_m}:{end_s:02d}
  <i class="b-fight-details__label">Time format:</i> {rounds} Rnd
</p>
<section><h4>Totals</h4>
<table><tbody><tr>
<td><p class="b-fight-details__table-text">{fighter_a}</p>
    <p class="b-fight-details__table-text">{fighter_b}</p></td>
<td><p class="b-fight-details__table-text">{sig_a_l} of {sig_a_t}</p>
    <p class="b-fight-details__table-text">{sig_b_l} of {sig_b_t}</p></td>
<td><p class="b-fight-details__table-text">{tot_a_l} of {tot_a_t}</p>
    <p class="b-fight-details__table-text">{tot_b_l} of {tot_b_t}</p></td>
<td><p class="b-fight-details__table-text">{td_a} of {td_a_t}</p>
    <p class="b-fight-details__table-text">{td_b} of {td_b_t}</p></td>
<td><p class="b-fight-details__table-text">{ctrl_a_m}:{ctrl_a_s:02d}</p>
    <p class="b-fight-details__table-text">{ctrl_b_m}:{ctrl_b_s:02d}</p></td>
<td><p class="b-fight-details__table-text">{sub_a}</p>
    <p class="b-fight-details__table-text">{sub_b}</p></td>
</tr></tbody></table></section>
</body></html>
"""

_METHODS = ("KO/TKO", "Submission", "Decision - Unanimous", "Decision - Split")


def fight_page_params(event: str, idx: int) -> dict:
    """Deterministic fight parameters for fight ``idx`` of ``event`` —
    shared by the page generator AND the oracle's independent expected-row
    derivation (the Spark path must *parse* these back out of the HTML)."""
    h = hashlib.md5(f"{event}:{idx}".encode()).hexdigest()
    b = [int(h[i : i + 2], 16) for i in range(0, 32, 2)]
    rounds = 3 if b[0] % 2 == 0 else 5
    return {
        "event_name": f"Event {event.upper()} Night",
        "fighter_a": f"{event.upper()} Alpha {idx}",
        "fighter_b": f"{event.upper()} Bravo {idx}",
        "result_a": "W" if b[1] % 2 == 0 else "L",
        "result_b": "L" if b[1] % 2 == 0 else "W",
        "method": _METHODS[b[2] % len(_METHODS)],
        "end_round": 1 + b[3] % rounds,
        "end_m": b[4] % 5,
        "end_s": b[5] % 60,
        "rounds": rounds,
        "sig_a_l": b[6] % 60,
        "sig_a_t": b[6] % 60 + b[7] % 60,
        "sig_b_l": b[8] % 60,
        "sig_b_t": b[8] % 60 + b[9] % 60,
        "tot_a_l": b[10] % 90,
        "tot_a_t": b[10] % 90 + b[11] % 60,
        "tot_b_l": b[12] % 90,
        "tot_b_t": b[12] % 90 + b[13] % 60,
        "td_a": b[14] % 6,
        "td_a_t": b[14] % 6 + b[15] % 5,
        "td_b": b[0] % 6,
        "td_b_t": b[0] % 6 + b[1] % 5,
        "ctrl_a_m": b[2] % 5,
        "ctrl_a_s": b[3] % 60,
        "ctrl_b_m": b[4] % 3,
        "ctrl_b_s": b[6] % 60,
        "sub_a": b[7] % 3,
        "sub_b": b[8] % 2,
    }


def synth_fight_page(event: str, idx: int) -> tuple[str, str]:
    """Deterministic (url, html) for fight ``idx`` under ``event``."""
    p = fight_page_params(event, idx)
    h = hashlib.md5(f"{event}:{idx}".encode()).hexdigest()
    url = f"http://example.com/fight-details/{event}{idx}-{h[:6]}"
    return url, _FIGHT_PAGE_TEMPLATE.format(**p)


class _EventPartition(InputPartition):
    def __init__(self, event: str, per_event: int):
        self.event = event
        self.per_event = per_event


class FightPagesReader(DataSourceReader):
    def __init__(self, options):
        self.events = options.get("events", "xyz")
        self.per_event = int(options.get("perEvent", "4"))

    def partitions(self):
        # one InputPartition per event — level 1 of the S2/S3 fan-out.
        return [_EventPartition(e, self.per_event) for e in self.events]

    def read(self, partition: _EventPartition):
        for i in range(partition.per_event):
            url, html = synth_fight_page(partition.event, i)
            yield (partition.event, url, html)


class FightPagesDataSource(DataSource):
    """``spark.read.format("fight_pages").option("events", "xy")
    .option("perEvent", "3").load()``"""

    @classmethod
    def name(cls) -> str:
        return "fight_pages"

    def schema(self) -> str:
        return "event string, url string, html string"

    def reader(self, schema) -> FightPagesReader:
        return FightPagesReader(self.options)
