"""Synthetic HTML fixtures reproducing the selector structure the
reference reads (FIXTURES.md §A4). No scraped content."""

FIGHTER_INDEX_PAGE = """
<html><body><table>
<tr class="b-statistics__table-row">
  <a href="http://example.com/fighter-details/a1">A One</a></tr>
<tr class="b-statistics__table-row">
  <a href="http://example.com/fighter-details/a2">A Two</a></tr>
<tr class="b-statistics__table-row">
  <a href="http://example.com/other/x">ignore me</a></tr>
<tr class="b-statistics__table-row">
  <a href="http://example.com/fighter-details/a1">A One again</a></tr>
</table></body></html>
"""

FIGHTER_PAGE = """
<html><body>
<span class="b-content__title-highlight"> Jon Example </span>
<p class="b-content__Nickname"> Bones </p>
<span class="b-content__title-record">Record: 28-1-0</span>
<ul>
<li class="b-list__box-list-item"><i>Height:</i> 5' 11"</li>
<li class="b-list__box-list-item"><i>Weight:</i> 155 lbs.</li>
<li class="b-list__box-list-item"><i>Reach:</i> 70"</li>
<li class="b-list__box-list-item"><i>STANCE:</i> Orthodox</li>
<li class="b-list__box-list-item"><i>DOB:</i> Jul. 19, 1987</li>
<li class="b-list__box-list-item"><i>SLpM:</i> 4.32</li>
<li class="b-list__box-list-item"><i>Str. Acc.:</i> 58%</li>
</ul>
<p class="b-fight-details__table-text">Mar. 5, 2025</p>
<p class="b-fight-details__table-text">Jan. 15, 2020</p>
</body></html>
"""

#: missing nickname + reach, 2-part record (edge cases, FIXTURES.md §A4)
FIGHTER_PAGE_SPARSE = """
<html><body>
<span class="b-content__title-highlight">Ann Sparse</span>
<span class="b-content__title-record">Record: 15-3</span>
<ul>
<li class="b-list__box-list-item"><i>Height:</i> 5' 4"</li>
<li class="b-list__box-list-item"><i>Weight:</i> 115 lbs.</li>
</ul>
</body></html>
"""

FIGHT_PAGE = """
<html><body>
<h2 class="b-content__title">UFC 300: One vs Two</h2>
<div class="b-fight-details__person">
  <i class="b-fight-details__person-status">W</i>
  <h3 class="b-fight-details__person-name"><a href="#">Fighter One</a></h3>
</div>
<div class="b-fight-details__person">
  <i class="b-fight-details__person-status">L</i>
  <h3 class="b-fight-details__person-name"><a href="#">Fighter Two</a></h3>
</div>
<p class="b-fight-details__text">
  <i class="b-fight-details__label">Method:</i> KO/TKO
  <i class="b-fight-details__label">Round:</i> 3
  <i class="b-fight-details__label">Time:</i> 4:15
  <i class="b-fight-details__label">Time format:</i> 3 Rnd (5-5-5)
</p>
<section><h4>Totals</h4>
<table><tbody><tr>
<td><p class="b-fight-details__table-text">Fighter One</p>
    <p class="b-fight-details__table-text">Fighter Two</p></td>
<td><p class="b-fight-details__table-text">45 of 112</p>
    <p class="b-fight-details__table-text">38 of 90</p></td>
<td><p class="b-fight-details__table-text">88 of 160</p>
    <p class="b-fight-details__table-text">70 of 141</p></td>
<td><p class="b-fight-details__table-text">2 of 7</p>
    <p class="b-fight-details__table-text">0 of 3</p></td>
<td><p class="b-fight-details__table-text">3:42</p>
    <p class="b-fight-details__table-text">0:00</p></td>
<td><p class="b-fight-details__table-text">1</p>
    <p class="b-fight-details__table-text">0</p></td>
</tr></tbody></table></section>
<section><h4>Significant Strikes</h4>
<table><tbody><tr>
<td><p class="b-fight-details__table-text">Fighter One</p></td>
<td><p class="b-fight-details__table-text">30 of 80</p>
    <p class="b-fight-details__table-text">20 of 60</p></td>
<td><p class="b-fight-details__table-text">8 of 15</p></td>
<td><p class="b-fight-details__table-text">7 of 17</p>
    <p class="b-fight-details__table-text">6 of 12</p></td>
<td><p class="b-fight-details__table-text">35 of 95</p>
    <p class="b-fight-details__table-text">30 of 70</p></td>
<td><p class="b-fight-details__table-text">10 of 17</p>
    <p class="b-fight-details__table-text">8 of 20</p></td>
</tr></tbody></table></section>
</body></html>
"""

#: fewer than two fighters -> row must be dropped (fights P6)
FIGHT_PAGE_MALFORMED = """
<html><body>
<h2 class="b-content__title">Broken Event</h2>
<div class="b-fight-details__person">
  <i class="b-fight-details__person-status">W</i>
  <h3 class="b-fight-details__person-name"><a href="#">Only One</a></h3>
</div>
</body></html>
"""


def fighter_page(name: str, record: str = "10-2-0") -> str:
    """Parameterized fighter page for bulk pipeline tests."""
    return FIGHTER_PAGE.replace("Jon Example", name).replace("28-1-0", record)
