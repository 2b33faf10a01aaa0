"""Bronze → silver transforms: the reference's implicit string-typing
made explicit (SURVEY.md §1.2 / §7.2 step 2, FIXTURES.md §A3 contract).

One wide codegen'd projection per table — every cast is a built-in
column expression from functions.parsing; a malformed value becomes NULL
(never an error, never a silent ``"N/A"`` string downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import (
    activity_flag,
    nullify_na,
    parse_height_cm,
    parse_mmss_seconds,
    parse_of_pair,
    parse_pct,
    parse_reach_cm,
    parse_record,
    parse_ref_date,
    parse_scheduled_rounds,
    parse_weight_kg,
)

_PAIR_STATS = (
    "sig_str",
    "total_str",
    "td",
    "head",
    "body",
    "leg",
    "distance",
    "ground",
)


def fighters_silver(bronze: DataFrame, as_of: str) -> DataFrame:
    """Bronze fighter rows (scrape_pipeline/parse_pages output) → typed
    silver (FIXTURES.md fighters_typed). ``as_of`` pins the activity
    clock (SURVEY.md §7.1 determinism)."""
    wins, losses, draws = parse_record(F.col("Record"))
    # the bronze layer packs per-fighter fight dates pipe-joined; A1's
    # max() runs element-wise on the parsed array.
    last_fight = F.array_max(
        F.filter(
            F.transform(
                F.split(F.coalesce(F.col("fight_dates"), F.lit("")), r"\|"),
                lambda d: F.try_to_timestamp(d, F.lit("MMM. d, yyyy")).cast(
                    "date"
                ),
            ),
            lambda d: d.isNotNull(),
        )
    )
    return bronze.select(
        F.col("Name").alias("name"),
        nullify_na(F.col("Nickname")).alias("nickname"),
        wins.alias("wins"),
        losses.alias("losses"),
        draws.alias("draws"),
        parse_height_cm(F.col("Height")).alias("height_cm"),
        parse_weight_kg(F.col("Weight")).alias("weight_kg"),
        parse_reach_cm(F.col("Reach")).alias("reach_cm"),
        nullify_na(F.col("STANCE")).alias("stance"),
        parse_ref_date(F.col("DOB")).alias("dob"),
        nullify_na(F.col("SLpM")).try_cast("double").alias("slpm"),
        parse_pct(F.col("`Str. Acc.`")).alias("str_acc"),
        nullify_na(F.col("SApM")).try_cast("double").alias("sapm"),
        parse_pct(F.col("`Str. Def`")).alias("str_def"),
        nullify_na(F.col("`TD Avg.`")).try_cast("double").alias("td_avg"),
        parse_pct(F.col("`TD Acc.`")).alias("td_acc"),
        parse_pct(F.col("`TD Def.`")).alias("td_def"),
        nullify_na(F.col("`Sub. Avg.`")).try_cast("double").alias("sub_avg"),
        last_fight.alias("last_fight_date"),
        activity_flag(last_fight, as_of).alias("active_status"),
        F.col("url"),
    )


def fights_silver(bronze: DataFrame) -> DataFrame:
    """Bronze fight rows → typed silver (FIXTURES.md fights_typed):
    "X of Y" pairs split into landed/attempted ints, control time and end
    time to seconds, scheduled rounds extracted, N/A → NULL."""
    cols = [
        F.col("event_name"),
        F.col("fighter_a"),
        F.col("fighter_b"),
        nullify_na(F.col("result_a")).alias("result_a"),
        nullify_na(F.col("result_b")).alias("result_b"),
        nullify_na(F.col("method")).alias("method"),
        nullify_na(F.col("round")).try_cast("int").alias("end_round"),
        parse_mmss_seconds(F.col("time")).alias("end_time_s"),
        parse_scheduled_rounds(F.col("time_format")).alias("scheduled_rounds"),
        F.col("url").alias("fight_url"),
    ]
    for side in ("a", "b"):
        for stat in _PAIR_STATS:
            landed, att = parse_of_pair(F.col(f"{stat}_{side}"))
            cols.append(landed.alias(f"fighter_{side}_{stat}_landed"))
            cols.append(att.alias(f"fighter_{side}_{stat}_attempted"))
        cols.append(
            parse_mmss_seconds(F.col(f"ctrl_{side}")).alias(
                f"fighter_{side}_ctrl_s"
            )
        )
        cols.append(
            nullify_na(F.col(f"sub_{side}"))
            .try_cast("int")
            .alias(f"fighter_{side}_sub_att")
        )
    return bronze.select(*cols)
