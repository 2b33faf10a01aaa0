"""CSV compatibility layer (the reference's sink format, kept as an
export/import path — SURVEY.md §2.1 S5): schema-on-read in PERMISSIVE
mode captures malformed rows in an auditable _corrupt column instead of
the reference's silent None policy (SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_csv_roundtrip_preserves_bronze(spark, tmp_path):
    bronze = spark.createDataFrame(
        [("Jon", "28-1-0", "u1"), ("Ann", "15-3", "u2"), (None, "N/A", "u3")],
        schema="Name string, Record string, URL string",
    )
    path = str(tmp_path / "export_csv")
    bronze.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema("Name string, Record string, URL string")
        .option("header", True)
        .csv(path)
    )
    def norm(rows):
        return sorted((tuple(map(str, r)) for r in rows))

    assert norm(back.collect()) == norm(bronze.collect())


def test_csv_permissive_captures_corrupt_rows(spark, tmp_path):
    raw = tmp_path / "raw.csv"
    raw.write_text(
        "wins,losses,url\n"
        "28,1,u1\n"
        'garbage-not-int,"unclosed quote,u2\n'
        "15,3,u3\n"
    )
    df = (
        spark.read.schema(
            "wins int, losses int, url string, _corrupt string"
        )
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(tmp_path))
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert {(r["wins"], r["url"]) for r in good} == {(28, "u1"), (15, "u3")}
    assert len(bad) == 1  # malformed row kept, auditable — not dropped
    assert "garbage" in bad[0]["_corrupt"]
