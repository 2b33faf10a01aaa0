"""JSONL / text corpus readers and writers.

LLM training corpora overwhelmingly ship as line-delimited JSON — one
document object per line, usually compressed (``.jsonl.gz`` /
``.jsonl.zst``). The parquet loaders in ``tables.py`` cover the curated
lakehouse side; this module covers the raw-ingest side: reading
third-party corpus drops whose lines cannot be trusted, and exporting
curated slices back to the interchange format.

Reference parity: the reference pipeline's ingest contract is "malformed
rows are dropped, never crash the run" (its scraper skips pages that
fail to parse — scraper.py's try/except-per-page loop). ``read_jsonl``
exposes the same contract as an explicit ``mode`` dial on top of
Spark's JSON reader instead of imperative try/except.

Design notes for 100 TB:
- **Always pass an explicit schema.** ``inferSchema`` is a FULL extra
  pass over the corpus before the real one; at 100 TB that is the most
  expensive single line of code a pipeline can contain. The reader
  enforces this — there is no infer path.
- **Line-delimited, not multiLine.** ``multiLine=true`` makes each FILE
  a single record boundary, so one task must own a whole file and the
  format stops being splittable. JSONL keeps newline splits, so a 1 TB
  uncompressed file still fans out across executors.
- **Compression picks your parallelism.** gzip is not splittable: one
  ``.jsonl.gz`` = one task, however large. A corpus of many ~100 MB-1 GB
  gz shards parallelizes by file count and is fine; a single 500 GB gz
  is a one-task pipeline stall. zstd/bzip2 (splittable in Hadoop's
  codec) or uncompressed avoid the constraint entirely. The writer
  defaults to gzip at a shard-per-partition granularity, which keeps
  individual shards bounded.
- **Corrupt lines are data, not exceptions.** PERMISSIVE mode routes
  unparseable lines into ``corrupt_col`` so a quality gate can count,
  sample, and quarantine them (a driver-style oracle can too);
  DROPMALFORMED silently discards; FAILFAST makes ingest assert-like.
  The corrupt-record column must be part of the declared schema per
  Spark's contract, and a PERMISSIVE scan of ONLY the corrupt column
  hits a Spark footgun (the pushed projection can't tell corrupt from
  valid) — ``read_jsonl`` always keeps at least one payload column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = [
    "read_jsonl",
    "write_jsonl",
    "read_csv",
    "write_csv",
    "read_orc",
    "write_orc",
    "read_text_docs",
    "corrupt_line_report",
]

_MODES = ("PERMISSIVE", "DROPMALFORMED", "FAILFAST")


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    In PERMISSIVE mode the returned frame carries ``corrupt_col``
    (STRING): NULL for clean lines, the raw line text for unparseable
    ones (whose declared columns are NULL). In DROPMALFORMED /
    FAILFAST the column is omitted.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if not isinstance(schema, StructType) or not schema.fields:
        raise ValueError("read_jsonl requires a non-empty explicit schema")
    reader_schema = schema
    if mode == "PERMISSIVE":
        if corrupt_col in schema.fieldNames():
            raise ValueError(
                f"corrupt_col {corrupt_col!r} collides with a schema field"
            )
        reader_schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    return (
        spark.read.schema(reader_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        # JSONL contract: records never span lines -> splittable scan.
        .option("multiLine", "false")
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str = "gzip",
    shards: int | None = None,
) -> None:
    """Write a frame as (optionally compressed) JSONL shards.

    ``shards`` repartitions before the write to bound shard count/size;
    None writes one shard per existing partition — the right call when
    the upstream plan already sized partitions (maxPartitionBytes /
    AQE), because an extra repartition here is a pure-overhead shuffle.
    """
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").option("compression", compression).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    header: bool = True,
    sep: str = ",",
    multi_line: bool = False,
) -> DataFrame:
    """Read CSV with an explicit schema and the JSONL module's
    malformed-row contract (reference parity: the reference's own sink
    format IS CSV — fighters.csv / fights.csv, reference
    fighters_scraper.py — so round-tripping it cannot be an
    afterthought).

    Same dials as :func:`read_jsonl`: PERMISSIVE routes unparseable
    rows into ``corrupt_col`` (raw line text, declared columns NULL),
    DROPMALFORMED discards, FAILFAST raises.

    The newline trade, stated plainly: CSV has no line-safe escape for
    embedded newlines — writers (Spark's included) emit them as literal
    newlines inside quoted fields, so a record can SPAN lines. With the
    default ``multi_line=False`` the scan stays splittable (JSONL's
    contract) but a quoted-newline record parses as corrupt. If your
    text columns may embed newlines, either pass ``multi_line=True``
    and accept file-per-task parallelism, or ship such corpora as JSONL
    (which escapes ``\\n`` by construction) — the better format for
    free-text payloads.

    DROPMALFORMED caveat (an upstream Spark quirk, not this module's):
    ``df.count()`` short-circuits the parser and counts RAW records, so
    it still includes the rows the mode will drop; any query that
    touches a column sees the dropped rows gone. Count clean rows via
    an aggregate over a column — or use PERMISSIVE +
    :func:`corrupt_line_report`, which exists for exactly this.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if not isinstance(schema, StructType) or not schema.fields:
        raise ValueError("read_csv requires a non-empty explicit schema")
    reader_schema = schema
    if mode == "PERMISSIVE":
        if corrupt_col in schema.fieldNames():
            raise ValueError(
                f"corrupt_col {corrupt_col!r} collides with a schema field"
            )
        reader_schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    return (
        spark.read.schema(reader_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("multiLine", str(multi_line).lower())
        .option("escape", '"')
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    *,
    compression: str = "gzip",
    shards: int | None = None,
    header: bool = True,
    sep: str = ",",
) -> None:
    """Write CSV shards in the RFC-4180 dialect (quotes doubled via
    ``escape='"'`` — the convention DuckDB/pandas/excel all read
    without configuration). Embedded newlines are quoted, NOT removed:
    read such shards back with ``multi_line=True`` (see
    :func:`read_csv` for the splittability trade). Same ``shards``
    semantics as :func:`write_jsonl`."""
    out = df.repartition(shards) if shards else df
    (
        out.write.mode("overwrite")
        .option("compression", compression)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("escape", '"')
        .csv(path)
    )


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read ORC (the other columnar lakehouse format — Hive-ecosystem
    drops arrive in it). Columnar + footer statistics means predicate
    pushdown and column pruning work exactly as for parquet; pass
    ``schema`` to pin the expected shape (extra/missing columns fail
    loudly at analysis instead of silently drifting downstream)."""
    df = spark.read.orc(path)
    if schema is not None:
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in schema.fields}
        if got != want:
            raise ValueError(
                f"ORC schema mismatch at {path}: expected {want}, got {got}"
            )
        df = df.select(*[f.name for f in schema.fields])
    return df


def write_orc(
    df: DataFrame,
    path: str,
    *,
    compression: str = "zstd",
    shards: int | None = None,
) -> None:
    """Write ORC shards (zstd default — splittable container regardless
    of codec, unlike gzipped text). Same ``shards`` semantics as
    :func:`write_jsonl`."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").option("compression", compression).orc(path)


def read_text_docs(
    spark: SparkSession,
    path: str,
    *,
    whole_file: bool = False,
) -> DataFrame:
    """Read raw text as documents: one row per line, or per file.

    ``whole_file=True`` maps each file to one row (document-per-file
    corpora) — like multiLine JSON this forfeits intra-file splits, so
    it is only sane when files are individually small. The file path
    rides along for provenance either way.
    """
    return (
        spark.read.text(path, wholetext=whole_file)
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("text"),
        )
    )


def corrupt_line_report(df: DataFrame, corrupt_col: str = "_corrupt_record") -> DataFrame:
    """One-row ingest quality summary for a PERMISSIVE read.

    Single scan, no shuffle beyond the final 1-row aggregate: the
    conditional-sum shape every 100 TB quality gate in this repo uses
    (operators/expectations.py).
    """
    if corrupt_col not in df.columns:
        raise ValueError(f"frame has no {corrupt_col!r} column (PERMISSIVE only)")
    # Spark refuses a raw-JSON query whose referenced columns are ONLY
    # the corrupt record (SQLSTATE 0A000) — its suggested workaround is
    # caching the frame, which at corpus scale means materializing the
    # whole scan. Referencing one real payload column lifts the
    # restriction instead; pick the first non-corrupt column.
    payload = next(c for c in df.columns if c != corrupt_col)
    bad = F.col(corrupt_col).isNotNull().cast("long")
    present = (
        F.col(corrupt_col).isNull() & F.col(payload).isNotNull()
    ).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(bad).alias("n_corrupt"),
        (F.count(F.lit(1)) - F.sum(bad)).alias("n_ok"),
        F.sum(present).alias(f"n_ok_with_{payload}"),
    )


def jsonl_roundtrip_dir(base: str, name: str) -> str:
    """Canonical shard-directory path for a table exported via JSONL."""
    return os.path.join(base, f"{name}.jsonl")
