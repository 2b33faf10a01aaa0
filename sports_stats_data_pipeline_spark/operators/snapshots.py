"""Versioned parquet snapshots: manifest-published time travel.

The staged-replace protocol (operators/sinks.py) is crash-safe but
history-free — after promote, the previous state is gone. This module
is the retention-bearing sibling, a miniature of the Iceberg/Delta
commit idea rebuilt on plain parquet + JSON manifests:

    <table>/
      data/v<k>/part-*.parquet     immutable, written once
      _snapshots/v<k>.json         the COMMIT: file list + schema + count

A version becomes visible in exactly one step — the manifest file's
atomic rename into ``_snapshots/`` — so readers never observe partial
data: either the manifest exists (all files it lists were already fully
written) or it doesn't (its data directory is invisible garbage that
``vacuum_snapshots`` removes). Readers open the file LIST from the
manifest rather than listing directories — on object stores this
sidesteps slow/eventually-consistent LISTs, and it is what makes
`append` mode O(Δ): a new version's manifest references the previous
version's files plus the new batch's, copying no data.

Scale notes:
- Publish cost is O(1) (one rename) regardless of table size; append
  cost is O(batch). Overwrite never deletes the old version's data —
  retention is vacuum's job, so time travel works until vacuumed.
- The manifest carries the schema (as DDL) and row count: consistency
  checks and `list_snapshots` introspection need no data scan.
- Single-writer, like sinks.py: concurrent committers would race the
  version counter (the loser's rename lands on a taken version id and
  raises). A real multi-writer table needs a log store with CAS —
  that's Delta/Iceberg's job; see operators/delta_compat.py.

Reference parity: the reference keeps exactly one CSV state and loses
history on every overwrite (reference fighters_scraper.py's
read-merge-rewrite loop); snapshots are what its "merged state" becomes
when yesterday's answers still matter.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_snapshot",
    "read_snapshot",
    "list_snapshots",
    "vacuum_snapshots",
]

_MANIFEST_DIR = "_snapshots"


def _manifest_dir(table: str) -> str:
    return os.path.join(table, _MANIFEST_DIR)


def _versions(table: str) -> list[int]:
    d = _manifest_dir(table)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _resolve(table: str, path: str) -> str:
    """Manifest paths are stored relative to the table root, so the
    manifest stays valid when the table is addressed via a different
    spelling or working directory (a relative ``table`` used to bake
    the caller's cwd into the manifest, which could mislead a later
    ``vacuum_snapshots`` into removing live data). Absolute entries
    (pre-round-6 manifests) resolve as-is."""
    return path if os.path.isabs(path) else os.path.join(table, path)


def _load_manifest(table: str, version: int) -> dict:
    p = os.path.join(_manifest_dir(table), f"v{version}.json")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"snapshot v{version} does not exist at {table} "
            f"(have: {_versions(table)})"
        )
    with open(p) as fh:
        return json.load(fh)


def write_snapshot(
    df: DataFrame, table: str, *, mode: str = "overwrite"
) -> int:
    """Commit ``df`` as the next version of ``table``; returns the new
    version number.

    ``mode='overwrite'``: the new version is exactly ``df``.
    ``mode='append'``: the new version is the previous version's files
    plus ``df``'s — O(batch) work, no rewrite of existing data.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    vs = _versions(table)
    version = (vs[-1] + 1) if vs else 1
    data_dir = os.path.join(table, "data", f"v{version}")
    df.write.mode("errorifexists").parquet(data_dir)
    files = sorted(
        os.path.join("data", f"v{version}", f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    prev_files: list[str] = []
    prev_count = 0
    if mode == "append" and vs:
        prev = _load_manifest(table, vs[-1])
        if prev["schema_ddl"] != df.schema.simpleString():
            # a mixed-schema version would read back with columns
            # resolved from whichever file's footer wins — refuse
            # loudly (schema evolution is operators/schema_evolution's
            # job: conform the batch first, then append)
            shutil.rmtree(data_dir)
            raise ValueError(
                f"append schema mismatch at {table}: v{vs[-1]} has "
                f"{prev['schema_ddl']}, batch has "
                f"{df.schema.simpleString()}"
            )
        prev_files = prev["files"]
        prev_count = prev["count"]
    # count the WRITTEN files, not df: re-counting df would re-run its
    # whole upstream plan, while a parquet count is a footer-metadata
    # read (row-group counts, no data pages)
    count = df.sparkSession.read.parquet(data_dir).count() + prev_count
    manifest = {
        "version": version,
        "files": prev_files + files,
        "schema_ddl": df.schema.simpleString(),
        "count": count,
        "mode": mode,
    }
    mdir = _manifest_dir(table)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".v{version}.json.tmp")
    final = os.path.join(mdir, f"v{version}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    if os.path.exists(final):  # concurrent-writer race — refuse loudly
        os.remove(tmp)
        raise FileExistsError(f"snapshot v{version} already committed")
    os.rename(tmp, final)  # THE commit: atomic visibility
    return version


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (default: latest) via its manifest's
    file list — no directory listing, uncommitted data invisible."""
    vs = _versions(table)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {table}")
    v = vs[-1] if version is None else version
    m = _load_manifest(table, v)
    return spark.read.parquet(*(_resolve(table, f) for f in m["files"]))


def list_snapshots(table: str) -> list[dict]:
    """Manifest metadata for every retained version (no data scan)."""
    return [
        {
            "version": v,
            "count": (m := _load_manifest(table, v))["count"],
            "n_files": len(m["files"]),
            "mode": m["mode"],
            "schema_ddl": m["schema_ddl"],
        }
        for v in _versions(table)
    ]


def vacuum_snapshots(table: str, *, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` versions and delete every
    data directory no retained manifest references — including orphaned
    directories from commits that crashed before manifest publish.

    Returns ``{"dropped_versions": [...], "removed_dirs": [...]}``.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _versions(table)
    keep, drop = vs[-keep_last:], vs[:-keep_last]
    referenced: set[str] = set()
    for v in keep:
        for f in _load_manifest(table, v)["files"]:
            referenced.add(os.path.dirname(os.path.abspath(_resolve(table, f))))
    removed = []
    data_root = os.path.join(table, "data")
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            full = os.path.abspath(os.path.join(data_root, d))
            if full not in referenced:
                shutil.rmtree(full)
                removed.append(os.path.join(data_root, d))
    for v in drop:
        os.remove(os.path.join(_manifest_dir(table), f"v{v}.json"))
    return {"dropped_versions": drop, "removed_dirs": removed}
