"""Triangulation pins for the parallel Python sneardup fold referee
(streaming.fold_reference) — the >=30x scale-validation referee that
replaces the row-group-bound DuckDB fold (SCALING.md round 8: one core
at 100% for ~44 min at 60x).

Three-way agreement, mirroring test_nndescent_sql_reference: the Spark
streaming execution == the DuckDB unrolled-CTE fold (the driver's
sf0.01 gate, unchanged) and the DuckDB fold == this independent Python
implementation (here, on the real corpora AND randomized synthetic
shapes) — so Spark == Python transitively everywhere the driver gate
holds, and directly at replica scale via test_scale_replica's splice.

All arithmetic in the fold is exact (integer Jaccard, md5, modular
permutations), so the pins are strict equality — no float contract.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from sports_stats_data_pipeline_spark.plans import all_registries
from sports_stats_data_pipeline_spark.plans.documents import _NEARDUP_DOCS_SQL
from sports_stats_data_pipeline_spark.plans.events import streaming_oracle_sql
from sports_stats_data_pipeline_spark.sources.tables import TABLE_NAMES
from sports_stats_data_pipeline_spark.streaming.dedup_lsh import (
    greedy_fold_cte_parts,
)
from sports_stats_data_pipeline_spark.streaming.fold_reference import (
    greedy_fold_reference,
    sneardup_admissions_reference,
    synthesize_neardup_corpus,
)

from ._compare import assert_frames_match

REG = all_registries()


def _duckdb_fold(
    con: duckdb.DuckDBPyConnection, n_batches: int, cap: int = 64
) -> list[tuple[int, int]]:
    """Run the unrolled-CTE fold over a pre-registered ``docs``
    relation (doc_id, text, batch); (doc_id, admitted) ascending."""
    parts, store = greedy_fold_cte_parts(n_batches, cap)
    joined = ",\n".join(parts)
    return con.execute(
        f"WITH {joined}\n"
        "SELECT d.doc_id, CAST(CASE WHEN st.doc_id IS NULL THEN 0 "
        "ELSE 1 END AS BIGINT) AS admitted "
        f"FROM (SELECT DISTINCT doc_id FROM docs) d "
        f"LEFT JOIN {store} st ON st.doc_id = d.doc_id ORDER BY d.doc_id"
    ).fetchall()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
def test_fold_reference_matches_duckdb_real_corpus(sf_dir):
    """Python referee == DuckDB fold on the driver-shaped corpus
    (synthesized clones, doc_id % 3 batches), serial AND parallel."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        con.execute(
            f"CREATE VIEW sdocs AS {_NEARDUP_DOCS_SQL}"
        )
        con.execute(
            "CREATE VIEW docs AS SELECT doc_id, text, "
            "CAST(doc_id % 3 AS INT) AS batch FROM sdocs"
        )
        duck = _duckdb_fold(con, 3)
    finally:
        con.close()
    py_serial = sneardup_admissions_reference(sf_dir, processes=0)
    py_parallel = sneardup_admissions_reference(sf_dir, processes=8)
    assert py_serial == py_parallel, "parallel fold diverged from serial"
    assert [tuple(r) for r in duck] == py_serial
    admitted = sum(a for _, a in py_serial)
    assert 0 < admitted < len(py_serial), "degenerate admission pattern"


@pytest.mark.parametrize(
    "seed,n_docs,n_batches,cap",
    [
        (1, 120, 3, 64),
        (2, 200, 2, 64),
        (3, 200, 4, 64),
        # tiny cap: hot-bucket skips fire on BOTH prior sides, and
        # capped-away dups get admitted (the bounded-recall contract)
        (4, 150, 3, 2),
        (5, 150, 5, 3),
        (6, 300, 3, 8),
    ],
)
def test_fold_reference_matches_duckdb_random(seed, n_docs, n_batches, cap):
    """Randomized word-soup corpora with planted near-dup families in
    BOTH arrival orders (clone-id above and below the original), short
    (<3-token) docs exercising the whole-text shingle path, and
    boilerplate floods exercising the bucket caps."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(25)]
    docs: list[tuple[int, str]] = []
    next_id = 0

    def fresh_id() -> int:
        nonlocal next_id
        next_id += rng.randint(1, 4)
        return next_id

    boiler = " ".join(rng.choices(vocab[:5], k=12))
    for _ in range(n_docs):
        kind = rng.random()
        did = fresh_id()
        if kind < 0.15:  # short doc, whole-text shingle
            docs.append((did, " ".join(rng.choices(vocab, k=rng.randint(1, 2)))))
        elif kind < 0.35:  # boilerplate flood -> hot buckets
            docs.append((did, boiler + f" {rng.choice(vocab)}"))
        else:
            text = " ".join(rng.choices(vocab, k=rng.randint(5, 25)))
            docs.append((did, text))
            if rng.random() < 0.5:  # plant a near-dup pair
                clone_id = fresh_id()
                clone = text + " tail"
                if rng.random() < 0.5:
                    docs.append((clone_id, clone))
                else:  # clone arrives with a SMALLER id: original loses
                    docs.append((did, clone))
                    docs[-2] = (clone_id, text)
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
        }
    )
    pdf["batch"] = (pdf.doc_id % n_batches).astype("int32")
    con = duckdb.connect()
    try:
        con.register("docs", pdf)
        duck = _duckdb_fold(con, n_batches, cap)
    finally:
        con.close()
    py = greedy_fold_reference(docs, n_batches, cap, processes=0)
    got = [(d, int(d in py)) for d in sorted({d for d, _ in docs})]
    assert [tuple(r) for r in duck] == got


def test_streaming_oracle_splice_matches_full():
    """streaming_oracle_sql(None) is the registered oracle, and the
    spliced form fed the Python referee's admissions reproduces the
    full oracle's rows exactly — the >=30x comparison is therefore the
    same value check with an independent (and parallel) referee."""
    assert (
        REG.oracles["streaming_tumbling_hourly"] == streaming_oracle_sql()
    )
    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        full = con.execute(REG.oracles["streaming_tumbling_hourly"]).df()
        py_adm = pd.DataFrame(
            sneardup_admissions_reference(sf_dir),
            columns=["doc_id", "admitted"],
        )
        con.register("py_adm", py_adm)
        spliced = con.execute(streaming_oracle_sql("py_adm")).df()
    finally:
        con.close()
    assert_frames_match(full, spliced, "spliced-vs-full-streaming-oracle")


def test_synthesize_neardup_corpus_matches_sql_recipe():
    """The Python clone recipe must stay byte-identical to
    _NEARDUP_DOCS_SQL (doc_id % 7 -> +1000000, tail marker)."""
    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        sql_rows = con.execute(
            f"SELECT doc_id, text FROM ({_NEARDUP_DOCS_SQL}) ORDER BY doc_id"
        ).fetchall()
        base = con.execute(
            "SELECT doc_id, text FROM documents"
        ).fetchall()
    finally:
        con.close()
    py_rows = sorted(synthesize_neardup_corpus([tuple(r) for r in base]))
    assert py_rows == [tuple(r) for r in sql_rows]
