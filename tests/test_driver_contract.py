"""Replicates the driver's correctness gate locally: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same parquet, and require identical row counts, column names, and
(sorted) values."""

import math

import duckdb
import pytest

from moamosaic_spark import driver_contract as DC

SF_DIR = __import__("os").environ.get("MOA_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(DC.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = DC.queries()[name]
    sql = DC.oracle_sql().get(name)
    if sql is None:
        # rows-only entry (no SQL oracle CAN exist, e.g. binary media
        # decode): the driver records the weaker rows-only check; here
        # assert it runs, returns rows, and repeats identically
        # (partitioning-independence of the media pipeline is covered
        # in test_multimodal.py, which repartitions the INPUT — a
        # repartition on the query output would sit above mapInPandas
        # and exercise nothing)
        a = sorted(tuple(r) for r in q(spark, SF_DIR).collect())
        b = sorted(tuple(r) for r in q(spark, SF_DIR).collect())
        assert len(a) > 0 and a == b
        return
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    dres = duck.execute(sql)
    duck_cols = [d[0].lower() for d in dres.description]
    drows = dres.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    # align column order by name (driver sorts by column name)
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    s_sorted = normalize([tuple(r[i] for i in order) for r in srows])
    d_sorted = normalize([tuple(r[i] for i in order) for r in drows])
    mismatches = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_no_embedded_truth_values():
    """Round-6: every truth sidecar lives as committed parquet under
    fixtures/ (minted by tools/mint_fixtures.py) and the oracle SQL
    reads it with read_parquet — no oracle may embed a truth relation
    as a VALUES literal again (round-5 verdict, "what's wrong" #1)."""
    import os

    from moamosaic_spark import fixtures as FX

    for name, sql in DC.oracle_sql().items():
        assert "AS (VALUES" not in sql, f"{name}: embedded VALUES relation"
    for t in ("media_image", "media_audio", "frame_samples",
              "video_postings", "audio_postings", "region_labels",
              "region_outlines"):
        assert os.path.exists(FX.truth_path(t)), t
    assert os.path.exists(FX.polys_input_path())


def test_every_query_has_an_oracle():
    """As of round 5 the contract is FULLY gated: every queries() entry
    has an oracle_sql() twin and vice versa — a new query landing
    without its oracle (or a stale oracle key) fails here instead of
    silently downgrading to the driver's rows-only check."""
    q, o = set(DC.queries()), set(DC.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))
