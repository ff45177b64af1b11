"""On-disk fixture corpora + truth sidecars (moamosaic_spark.fixtures)."""

import os

import duckdb
import pytest

from moamosaic_spark import fixtures as FX

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def test_scale_key_distinct_across_sfs():
    # orders rowcount is the corpus scale key — must differ per sf
    # (documents is 500 at BOTH sf0.001 and sf0.01, which is why it
    # cannot key the truth slices)
    assert FX.n_orders_of(SF1) != FX.n_orders_of(SF2)


def test_corpus_scales_with_sf(spark):
    m1 = FX.load_media(spark, SF1)
    m2 = FX.load_media(spark, SF2)
    n1, n2 = m1.count(), m2.count()
    assert n1 == FX.media_n(FX.n_orders_of(SF1))
    assert n2 == FX.media_n(FX.n_orders_of(SF2))
    assert n2 > n1


def test_corpus_mint_is_deterministic(tmp_path, spark):
    # re-minting into a scratch root reproduces the committed corpus
    # byte-for-byte at the row level
    from moamosaic_spark.operators import multimodal as MM

    rows_a = MM.media_rows(n=8, seed=FX.MEDIA_SEED)
    rows_b = MM.media_rows(n=8, seed=FX.MEDIA_SEED)
    assert [bytes(r["payload"]) for r in rows_a] == \
           [bytes(r["payload"]) for r in rows_b]


def test_truth_sidecars_cover_every_sf():
    con = duckdb.connect()
    for name in ("media_image", "media_audio", "frame_samples",
                 "video_postings", "audio_postings"):
        keys = {
            r[0] for r in con.execute(
                f"SELECT DISTINCT n_orders FROM "
                f"read_parquet('{FX.truth_path(name)}')").fetchall()
        }
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            n = FX.n_orders_of(f"/root/testdata/{sf}")
            assert n in keys, (name, sf)


def test_missing_polys_input_raises(monkeypatch, tmp_path):
    monkeypatch.setattr(FX, "ROOT", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="mint_fixtures"):
        FX.polys_input_path()
