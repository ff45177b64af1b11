"""Mint the on-disk fixture corpora and truth sidecars.

Usage: python tools/mint_fixtures.py [sf_dir ...]
       (default: /root/testdata/sf0.001 sf0.01 sf0.1)

Writes, under ``fixtures/``:

* ``corpus/o{n_orders}/{media,audio_clips,video_clips}.parquet`` —
  the sf-scaled input corpora the driver-contract queries read.
* ``truth/{media_image,media_audio,frame_samples,video_postings,
  audio_postings}.parquet`` — sf-keyed (``n_orders`` column) truth
  sidecars computed from the synth generators' SOURCE arrays; the
  oracle SQL reads these with read_parquet() and selects its sf slice
  via ``WHERE n_orders = (SELECT count(*) FROM orders)``.
* ``truth/region_labels.parquet`` / ``truth/region_outlines.parquet``
  — independent numpy truths (PIP burn + BFS flood fill; boundary
  crack-trace) for the distributed region operators; sf-independent.
* ``input/polys.parquet`` — the 3-polygon rasterize fixture as a
  parquet input table read by BOTH the Spark queries and the DuckDB
  oracles (previously embedded as VALUES literals on each side).

The truth parquets are committed; a query can't regenerate them at
run time — regeneration is this explicit, reviewable step.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa
import pyarrow.parquet as pq

from moamosaic_spark import fixtures as FX

TRUTH_SCHEMAS = {
    "media_image": pa.schema([
        ("n_orders", pa.int64()), ("media_id", pa.string()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("mean_intensity", pa.float64()), ("phash", pa.int64()),
    ]),
    "media_audio": pa.schema([
        ("n_orders", pa.int64()), ("media_id", pa.string()),
        ("sample_rate", pa.int32()), ("n_samples", pa.int32()),
        ("rms", pa.float64()), ("zero_crossings", pa.int32()),
    ]),
    "frame_samples": pa.schema([
        ("n_orders", pa.int64()), ("media_id", pa.string()),
        ("frame_idx", pa.int32()), ("mean_intensity", pa.float64()),
    ]),
    "video_postings": pa.schema([
        ("n_orders", pa.int64()), ("doc_id", pa.string()),
        ("shingle", pa.string()),
    ]),
    "audio_postings": pa.schema([
        ("n_orders", pa.int64()), ("doc_id", pa.string()),
        ("shingle", pa.string()),
    ]),
}


def _write(path: str, rows: list[dict], schema: pa.Schema) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
    os.replace(tmp, path)
    print(f"  wrote {path} ({len(rows)} rows)")


def mint_sf_keyed_truths(sf_dirs: list[str]) -> None:
    acc: dict[str, list[dict]] = {k: [] for k in TRUTH_SCHEMAS}
    for d in sf_dirs:
        n_orders = FX.n_orders_of(d)
        print(f"{d}: n_orders={n_orders} n_media={FX.media_n(n_orders)} "
              f"clip_families={FX.clip_families(n_orders)}")
        for name, rows in FX.truth_rows_for_scale(n_orders).items():
            acc[name].extend(rows)
    for name, rows in acc.items():
        _write(FX.truth_path(name), rows, TRUTH_SCHEMAS[name])


def mint_corpora(sf_dirs: list[str]) -> None:
    for d in sf_dirs:
        for fn in (FX.ensure_media, FX.ensure_audio_clips,
                   FX.ensure_video_clips):
            print(f"  corpus {fn(d)}")


def mint_region_truths() -> None:
    from moamosaic_spark import driver_contract as DC

    rows = [
        {"region_id": rid, "value": v, "n_px": n, "min_row": r0,
         "min_col": c0, "max_row": r1, "max_col": c1}
        for rid, v, n, r0, c0, r1, c1 in DC._region_truth()
    ]
    _write(FX.truth_path("region_labels"), rows, pa.schema([
        ("region_id", pa.int64()), ("value", pa.int32()),
        ("n_px", pa.int64()), ("min_row", pa.int64()),
        ("min_col", pa.int64()), ("max_row", pa.int64()),
        ("max_col", pa.int64()),
    ]))


def mint_polys_input() -> None:
    from moamosaic_spark import driver_contract as DC

    rows = [
        {"poly": [{"x": v["x"], "y": v["y"]} for v in verts],
         "value": value, "priority": prio}
        for verts, value, prio in DC._rasterize_fixture()
    ]
    _write(os.path.join(FX.ROOT, "input", "polys.parquet"), rows, pa.schema([
        ("poly", pa.list_(pa.struct([("x", pa.float64()),
                                     ("y", pa.float64())]))),
        ("value", pa.int32()), ("priority", pa.int32()),
    ]))


def main(sf_dirs: list[str]) -> None:
    mint_corpora(sf_dirs)
    mint_sf_keyed_truths(sf_dirs)
    mint_region_truths()
    mint_polys_input()
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from mint_outline_truth import mint_region_outlines
    except ImportError:
        print("  (outline truth minter not present yet — skipped)")
    else:
        mint_region_outlines()


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    main(dirs)
