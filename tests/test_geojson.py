"""File-level API parity: GeoJSON source/sink + intersect_files
(reference core.py:31-187 file surface, JSON extract core.py:95-126)."""

import json

import pytest

import pandarus_spark as ps
from pandarus_spark.sources.geojson import (
    import_json, intersect_files, read_geojson,
)
from pandarus_spark.sources.pages import FIXTURES, _geo_json
from tests.conftest import GOLDEN_GRID_SQUARE


def _write_fixture(tmp_path, name):
    feats = []
    for f in FIXTURES[name]():
        feats.append({"type": "Feature",
                      "geometry": json.loads(_geo_json(f["geometry"])),
                      "properties": {"name": f["name"]}})
    p = str(tmp_path / f"{name}.geojson")
    with open(p, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats}, fh)
    return p


def test_read_geojson_roundtrip(spark, tmp_path):
    p = _write_fixture(tmp_path, "grid")
    feats = read_geojson(spark, p)
    rows = {r["label"]: r for r in feats.collect()}
    assert set(rows) == {f"grid cell {i}" for i in range(4)}
    assert all(r["kind"] == "polygon" and r["is_rect"] for r in rows.values())


def test_read_geojson_duplicate_labels_raise(spark, tmp_path):
    p = _write_fixture(tmp_path, "duplicates")
    with pytest.raises(ValueError, match="duplicate"):
        read_geojson(spark, p)


def test_intersect_files_goldens_and_extract(spark, tmp_path):
    first = _write_fixture(tmp_path, "square")
    second = _write_fixture(tmp_path, "grid")
    geo_fp, json_fp = intersect_files(
        spark, first, "name", second, "name",
        out_dir=str(tmp_path / "out"), when="2026-01-01T00:00:00")
    # geo file: reference's fixed property schema
    with open(geo_fp) as f:
        fc = json.load(f)
    assert len(fc["features"]) == 4
    props = fc["features"][0]["properties"]
    assert set(props) == {"id", "from_label", "to_label", "measure"}
    # json extract: metadata envelope + golden measures
    payload = import_json(json_fp)
    assert set(payload["metadata"]) == {"first", "second", "when"}
    assert set(payload["metadata"]["first"]) == {"field", "path", "filename", "sha256"}
    assert len(payload["metadata"]["first"]["sha256"]) == 64
    got = {(row[1], row[0]): row[2] for row in payload["data"]}  # (grid, square)
    for (f_lab, t_lab), golden in GOLDEN_GRID_SQUARE.items():
        assert got[(f_lab, t_lab)] == pytest.approx(golden, rel=1e-9)
    # content-addressed naming: {sha1}.{sha2}
    assert payload["metadata"]["first"]["sha256"] in geo_fp
    assert payload["metadata"]["second"]["sha256"] in geo_fp
