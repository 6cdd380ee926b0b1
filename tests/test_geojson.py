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


def _write_fixture(tmp_path, name, transform=None, crs_member=None):
    feats = []
    for f in FIXTURES[name]():
        geom = json.loads(_geo_json(f["geometry"]))
        if transform is not None:
            geom = _map_coords(geom, transform)
        feats.append({"type": "Feature", "geometry": geom,
                      "properties": {"name": f["name"]}})
    fc = {"type": "FeatureCollection", "features": feats}
    if crs_member:
        fc["crs"] = {"type": "name", "properties": {"name": crs_member}}
    p = str(tmp_path / f"{name}.geojson")
    with open(p, "w") as fh:
        json.dump(fc, fh)
    return p


def _map_coords(geom, fn):
    def walk(c):
        if isinstance(c[0], (int, float)):
            return list(fn(c[0], c[1]))
        return [walk(x) for x in c]
    return {"type": geom["type"], "coordinates": walk(geom["coordinates"])}


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


def test_projected_crs_ingest_matches_wgs84_goldens(spark, tmp_path):
    """Reference projected-CRS variants (test_intersect.py:288-356):
    a square stored in EPSG:3857 must intersect the WGS84 grid with the
    same golden Mollweide areas after normalize-at-ingest
    (Map.iter_latlong parity, model.py:130-140)."""
    import numpy as np

    from pandarus_spark.geometry.projection import web_mercator_forward

    def fwd(lon, lat):
        x, y = web_mercator_forward(np.array([lon]), np.array([lat]))
        return float(x[0]), float(y[0])

    # explicit crs= argument
    first = _write_fixture(tmp_path, "square", transform=fwd)
    square = read_geojson(spark, first, crs="EPSG:3857")
    grid = read_geojson(spark, _write_fixture(tmp_path, "grid"))
    out = {(r["from_label"], r["to_label"]): r["measure"]
           for r in ps.intersect(square, grid).collect()}
    for (g_lab, s_lab), golden in GOLDEN_GRID_SQUARE.items():
        assert out[(s_lab, g_lab)] == pytest.approx(golden, rel=1e-6)

    # legacy file-level crs member, no argument
    first2 = _write_fixture(tmp_path, "square", transform=fwd,
                            crs_member="urn:ogc:def:crs:EPSG::3857")
    square2 = read_geojson(spark, first2)
    out2 = {(r["from_label"], r["to_label"]): r["measure"]
            for r in ps.intersect(square2, grid).collect()}
    assert out2 == pytest.approx(out)


def test_utm_and_laea_ingest_match_wgs84_goldens(spark, tmp_path):
    """Round-2 CRS breadth (verdict #7): a square stored in a UTM zone
    or in LAEA Europe must hit the same golden Mollweide areas after
    normalize-at-ingest, at 1e-9."""
    import numpy as np

    from pandarus_spark.geometry.projection import from_wgs84

    grid = read_geojson(spark, _write_fixture(tmp_path, "grid"))
    for crs in ("EPSG:32631", "EPSG:3035",
                "+proj=utm +zone=31 +datum=WGS84 +units=m +no_defs"):
        def fwd(lon, lat, _crs=crs):
            x, y = from_wgs84(np.array([lon]), np.array([lat]), _crs)
            return float(x[0]), float(y[0])
        p = _write_fixture(tmp_path, "square", transform=fwd)
        square = read_geojson(spark, p, crs=crs)
        out = {(r["from_label"], r["to_label"]): r["measure"]
               for r in ps.intersect(square, grid).collect()}
        for (g_lab, s_lab), golden in GOLDEN_GRID_SQUARE.items():
            assert out[(s_lab, g_lab)] == pytest.approx(golden, rel=1e-9), crs


def test_file_api_chain_ifi_and_remaining(spark, tmp_path):
    """Full reference file-surface chain: intersect_files →
    intersections_from_intersection_files (core.py:190-269; sibling
    metadata discovery, content-addressed names, [id, label, measure]
    rows) → calculate_remaining_files (core.py:272-387)."""
    from pandarus_spark.sources.geojson import (
        calculate_remaining_files, intersections_from_intersection_files,
    )

    first = _write_fixture(tmp_path, "outside")
    second = _write_fixture(tmp_path, "grid")
    out_dir = str(tmp_path / "out")
    geo_fp, json_fp = intersect_files(spark, first, "name", second, "name",
                                      out_dir=out_dir, when="2026-01-01T00:00:00")

    fp1, fp2 = intersections_from_intersection_files(
        geo_fp, out_dir=out_dir, when="2026-01-01T00:00:00")
    d1, d2 = import_json(fp1), import_json(fp2)
    # (C,A) carries from-side labels, (C,B) to-side labels, same measures
    assert [row[1] for row in d1["data"]] == ["by-myself"] * 2
    assert sorted(row[1] for row in d2["data"]) == ["grid cell 1", "grid cell 3"]
    assert [row[2] for row in d1["data"]] == [row[2] for row in d2["data"]]
    assert d1["metadata"]["second"]["sha256"] != d2["metadata"]["second"]["sha256"]
    # chained identity: 'first' is the intersections file itself
    assert d1["metadata"]["first"]["sha256"] in fp1

    rem_fp = calculate_remaining_files(spark, first, "name", geo_fp,
                                       out_dir=out_dir, when="2026-01-01T00:00:00")
    payload = import_json(rem_fp)
    assert set(payload["metadata"]) == {"source", "intersections", "when"}
    (label, remaining), = payload["data"]
    assert label == "by-myself"
    # reference golden: half the outside square lies beyond the grid,
    # ≈ ½·(4e7/360)² (test_calculate_remaining.py:52-82, rtol 1e-2)
    assert remaining == pytest.approx(0.5 * (4e7 / 360) ** 2, rel=1e-2)


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
