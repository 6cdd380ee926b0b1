"""GeoPackage source/sink parity: read_gpkg must behave exactly like
read_geojson (same feature contract, same goldens, same error paths);
write_gpkg must produce a GPKG the reader round-trips (reference reads
and writes GPKG via fiona, tests/__init__.py:8,26, core.py:71-72)."""

import sqlite3

import pytest

import pandarus_spark as ps
from pandarus_spark.geometry import geom as G
from pandarus_spark.sources.gpkg import (
    _make_gpkg_blob, _parse_gpkg_blob, read_gpkg, write_features_gpkg, write_gpkg,
)
from pandarus_spark.sources.pages import FIXTURES, extract_features, pages_df
from tests.conftest import GOLDEN_GRID_SQUARE


def _write_fixture_gpkg(spark, tmp_path, name, layer="features"):
    feats = extract_features(pages_df(spark, name), validate_unique=False)
    p = str(tmp_path / f"{name}.gpkg")
    return write_features_gpkg(feats, p, layer=layer)


def test_blob_roundtrip_and_envelope_variants():
    g = {"type": "Point", "coordinates": [1.5, 2.5]}
    wkb = G.wkb_dumps(g)
    assert _parse_gpkg_blob(_make_gpkg_blob(wkb)) == wkb
    # envelope indicator 1 (32-byte envelope) must be skipped correctly
    import struct
    env = struct.pack("<4d", 0, 0, 0, 0)
    blob = b"GP\x00" + bytes([0b0011]) + struct.pack("<i", 4326) + env + wkb
    assert _parse_gpkg_blob(blob) == wkb
    with pytest.raises(ValueError):
        _parse_gpkg_blob(b"XX\x00\x01garbagegarbage")


def test_read_gpkg_roundtrip(spark, tmp_path):
    p = _write_fixture_gpkg(spark, tmp_path, "grid")
    feats = read_gpkg(spark, p)
    rows = {r["label"]: r for r in feats.collect()}
    assert set(rows) == {f"grid cell {i}" for i in range(4)}
    assert all(r["kind"] == "polygon" and r["is_rect"] for r in rows.values())


def test_read_gpkg_duplicate_labels_raise(spark, tmp_path):
    p = _write_fixture_gpkg(spark, tmp_path, "duplicates")
    with pytest.raises(ValueError, match="duplicate"):
        read_gpkg(spark, p)


def test_read_gpkg_table_selection_and_errors(spark, tmp_path):
    p = _write_fixture_gpkg(spark, tmp_path, "grid", layer="mylayer")
    assert read_gpkg(spark, p, table="mylayer").count() == 4
    with pytest.raises(ValueError, match="no feature table"):
        read_gpkg(spark, p, table="nope")
    with pytest.raises(ValueError, match="identifying field"):
        read_gpkg(spark, p, identifying_field="missing")
    not_gpkg = str(tmp_path / "plain.db")
    sqlite3.connect(not_gpkg).execute("CREATE TABLE t (x)").connection.commit()
    with pytest.raises(ValueError, match="not a GeoPackage"):
        read_gpkg(spark, not_gpkg)


def test_gpkg_intersect_matches_geojson_goldens(spark, tmp_path):
    """GPKG-read features through the overlay hit the same reference
    goldens as the GeoJSON path (1e-9, golden areas FIXTURES.md §4)."""
    square = read_gpkg(spark, _write_fixture_gpkg(spark, tmp_path, "square"))
    grid = read_gpkg(spark, _write_fixture_gpkg(spark, tmp_path, "grid"))
    out = {(r["from_label"], r["to_label"]): r["measure"]
           for r in ps.intersect(square, grid).collect()}
    for (g_lab, s_lab), golden in GOLDEN_GRID_SQUARE.items():
        assert out[(s_lab, g_lab)] == pytest.approx(golden, rel=1e-9)


def test_intersect_files_gpkg_driver_and_inputs(spark, tmp_path):
    """Full file chain on GPKG: GPKG inputs + driver='GPKG' output,
    content-addressed names, fixed property schema, golden measures."""
    from pandarus_spark.sources.geojson import import_json, intersect_files

    first = _write_fixture_gpkg(spark, tmp_path, "square")
    second = _write_fixture_gpkg(spark, tmp_path, "grid")
    geo_fp, json_fp = intersect_files(
        spark, first, "name", second, "name",
        out_dir=str(tmp_path / "out"), driver="GPKG", when="2026-01-01T00:00:00")
    assert geo_fp.endswith(".gpkg")
    con = sqlite3.connect(geo_fp)
    try:
        app_id = con.execute("PRAGMA application_id").fetchone()[0]
        assert app_id == 0x47504B47
        rows = con.execute(
            "SELECT id, from_label, to_label, measure, geom FROM intersections "
            "ORDER BY id").fetchall()
    finally:
        con.close()
    assert [r[0] for r in rows] == [1, 2, 3, 4]
    got = {(r[2], r[1]): r[3] for r in rows}
    for pair, golden in GOLDEN_GRID_SQUARE.items():
        assert got[pair] == pytest.approx(golden, rel=1e-9)
    for r in rows:
        g = G.wkb_loads(_parse_gpkg_blob(r[4]))
        assert g["type"] == "MultiPolygon"
    payload = import_json(json_fp)
    assert set(payload["metadata"]) == {"first", "second", "when"}

    # the written GPKG is itself readable as a feature source
    back = read_gpkg(spark, geo_fp, identifying_field="id")
    assert back.count() == 4


def test_read_vector_dispatch(spark, tmp_path):
    import json as _json

    from pandarus_spark.sources.geojson import read_vector
    from pandarus_spark.sources.pages import _geo_json
    gp = _write_fixture_gpkg(spark, tmp_path, "grid")
    feats = [{"type": "Feature", "geometry": _json.loads(_geo_json(f["geometry"])),
              "properties": {"name": f["name"]}} for f in FIXTURES["grid"]()]
    gj = str(tmp_path / "grid.geojson")
    with open(gj, "w") as fh:
        _json.dump({"type": "FeatureCollection", "features": feats}, fh)
    a = {r["label"] for r in read_vector(spark, gp).collect()}
    b = {r["label"] for r in read_vector(spark, gj).collect()}
    assert a == b == {f"grid cell {i}" for i in range(4)}


def test_gpkg_intersections_feed_ifi_and_remaining(spark, tmp_path):
    """The GPKG intersect output is itself a valid input to the
    downstream file chain (reference reads its own geo output back via
    fiona regardless of driver, core.py:221-233)."""
    from pandarus_spark.sources.geojson import (
        calculate_remaining_files, import_json, intersect_files,
        intersections_from_intersection_files,
    )

    first = _write_fixture_gpkg(spark, tmp_path, "outside")
    second = _write_fixture_gpkg(spark, tmp_path, "grid")
    out_dir = str(tmp_path / "chain")
    geo_fp, _ = intersect_files(spark, first, "name", second, "name",
                                out_dir=out_dir, driver="GPKG",
                                when="2026-01-01T00:00:00")
    assert geo_fp.endswith(".gpkg")
    fp1, fp2 = intersections_from_intersection_files(
        geo_fp, out_dir=out_dir, when="2026-01-01T00:00:00")
    d1, d2 = import_json(fp1), import_json(fp2)
    assert [row[1] for row in d1["data"]] == ["by-myself"] * 2
    assert sorted(row[1] for row in d2["data"]) == ["grid cell 1", "grid cell 3"]

    rem_fp = calculate_remaining_files(spark, first, "name", geo_fp,
                                       out_dir=out_dir, when="2026-01-01T00:00:00")
    (label, remaining), = import_json(rem_fp)["data"]
    assert label == "by-myself"
    assert remaining == pytest.approx(0.5 * (4e7 / 360) ** 2, rel=1e-2)


def test_read_intersections_gpkg_validates_like_geojson(spark, tmp_path):
    """Round-2 advice: the GPKG intersections reader must reject NULL
    id/measure and empty geometries with the same schema errors as the
    GeoJSON branch, not bare TypeErrors / silent NULL geom_wkb rows."""
    import pytest as _pytest

    from pandarus_spark.sources.geojson import intersect_files, read_intersections_vector
    from pandarus_spark.sources.pages import extract_features, pages_df

    first = _write_fixture_gpkg(spark, tmp_path, "square")
    second = _write_fixture_gpkg(spark, tmp_path, "grid")
    geo_fp, _ = intersect_files(
        spark, first, "name", second, "name",
        out_dir=str(tmp_path / "v"), driver="GPKG", when="2026-01-01T00:00:00")
    # valid file loads
    assert read_intersections_vector(spark, geo_fp).count() == 4

    con = sqlite3.connect(geo_fp)
    con.execute("UPDATE intersections SET measure = NULL WHERE id = 1")
    con.commit(); con.close()
    with _pytest.raises(ValueError, match="'measure' must be numeric"):
        read_intersections_vector(spark, geo_fp)

    con = sqlite3.connect(geo_fp)
    con.execute("UPDATE intersections SET measure = 1.0 WHERE id = 1")
    con.execute("UPDATE intersections SET id = NULL WHERE id = 2")
    con.commit(); con.close()
    with _pytest.raises(ValueError, match="'id' must be an integer"):
        read_intersections_vector(spark, geo_fp)


def test_gpkg_bz2_compress_roundtrip(spark, tmp_path):
    """r4 verdict #8: the GPKG path advertises the same compress=
    round-trip as the GeoJSON file API — features and intersections
    sinks gain .bz2, the reader inflates transparently, read_vector
    dispatches on .gpkg.bz2, and results equal the uncompressed path
    byte for byte."""
    import pandarus_spark as ps
    from pandarus_spark.sources.gpkg import write_features_gpkg, write_gpkg
    from pandarus_spark.sources.geojson import read_vector

    feats = extract_features(pages_df(spark, "grid"))
    plain = write_features_gpkg(feats, str(tmp_path / "grid.gpkg"))
    comp = write_features_gpkg(feats, str(tmp_path / "grid_c.gpkg"),
                               compress=True)
    assert comp.endswith(".gpkg.bz2")
    # compressed artifact actually bz2 (and differs from the plain file)
    assert open(comp, "rb").read(3) == b"BZh"
    assert open(plain, "rb").read(3) != b"BZh"
    # uppercase suffix must inflate too (read_vector lowercases before
    # dispatch; the decompressor must agree)
    import shutil
    upper = str(tmp_path / "GRID_C.GPKG.BZ2")
    shutil.copy(comp, upper)
    d = sorted(tuple(r) for r in read_vector(spark, upper).collect())
    a = sorted(tuple(r) for r in read_gpkg(spark, plain).collect())
    b = sorted(tuple(r) for r in read_gpkg(spark, comp).collect())
    c = sorted(tuple(r) for r in read_vector(spark, comp).collect())
    assert a == b == c == d

    # intersections sink symmetry
    square = extract_features(pages_df(spark, "square"))
    inter = ps.intersect(square, extract_features(pages_df(spark, "grid")))
    ic = write_gpkg(inter, str(tmp_path / "inter.gpkg"), compress=True)
    assert ic.endswith(".gpkg.bz2") and open(ic, "rb").read(3) == b"BZh"
    got = {(r["label"]): r for r in
           read_gpkg(spark, ic, identifying_field="id",
                     validate_unique=False).collect()}
    assert len(got) == 4
