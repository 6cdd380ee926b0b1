"""GeoJSON source/sink + file-level API parity with the reference.

The reference's public surface is file-in/file-out: ``intersect()``
takes two fiona-readable vector files and writes a geo file plus a JSON
extract with a metadata envelope (core.py:31-187, output schema
core.py:153-161, JSON shape core.py:95-126; metadata fields
model.py:93-105; sha256 identity utils/io.py:11-19; bz2 JSON
utils/io.py:22-35).  This module reproduces that surface on the Spark
engine for GeoJSON (the format the reference's own tests exercise,
tests/__init__.py:8,26), without GDAL:

* :func:`read_geojson` — FeatureCollection file → feature DataFrame
  (same normalize pass as ``extract_features``: WKB + kind + bbox +
  is_rect, stable integer feature ids).
* :func:`write_geojson` — intersections DataFrame → FeatureCollection
  with properties ``{id, from_label, to_label, measure}`` (the
  reference's fixed output schema).
* :func:`export_json` / :func:`intersections_json_extract` — the
  ``{'metadata': …, 'data': [[from, to, measure]]}`` extract, optional
  bz2.
* :func:`intersect_files` — the reference's flagship signature:
  ``(first_path, first_field, second_path, second_field, out_dir=…)``
  → ``(geojson_fp, json_fp)``.

Driver-side file IO is deliberate: these are report-scale artifacts
(the reference writes them on one machine too).  At cluster scale the
same DataFrames sink to parquet/Iceberg instead.
"""

from __future__ import annotations

import bz2
import datetime as _dt
import hashlib
import json
import os

from ..geometry import geom as G


def sha256_file(path: str) -> str:
    """Content identity of an input file (reference utils/io.py:11-19)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _open_maybe_bz2(path: str, mode: str):
    if path.endswith(".bz2"):
        return bz2.open(path, mode + "t" if "b" not in mode else mode)
    return open(path, mode)


def export_json(data: dict, path: str, compress: bool = True) -> str:
    """(bz2-)JSON sink (reference utils/io.py:22-35)."""
    if compress and not path.endswith(".bz2"):
        path += ".bz2"
    with _open_maybe_bz2(path, "w") as f:
        json.dump(data, f, ensure_ascii=False)
    return path


def import_json(path: str) -> dict:
    with _open_maybe_bz2(path, "r") as f:
        return json.load(f)


def file_metadata(path: str, field: str) -> dict:
    """Reference Map.metadata (model.py:93-105)."""
    return {"field": field, "path": os.path.abspath(path),
            "filename": os.path.basename(path), "sha256": sha256_file(path)}


def read_geojson(spark, path: str, identifying_field: str = "name",
                 validate_unique: bool = True, crs: str | None = None,
                 repair: bool = False):
    """GeoJSON FeatureCollection → feature DataFrame.

    Feature ids are the enumeration order, like the reference's stable
    integer row index (model.py:25-28); labels come from
    ``identifying_field`` with the reference's uniqueness check
    (DuplicateFieldIDError, model.py:126-127).

    ``crs`` names the file's coordinate system; geometries are
    normalized to WGS84 at ingest, the Spark analogue of the
    reference's ``Map.iter_latlong`` re-projection pass
    (model.py:130-140) that its projected-CRS test variants exercise
    (tests/integration/test_intersect.py:288-356).  If omitted, the
    file-level ``crs`` member is honoured when present (legacy GeoJSON),
    else WGS84 per RFC 7946."""
    from ..geometry.projection import is_geographic, to_wgs84
    from .pages import FEATURES_SCHEMA, _np_geometry

    with _open_maybe_bz2(path, "r") as f:
        fc = json.load(f)
    if crs is None:
        crs = _file_crs(fc)
    project = None
    if crs is not None and not is_geographic(crs):
        project = lambda x, y: to_wgs84(x, y, crs)  # noqa: E731
    rows, seen = [], set()
    for idx, feat in enumerate(fc["features"]):
        label = feat["properties"][identifying_field]
        if validate_unique:
            if label in seen:
                raise ValueError(f"duplicate identifying field value {label!r} "
                                 "(reference DuplicateFieldIDError, model.py:126-127)")
            seen.add(label)
        geometry = _np_geometry(feat["geometry"])
        if project is not None:
            geometry = G.transform_geom(geometry, project)
        geometry = G.clean_geom(geometry, repair=repair)
        mnx, mny, mxx, mxy = G.bounds(geometry)
        rows.append((idx, label if isinstance(label, str) else json.dumps(label),
                     G.wkb_dumps(geometry), G.geom_kind(geometry),
                     mnx, mny, mxx, mxy, G.is_axis_rect(geometry)))
    return spark.createDataFrame(rows, FEATURES_SCHEMA)


def _file_crs(fc: dict) -> str | None:
    """Legacy GeoJSON ``crs`` member → authority string (e.g.
    'EPSG:3857'), or None.  RFC 7946 removed the member; files the
    pre-RFC tooling wrote (and fiona still reads) carry
    ``{"crs": {"type": "name", "properties": {"name": "urn:ogc:def:crs:EPSG::3857"}}}``."""
    crs = fc.get("crs")
    if not isinstance(crs, dict):
        return None
    name = (crs.get("properties") or {}).get("name", "")
    if not isinstance(name, str) or not name:
        return None
    up = name.upper()
    if "CRS84" in up:
        return None  # CRS84 is WGS84 lon/lat
    if "EPSG" in up:
        code = up.rsplit(":", 1)[-1]
        return f"EPSG:{code}"
    return name


def _geojson_geometry(geom: dict) -> dict:
    """Geometry dict (numpy coords) → plain-list GeoJSON geometry."""
    def conv(c):
        import numpy as np
        if isinstance(c, np.ndarray):
            return c.tolist()
        if isinstance(c, (list, tuple)):
            return [conv(x) for x in c]
        return c
    if geom["type"] == "GeometryCollection":
        return {"type": "GeometryCollection",
                "geometries": [_geojson_geometry(g) for g in geom["geometries"]]}
    return {"type": geom["type"], "coordinates": conv(geom["coordinates"])}


def write_geojson(intersections, path: str) -> str:
    """Intersections DataFrame → GeoJSON FeatureCollection with the
    reference's fixed property schema (core.py:153-161)."""
    feats = []
    for r in intersections.select("id", "from_label", "to_label", "measure",
                                  "geom_wkb").collect():
        feats.append({
            "type": "Feature",
            "geometry": _geojson_geometry(G.wkb_loads(bytes(r["geom_wkb"]))),
            "properties": {"id": int(r["id"]), "from_label": r["from_label"],
                           "to_label": r["to_label"], "measure": float(r["measure"])},
        })
    fc = {"type": "FeatureCollection", "features": feats}
    with open(path, "w") as f:
        json.dump(fc, f, ensure_ascii=False)
    return path


def intersections_json_extract(intersections, first_meta: dict, second_meta: dict,
                               path: str, compress: bool = True,
                               when: str | None = None) -> str:
    """The reference's JSON extract (core.py:95-126, 174-185):
    ``{'metadata': {'first','second','when'}, 'data': [[from,to,measure]]}``."""
    data = [[r["from_label"], r["to_label"], float(r["measure"])]
            for r in intersections.select("from_label", "to_label", "measure")
            .orderBy("from_label", "to_label").collect()]
    payload = {"metadata": {"first": first_meta, "second": second_meta,
                            "when": when or _dt.datetime.now().isoformat()},
               "data": data}
    return export_json(payload, path, compress=compress)


INTERSECTIONS_SCHEMA = ("id long, from_label string, to_label string, "
                        "measure double, geom_wkb binary")


def read_intersections_geojson(spark, path: str):
    """Intersections GeoJSON (the ``intersect`` output) → DataFrame,
    with the reference's schema validation (exact property set
    {id, from_label, to_label, measure}; core.py:338-355 /
    core.py:225-229)."""
    from .pages import _np_geometry

    with _open_maybe_bz2(path, "r") as f:
        fc = json.load(f)
    rows = []
    for feat in fc["features"]:
        props = feat["properties"]
        for key in ("id", "from_label", "to_label", "measure"):
            if key not in props:
                raise KeyError(f"Input file {path} does not have required field: {key}")
        # schema-type validation (reference core.py:348-360): id must be
        # integral, measure numeric — not merely coercible strings
        if isinstance(props["id"], bool) or not isinstance(props["id"], int):
            raise ValueError(f"Input file {path}: field 'id' must be an integer, "
                             f"got {props['id']!r}")
        if isinstance(props["measure"], bool) or not isinstance(props["measure"], (int, float)):
            raise ValueError(f"Input file {path}: field 'measure' must be numeric, "
                             f"got {props['measure']!r}")
        rows.append((int(props["id"]), str(props["from_label"]), str(props["to_label"]),
                     float(props["measure"]),
                     G.wkb_dumps(_np_geometry(feat["geometry"]))))
    return spark.createDataFrame(rows, INTERSECTIONS_SCHEMA)


def _intersection_props(path: str) -> list[dict]:
    """Property rows {id, from_label, to_label, measure} of an
    intersections file, GeoJSON or GPKG (the reference reads its own
    geo output back through fiona regardless of driver,
    core.py:221-233)."""
    if path.lower().endswith(".gpkg"):
        import sqlite3

        from .gpkg import _feature_tables
        con = sqlite3.connect(path)
        try:
            tbl, _geom_col, _srs = _feature_tables(con)[0]
            cols = [r[1] for r in con.execute(f'PRAGMA table_info("{tbl}")')]
            for key in ("id", "from_label", "to_label", "measure"):
                if key not in cols:
                    raise KeyError(f"Input file {path} does not have "
                                   f"required field: {key}")
            return [dict(zip(("id", "from_label", "to_label", "measure"), r))
                    for r in con.execute(
                        f'SELECT id, from_label, to_label, measure FROM "{tbl}" '
                        "ORDER BY rowid")]
        finally:
            con.close()
    with _open_maybe_bz2(path, "r") as f:
        fc = json.load(f)
    data = []
    for feat in fc["features"]:
        props = feat["properties"]
        for key in ("id", "from_label", "to_label", "measure"):
            if key not in props:
                raise KeyError(f"Input file {path} does not have "
                               f"required field: {key}")
        data.append(props)
    return data


def read_intersections_vector(spark, path: str):
    """Intersections file → DataFrame, GeoJSON or GPKG dispatch."""
    if path.lower().endswith(".gpkg"):
        import sqlite3

        from .gpkg import _feature_tables, _parse_gpkg_blob
        con = sqlite3.connect(path)
        try:
            tbl, geom_col, _srs = _feature_tables(con)[0]
            rows = []
            for i, fl, tl, m, blob in con.execute(
                    f'SELECT id, from_label, to_label, measure, "{geom_col}" '
                    f'FROM "{tbl}" ORDER BY rowid'):
                # same schema-type validation as the GeoJSON branch
                # (round-2 advice: a NULL id/measure raised a bare
                # TypeError from int()/float(), and empty-geometry
                # blobs yielded NULL geom_wkb rows silently)
                if isinstance(i, bool) or not isinstance(i, int):
                    raise ValueError(f"Input file {path}: field 'id' must be "
                                     f"an integer, got {i!r}")
                if isinstance(m, bool) or not isinstance(m, (int, float)):
                    raise ValueError(f"Input file {path}: field 'measure' must "
                                     f"be numeric, got {m!r}")
                wkb = _parse_gpkg_blob(blob)
                if wkb is None:
                    raise ValueError(
                        f"Input file {path}: intersection id {i} has an empty "
                        "geometry — not a valid intersect output")
                rows.append((int(i), str(fl), str(tl), float(m), wkb))
        finally:
            con.close()
        return spark.createDataFrame(rows, INTERSECTIONS_SCHEMA)
    return read_intersections_geojson(spark, path)


def _sibling_metadata_path(vector_file_path: str) -> str:
    """The reference's metadata-file discovery (core.py:213-220): same
    basename with .json / .json.bz2."""
    base = ".".join(vector_file_path.split(".")[:-1]) + ".json"
    if os.path.isfile(base):
        return base
    if os.path.isfile(base + ".bz2"):
        return base + ".bz2"
    raise ValueError("Can't find metadata file")


def intersections_from_intersection_files(vector_file_path: str,
                                          metadata_file_path: str | None = None,
                                          out_dir: str = ".", compress: bool = True,
                                          when: str | None = None) -> tuple[str, str]:
    """Reference ``intersections_from_intersection`` file surface
    (core.py:190-269): intersections GeoJSON C = A⋈B → two JSON data
    files (C,A) and (C,B) — data rows [id, from|to_label, measure],
    metadata chaining this file's sha256 with the original inputs',
    content-addressed output names."""
    if not os.path.isfile(vector_file_path):
        raise FileNotFoundError(f"Can't find vector file: {vector_file_path}.")
    if metadata_file_path is None:
        metadata_file_path = _sibling_metadata_path(vector_file_path)
    elif not os.path.isfile(metadata_file_path):
        raise FileNotFoundError(f"Can't find metadata file: {metadata_file_path}.")
    metadata = import_json(metadata_file_path)["metadata"]
    data = _intersection_props(vector_file_path)
    this = file_metadata(vector_file_path, "id")
    stamp = when or _dt.datetime.now().isoformat()
    os.makedirs(out_dir, exist_ok=True)
    out = []
    for side, label_key in (("first", "from_label"), ("second", "to_label")):
        payload = {
            "data": [[o["id"], o[label_key], o["measure"]] for o in data],
            "metadata": {"first": this, "second": metadata[side], "when": stamp},
        }
        fp = os.path.join(out_dir, f"{this['sha256']}.{metadata[side]['sha256']}.json")
        out.append(export_json(payload, fp, compress=compress))
    return out[0], out[1]


def calculate_remaining_files(spark, source_file_path: str, source_field: str,
                              intersection_file_path: str, out_dir: str = ".",
                              compress: bool = True, when: str | None = None,
                              crs: str | None = None) -> str:
    """Reference ``calculate_remaining`` file surface (core.py:272-387)
    on the Spark engine: source vector file + intersections GeoJSON →
    ``{'metadata': {source, intersections, when}, 'data':
    [[label, remaining]]}`` JSON.

    Parity details (round-2, per advisor): output is content-addressed
    ``{source_sha256}.{intersections_sha256}.json`` (reference
    core.py:324-328), data rows follow SOURCE FEATURE enumeration order
    (the reference iterates the source map, core.py:357-379 — not label
    sort order), and the intersections file's id/measure property types
    are validated on ingest (core.py:348-360, via
    ``read_intersections_geojson``)."""
    import pandarus_spark as ps

    source = read_vector(spark, source_file_path, source_field, crs=crs)
    inter = read_intersections_vector(spark, intersection_file_path)
    rem = ps.calculate_remaining(source, inter)
    order = source.select("feature_id", "label")
    data = [[r["label"], float(r["remaining"])]
            for r in rem.join(order, "label").orderBy("feature_id").collect()]
    source_meta = file_metadata(source_file_path, source_field)
    inter_meta = file_metadata(intersection_file_path, "id")
    payload = {
        "metadata": {
            "source": source_meta,
            "intersections": inter_meta,
            "when": when or _dt.datetime.now().isoformat(),
        },
        "data": data,
    }
    os.makedirs(out_dir, exist_ok=True)
    fp = os.path.join(out_dir, f"{source_meta['sha256']}.{inter_meta['sha256']}.json")
    return export_json(payload, fp, compress=compress)


def read_vector(spark, path: str, identifying_field: str = "name",
                validate_unique: bool = True, crs: str | None = None,
                repair: bool = False, **kwargs):
    """Format-dispatching vector reader (the reference's fiona-open
    sniffing, utils/conversion.py:31-51): ``.gpkg`` → GeoPackage,
    ``.shp`` → shapefile, anything else → GeoJSON."""
    low = path.lower()
    if low.endswith(".gpkg") or low.endswith(".gpkg.bz2"):
        from .gpkg import read_gpkg
        return read_gpkg(spark, path, identifying_field,
                         validate_unique=validate_unique, crs=crs,
                         repair=repair, **kwargs)
    if low.endswith(".shp"):
        from .shapefile import read_shapefile
        return read_shapefile(spark, path, identifying_field,
                              validate_unique=validate_unique, crs=crs,
                              repair=repair)
    return read_geojson(spark, path, identifying_field,
                        validate_unique=validate_unique, crs=crs, repair=repair)


def intersect_files(spark, first_path: str, first_field: str,
                    second_path: str, second_field: str,
                    out_dir: str, compress: bool = True, driver: str = "GeoJSON",
                    when: str | None = None, first_crs: str | None = None,
                    second_crs: str | None = None, **intersect_kwargs) -> tuple[str, str]:
    """The reference's flagship file API (core.py:31-187) on the Spark
    engine: read both vector inputs (GeoJSON or GPKG, dispatched on
    extension), run the overlay join, write the geo result
    (``driver="GeoJSON"`` or ``"GPKG"``, reference core.py:71-72) + the
    JSON extract; output names are the content-addressed
    ``{sha1}.{sha2}`` convention (core.py:140).
    ``first_crs``/``second_crs`` normalize projected inputs to WGS84 at
    ingest (reference projected-CRS variants, test_intersect.py:288-356)."""
    import pandarus_spark as ps

    if driver not in ("GeoJSON", "GPKG"):
        raise ValueError(f"unsupported driver {driver!r} (GeoJSON or GPKG)")
    first_meta = file_metadata(first_path, first_field)
    second_meta = file_metadata(second_path, second_field)
    f1 = read_vector(spark, first_path, first_field, crs=first_crs)
    f2 = read_vector(spark, second_path, second_field, crs=second_crs)
    # file outputs need the reference's deterministic enumeration-order
    # ids (utils/conversion.py:14-28) — opt into the global sort here,
    # at report scale, rather than making it the engine-wide default
    intersect_kwargs.setdefault("ids", "sorted")
    out = ps.intersect(f1, f2, **intersect_kwargs).persist()

    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(out_dir, f"{first_meta['sha256']}.{second_meta['sha256']}")
    if driver == "GPKG":
        from .gpkg import write_gpkg
        geo_fp = write_gpkg(out, base + ".gpkg")
    else:
        geo_fp = write_geojson(out, base + ".geojson")
    json_fp = intersections_json_extract(out, first_meta, second_meta,
                                         base + ".json", compress=compress, when=when)
    return geo_fp, json_fp
