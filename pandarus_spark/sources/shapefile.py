"""ESRI Shapefile source — pure Python (struct + numpy), no GDAL.

The reference reads shapefiles through fiona (its own integration tests
feed one to ``intersections_from_intersection``,
tests/integration/test_intersections_from_intersection.py:29-37).
Round-1 shipped GeoJSON only; with GPKG (round 2) this closes the last
vector-format gap in "What's missing" #2.

Format notes (ESRI whitepaper, 1998):

* ``.shp``: 100-byte header (file code 9994 big-endian, shape type
  little-endian), then records — (record#, content length) big-endian
  + little-endian shape payload.  Supported shapes: Point(1),
  PolyLine(3), Polygon(5), MultiPoint(8), and Null(0) (skipped).
  Z/M variants raise.
* Polygon rings are delimited by the parts index; OUTER rings wind
  clockwise (negative shoelace), holes counter-clockwise — ring
  grouping assigns each hole to the exterior whose region contains
  its first vertex.
* ``.dbf`` (dBASE III): fixed-width attribute records; C (text),
  N/F (numeric), L (logical) fields supported.
* ``.prj`` is optional; when present a few well-known WKT spellings
  map onto the engine's CRS registry, otherwise pass ``crs=``.
"""

from __future__ import annotations

import json
import os
import re
import struct

import numpy as np

from ..geometry import geom as G

_SHAPE_NAMES = {0: "Null", 1: "Point", 3: "PolyLine", 5: "Polygon", 8: "MultiPoint"}


def _read_shp(path: str) -> list[dict | None]:
    """.shp → list of geometry dicts (None for Null shapes)."""
    with open(path, "rb") as f:
        buf = f.read()
    code, = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError(f"{path} is not a shapefile (bad file code {code})")
    length_words, = struct.unpack_from(">i", buf, 24)
    end = length_words * 2
    geoms: list[dict | None] = []
    pos = 100
    while pos + 8 <= min(end, len(buf)):
        _recno, content_words = struct.unpack_from(">ii", buf, pos)
        pos += 8
        shape_type, = struct.unpack_from("<i", buf, pos)
        geoms.append(_parse_shape(buf, pos, shape_type, path))
        pos += content_words * 2
    return geoms


def _parse_shape(buf: bytes, pos: int, shape_type: int, path: str) -> dict | None:
    if shape_type == 0:
        return None
    if shape_type == 1:
        x, y = struct.unpack_from("<dd", buf, pos + 4)
        return {"type": "Point", "coordinates": np.array([x, y])}
    if shape_type == 8:
        npts, = struct.unpack_from("<i", buf, pos + 36)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npts,
                            offset=pos + 40).reshape(npts, 2).astype(np.float64)
        return {"type": "MultiPoint", "coordinates": pts}
    if shape_type in (3, 5):
        nparts, npts = struct.unpack_from("<ii", buf, pos + 36)
        parts = np.frombuffer(buf, dtype="<i4", count=nparts, offset=pos + 44)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npts,
                            offset=pos + 44 + 4 * nparts).reshape(npts, 2).astype(np.float64)
        bounds = list(parts) + [npts]
        rings = [pts[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if b - a >= 2]
        if shape_type == 3:
            if len(rings) == 1:
                return {"type": "LineString", "coordinates": rings[0]}
            return {"type": "MultiLineString", "coordinates": rings}
        return _group_polygon_rings(rings)
    raise NotImplementedError(
        f"shape type {shape_type} ({_SHAPE_NAMES.get(shape_type, 'Z/M variant')}) "
        f"in {path} is not supported")


def _group_polygon_rings(rings: list[np.ndarray]) -> dict:
    """Shapefile ring soup → Polygon/MultiPolygon: clockwise rings are
    exteriors, counter-clockwise are holes of the exterior containing
    their first vertex."""
    exts, holes = [], []
    for r in rings:
        if len(r) < 4:
            continue
        closed = r if np.array_equal(r[0], r[-1]) else np.vstack([r, r[0]])
        (exts if G.ring_area(closed) < 0 else holes).append(closed)
    if not exts:        # degenerate: treat everything as exteriors
        exts, holes = holes, []
    parts = [[e] for e in exts]
    for h in holes:
        placed = False
        for part in parts:
            if G.points_in_ring(h[0:1], part[0])[0]:
                part.append(h)
                placed = True
                break
        if not placed:  # orphan hole: keep as its own exterior
            parts.append([h])
    if len(parts) == 1:
        return {"type": "Polygon", "coordinates": parts[0]}
    return {"type": "MultiPolygon", "coordinates": parts}


def _read_dbf(path: str) -> list[dict]:
    """.dbf → list of {field: value} per record (deleted rows skipped)."""
    with open(path, "rb") as f:
        buf = f.read()
    n_rec, = struct.unpack_from("<I", buf, 4)
    hdr_size, rec_size = struct.unpack_from("<HH", buf, 8)
    fields = []
    pos = 32
    while pos < hdr_size - 1 and buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    out = []
    pos = hdr_size
    for _ in range(n_rec):
        if pos + rec_size > len(buf):
            break
        rec = buf[pos:pos + rec_size]
        pos += rec_size
        if rec[0:1] == b"*":
            continue  # deleted
        row, off = {}, 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off:off + flen]
            off += flen
            txt = raw.decode("latin-1").strip()
            if ftype in ("N", "F"):
                if not txt or txt == "*" * len(txt):
                    row[name] = None
                elif ftype == "N" and fdec == 0 and "." not in txt:
                    row[name] = int(txt)
                else:
                    row[name] = float(txt)
            elif ftype == "L":
                row[name] = txt.upper() in ("T", "Y")
            else:
                row[name] = txt
        out.append(row)
    return out


_PRJ_PATTERNS = [
    # order matters: a UTM PROJCS embeds a WGS84 GEOGCS, so the most
    # specific projected spellings must win over the geographic one
    (re.compile(r"UTM[_ ]?[Zz]one[_ ]?(\d{1,2})(N|S|_N|_S|\b)", re.I), "UTM"),
    # a bare '3857' substring would misfire on e.g. a False_Northing of
    # 3857000 or an unrelated authority code — require the name or the
    # explicit EPSG authority node (round-2 review finding)
    (re.compile(r"Web_Mercator|Pseudo[-_]?Mercator"
                r"|AUTHORITY\s*\[\s*\"EPSG\"\s*,\s*\"3857\"\s*\]"
                r"|ID\s*\[\s*\"EPSG\"\s*,\s*3857\s*\]", re.I), "EPSG:3857"),
    (re.compile(r"GCS_WGS_1984|WGS\s*84|WGS_1984", re.I), "EPSG:4326"),
]


#: WKT PARAMETER name → PROJ4 key, covering ESRI WKT1 and OGC WKT2
#: spellings (names normalized to lowercase words).
_WKT_PARAM_KEYS = {
    "false easting": "x_0",
    "false northing": "y_0",
    "central meridian": "lon_0",
    "longitude of center": "lon_0",
    "longitude of origin": "lon_0",
    "longitude of natural origin": "lon_0",
    "scale factor": "k",
    "scale factor at natural origin": "k",
    "latitude of origin": "lat_0",
    "latitude of center": "lat_0",
    "latitude of natural origin": "lat_0",
    "standard parallel 1": "lat_1",
    "standard parallel 2": "lat_2",
    "latitude of 1st standard parallel": "lat_1",
    "latitude of 2nd standard parallel": "lat_2",
    # WKT2 conic spellings (EPSG dataset names for aea/lcc)
    "latitude of false origin": "lat_0",
    "longitude of false origin": "lon_0",
    "easting at false origin": "x_0",
    "northing at false origin": "y_0",
}

#: WKT PROJECTION/METHOD name → PROJ4 projection, restricted to what the
#: closed-form kernels implement.
_WKT_PROJ_NAMES = {
    "transverse mercator": "tmerc",
    "lambert azimuthal equal area": "laea",
    "mollweide": "moll",
    "albers": "aea",
    "albers conic equal area": "aea",
    "albers equal area": "aea",
    "lambert conformal conic": "lcc",
    "lambert conformal conic 2sp": "lcc",
    "lambert conformal conic 1sp": "lcc",
    "lambert conic conformal 2sp": "lcc",
    "lambert conic conformal 1sp": "lcc",
}


def _norm_wkt_name(s: str) -> str:
    return " ".join(re.sub(r"[^a-z0-9]+", " ", s.lower()).split())


def _proj4_from_projcs_wkt(wkt: str) -> str | None:
    """Generic PROJCS WKT → PROJ4 string for the projections the engine
    implements (tmerc/laea/aea/lcc/moll); returns None when the WKT is not a
    recognizable parameterized PROJCS.  The resulting string dispatches
    through the PROJ4 front-end in geometry/projection.py, so ellipsoid
    restrictions (WGS84/GRS80 only) are enforced there."""
    m = re.search(r'(?:PROJECTION|METHOD)\s*\[\s*"([^"]+)"', wkt, re.I)
    if not m:
        return None
    proj = _WKT_PROJ_NAMES.get(_norm_wkt_name(m.group(1)))
    if proj is None:
        return None
    parts = [f"+proj={proj}"]
    for name, val in re.findall(
            r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)', wkt, re.I):
        key = _WKT_PARAM_KEYS.get(_norm_wkt_name(name))
        if key is not None:
            # repr keeps the value exact: '%.10g' truncated repeating
            # decimals like -84.16666666666667 (US state-plane
            # meridians) by ~4e-8 deg (round-2 review finding)
            parts.append(f"+{key}={float(val)!r}")
        else:
            # silently dropping an unrecognized parameter mis-projects
            # every coordinate (e.g. WKT2's 'Longitude of false origin'
            # before it was mapped); refuse instead
            raise ValueError(
                f"unrecognized projection parameter {name!r} in .prj; "
                "pass crs= explicitly")
    ell = _wkt_ellps(wkt)
    if ell:
        parts.append(f"+ellps={ell}")
    # the projected unit is the LAST UNIT/LENGTHUNIT node (the GEOGCS
    # degree unit precedes PROJECTION); anchoring to end-of-string
    # missed GDAL WKTs where AUTHORITY/AXIS nodes follow the unit,
    # letting foot-based CRSs through to the metre kernels silently
    # (round-2 review finding)
    units = re.findall(r'\b(?:LENGTHUNIT|UNIT)\s*\[\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)',
                       wkt, re.I)  # \b keeps ANGLEUNIT (degrees) out
    if units:
        uname, ufac = units[-1]
        if abs(float(ufac) - 1.0) > 1e-12:
            raise ValueError(
                f"non-metre projected unit {uname!r} in .prj is not supported")
    return " ".join(parts)


def _wkt_ellps(wkt: str) -> str | None:
    """Spheroid gate shared by the generic PROJCS path and the UTM
    shortcut: WGS84/GRS80 map to the exact closed-form kernels, any
    other ellipsoid (Clarke 1866/NAD27, Bessel, intl) raises instead of
    silently running WGS84 math 10-200 m off (round-2 advice)."""
    ell = re.search(r'SPHEROID\s*\[\s*"([^"]+)"|ELLIPSOID\s*\[\s*"([^"]+)"',
                    wkt, re.I)
    if not ell:
        return None
    name = _norm_wkt_name(ell.group(1) or ell.group(2))
    if "wgs" in name and "84" in name:
        return "WGS84"
    if "grs" in name and ("80" in name or "1980" in name):
        return "GRS80"
    raise ValueError(
        f"unsupported spheroid {name!r} in .prj; the closed-form "
        "kernels are WGS84/GRS80-exact only")


def _crs_from_prj(path: str) -> str | None:
    prj = os.path.splitext(path)[0] + ".prj"
    if not os.path.isfile(prj):
        return None
    wkt = open(prj).read()
    projected = re.search(r"(?:PROJECTION|METHOD)\s*\[", wkt, re.I) is not None
    for pat, tag in _PRJ_PATTERNS:
        if tag == "EPSG:4326" and projected:
            # a projected WKT embeds a geographic GEOGCS — matching its
            # WGS84 name would silently skip the projection
            continue
        m = pat.search(wkt)
        if not m:
            continue
        if tag != "UTM":
            return tag
        # the UTM shortcut must enforce the same spheroid gate as the
        # generic PROJCS path: a NAD27/Clarke-1866 UTM .prj would
        # otherwise resolve to EPSG:326xx and silently run the WGS84
        # kernels (round-2 advice)
        _wkt_ellps(wkt)
        zone = int(m.group(1))
        hemi = (m.group(2) or "").strip("_").upper()
        if hemi in ("N", "S"):
            south = hemi == "S"
        else:
            # no explicit suffix: consult ONLY the quoted name that
            # contains the zone match — 'south' anywhere else in the
            # WKT (AREA["South Carolina"], South_American_Datum) must
            # not flip a northern zone (round-2 advice)
            q0 = wkt.rfind('"', 0, m.start())
            q1 = wkt.find('"', m.end())
            ctx = wkt[q0 + 1:q1] if (q0 != -1 and q1 != -1) else m.group(0)
            south = "south" in ctx.lower()
        return f"EPSG:{327 if south else 326}{zone:02d}"
    p4 = _proj4_from_projcs_wkt(wkt)
    if p4 is not None:
        return p4
    raise ValueError(f"unrecognized .prj CRS in {prj!r}; pass crs= explicitly")


def read_shapefile(spark, path: str, identifying_field: str = "name",
                   validate_unique: bool = True, crs: str | None = None,
                   repair: bool = False):
    """Shapefile (.shp + .dbf [+ .prj]) → feature DataFrame — the same
    contract as ``read_geojson`` / ``read_gpkg`` (stable enumeration
    ids, label uniqueness, WGS84 normalization, WKB + kind + bbox +
    is_rect)."""
    from ..geometry.projection import is_geographic, to_wgs84
    from .pages import FEATURES_SCHEMA

    geoms = _read_shp(path)
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    if not os.path.isfile(dbf_path):
        raise FileNotFoundError(f"attribute table not found: {dbf_path}")
    attrs = _read_dbf(dbf_path)
    if len(attrs) != len(geoms):
        raise ValueError(f"{path}: {len(geoms)} shapes but {len(attrs)} dbf records")
    if attrs and identifying_field not in attrs[0]:
        raise ValueError(f"identifying field {identifying_field!r} not in "
                         f"{dbf_path} (has: {sorted(attrs[0])})")
    if crs is None:
        crs = _crs_from_prj(path)
    project = None
    if crs is not None and not is_geographic(crs):
        project = lambda x, y: to_wgs84(x, y, crs)  # noqa: E731

    rows, seen = [], set()
    for idx, (geometry, props) in enumerate(zip(geoms, attrs)):
        if geometry is None:
            continue
        label = props[identifying_field]
        if validate_unique:
            if label in seen:
                raise ValueError(f"duplicate identifying field value {label!r} "
                                 "(reference DuplicateFieldIDError, model.py:126-127)")
            seen.add(label)
        if project is not None:
            geometry = G.transform_geom(geometry, project)
        geometry = G.clean_geom(geometry, repair=repair)
        mnx, mny, mxx, mxy = G.bounds(geometry)
        rows.append((idx, label if isinstance(label, str) else json.dumps(label),
                     G.wkb_dumps(geometry), G.geom_kind(geometry),
                     mnx, mny, mxx, mxy, G.is_axis_rect(geometry)))
    return spark.createDataFrame(rows, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Minimal writer (tests / fixtures round-trip; not a full GDAL replacement)
# ---------------------------------------------------------------------------

def write_features_shapefile(features_df, path: str, label_field: str = "name") -> str:
    """Feature DataFrame → .shp/.shx/.dbf triple (+ .prj WGS84), so the
    reader has a self-contained round-trip and fixtures can exercise
    the reference's shapefile-input path without GDAL."""
    rows = features_df.select("feature_id", "label", "geom_wkb") \
                      .orderBy("feature_id").collect()
    shapes, labels = [], []
    for r in rows:
        shapes.append(G.wkb_loads(bytes(r["geom_wkb"])))
        labels.append(str(r["label"]))

    records = []
    for g in shapes:
        records.append(_encode_shape(g))
    shape_type = records[0][0] if records else 1

    recs_buf = bytearray()
    shx_buf = bytearray()
    offset_words = 50
    for i, (st, payload) in enumerate(records):
        content_words = len(payload) // 2
        shx_buf += struct.pack(">ii", offset_words, content_words)
        recs_buf += struct.pack(">ii", i + 1, content_words) + payload
        offset_words += 4 + content_words

    all_pts = np.vstack([np.vstack(list(G._iter_coord_arrays(g))) for g in shapes]) \
        if shapes else np.zeros((1, 2))
    bbox = (all_pts[:, 0].min(), all_pts[:, 1].min(),
            all_pts[:, 0].max(), all_pts[:, 1].max())

    def header(total_bytes):
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_bytes // 2)
        h += struct.pack("<ii", 1000, shape_type)
        h += struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0)
        return h

    with open(path, "wb") as f:
        f.write(header(100 + len(recs_buf)) + recs_buf)
    with open(os.path.splitext(path)[0] + ".shx", "wb") as f:
        f.write(header(100 + len(shx_buf)) + shx_buf)

    flen = max(8, max((len(lab.encode("latin-1")) for lab in labels), default=8))
    if flen > 254:
        # dBASE C fields cap at 254 bytes; silent truncation could
        # collapse distinct labels, so refuse loudly instead
        long_lab = next(lab for lab in labels if len(lab.encode("latin-1")) > 254)
        raise ValueError(f"label {long_lab[:40]!r}… is {flen} bytes; dBASE "
                         "character fields cap at 254 — shorten labels or "
                         "use the GeoJSON/GPKG writers")
    dbf = bytearray()
    dbf += bytes([3, 126, 1, 1]) + struct.pack("<I", len(labels))
    dbf += struct.pack("<HH", 32 + 32 + 1, 1 + flen) + b"\x00" * 20
    name_b = label_field.encode("ascii")[:10]
    dbf += name_b + b"\x00" * (11 - len(name_b)) + b"C" + b"\x00" * 4
    dbf += bytes([flen, 0]) + b"\x00" * 14
    dbf += b"\x0d"
    for lab in labels:
        enc = lab.encode("latin-1")[:flen]
        dbf += b" " + enc + b" " * (flen - len(enc))
    dbf += b"\x1a"
    with open(os.path.splitext(path)[0] + ".dbf", "wb") as f:
        f.write(bytes(dbf))
    with open(os.path.splitext(path)[0] + ".prj", "w") as f:
        f.write('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
                'SPHEROID["WGS_1984",6378137,298.257223563]],'
                'PRIMEM["Greenwich",0],UNIT["Degree",0.017453292519943295]]')
    return path


def _encode_shape(g: dict) -> tuple[int, bytes]:
    t = g["type"]
    if t == "Point":
        return 1, struct.pack("<idd", 1, float(g["coordinates"][0]),
                              float(g["coordinates"][1]))
    if t == "MultiPoint":
        pts = np.asarray(g["coordinates"], dtype="<f8").reshape(-1, 2)
        bb = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        return 8, (struct.pack("<i4di", 8, *bb, len(pts)) + pts.tobytes())
    if t in ("LineString", "MultiLineString"):
        lines = [g["coordinates"]] if t == "LineString" else list(g["coordinates"])
        return 3, _encode_parts(3, [np.asarray(p) for p in lines])
    if t in ("Polygon", "MultiPolygon"):
        parts = [g["coordinates"]] if t == "Polygon" else list(g["coordinates"])
        rings = []
        for p in parts:
            for ri, ring in enumerate(p):
                ring = np.asarray(ring, dtype=np.float64)
                closed = ring if np.array_equal(ring[0], ring[-1]) \
                    else np.vstack([ring, ring[0]])
                # shapefile convention: exterior CW, holes CCW
                cw = G.ring_area(closed) < 0
                want_cw = ri == 0
                rings.append(closed if cw == want_cw else closed[::-1])
        return 5, _encode_parts(5, rings)
    raise NotImplementedError(f"cannot write {t} to shapefile")


def _encode_parts(shape_type: int, parts: list[np.ndarray]) -> bytes:
    pts = np.vstack(parts).astype("<f8")
    bb = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
    starts, acc = [], 0
    for p in parts:
        starts.append(acc)
        acc += len(p)
    out = struct.pack("<i4dii", shape_type, *bb, len(parts), len(pts))
    out += np.asarray(starts, dtype="<i4").tobytes()
    out += pts.tobytes()
    return out
