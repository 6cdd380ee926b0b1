"""Minimal pure-python GeoTIFF writer/reader — the file sink the
reference's raster utilities have (``clean_raster``/``round_raster``
write LZW GTiffs, core.py:606,653-655) and round-2 verdict item #6.

Scope is the raster-utility round trip, not a GDAL replacement:
single-band, uncompressed baseline TIFF (classic, little-endian),
IEEE-float samples (float32/float64), one strip, affine georeferencing
via ModelTransformationTag, CRS as an EPSG GeoKey, nodata as
GDAL_NODATA.  Anything else (compression, palettes, multi-band,
BigTIFF) belongs to the import-guarded rasterio path in
:func:`pandarus_spark.sources.raster.read_gtiff`, which falls back to
this reader when rasterio is absent.
"""

from __future__ import annotations

import re
import struct

import numpy as np

from ..operators.raster_stats import RasterSpec

# TIFF tag codes
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT, _FMT = 273, 277, 278, 279, 339
_PIXEL_SCALE, _TIEPOINT, _TRANSFORM = 33550, 33922, 34264
_GEO_KEYS, _GDAL_NODATA = 34735, 42113
# GeoKey ids
_GT_MODEL, _GT_RASTER, _GEOGRAPHIC_TYPE, _PROJECTED_TYPE = 1024, 1025, 2048, 3072

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}  # BYTE ASCII SHORT LONG DOUBLE


def _epsg_of(crs: str) -> int:
    m = re.fullmatch(r"EPSG:(\d+)", crs.strip(), re.I)
    if not m:
        raise ValueError(
            f"write_gtiff encodes EPSG codes only (got {crs!r}); reproject or "
            "pass an EPSG:NNNN crs")
    return int(m.group(1))


def write_gtiff(path: str, values: np.ndarray, spec: RasterSpec) -> None:
    """Write one band as an uncompressed baseline GeoTIFF.

    ``values.dtype`` picks the sample width (float32 stays float32 —
    the reference's LZW output is float32, core.py:653-655; everything
    else is written float64).  NaN cells are stored as ``spec.nodata``
    when set (rasterio's masked-write behavior), else as NaN."""
    if values.ndim != 2:
        raise ValueError("write_gtiff expects a single (H, W) band")
    arr = values.astype(np.float32 if values.dtype == np.float32 else np.float64,
                        copy=True)
    if spec.nodata is not None:
        arr[np.isnan(arr)] = spec.nodata
    h, w = arr.shape
    if (w, h) != (spec.width, spec.height):
        raise ValueError(f"values shape {arr.shape} != spec "
                         f"{(spec.height, spec.width)}")
    bits = arr.dtype.itemsize * 8
    data = arr.astype("<" + arr.dtype.str[1:]).tobytes()

    epsg = _epsg_of(spec.crs)
    # consult the CRS registry, not an EPSG-band heuristic: the 4xxx
    # range also holds PROJECTED codes (e.g. 4087 World Equidistant
    # Cylindrical), which must get ProjectedCSTypeGeoKey
    from ..geometry.projection import is_geographic
    geographic = is_geographic(spec.crs)
    keys = [(_GT_MODEL, 0, 1, 2 if geographic else 1),
            (_GT_RASTER, 0, 1, 1)]  # PixelIsArea
    keys.append((_GEOGRAPHIC_TYPE if geographic else _PROJECTED_TYPE, 0, 1, epsg))
    geo_dir = [1, 1, 0, len(keys)]
    for k in keys:
        geo_dir.extend(k)

    transform = [spec.a, spec.b, 0.0, spec.c,
                 spec.d, spec.e, 0.0, spec.f,
                 0.0, 0.0, 0.0, 0.0,
                 0.0, 0.0, 0.0, 1.0]
    # float() first: repr(np.float64(x)) is "np.float64(x)" under
    # numpy>=2, which would write an unparseable GDAL_NODATA
    nodata_ascii = (f"{float(spec.nodata)!r}".encode() + b"\x00"
                    if spec.nodata is not None else None)

    # layout: header | IFD | out-of-line values | strip data
    tags = [(_W, 4, 1, w), (_H, 4, 1, h), (_BITS, 3, 1, bits),
            (_COMP, 3, 1, 1), (_PHOTO, 3, 1, 1),
            (_STRIP_OFF, 4, 1, "STRIP"), (_SPP, 3, 1, 1),
            (_ROWS_PER_STRIP, 4, 1, h), (_STRIP_CNT, 4, 1, len(data)),
            (_FMT, 3, 1, 3),
            (_TRANSFORM, 12, 16, transform),
            (_GEO_KEYS, 3, len(geo_dir), geo_dir)]
    if nodata_ascii:
        tags.append((_GDAL_NODATA, 2, len(nodata_ascii), nodata_ascii))
    tags.sort()

    ifd_offset = 8
    ifd_size = 2 + 12 * len(tags) + 4
    overflow_at = ifd_offset + ifd_size
    overflow = b""
    entries = b""
    for code, typ, count, val in tags:
        size = _TYPE_SIZE[typ] * count
        if val == "STRIP":
            # placeholder; patched once the strip offset is known
            entries += struct.pack("<HHI4s", code, typ, count, b"\x00\x00\x00\x00")
            continue
        if typ == 2:
            raw = val
        elif typ == 12:
            raw = struct.pack(f"<{count}d", *val)
        elif count > 1:
            raw = struct.pack(f"<{count}{'H' if typ == 3 else 'I'}", *val)
        else:
            raw = struct.pack("<H" if typ == 3 else "<I", val)
        if size <= 4:
            entries += struct.pack("<HHI", code, typ, count) + raw.ljust(4, b"\x00")
        else:
            entries += struct.pack("<HHII", code, typ, count,
                                   overflow_at + len(overflow))
            overflow += raw
    strip_offset = overflow_at + len(overflow)
    # patch the StripOffsets entry (value 0 placeholder)
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += struct.pack("<H", len(tags)) + entries + struct.pack("<I", 0)
    out += overflow
    for i, (code, typ, count, _) in enumerate(tags):
        if (code, typ, count) == (_STRIP_OFF, 4, 1):
            pos = 8 + 2 + 12 * i + 8
            out[pos:pos + 4] = struct.pack("<I", strip_offset)
    out += data
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_gtiff_array(path: str) -> tuple[np.ndarray, RasterSpec]:
    """Read a baseline uncompressed float GeoTIFF (the subset
    :func:`write_gtiff` emits, which GDAL also writes with
    ``COMPRESS=NONE``) → (band array, RasterSpec).  Raises ValueError
    on anything outside that subset."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] == b"II*\x00":
        en = "<"
    elif buf[:4] == b"MM\x00*":
        en = ">"
    else:
        raise ValueError(f"{path!r} is not a classic TIFF")
    (ifd_off,) = struct.unpack(en + "I", buf[4:8])
    (n,) = struct.unpack(en + "H", buf[ifd_off:ifd_off + 2])
    tags: dict[int, tuple] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        code, typ, count = struct.unpack(en + "HHI", buf[e:e + 8])
        size = _TYPE_SIZE.get(typ, 0) * count
        if size == 0:
            continue
        if size <= 4:
            raw = buf[e + 8:e + 8 + size]
        else:
            (off,) = struct.unpack(en + "I", buf[e + 8:e + 12])
            raw = buf[off:off + size]
        if typ == 2:
            tags[code] = (typ, raw)
        elif typ == 12:
            tags[code] = (typ, struct.unpack(en + f"{count}d", raw))
        elif typ == 3:
            tags[code] = (typ, struct.unpack(en + f"{count}H", raw))
        else:
            tags[code] = (typ, struct.unpack(en + f"{count}I", raw))

    def val(code, default=None):
        t = tags.get(code)
        return t[1] if t else default

    comp = val(_COMP, (1,))[0]
    if comp != 1:
        raise ValueError(f"compressed TIFF (compression={comp}) needs rasterio")
    fmt = val(_FMT, (1,))[0]
    bits = val(_BITS, (32,))[0]
    if fmt != 3 or bits not in (32, 64):
        raise ValueError("only IEEE-float32/64 samples supported without rasterio")
    if val(_SPP, (1,))[0] != 1:
        raise ValueError("only single-band TIFFs supported without rasterio")
    w, h = val(_W)[0], val(_H)[0]
    offs, cnts = val(_STRIP_OFF), val(_STRIP_CNT)
    if offs is None or cnts is None:
        raise ValueError("tiled TIFF (no strips) needs rasterio")
    raw = b"".join(buf[o:o + c] for o, c in zip(offs, cnts))
    dt = np.dtype(("<" if en == "<" else ">") + ("f4" if bits == 32 else "f8"))
    arr = np.frombuffer(raw, dtype=dt).reshape(h, w).astype(np.float64)

    if _TRANSFORM in tags:
        t = val(_TRANSFORM)
        transform = (t[0], t[1], t[3], t[4], t[5], t[7])
    elif _PIXEL_SCALE in tags and _TIEPOINT in tags:
        sx, sy = val(_PIXEL_SCALE)[0], val(_PIXEL_SCALE)[1]
        tp = val(_TIEPOINT)
        # tiepoint (i, j, k, x, y, z): raster (i, j) maps to (x, y)
        transform = (sx, 0.0, tp[3] - tp[0] * sx, 0.0, -sy, tp[4] + tp[1] * sy)
    else:
        raise ValueError("GeoTIFF without georeferencing tags")

    crs = "EPSG:4326"
    if _GEO_KEYS in tags:
        gk = val(_GEO_KEYS)
        kv = {gk[4 + 4 * i]: gk[7 + 4 * i] for i in range((len(gk) - 4) // 4)
              if gk[5 + 4 * i] == 0}
        if _PROJECTED_TYPE in kv:
            crs = f"EPSG:{kv[_PROJECTED_TYPE]}"
        elif _GEOGRAPHIC_TYPE in kv:
            crs = f"EPSG:{kv[_GEOGRAPHIC_TYPE]}"
    nodata = None
    if _GDAL_NODATA in tags:
        nodata = float(val(_GDAL_NODATA).rstrip(b"\x00").decode())
    return arr, RasterSpec(w, h, transform, crs=crs, nodata=nodata)


def cells_to_array(cells, spec: RasterSpec, value_col: str = "value") -> np.ndarray:
    """Cell DataFrame → dense (H, W) band, absent cells filled with
    ``spec.nodata`` (or NaN).  Driver-side by design — the file sink is
    a driver surface exactly like the reference's rasterio write
    (core.py:645-657); cluster-scale rasters stay in the tile-parquet
    contract instead."""
    fill = spec.nodata if spec.nodata is not None else np.nan
    arr = np.full((spec.height, spec.width), fill, dtype=np.float64)
    pdf = cells.select("row", "col", value_col).toPandas()
    arr[pdf["row"].to_numpy(dtype=np.int64),
        pdf["col"].to_numpy(dtype=np.int64)] = pdf[value_col].to_numpy(dtype=np.float64)
    return arr


def write_gtiff_cells(path: str, cells, spec: RasterSpec,
                      value_col: str = "value", float32: bool = True) -> None:
    """File-level twin of the reference's clean_raster/round_raster
    sinks (core.py:606,653-655): densify the cell DataFrame and write
    the GeoTIFF.  ``float32=True`` matches the reference's output
    dtype for round_raster."""
    arr = cells_to_array(cells, spec, value_col)
    write_gtiff(path, arr.astype(np.float32) if float32 else arr, spec)
