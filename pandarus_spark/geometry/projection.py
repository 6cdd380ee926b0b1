"""Pure-numpy map projections.

The reference measures all geometry in the Mollweide equal-area
projection (reference: pandarus/utils/projection.py:6-11 — PROJ string
``+proj=moll +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +datum=WGS84 +units=m
+no_defs``).  PROJ's ``moll`` is a spherical projection; with the WGS84
ellipsoid it uses the semi-major axis as the sphere radius and geodetic
latitude directly.  Our implementation solves the Mollweide auxiliary
angle with Newton iteration to machine convergence and reproduces the
reference's stored golden areas (tests/data/i_result.json) to ~1e-15
relative error (verified in tests/test_projection.py).

The reference also short-circuits re-projection when source and target
CRS match, or when both are geographic (projection.py:54-57); we
normalize to WGS84 once at ingest instead and project only at measure
time — same observable semantics ("Projections through the calculation
chain", reference docs/index.rst).

Everything here is vectorized numpy over coordinate arrays so it can run
inside Arrow-batched pandas UDFs (never per-row Python, per the build's
north star).
"""

from __future__ import annotations

import numpy as np

#: WGS84 semi-major axis in metres — the sphere radius PROJ uses for moll.
WGS84_A = 6378137.0
#: WGS84 inverse flattening.
WGS84_INV_F = 298.257223563

MOLLWEIDE = "+proj=moll +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +datum=WGS84 +units=m +no_defs"
WGS84 = "EPSG:4326"

_SQRT2 = float(np.sqrt(2.0))


def mollweide_forward(lon_deg: np.ndarray, lat_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Project WGS84 degrees -> Mollweide metres (vectorized).

    Solves ``2*theta + sin(2*theta) = pi*sin(phi)`` by Newton iteration
    until the update underflows double precision, then
    ``x = (2*sqrt(2)/pi) * R * lambda * cos(theta)``,
    ``y = sqrt(2) * R * sin(theta)``.
    """
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = phi.copy()
    target = np.pi * np.sin(phi)
    for _ in range(60):
        f = 2.0 * theta + np.sin(2.0 * theta) - target
        fp = 2.0 + 2.0 * np.cos(2.0 * theta)
        # fp -> 0 only at the poles where theta = phi = ±pi/2 is exact.
        d = np.where(np.abs(fp) > 1e-14, f / np.where(fp == 0.0, 1.0, fp), 0.0)
        theta -= d
        if not np.any(np.abs(d) > 1e-17):
            break
    x = (2.0 * _SQRT2 / np.pi) * WGS84_A * lam * np.cos(theta)
    y = _SQRT2 * WGS84_A * np.sin(theta)
    return x, y


def mollweide_inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Mollweide metres -> WGS84 degrees (vectorized)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    st = np.clip(y / (_SQRT2 * WGS84_A), -1.0, 1.0)
    theta = np.arcsin(st)
    phi = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / np.pi, -1.0, 1.0))
    ct = np.cos(theta)
    lam = np.where(np.abs(ct) > 1e-14, x * np.pi / (2.0 * _SQRT2 * WGS84_A * np.where(ct == 0.0, 1.0, ct)), 0.0)
    return np.degrees(lam), np.degrees(phi)


def web_mercator_inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 metres -> WGS84 degrees (spherical Mercator, radius a).

    Supports the reference's projected-CRS fixture ``square-3857``
    (reference tests/__init__.py:18, test_intersect.py:288-356): results
    must match the plain WGS84 case after normalization at ingest.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WGS84_A)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2.0)
    return lon, lat


def web_mercator_forward(lon_deg: np.ndarray, lat_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    return WGS84_A * lam, WGS84_A * np.log(np.tan(np.pi / 4.0 + phi / 2.0))


#: CRS registry: name -> (to_wgs84, from_wgs84). WGS84 itself is identity.
_IDENT = (lambda x, y: (np.asarray(x, float), np.asarray(y, float)))
CRS_TO_WGS84 = {
    "EPSG:4326": _IDENT,
    "WGS84": _IDENT,
    "EPSG:3857": web_mercator_inverse,
}


def to_wgs84(x: np.ndarray, y: np.ndarray, crs: str = "EPSG:4326") -> tuple[np.ndarray, np.ndarray]:
    """Normalize coordinates in a supported CRS to WGS84 degrees.

    Mirrors Map.iter_latlong's normalize-at-ingest pass
    (reference pandarus/model.py:130-140). Unsupported CRSs raise —
    the engine documents WGS84/EPSG:3857 support in this build.
    """
    try:
        fn = CRS_TO_WGS84[crs.upper()]
    except KeyError:
        raise ValueError(f"unsupported CRS {crs!r}; supported: {sorted(CRS_TO_WGS84)}")
    out = fn(x, y)
    return out if isinstance(out, tuple) else (out[0], out[1])
