"""Geo-referencing: world coordinates -> geodetic lat/long.

The reference converts each segment's center to lat/long with proj4rs using a
user-editable proj string, default UTM zone 32 on GRS80
(treee/src/interactive/mod.rs:53,235-243), and formats degrees as D°M'S"
(mod.rs:1060-1066).  No proj library ships in this environment, so this module
implements the inverse transverse Mercator (UTM) projection directly — the
standard series expansion (Karney/Krüger coefficients to 4th order, accurate to
well under a millimeter for UTM extents) — and parses the proj-string subset
the reference exposes: ``+proj=utm +zone=N [+south] +ellps=GRS80|WGS84``.
"""

from __future__ import annotations

import math
import re

# GRS80 / WGS84 ellipsoids (semi-major axis, flattening)
_ELLIPSOIDS = {
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "WGS84": (6378137.0, 1.0 / 298.257223563),
}

UTM_SCALE = 0.9996
UTM_FALSE_EASTING = 500_000.0
UTM_FALSE_NORTHING_SOUTH = 10_000_000.0


class ProjError(ValueError):
    pass


def parse_proj(proj_string: str) -> dict:
    """Parse the supported proj-string subset (whitespace/newline separated)."""
    params: dict[str, str | bool] = {}
    for tok in proj_string.split():
        if not tok.startswith("+"):
            raise ProjError(f"bad proj token {tok!r}")
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            params[k] = v
        else:
            params[body] = True
    if params.get("proj") != "utm":
        raise ProjError(f"only +proj=utm is supported, got {params.get('proj')!r}")
    zone = int(params.get("zone", 0))
    if not 1 <= zone <= 60:
        raise ProjError(f"utm zone {zone} out of range")
    ellps = str(params.get("ellps", "GRS80"))
    if ellps not in _ELLIPSOIDS:
        raise ProjError(f"unsupported ellipsoid {ellps!r}")
    return {"zone": zone, "south": bool(params.get("south", False)), "ellps": ellps}


def utm_to_latlong(easting: float, northing: float, zone: int,
                   south: bool = False, ellps: str = "GRS80") -> tuple[float, float]:
    """Inverse UTM -> (longitude, latitude) in RADIANS (matching proj4's
    radian output that the reference then formats, mod.rs:619-620,1060)."""
    a, f = _ELLIPSOIDS[ellps]
    n = f / (2.0 - f)
    # rectifying radius
    big_a = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)

    x = (easting - UTM_FALSE_EASTING) / (UTM_SCALE * big_a)
    y_off = UTM_FALSE_NORTHING_SOUTH if south else 0.0
    y = (northing - y_off) / (UTM_SCALE * big_a)

    # inverse series (Krüger, 4th order in n)
    beta = [
        n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0 - n**4 / 360.0,
        n**2 / 48.0 + n**3 / 15.0 - 437.0 * n**4 / 1440.0,
        17.0 * n**3 / 480.0 - 37.0 * n**4 / 840.0,
        4397.0 * n**4 / 161280.0,
    ]
    xi = y
    eta = x
    for j, b in enumerate(beta, start=1):
        xi -= b * math.sin(2 * j * y) * math.cosh(2 * j * x)
        eta -= b * math.cos(2 * j * y) * math.sinh(2 * j * x)

    chi = math.asin(math.sin(xi) / math.cosh(eta))
    # conformal -> geodetic latitude series
    delta = [
        2.0 * n - 2.0 * n**2 / 3.0 - 2.0 * n**3 + 116.0 * n**4 / 45.0,
        7.0 * n**2 / 3.0 - 8.0 * n**3 / 5.0 - 227.0 * n**4 / 45.0,
        56.0 * n**3 / 15.0 - 136.0 * n**4 / 35.0,
        4279.0 * n**4 / 630.0,
    ]
    lat = chi
    for j, dcoef in enumerate(delta, start=1):
        lat += dcoef * math.sin(2 * j * chi)

    lon0 = math.radians(zone * 6.0 - 183.0)
    lon = lon0 + math.atan2(math.sinh(eta), math.cos(xi))
    return lon, lat


def transform_to_latlong(proj_string: str, x: float, y: float) -> tuple[float, float]:
    """World (easting, northing) -> (long, lat) radians via a proj string."""
    p = parse_proj(proj_string)
    return utm_to_latlong(x, y, p["zone"], p["south"], p["ellps"])


def segment_coords(world_offset, lo, hi, proj_string: str) -> tuple[float, float]:
    """Lat/long of a segment's center, reproducing update_location
    (mod.rs:235-243): easting = offset.x + mid(x), northing = -(offset.z +
    mid(z)) — undoing the y-up swizzle's z = -northing."""
    easting = float(world_offset[0]) + (float(lo[0]) + float(hi[0])) / 2.0
    northing = -(float(world_offset[2]) + (float(lo[2]) + float(hi[2])) / 2.0)
    return transform_to_latlong(proj_string, easting, northing)


def format_degrees(val_radians: float) -> str:
    """D°M'S.s" formatting (mod.rs:1060-1066 semantics)."""
    deg = math.degrees(val_radians)
    minutes = (deg - math.trunc(deg)) * (60.0 if deg >= 0 else -60.0)
    d = math.trunc(deg)
    m = math.trunc(minutes)
    s = (minutes - m) * 60.0
    return f"{int(d):02d}°{int(m):02d}'{s:04.1f}\""
