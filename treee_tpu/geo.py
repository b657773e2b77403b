"""Geo-referencing: world coordinates -> geodetic lat/long.

The reference converts each segment's center to lat/long with proj4rs using a
user-editable proj string, default UTM zone 32 on GRS80
(treee/src/interactive/mod.rs:53,235-243), and formats degrees as D°M'S"
(mod.rs:1060-1066).  No proj library ships in this environment, so this module
implements the inverse projections directly from the published formulas:

- ``+proj=utm``    — inverse transverse Mercator via the 4th-order Krüger
  series (sub-millimeter over UTM extents), zone/+south handling;
- ``+proj=tmerc``  — the general form: arbitrary +lat_0/+lon_0/+k(_0)/
  +x_0/+y_0, lat_0 entering through the meridian arc;
- ``+proj=merc``   — ellipsoidal Mercator inverse (isometric -> conformal ->
  geodetic latitude via the same series);
- ``+proj=longlat``/``latlong``/``lonlat`` — identity (degrees in, radians out);
- ellipsoids by ``+ellps`` name (GRS80/WGS84/intl/bessel/clrk66/krass/sphere)
  or explicit ``+a`` with ``+b``/``+f``/``+rf``.

Datum shifts (``+towgs84``, grids) are accepted but ignored — the reference's
proj4rs pipeline applies them only between two full CRS definitions, and the
app's single-string use (projected -> longlat on the SAME datum) never
exercises them.  Unknown ``+proj`` families raise :class:`ProjError`, which
the callers surface as "proj string did not parse" (mod.rs:470-488 text box
semantics: bad strings simply show no coordinates).
"""

from __future__ import annotations

import math

# named ellipsoids (semi-major axis, flattening), proj4 table subset
_ELLIPSOIDS = {
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "intl": (6378388.0, 1.0 / 297.0),
    "bessel": (6377397.155, 1.0 / 299.1528128),
    "clrk66": (6378206.4, 1.0 / 294.9786982),
    "krass": (6378245.0, 1.0 / 298.3),
    "sphere": (6371000.0, 0.0),
}

UTM_SCALE = 0.9996
UTM_FALSE_EASTING = 500_000.0
UTM_FALSE_NORTHING_SOUTH = 10_000_000.0


class ProjError(ValueError):
    pass


def parse_proj(proj_string: str) -> dict:
    """Parse a proj string into a parameter dict (+k=v / +flag tokens)."""
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
    if "proj" not in params:
        raise ProjError("proj string has no +proj")
    return params


def _ellipsoid(params: dict) -> tuple[float, float]:
    """(a, f) from +ellps or explicit +a with +b/+f/+rf."""
    if "a" in params:
        a = float(params["a"])
        if "rf" in params:
            f = 1.0 / float(params["rf"])
        elif "f" in params:
            f = float(params["f"])
        elif "b" in params:
            f = (a - float(params["b"])) / a
        else:
            f = 0.0  # sphere
        return a, f
    name = str(params.get("ellps", "GRS80"))
    if name not in _ELLIPSOIDS:
        raise ProjError(f"unsupported ellipsoid {name!r}")
    return _ELLIPSOIDS[name]


def _third_flattening(f: float) -> float:
    return f / (2.0 - f)


def _rectifying_radius(a: float, n: float) -> float:
    return a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)


def _meridian_arc(lat: float, n: float, big_a: float) -> float:
    """Meridian arc length from the equator (rectifying-latitude series)."""
    mu = (
        lat
        - (3.0 * n / 2.0 - 9.0 * n**3 / 16.0) * math.sin(2.0 * lat)
        + (15.0 * n**2 / 16.0 - 15.0 * n**4 / 32.0) * math.sin(4.0 * lat)
        - (35.0 * n**3 / 48.0) * math.sin(6.0 * lat)
        + (315.0 * n**4 / 512.0) * math.sin(8.0 * lat)
    )
    return big_a * mu


def _conformal_to_geodetic(chi: float, n: float) -> float:
    delta = [
        2.0 * n - 2.0 * n**2 / 3.0 - 2.0 * n**3 + 116.0 * n**4 / 45.0,
        7.0 * n**2 / 3.0 - 8.0 * n**3 / 5.0 - 227.0 * n**4 / 45.0,
        56.0 * n**3 / 15.0 - 136.0 * n**4 / 35.0,
        4279.0 * n**4 / 630.0,
    ]
    lat = chi
    for j, dcoef in enumerate(delta, start=1):
        lat += dcoef * math.sin(2 * j * chi)
    return lat


def tmerc_to_latlong(
    easting: float, northing: float, a: float, f: float,
    k0: float = 1.0, lon0: float = 0.0, lat0: float = 0.0,
    x0: float = 0.0, y0: float = 0.0,
) -> tuple[float, float]:
    """General inverse transverse Mercator (Krüger 4th-order series).

    Angles in RADIANS (matching proj4's radian output the reference formats,
    mod.rs:619-620,1060).
    """
    n = _third_flattening(f)
    big_a = _rectifying_radius(a, n)
    m0 = _meridian_arc(lat0, n, big_a) if lat0 else 0.0

    # forward is northing = y0 + k0*(M(lat) - M(lat0)), so the recovered arc
    # is M = (northing - y0)/k0 + M0 — M0 must NOT be divided by k0
    x = (easting - x0) / (k0 * big_a)
    y = ((northing - y0) / k0 + m0) / big_a

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
    lat = _conformal_to_geodetic(chi, n)
    lon = lon0 + math.atan2(math.sinh(eta), math.cos(xi))
    return lon, lat


def utm_to_latlong(easting: float, northing: float, zone: int,
                   south: bool = False, ellps: str = "GRS80") -> tuple[float, float]:
    """Inverse UTM -> (longitude, latitude) in radians."""
    a, f = _ELLIPSOIDS[ellps]
    return tmerc_to_latlong(
        easting, northing, a, f,
        k0=UTM_SCALE,
        lon0=math.radians(zone * 6.0 - 183.0),
        x0=UTM_FALSE_EASTING,
        y0=UTM_FALSE_NORTHING_SOUTH if south else 0.0,
    )


def merc_to_latlong(easting: float, northing: float, a: float, f: float,
                    k0: float = 1.0, lon0: float = 0.0,
                    x0: float = 0.0, y0: float = 0.0) -> tuple[float, float]:
    """Inverse ellipsoidal Mercator: isometric -> conformal -> geodetic."""
    n = _third_flattening(f)
    lon = lon0 + (easting - x0) / (a * k0)
    psi = (northing - y0) / (a * k0)
    chi = 2.0 * math.atan(math.exp(psi)) - math.pi / 2.0
    return lon, _conformal_to_geodetic(chi, n)


def transform_to_latlong(proj_string: str, x: float, y: float) -> tuple[float, float]:
    """World (easting, northing) -> (long, lat) radians via a proj string."""
    p = parse_proj(proj_string)
    proj = str(p["proj"])
    if proj in ("longlat", "latlong", "lonlat"):
        return math.radians(x), math.radians(y)

    a, f = _ellipsoid(p)
    k0 = float(p.get("k", p.get("k_0", 1.0)))
    x0 = float(p.get("x_0", 0.0))
    y0 = float(p.get("y_0", 0.0))
    lon0 = math.radians(float(p.get("lon_0", 0.0)))
    lat0 = math.radians(float(p.get("lat_0", 0.0)))
    if proj == "utm":
        zone = int(p.get("zone", 0))
        if not 1 <= zone <= 60:
            raise ProjError(f"utm zone {zone} out of range")
        # honor explicit +a/+b/+rf/+f like the other projections: (a, f)
        # above already resolved them (falling back to +ellps)
        return tmerc_to_latlong(
            x, y, a, f,
            k0=UTM_SCALE,
            lon0=math.radians(zone * 6.0 - 183.0),
            x0=UTM_FALSE_EASTING,
            y0=UTM_FALSE_NORTHING_SOUTH if p.get("south", False) else 0.0,
        )
    if proj == "tmerc":
        return tmerc_to_latlong(x, y, a, f, k0=k0, lon0=lon0, lat0=lat0,
                                x0=x0, y0=y0)
    if proj == "merc":
        return merc_to_latlong(x, y, a, f, k0=k0, lon0=lon0, x0=x0, y0=y0)
    raise ProjError(f"unsupported projection {proj!r}")


def segment_coords(world_offset, lo, hi, proj_string: str) -> tuple[float, float]:
    """Lat/long of a segment's center, reproducing update_location
    (mod.rs:235-243): easting = offset.x + mid(x), northing = -(offset.z +
    mid(z)) — undoing the y-up swizzle's z = -northing."""
    easting = float(world_offset[0]) + (float(lo[0]) + float(hi[0])) / 2.0
    northing = -(float(world_offset[2]) + (float(lo[2]) + float(hi[2])) / 2.0)
    return transform_to_latlong(proj_string, easting, northing)


def format_degrees(val_radians: float) -> str:
    """D°M'S.s" formatting (mod.rs:1060-1066 semantics).

    The sign rides an explicit prefix so values in (-1°, 0°) — where the
    truncated degree part is 0 — keep their hemisphere."""
    deg = math.degrees(val_radians)
    mag = abs(deg)
    d = math.trunc(mag)
    minutes = (mag - d) * 60.0
    m = math.trunc(minutes)
    s = (minutes - m) * 60.0
    sign = "-" if deg < 0 else ""
    return f"{sign}{int(d):02d}°{int(m):02d}'{s:04.1f}\""
