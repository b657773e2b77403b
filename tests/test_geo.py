"""UTM inverse projection tests against known geodetic fixtures."""

import math

import pytest

from treee_tpu import geo


def test_parse_proj_reference_default():
    # the reference's default location string (mod.rs:53)
    p = geo.parse_proj("+proj=utm\n+ellps=GRS80\n+zone=32")
    assert p == {"proj": "utm", "ellps": "GRS80", "zone": "32"}


def test_parse_proj_rejects_unknown():
    with pytest.raises(geo.ProjError):
        geo.parse_proj("utm zone=32")  # not +key=value tokens
    with pytest.raises(geo.ProjError):
        geo.transform_to_latlong("+proj=utm +zone=99", 500000.0, 5e6)
    with pytest.raises(geo.ProjError):
        geo.transform_to_latlong("+proj=utm +zone=32 +ellps=nope",
                                 500000.0, 5e6)


def test_utm_known_point_munich():
    # UTM 32U 691609.6 5334759.9 ~= 48.1372N 11.5756E (Munich Marienplatz)
    lon, lat = geo.utm_to_latlong(691609.6, 5334759.9, zone=32)
    assert abs(math.degrees(lat) - 48.1372) < 2e-4
    assert abs(math.degrees(lon) - 11.5756) < 2e-4


def test_utm_central_meridian():
    # on the central meridian, easting = 500000 -> longitude = zone center
    lon, lat = geo.utm_to_latlong(500000.0, 5000000.0, zone=32)
    assert abs(math.degrees(lon) - 9.0) < 1e-9
    assert 45.0 < math.degrees(lat) < 45.2  # ~45.1N


def _utm_forward(lat_deg, lon_deg, zone, south=False, ellps="GRS80"):
    """Forward Krüger series (independent alpha coefficients) as test oracle."""
    a, f = geo._ELLIPSOIDS[ellps]
    n = f / (2.0 - f)
    big_a = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    lat = math.radians(lat_deg)
    lon0 = math.radians(zone * 6.0 - 183.0)
    dlon = math.radians(lon_deg) - lon0
    t = math.sinh(
        math.atanh(math.sin(lat))
        - 2.0 * math.sqrt(n) / (1.0 + n) * math.atanh(
            2.0 * math.sqrt(n) / (1.0 + n) * math.sin(lat))
    )
    xi = math.atan2(t, math.cos(dlon))
    eta = math.atanh(math.sin(dlon) / math.sqrt(1.0 + t * t))
    alpha = [
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0 + 41.0 * n**4 / 180.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0 + 557.0 * n**4 / 1440.0,
        61.0 * n**3 / 240.0 - 103.0 * n**4 / 140.0,
        49561.0 * n**4 / 161280.0,
    ]
    x, y = eta, xi
    for j, c in enumerate(alpha, start=1):
        y += c * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        x += c * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    easting = geo.UTM_FALSE_EASTING + geo.UTM_SCALE * big_a * x
    northing = geo.UTM_SCALE * big_a * y
    if south:
        northing += geo.UTM_FALSE_NORTHING_SOUTH
    return easting, northing


def test_utm_forward_inverse_roundtrip():
    for lat, lon, zone, south in (
        (48.1372, 11.5756, 32, False),
        (-33.8688, 151.2093, 56, True),
        (63.4305, 10.3951, 32, False),   # Trondheim, off-zone longitude
        (0.5, 9.1, 32, False),
    ):
        e, nn = _utm_forward(lat, lon, zone, south)
        lon2, lat2 = geo.utm_to_latlong(e, nn, zone, south)
        assert abs(math.degrees(lat2) - lat) < 1e-7
        assert abs(math.degrees(lon2) - lon) < 1e-7


def test_segment_coords_swizzle():
    # world z is -northing (laz.rs:210 swizzle); offsets add
    lon1, lat1 = geo.segment_coords(
        [500000.0, 0.0, -5334000.0], [0.0, 0, 0.0], [0.0, 0, 0.0],
        "+proj=utm +zone=32",
    )
    lon2, lat2 = geo.utm_to_latlong(500000.0, 5334000.0, 32)
    assert (lon1, lat1) == (lon2, lat2)


def test_format_degrees():
    s = geo.format_degrees(math.radians(48.5))
    assert s == "48°30'00.0\""


def test_tmerc_general_matches_utm():
    """+proj=tmerc with UTM's parameters reproduces +proj=utm exactly."""
    e, nn = 512345.0, 5334567.0
    lon_u, lat_u = geo.transform_to_latlong("+proj=utm +zone=32 +ellps=GRS80",
                                            e, nn)
    lon_t, lat_t = geo.transform_to_latlong(
        "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 +x_0=500000 +y_0=0 "
        "+ellps=GRS80", e, nn)
    assert abs(lon_u - lon_t) < 1e-12
    assert abs(lat_u - lat_t) < 1e-12


def test_tmerc_lat0_false_origin():
    """+lat_0 shifts the northing origin by the meridian arc (e.g. Gauss-
    Krüger style grids with a false latitude origin)."""
    base = "+proj=tmerc +lon_0=9 +k=1 +x_0=0 +y_0=0 +ellps=bessel"
    lon0, lat0 = geo.transform_to_latlong(base, 10_000.0, 5_550_000.0)
    # same point expressed with a +lat_0=50 origin: northing is reduced by
    # the meridian arc of 50 degrees
    import math as m
    a, f = 6377397.155, 1.0 / 299.1528128
    n = f / (2.0 - f)
    big_a = geo._rectifying_radius(a, n)
    m50 = geo._meridian_arc(m.radians(50.0), n, big_a)
    lon1, lat1 = geo.transform_to_latlong(
        base.replace("+lon_0=9", "+lon_0=9 +lat_0=50"),
        10_000.0, 5_550_000.0 - m50)
    assert abs(lon0 - lon1) < 1e-12
    assert abs(lat0 - lat1) < 1e-9


def test_merc_inverse_against_forward():
    """Ellipsoidal Mercator inverse checked against the closed-form forward
    formula (isometric latitude)."""
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    for lat_deg, lon_deg in ((45.0, 7.5), (-33.0, 151.0), (10.0, -60.0)):
        phi = math.radians(lat_deg)
        x = a * math.radians(lon_deg)
        y = a * math.log(
            math.tan(math.pi / 4 + phi / 2)
            * ((1 - e * math.sin(phi)) / (1 + e * math.sin(phi))) ** (e / 2)
        )
        lon, lat = geo.transform_to_latlong("+proj=merc +ellps=WGS84", x, y)
        assert abs(math.degrees(lat) - lat_deg) < 1e-7
        assert abs(math.degrees(lon) - lon_deg) < 1e-9


def test_longlat_identity_and_custom_ellipsoid():
    lon, lat = geo.transform_to_latlong("+proj=longlat +datum=WGS84",
                                        9.25, 48.75)
    assert abs(math.degrees(lon) - 9.25) < 1e-12
    assert abs(math.degrees(lat) - 48.75) < 1e-12
    # explicit +a/+rf ellipsoid equals the named one
    l1 = geo.transform_to_latlong("+proj=tmerc +lon_0=9 +ellps=GRS80",
                                  1000.0, 5_000_000.0)
    l2 = geo.transform_to_latlong(
        "+proj=tmerc +lon_0=9 +a=6378137.0 +rf=298.257222101",
        1000.0, 5_000_000.0)
    assert abs(l1[0] - l2[0]) < 1e-14
    assert abs(l1[1] - l2[1]) < 1e-14


def test_unknown_projection_raises():
    import pytest

    with pytest.raises(geo.ProjError):
        geo.transform_to_latlong("+proj=sinu +ellps=WGS84", 0.0, 0.0)
    with pytest.raises(geo.ProjError):
        geo.transform_to_latlong("no plus tokens", 0.0, 0.0)


def test_format_degrees_negative_fraction_keeps_sign():
    """-0°30' must not print identically to +0°30' (the truncated degree
    part is 0, so the sign has to ride an explicit prefix)."""
    assert geo.format_degrees(math.radians(-0.5)) == "-00°30'00.0\""
    assert geo.format_degrees(math.radians(0.5)) == "00°30'00.0\""
    assert geo.format_degrees(math.radians(-48.5)) == "-48°30'00.0\""


def test_tmerc_lat0_with_scale():
    """+lat_0 combined with +k != 1 (Gauss-Krüger-style): the false origin
    arc must NOT be divided by k0 — forward is y = y0 + k0*(M - M0)."""
    base = "+proj=tmerc +lon_0=9 +k=0.9996 +x_0=0 +y_0=0 +ellps=bessel"
    e, nn = 10_000.0, 5_550_000.0
    lon0, lat0 = geo.transform_to_latlong(base, e, nn)
    a, f = 6377397.155, 1.0 / 299.1528128
    n = f / (2.0 - f)
    big_a = geo._rectifying_radius(a, n)
    m50 = geo._meridian_arc(math.radians(50.0), n, big_a)
    lon1, lat1 = geo.transform_to_latlong(
        base + " +lat_0=50", e, nn - 0.9996 * m50)
    assert abs(lon0 - lon1) < 1e-12
    assert abs(lat0 - lat1) < 1e-9


def test_utm_honors_explicit_ellipsoid_params():
    """+proj=utm with explicit +a/+rf (no +ellps) must use them, not the
    GRS80 fallback — same as the tmerc path with identical parameters."""
    e, nn = 512345.0, 5334567.0
    lon_u, lat_u = geo.transform_to_latlong(
        "+proj=utm +zone=32 +a=6377397.155 +rf=299.1528128", e, nn)
    lon_t, lat_t = geo.transform_to_latlong(
        "+proj=tmerc +lon_0=9 +k=0.9996 +x_0=500000 +y_0=0 "
        "+a=6377397.155 +rf=299.1528128", e, nn)
    assert abs(lon_u - lon_t) < 1e-12
    assert abs(lat_u - lat_t) < 1e-12
    # and differs measurably from the GRS80 fallback it used to take
    lon_g, lat_g = geo.transform_to_latlong(
        "+proj=utm +zone=32 +ellps=GRS80", e, nn)
    assert abs(lat_u - lat_g) > 1e-6
