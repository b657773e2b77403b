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


# ---------------------------------------------------------------------------
# New projection families (lcc/aea/laea/stere/sterea/somerc/eqc/webmerc).
# Validation strategy (no proj library ships in this env):
#   1. roundtrip through INDEPENDENT forward implementations written from
#      Snyder's forward equations (not by inverting geo.py's code);
#   2. near-center agreement with the already-validated tmerc inverse — all
#      scale-1-at-center projections must agree to O(d^3/R^2) there;
#   3. Snyder's published numeric examples as absolute anchors.

def _ecc(f):
    return math.sqrt(f * (2.0 - f))


def _fwd_lcc(lat, lon, a, f, lat1, lat2, lat0, lon0, k0=1.0, x0=0.0, y0=0.0):
    """Snyder 15-1..15-10 forward."""
    e = _ecc(f)
    m1 = geo._m_parallel(lat1, e)
    t1 = geo._conformal_t(lat1, e)
    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(lat1)
    else:
        m2 = geo._m_parallel(lat2, e)
        t2 = geo._conformal_t(lat2, e)
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    big_f = m1 / (n * t1 ** n)
    rho = a * k0 * big_f * geo._conformal_t(lat, e) ** n
    rho0 = a * k0 * big_f * geo._conformal_t(lat0, e) ** n
    th = n * (lon - lon0)
    return x0 + rho * math.sin(th), y0 + rho0 - rho * math.cos(th)


def _fwd_aea(lat, lon, a, f, lat1, lat2, lat0, lon0, x0=0.0, y0=0.0):
    """Snyder 14-1..14-10 forward."""
    e = _ecc(f)
    m1 = geo._m_parallel(lat1, e)
    q1 = geo._q_authalic(lat1, e)
    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(lat1)
    else:
        m2 = geo._m_parallel(lat2, e)
        q2 = geo._q_authalic(lat2, e)
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    big_c = m1 * m1 + n * q1
    rho = a * math.sqrt(big_c - n * geo._q_authalic(lat, e)) / n
    rho0 = a * math.sqrt(big_c - n * geo._q_authalic(lat0, e)) / n
    th = n * (lon - lon0)
    return x0 + rho * math.sin(th), y0 + rho0 - rho * math.cos(th)


def _fwd_laea(lat, lon, a, f, lat0, lon0, x0=0.0, y0=0.0):
    """Snyder 24-2..24-19 forward (oblique + polar aspects)."""
    e = _ecc(f)
    qp = geo._q_authalic(math.pi / 2.0, e)
    q = geo._q_authalic(lat, e)
    dl = lon - lon0
    if abs(abs(lat0) - math.pi / 2.0) < 1e-9:
        if lat0 > 0:
            rho = a * math.sqrt(qp - q)
            return x0 + rho * math.sin(dl), y0 - rho * math.cos(dl)
        rho = a * math.sqrt(qp + q)
        return x0 + rho * math.sin(dl), y0 + rho * math.cos(dl)
    rq = a * math.sqrt(qp / 2.0)
    beta1 = math.asin(geo._q_authalic(lat0, e) / qp)
    beta = math.asin(q / qp)
    m1 = geo._m_parallel(lat0, e)
    d = a * m1 / (rq * math.cos(beta1))
    b = rq * math.sqrt(2.0 / (1.0 + math.sin(beta1) * math.sin(beta)
                              + math.cos(beta1) * math.cos(beta) * math.cos(dl)))
    x = x0 + b * d * math.cos(beta) * math.sin(dl)
    y = y0 + (b / d) * (math.cos(beta1) * math.sin(beta)
                        - math.sin(beta1) * math.cos(beta) * math.cos(dl))
    return x, y


def _fwd_stere(lat, lon, a, f, lat0, lon0, k0=1.0, lat_ts=None,
               x0=0.0, y0=0.0):
    """Snyder 21-27..21-35 forward (polar exact + conformal-lat oblique)."""
    e = _ecc(f)
    dl = lon - lon0
    if abs(abs(lat0) - math.pi / 2.0) < 1e-9:
        south = lat0 < 0
        if south:
            lat = -lat
        t = geo._conformal_t(lat, e)
        if lat_ts is not None and abs(lat_ts) < math.pi / 2.0 - 1e-9:
            tsa = abs(lat_ts)
            rho = a * geo._m_parallel(tsa, e) * t / geo._conformal_t(tsa, e)
        else:
            rho = 2.0 * a * k0 * t / math.sqrt(
                (1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        x = x0 + rho * math.sin(dl)
        y = (y0 + rho * math.cos(dl)) if south else (y0 - rho * math.cos(dl))
        return x, y
    chi = math.pi / 2.0 - 2.0 * math.atan(geo._conformal_t(lat, e))
    chi1 = math.pi / 2.0 - 2.0 * math.atan(geo._conformal_t(lat0, e))
    m1 = geo._m_parallel(lat0, e)
    big_a = 2.0 * a * k0 * m1 / (math.cos(chi1) * (
        1.0 + math.sin(chi1) * math.sin(chi)
        + math.cos(chi1) * math.cos(chi) * math.cos(dl)))
    x = x0 + big_a * math.cos(chi) * math.sin(dl)
    y = y0 + big_a * (math.cos(chi1) * math.sin(chi)
                      - math.sin(chi1) * math.cos(chi) * math.cos(dl))
    return x, y


def _fwd_sterea(lat, lon, a, f, lat0, lon0, k0=1.0, x0=0.0, y0=0.0):
    """EPSG 9809 forward: Gauss conformal sphere + sphere stereographic."""
    e = _ecc(f)
    c, chi0, log_k = geo._gauss_sphere(lat0, e)
    r = geo._gauss_sphere_radius(lat0, a, e)
    w = math.exp(log_k + 2.0 * c * geo._isometric_lat(lat, e))
    chi = math.asin((w - 1.0) / (w + 1.0))
    dl = c * (lon - lon0)
    b = 1.0 + math.sin(chi) * math.sin(chi0) \
        + math.cos(chi) * math.cos(chi0) * math.cos(dl)
    x = x0 + 2.0 * r * k0 * math.cos(chi) * math.sin(dl) / b
    y = y0 + 2.0 * r * k0 * (math.sin(chi) * math.cos(chi0)
                             - math.cos(chi) * math.sin(chi0) * math.cos(dl)) / b
    return x, y


def _fwd_somerc(lat, lon, a, f, lat0, lon0, k0=1.0, x0=0.0, y0=0.0):
    """EPSG 9815 forward: Gauss sphere -> rotate b0 to equator -> Mercator."""
    e = _ecc(f)
    c, b0, log_k = geo._gauss_sphere(lat0, e)
    r = geo._gauss_sphere_radius(lat0, a, e) * k0
    w = math.exp(log_k + 2.0 * c * geo._isometric_lat(lat, e))
    b = math.asin((w - 1.0) / (w + 1.0))
    ell = c * (lon - lon0)
    sb0, cb0 = math.sin(b0), math.cos(b0)
    bbar = math.asin(cb0 * math.sin(b) - sb0 * math.cos(b) * math.cos(ell))
    lbar = math.atan2(math.cos(b) * math.sin(ell),
                      sb0 * math.sin(b) + cb0 * math.cos(b) * math.cos(ell))
    x = x0 + r * lbar
    y = y0 + r * math.atanh(math.sin(bbar))
    return x, y


_RT_CASES = [
    # (name, proj_string, forward_fn(lat, lon) -> (x, y))
    ("lcc-2sp",
     "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
     "+x_0=700000 +y_0=6600000 +ellps=GRS80",   # Lambert-93 (EPSG:2154)
     lambda lat, lon: _fwd_lcc(lat, lon, 6378137.0, 1 / 298.257222101,
                               math.radians(49), math.radians(44),
                               math.radians(46.5), math.radians(3),
                               1.0, 700000.0, 6600000.0)),
    ("lcc-1sp",
     "+proj=lcc +lat_1=46 +lat_0=46 +lon_0=8 +k_0=0.99987742 "
     "+x_0=600000 +y_0=200000 +ellps=bessel",
     lambda lat, lon: _fwd_lcc(lat, lon, 6377397.155, 1 / 299.1528128,
                               math.radians(46), math.radians(46),
                               math.radians(46), math.radians(8),
                               0.99987742, 600000.0, 200000.0)),
    ("aea",
     "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
     "+x_0=0 +y_0=0 +ellps=clrk66",
     lambda lat, lon: _fwd_aea(lat, lon, 6378206.4, 1 / 294.9786982,
                               math.radians(29.5), math.radians(45.5),
                               math.radians(23), math.radians(-96))),
    ("laea-europe",
     "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
     "+ellps=GRS80",                            # EPSG:3035
     lambda lat, lon: _fwd_laea(lat, lon, 6378137.0, 1 / 298.257222101,
                                math.radians(52), math.radians(10),
                                4321000.0, 3210000.0)),
    ("laea-north-pole",
     "+proj=laea +lat_0=90 +lon_0=0 +ellps=WGS84",
     lambda lat, lon: _fwd_laea(lat, lon, 6378137.0, 1 / 298.257223563,
                                math.radians(90), 0.0)),
    ("stere-north-ts",
     "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
     "+ellps=WGS84",                            # EPSG:3413
     lambda lat, lon: _fwd_stere(lat, lon, 6378137.0, 1 / 298.257223563,
                                 math.radians(90), math.radians(-45),
                                 1.0, math.radians(70))),
    ("stere-south-ts",
     "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84",  # EPSG:3031
     lambda lat, lon: _fwd_stere(lat, lon, 6378137.0, 1 / 298.257223563,
                                 math.radians(-90), 0.0,
                                 1.0, math.radians(-71))),
    ("ups-north",
     "+proj=ups +ellps=WGS84",
     lambda lat, lon: _fwd_stere(lat, lon, 6378137.0, 1 / 298.257223563,
                                 math.radians(90), 0.0, 0.994, None,
                                 2000000.0, 2000000.0)),
    ("stere-oblique",
     "+proj=stere +lat_0=47 +lon_0=8 +k_0=0.9999 +x_0=100000 +y_0=200000 "
     "+ellps=GRS80",
     lambda lat, lon: _fwd_stere(lat, lon, 6378137.0, 1 / 298.257222101,
                                 math.radians(47), math.radians(8),
                                 0.9999, None, 100000.0, 200000.0)),
    ("sterea-rdnew",
     "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
     "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel",  # EPSG:28992
     lambda lat, lon: _fwd_sterea(lat, lon, 6377397.155, 1 / 299.1528128,
                                  math.radians(52.15616055555555),
                                  math.radians(5.38763888888889),
                                  0.9999079, 155000.0, 463000.0)),
    ("somerc-lv95",
     "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
     "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel",      # EPSG:2056
     lambda lat, lon: _fwd_somerc(lat, lon, 6377397.155, 1 / 299.1528128,
                                  math.radians(46.95240555555556),
                                  math.radians(7.439583333333333),
                                  1.0, 2600000.0, 1200000.0)),
]


@pytest.mark.parametrize("name,proj_string,fwd",
                         _RT_CASES, ids=[c[0] for c in _RT_CASES])
def test_inverse_roundtrips_independent_forward(name, proj_string, fwd):
    """inverse(forward(lat, lon)) == (lat, lon) with the forward written
    from Snyder's/EPSG's FORWARD equations (different series, different
    code path than the inverse under test)."""
    p = geo.parse_proj(proj_string)
    clat = float(p.get("lat_0", 0.0))
    if "ups" in name or abs(clat) > 89.0:
        probes = [(-85.0, 150.0), (-80.0, -30.0)] if clat < 0 else \
                 [(85.0, 150.0), (75.0, -120.0), (88.0, 13.0)]
    else:
        # probe around each CRS's own center
        clat = clat or 47.0
        clon = float(p.get("lon_0", 0.0))
        probes = [(clat + dlat, clon + dlon)
                  for dlat in (-2.0, 0.3, 1.5) for dlon in (-3.0, 0.7)]
    for lat_deg, lon_deg in probes:
        x, y = fwd(math.radians(lat_deg), math.radians(lon_deg))
        lon, lat = geo.transform_to_latlong(proj_string, x, y)
        assert abs(math.degrees(lat) - lat_deg) < 1e-9, (name, lat_deg)
        dlon = (math.degrees(lon) - lon_deg + 180.0) % 360.0 - 180.0
        assert abs(dlon) < 1e-9, (name, lon_deg)


def test_conformal_families_agree_near_center():
    """Every scale-1-at-center projection tangent at (47N, 8E) must invert
    small offsets identically to the validated tmerc inverse (difference is
    O(d^3/R^2) ~ 0.2 mm at 2 km)."""
    center = "+lat_0=47 +lon_0=8 +x_0=0 +y_0=0 +ellps=GRS80"
    strings = [
        "+proj=tmerc +k=1 " + center,
        "+proj=lcc +lat_1=47 +k_0=1 " + center,
        "+proj=stere +k_0=1 " + center,
        "+proj=sterea +k_0=1 " + center,
        "+proj=somerc +k_0=1 " + center,
        "+proj=laea " + center,
        "+proj=aea +lat_1=47 " + center,
    ]
    for dx, dy in [(1500.0, -900.0), (-2000.0, 400.0), (50.0, 2000.0)]:
        ref = geo.transform_to_latlong(strings[0], dx, dy)
        for s in strings[1:]:
            lon, lat = geo.transform_to_latlong(s, dx, dy)
            assert abs(lon - ref[0]) < 1e-9, s
            assert abs(lat - ref[1]) < 1e-9, s


def test_lcc_snyder_numeric_example():
    """Snyder PP1395 p.296: Clarke 1866, lat_1=33, lat_2=45, origin
    (23N, 96W); (35N, 75W) -> x=1,894,410.9  y=1,564,649.5 (meters)."""
    s = "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +ellps=clrk66"
    lon, lat = geo.transform_to_latlong(s, 1894410.9, 1564649.5)
    assert abs(math.degrees(lat) - 35.0) < 1e-5
    assert abs(math.degrees(lon) - (-75.0)) < 1e-5


def test_stere_snyder_polar_example():
    """Snyder PP1395 p.315: International ellipsoid, south polar with
    lat_ts=-71, lon_0=-100; (-75N, 150E) -> x=-1,540,033.6 y=-560,526.4."""
    s = "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=-100 +ellps=intl"
    lon, lat = geo.transform_to_latlong(s, -1540033.6, -560526.4)
    assert abs(math.degrees(lat) - (-75.0)) < 1e-5
    dlon = (math.degrees(lon) - 150.0 + 180.0) % 360.0 - 180.0
    assert abs(dlon) < 1e-5


def test_merc_lat_ts_and_webmerc():
    # webmerc: exact spherical closed form on a
    a = 6378137.0
    lon, lat = geo.transform_to_latlong(
        "+proj=webmerc +ellps=WGS84", a * math.radians(12.0),
        a * math.log(math.tan(math.pi / 4.0 + math.radians(48.0) / 2.0)))
    assert abs(math.degrees(lon) - 12.0) < 1e-9
    assert abs(math.degrees(lat) - 48.0) < 1e-9
    # merc +lat_ts scales by m(lat_ts): equator arc shrinks by that factor
    lon1, _ = geo.transform_to_latlong("+proj=merc +ellps=WGS84", 1e5, 0.0)
    lon2, _ = geo.transform_to_latlong(
        "+proj=merc +lat_ts=45 +ellps=WGS84", 1e5, 0.0)
    e = _ecc(1 / 298.257223563)
    k_ts = geo._m_parallel(math.radians(45.0), e)
    assert abs(lon2 - lon1 / k_ts) < 1e-12


def test_eqc_sphere():
    # plate carrée on a sphere is exact and closed-form
    r = 6371000.0
    s = f"+proj=eqc +lat_ts=30 +lat_0=5 +lon_0=10 +R={r}"
    lat_deg, lon_deg = 12.0, 25.0
    x = r * math.cos(math.radians(30.0)) * math.radians(lon_deg - 10.0)
    y = r * math.radians(lat_deg - 5.0)
    lon, lat = geo.transform_to_latlong(s, x, y)
    assert abs(math.degrees(lon) - lon_deg) < 1e-9
    assert abs(math.degrees(lat) - lat_deg) < 1e-9


def test_datum_alias_selects_ellipsoid():
    # +datum=NAD83 (no +ellps) must behave exactly like +ellps=GRS80
    a1 = geo.transform_to_latlong("+proj=utm +zone=32 +datum=NAD83",
                                  512345.0, 5334567.0)
    a2 = geo.transform_to_latlong("+proj=utm +zone=32 +ellps=GRS80",
                                  512345.0, 5334567.0)
    assert a1 == a2
    with pytest.raises(geo.ProjError):
        geo.transform_to_latlong("+proj=utm +zone=32 +datum=unknowable",
                                 500000.0, 5e6)


def test_lcc_needs_lat1():
    with pytest.raises(geo.ProjError):
        geo.transform_to_latlong("+proj=lcc +lat_0=40 +ellps=GRS80", 0.0, 0.0)
    with pytest.raises(geo.ProjError):  # equatorial single parallel: n = 0
        geo.transform_to_latlong("+proj=lcc +lat_1=0 +ellps=GRS80", 0.0, 0.0)


def test_sterea_epsg_worked_example():
    """EPSG guidance note 7-2, method 9809 (RD New / EPSG:28992):
    53°N 6°E -> E 196,105.283  N 557,057.739.  Absolute anchor independent
    of the roundtrip suite (which shares geo.py's series helpers)."""
    s = ("+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
         "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
    lon, lat = geo.transform_to_latlong(s, 196105.283, 557057.739)
    assert abs(math.degrees(lat) - 53.0) < 1e-7
    assert abs(math.degrees(lon) - 6.0) < 1e-7


def test_aea_snyder_numeric_example():
    """Snyder PP1395 Albers example: Clarke 1866, lat_1=29.5, lat_2=45.5,
    origin (23N, 96W); (35N, 75W) -> x=1,885,472.7  y=1,535,925.0."""
    s = "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=clrk66"
    lon, lat = geo.transform_to_latlong(s, 1885472.7, 1535925.0)
    assert abs(math.degrees(lat) - 35.0) < 1e-5
    assert abs(math.degrees(lon) - (-75.0)) < 1e-5


def test_laea_snyder_numeric_example():
    """Snyder PP1395 LAEA example: Clarke 1866, origin (40N, 100W);
    (30N, 110W) -> x=-965,932.1  y=-1,056,814.9."""
    s = "+proj=laea +lat_0=40 +lon_0=-100 +ellps=clrk66"
    lon, lat = geo.transform_to_latlong(s, -965932.1, -1056814.9)
    assert abs(math.degrees(lat) - 30.0) < 1e-5
    assert abs(math.degrees(lon) - (-110.0)) < 1e-5


def test_degenerate_proj_strings_raise_projerror():
    """Parseable-but-degenerate strings must stay inside the ProjError
    taxonomy (segment_coords -> None, the reference's silent no-coordinates
    behavior) instead of leaking ValueError/ZeroDivisionError."""
    for bad in [
        "+proj=lcc +lat_1=91 +lat_2=95",   # math domain error
        "+proj=lcc +lat_1=90",             # division by zero in the cone
        "+proj=somerc +lat_0=90",          # polar Gauss sphere degenerates
        "+proj=sterea +lat_0=90",
        "+proj=lcc +lat_1=abc",            # non-numeric parameter
        "+proj=webmerc +lon_0=abc",
    ]:
        with pytest.raises(geo.ProjError):
            geo.transform_to_latlong(bad, 0.0, 0.0)


def test_webmerc_ignores_k0():
    # proj pins webmerc at k=1; +k_0 must not rescale the inverse
    a1 = geo.transform_to_latlong("+proj=webmerc", 1e6, 2e6)
    a2 = geo.transform_to_latlong("+proj=webmerc +k_0=0.5", 1e6, 2e6)
    assert a1 == a2
