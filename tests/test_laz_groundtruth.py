"""Drop-in ground-truth validation for the native LASzip codec.

The build environment ships no real-world ``.laz`` (no network, no
laspy/lazrs), so the codec is pinned by roundtrip + hand-derived bit tests
(test_laz_bits.py).  The day a real file exists, drop it in
``tests/fixtures/laz/`` (procedure in the README there) and this module
validates our decoder against it:

- sibling ``.las`` with the same stem  -> decoded raw records compared
  byte-for-byte (the strongest check);
- sibling ``.npz`` with a ``pos`` array -> positions compared to tolerance;
- no sibling -> decode invariants (count, bounds) + re-compression
  roundtrip through our writer.

With the fixtures dir empty every test here SKIPS, keeping the suite green
(VERDICT r3 task 7).
"""

import glob
import os

import numpy as np
import pytest

from treee_tpu.io import las

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "laz")
LAZ_FILES = sorted(glob.glob(os.path.join(FIXDIR, "*.laz")))

pytestmark = pytest.mark.skipif(
    not LAZ_FILES, reason="no real .laz fixtures present (see fixtures/laz/README.md)"
)


def _decode_raw(path):
    """Parse + decompress to raw point records (no position transform)."""
    with open(path, "rb") as fh:
        data = fh.read()
    header = las.LasHeader.parse(data)
    vlr = las._find_laszip_vlr(data, header)
    n = header.num_points
    if header.compressed or vlr is not None:
        from treee_tpu.io import laz_native

        raw = laz_native.decompress(data, header, vlr, n)
    else:
        raw = np.frombuffer(
            data, np.uint8, count=n * header.point_length,
            offset=header.offset_to_point_data,
        )
    return header, np.asarray(raw).reshape(n, header.point_length)


@pytest.mark.parametrize("laz_path", LAZ_FILES,
                         ids=[os.path.basename(p) for p in LAZ_FILES])
def test_real_laz_decodes(laz_path):
    """Decode end-to-end; count and bounds must match the header."""
    header, records = _decode_raw(laz_path)
    assert records.shape[0] == header.num_points
    scan = las.load(laz_path)
    assert scan.pos.shape == (header.num_points, 3)
    lo, hi = scan.lo, scan.hi
    margin = 0.5 + np.max(header.scale)  # header bounds are pre-quantization
    assert np.all(scan.pos >= lo - margin), "positions below header bounds"
    assert np.all(scan.pos <= hi + margin), "positions above header bounds"


@pytest.mark.parametrize("laz_path", LAZ_FILES,
                         ids=[os.path.basename(p) for p in LAZ_FILES])
def test_real_laz_vs_sibling_ground_truth(laz_path):
    """Byte-exact records vs a .las sibling / positions vs a .npz sibling."""
    stem = os.path.splitext(laz_path)[0]
    las_path, npz_path = stem + ".las", stem + ".npz"
    if not os.path.exists(las_path) and not os.path.exists(npz_path):
        pytest.skip("no ground-truth sibling (.las/.npz) for this fixture")

    if os.path.exists(las_path):
        h_laz, rec_laz = _decode_raw(laz_path)
        h_las, rec_las = _decode_raw(las_path)
        assert h_laz.num_points == h_las.num_points
        assert h_laz.point_length == h_las.point_length, (
            "sibling .las has a different record layout; regenerate it with "
            "`laszip -d` so records compare byte-for-byte")
        np.testing.assert_array_equal(rec_laz, rec_las)

    if os.path.exists(npz_path):
        scan = las.load(laz_path)
        with np.load(npz_path) as z:
            np.testing.assert_allclose(scan.pos, z["pos"], atol=1e-3)
            for k in z.files:
                if k.startswith("attr_"):
                    np.testing.assert_array_equal(
                        scan.attributes[k[5:]], z[k])


@pytest.mark.parametrize("laz_path", LAZ_FILES,
                         ids=[os.path.basename(p) for p in LAZ_FILES])
def test_real_laz_recompression_roundtrip(laz_path):
    """decode -> our compressor -> decode must be record-bit-identical."""
    from types import SimpleNamespace

    from treee_tpu.io import laz_native

    header, records = _decode_raw(laz_path)
    pf = header.point_format & 0x3F
    with open(laz_path, "rb") as fh:
        vlr_orig = las._find_laszip_vlr(fh.read(), header)
    std = laz_native.standard_items(pf, header.point_length)
    file_items = laz_native.parse_vlr(vlr_orig)["items"]
    if [(i["type"], i["size"]) for i in file_items] != \
            [(i["type"], i["size"]) for i in std]:
        pytest.skip("non-standard item list (extra bytes layout); "
                    "recompression roundtrip needs the standard sequence")

    flat = np.ascontiguousarray(records).reshape(-1)
    payload = laz_native.compress(
        flat, header.point_length, base_offset=0, point_format=pf)
    vlr2 = laz_native.make_vlr(point_length=header.point_length,
                               point_format=pf)
    stub = SimpleNamespace(offset_to_point_data=0,
                           point_length=header.point_length)
    rec2 = laz_native.decompress(payload, stub, vlr2, header.num_points)
    np.testing.assert_array_equal(
        np.asarray(rec2).reshape(header.num_points, header.point_length),
        records)
