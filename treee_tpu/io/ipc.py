"""Session checkpoint (.ipc-equivalent) save/load/merge.

The reference serializes ``InteractiveSave {segments, deleted, world_offset,
source_location}`` with bincode (treee/src/interactive/mod.rs:44-50, save
:386-396, load :270-297) and supports additive merge with a world-offset shift
(:300-338).  Our checkpoint is one compressed ``.npz`` holding the SoA arrays +
metadata — the same full-session semantics, loadable by anything that reads
numpy.
"""

from __future__ import annotations

import io as _io
import json
import struct

import numpy as np

from ..cloud import PointCloud

FORMAT_VERSION = 1

# --- reference .ipc (bincode) interop -------------------------------------
#
# The reference app checkpoints ``InteractiveSave { segments: HashMap<u32,
# SegmentData>, deleted: SegmentData, world_offset: Point3<f64>,
# source_location: String }`` via bincode 1.3 with its legacy default
# options (treee/src/interactive/mod.rs:44-50, save :386-396, load
# :270-297; Cargo.lock pins bincode 1.3.3 + nalgebra 0.33).  That wire
# layout is mechanical:
#   - little-endian fixed-width ints; Vec/HashMap/String lengths are u64
#   - enum unit variants (Classification Ground/Trunk/Crown,
#     calculations.rs:55-59) are a u32 variant index
#   - Option<T> is a one-byte 0/1 tag then T
#   - nalgebra Point3<T> serializes as its fixed coordinate array -> 3 raw
#     T values, NO length prefix (serde fixed arrays are tuples)
# SegmentData (calculations.rs:35-43) is
#   points Vec<Point3<f32>>, classifications Vec<Classification>,
#   info { trunk_height, crown_height, ground_sep, crown_sep } (4 x f32,
#   calculations.rs:191-197), min/max Point3<f32>, coords Option<(f64,f64)>.

_DELETED_INDEX = 0  # interactive/mod.rs:19 — matches our DELETED_SEGMENT


class _Reader:
    """Bounds-checked little-endian cursor over the bincode stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def take(self, n: int) -> memoryview:
        from ..utils.errors import CorruptFile

        if n < 0 or self.off + n > len(self.data):
            raise CorruptFile(
                f"bad reference .ipc: truncated at byte {self.off} "
                f"(wanted {n} more of {len(self.data)})"
            )
        out = memoryview(self.data)[self.off:self.off + n]
        self.off += n
        return out

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u8(self) -> int:
        return self.take(1)[0]

    def f32x(self, n: int) -> np.ndarray:
        return np.frombuffer(self.take(4 * n), "<f4").copy()

    def f64x(self, n: int) -> np.ndarray:
        return np.frombuffer(self.take(8 * n), "<f8").copy()


def _read_segment_data(r: _Reader):
    """One bincode SegmentData -> (pos f32[n,3], classification i32[n])."""
    from ..utils.errors import CorruptFile

    n_pts = r.u64()
    if n_pts * 12 > len(r.data):  # cheap sanity before a huge frombuffer
        raise CorruptFile(f"bad reference .ipc: segment claims {n_pts} points")
    pos = r.f32x(3 * n_pts).reshape(n_pts, 3)
    n_cls = r.u64()
    if n_cls != n_pts:
        raise CorruptFile(
            f"bad reference .ipc: {n_pts} points but {n_cls} classifications"
        )
    cls = np.frombuffer(r.take(4 * n_cls), "<u4").astype(np.int32)
    if n_cls and cls.max() > 2:
        raise CorruptFile("bad reference .ipc: classification variant > 2")
    r.f32x(4)   # SegmentInformation (recomputed on demand here)
    r.f32x(6)   # min / max (recomputed)
    tag = r.u8()  # coords: Option<(f64, f64)> (recomputed from location)
    if tag == 1:
        r.f64x(2)
    elif tag != 0:
        raise CorruptFile("bad reference .ipc: Option tag not 0/1")
    return pos, cls


def read_reference_ipc(data: bytes):
    """Parse a reference-app ``.ipc`` session -> (arrays, offset, location).

    Same return shape as :func:`load`.  Segment ids are densified to
    1..K in ascending original-id order (the reference uses sparse random
    u32 ids on respawn, mod.rs:755-765, which would blow our packed-key
    id space); the deleted bucket keeps id 0.
    """
    from ..utils.errors import CorruptFile

    r = _Reader(data)
    n_seg = r.u64()
    if n_seg > len(data) // 33:  # each entry is >= 4 + 16 + 8 + 4 + 1 bytes
        raise CorruptFile(f"bad reference .ipc: claims {n_seg} segments")
    segs: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for _ in range(n_seg):
        idx = r.u32()
        if idx in segs:
            raise CorruptFile(f"bad reference .ipc: duplicate segment {idx}")
        segs[idx] = _read_segment_data(r)
    deleted = _read_segment_data(r)
    world_offset = r.f64x(3)
    loc_len = r.u64()
    try:
        source_location = bytes(r.take(loc_len)).decode()
    except UnicodeDecodeError as e:
        raise CorruptFile(f"bad reference .ipc: {e}") from e
    if r.off != len(data):
        raise CorruptFile(
            f"bad reference .ipc: {len(data) - r.off} trailing bytes"
        )

    parts_pos = [deleted[0]]
    parts_cls = [deleted[1]]
    parts_seg = [np.zeros(len(deleted[0]), np.int32)]
    for new_id, old_id in enumerate(sorted(segs), start=1):
        p, c = segs[old_id]
        parts_pos.append(p)
        parts_cls.append(c)
        parts_seg.append(np.full(len(p), new_id, np.int32))
    arrays = {
        "pos": np.concatenate(parts_pos) if parts_pos else
        np.zeros((0, 3), np.float32),
        "segment": np.concatenate(parts_seg),
        "classification": np.concatenate(parts_cls),
    }
    return arrays, world_offset, source_location


def write_reference_ipc(path_or_buf, arrays: dict, world_offset,
                        source_location: str, info: dict | None = None) -> None:
    """Write a session the REFERENCE app can open (bincode InteractiveSave).

    ``arrays`` as from :func:`load`; per-point source attributes are not
    representable in the reference format and are dropped.  ``info``
    optionally maps segment id -> (trunk_height, crown_height, ground_sep,
    crown_sep) (calculations.rs:191-197); absent entries write zeros (the
    reference only reads them for the focused-view sliders).
    """
    seg = np.asarray(arrays["segment"], np.int64)
    # ONE stable argsort by segment id, then every segment is a contiguous
    # slice — a per-id boolean mask + fancy-index gather would make this an
    # O(S*N) host pass (~2000 full-array scans for a 1000-tree scan, on the
    # ~10-20 MB/s post-axon host path; CLAUDE.md host-memory rules)
    order = np.argsort(seg, kind="stable")
    pos = np.ascontiguousarray(
        np.asarray(arrays["pos"], np.float32)[order], "<f4")
    cls = np.ascontiguousarray(
        np.clip(np.asarray(arrays["classification"])[order], 0, 2)
        .astype("<u4"))
    seg_sorted = seg[order]
    ids, starts = np.unique(seg_sorted, return_index=True)
    bounds = np.append(starts, len(seg_sorted))

    def segment_bytes(lo_i: int, hi_i: int, sid: int) -> bytes:
        p = pos[lo_i:hi_i]
        c = cls[lo_i:hi_i]
        n = len(p)
        th, ch, gs, cs = (info or {}).get(sid, (0.0, 0.0, 0.0, 0.0))
        lo = p.min(axis=0) if n else np.zeros(3, np.float32)
        hi = p.max(axis=0) if n else np.zeros(3, np.float32)
        return b"".join([
            struct.pack("<Q", n), p.tobytes(),
            struct.pack("<Q", n), c.tobytes(),
            struct.pack("<4f", th, ch, gs, cs),
            np.asarray(lo, "<f4").tobytes(), np.asarray(hi, "<f4").tobytes(),
            b"\x00",  # coords: None (recomputed from location by the app)
        ])

    runs = {int(s): (int(bounds[k]), int(bounds[k + 1]))
            for k, s in enumerate(ids)}
    live = [s for s in runs if s != _DELETED_INDEX]
    chunks = [struct.pack("<Q", len(live))]
    for sid in live:
        chunks.append(struct.pack("<I", sid))
        chunks.append(segment_bytes(*runs[sid], sid))
    dlo, dhi = runs.get(_DELETED_INDEX, (0, 0))
    chunks.append(segment_bytes(dlo, dhi, _DELETED_INDEX))
    chunks.append(np.asarray(world_offset, "<f8").tobytes())
    loc = source_location.encode()
    chunks.append(struct.pack("<Q", len(loc)) + loc)
    blob = b"".join(chunks)
    if hasattr(path_or_buf, "write"):
        path_or_buf.write(blob)
    else:
        with open(path_or_buf, "wb") as fh:
            fh.write(blob)


def merge_attributes(a: dict, n_a: int, b: dict, n_b: int) -> dict:
    """Concatenate two per-point attribute dicts, zero-filling keys missing
    on a side (e.g. merging an RGB scan into an intensity-only session).

    Shared by BOTH merge entry points — checkpoint merge (:func:`merge`)
    and live scan merge (pipeline.Session.add_las) — so the fill/union
    semantics cannot diverge.  Key names pass through verbatim (the
    checkpoint path carries its ``attr_`` prefix)."""
    out = {}
    for k in sorted(set(a) | set(b)):
        va, vb = a.get(k), b.get(k)
        ref = va if va is not None else vb
        if va is None:
            va = np.zeros((n_a,) + ref.shape[1:], ref.dtype)
        if vb is None:
            vb = np.zeros((n_b,) + ref.shape[1:], ref.dtype)
        out[k] = np.concatenate([va, vb])
    return out


def save(path_or_buf, cloud: PointCloud, world_offset: np.ndarray,
         source_location: str,
         attributes: dict[str, np.ndarray] | None = None,
         info: dict | None = None) -> None:
    """Checkpoint the full session state.

    A path ending ``.ipc`` writes the REFERENCE app's bincode format
    (:func:`write_reference_ipc` — openable by upstream treee; source
    attributes dropped, ``info`` optionally fills SegmentInformation);
    anything else writes our ``.npz``.  ``attributes`` optionally adds
    source point-record fields (intensity, rgb, ... —
    io/las.decode_attributes), stored as ``attr_<name>`` arrays aligned
    with the pos rows; absent in older checkpoints, which still load.
    """
    import os

    data = cloud.to_numpy()
    if (isinstance(path_or_buf, (str, os.PathLike))
            and str(path_or_buf).lower().endswith(".ipc")):
        write_reference_ipc(path_or_buf, data, world_offset,
                            source_location, info=info)
        return
    meta = {
        "format_version": FORMAT_VERSION,
        "source_location": source_location,
    }
    extra = {}
    for k, v in (attributes or {}).items():
        if len(v) != len(data["pos"]):
            raise ValueError(
                f"attribute {k!r} has {len(v)} rows, cloud has "
                f"{len(data['pos'])} valid points"
            )
        extra[f"attr_{k}"] = v
    np.savez_compressed(
        path_or_buf,
        pos=data["pos"],
        segment=data["segment"],
        classification=data["classification"],
        world_offset=np.asarray(world_offset, np.float64),
        meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
        **extra,
    )


def load(path_or_buf) -> tuple[dict[str, np.ndarray], np.ndarray, str]:
    """Load a checkpoint -> (arrays dict, world_offset f64[3], source_location).

    Accepts BOTH our ``.npz`` checkpoints and the reference app's bincode
    ``.ipc`` sessions (:func:`read_reference_ipc`), dispatched on the zip
    magic — a user migrating from upstream treee opens their edited
    forests directly.  Corrupt archives (bad zip framing, missing arrays,
    mangled metadata) raise the clean :class:`CorruptFile` taxonomy
    instead of leaking ``zipfile``/``KeyError`` internals; a missing file
    stays ``FileNotFoundError``.
    """
    import os
    import tokenize
    import zipfile
    import zlib

    from ..utils.errors import CorruptFile, UnsupportedFormat

    # dispatch: a bincode .ipc can never start with the zip magic "PK" —
    # that prefix would claim a ~10^18-entry segment HashMap.  Files NAMED
    # .npz are never routed to the bincode parser: a truncated/corrupt .npz
    # should fail through the zip taxonomy below with a message that names
    # the right format, not as a "bad reference .ipc" (advisor r3).
    def _named_npz(name) -> bool:
        return str(name).lower().endswith(".npz")

    if isinstance(path_or_buf, (str, os.PathLike)):
        with open(path_or_buf, "rb") as fh:
            head = fh.read(2)
        if head != b"PK" and not _named_npz(path_or_buf):
            with open(path_or_buf, "rb") as fh:
                return read_reference_ipc(fh.read())
    elif hasattr(path_or_buf, "read") and hasattr(path_or_buf, "seek"):
        pos0 = path_or_buf.tell()
        head = path_or_buf.read(2)
        path_or_buf.seek(pos0)
        if head != b"PK" and not _named_npz(getattr(path_or_buf, "name", "")):
            return read_reference_ipc(path_or_buf.read())

    try:
        with np.load(path_or_buf) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            if meta.get("format_version", 0) > FORMAT_VERSION:
                raise UnsupportedFormat("checkpoint from a newer format version")
            arrays = {
                "pos": z["pos"].astype(np.float32),
                "segment": z["segment"].astype(np.int32),
                "classification": z["classification"].astype(np.int32),
            }
            for k in z.files:
                if k.startswith("attr_"):
                    arrays[k] = z[k]
            return arrays, z["world_offset"], meta["source_location"]
    except FileNotFoundError:
        raise
    except UnsupportedFormat:
        raise
    except (zipfile.BadZipFile, KeyError, UnicodeDecodeError, OSError,
            json.JSONDecodeError, EOFError, zlib.error, NotImplementedError,
            tokenize.TokenError, SyntaxError, ValueError) as e:
        # zlib.error: mangled deflate stream; NotImplementedError: corrupted
        # zip compression-method field; TokenError/SyntaxError: numpy's .npy
        # header safe_eval on mangled bytes; ValueError: a flipped zip magic
        # sends np.load down its pickle path ("Cannot load file containing
        # pickled data when allow_pickle=False")
        raise CorruptFile(f"bad session checkpoint: {e}") from e


def merge(
    base: dict[str, np.ndarray],
    base_offset: np.ndarray,
    other: dict[str, np.ndarray],
    other_offset: np.ndarray,
) -> dict[str, np.ndarray]:
    """Additive merge of a second checkpoint, shifting by the offset difference
    and renumbering colliding segment ids (mod.rs:300-338)."""
    diff = np.asarray(other_offset, np.float64) - np.asarray(base_offset, np.float64)
    pos = other["pos"]
    if np.dot(diff, diff) > 0.1:  # mod.rs:305 threshold
        pos = (pos.astype(np.float64) + diff).astype(np.float32)

    used = set(np.unique(base["segment"]).tolist())
    remap = {}
    next_id = int(max(used)) + 1 if used else 1
    seg = other["segment"].copy()
    for sid in np.unique(seg):
        if sid == 0:
            continue
        if sid in used:
            remap[int(sid)] = next_id
            next_id += 1
        else:
            used.add(int(sid))
    for old, new in remap.items():
        seg[other["segment"] == old] = new

    out = {
        "pos": np.concatenate([base["pos"], pos]),
        "segment": np.concatenate([base["segment"], seg]),
        "classification": np.concatenate(
            [base["classification"], other["classification"]]
        ),
    }
    # source attributes: zero-fill whichever side lacks a key
    out.update(merge_attributes(
        {k: v for k, v in base.items() if k.startswith("attr_")},
        len(base["pos"]),
        {k: v for k, v in other.items() if k.startswith("attr_")},
        len(other["pos"]),
    ))
    return out
