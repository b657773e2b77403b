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

import numpy as np

from ..cloud import PointCloud

FORMAT_VERSION = 1


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
         attributes: dict[str, np.ndarray] | None = None) -> None:
    """Checkpoint the full session state.

    ``attributes`` optionally adds source point-record fields (intensity,
    rgb, ... — io/las.decode_attributes), stored as ``attr_<name>`` arrays
    aligned with the pos rows; absent in older checkpoints, which still load.
    """
    data = cloud.to_numpy()
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

    Corrupt archives (bad zip framing, missing arrays, mangled metadata)
    raise the clean :class:`CorruptFile` taxonomy instead of leaking
    ``zipfile``/``KeyError`` internals; a missing file stays
    ``FileNotFoundError``.
    """
    import tokenize
    import zipfile
    import zlib

    from ..utils.errors import CorruptFile, UnsupportedFormat

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
