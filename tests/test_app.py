"""CLI app-shell test: the full phase machine through the argparse surface.

One small end-to-end invocation (demo scene -> segment -> frame -> checkpoint
-> every export), mirroring how a user drives the reference app's buttons
(program.rs phase flow) through our flags.  Kept small: the test config shrinks
the render target; the pipeline shapes match other tests for jit-cache reuse.
"""

import json
import os

import numpy as np
import pytest

from treee_tpu import app


def test_cli_end_to_end(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    monkeypatch.setenv("TREEE_APP_CONFIG", "small")  # small static shapes
    out = lambda name: str(tmp_path / name)
    argv = [
        "--demo", "--frames", "1",
        "--width", "192", "--height", "108",
        "--out-dir", out("frames"),
        "--save", out("sess.npz"),
        "--export-info", out("info.json"),
        "--export-traits", out("traits.json"),
        "--export-ply", out("points.ply"),
        "--segment-id", "1",
        "--export-hull-ply", out("hull.ply"),
        "--export-landmarks", out("lm.txt"),
        "--export-rbv", out("rbv.json"),
        "--eye-dome-strength", "0.5",
        "--brush-radius", "1.5",
    ]
    assert app.main(argv) == 0

    # frame written
    assert os.path.exists(out("frames") + "/frame_000.png")
    # checkpoint reloads
    assert app.main([out("sess.npz"), "--no-segment"]) == 0
    # info json has per-segment rows with the reference's fields
    info = json.load(open(out("info.json")))
    assert info and all(
        {"trunk_height", "crown_height", "ground_sep", "crown_sep", "count"}
        <= set(v) for v in info.values()
    )
    # traits json has the hull.rs:998-1008 trait fields
    traits = json.load(open(out("traits.json")))
    assert "diameter_breast_height" in next(iter(traits.values()))
    # landmark rows are x\ty\tz triples
    rows = [l.split("\t") for l in open(out("lm.txt")).read().splitlines()]
    assert rows and all(len(r) == 3 for r in rows)
    # rbv distances json
    rbv = json.load(open(out("rbv.json")))
    assert len(rbv["distances"]) == rbv["slices"] * rbv["sectors"]
    # hull ply parses
    head = open(out("hull.ply")).read().split("end_header")[0]
    assert "element vertex" in head and "element face" in head


def test_cli_arg_errors(tmp_path, monkeypatch):
    monkeypatch.setenv("TREEE_APP_CONFIG", "small")
    assert app.main([]) == 2  # no input, no --demo
    # per-segment exports without --segment-id
    rc = app.main(["--demo", "--export-hull-ply", str(tmp_path / "h.ply")])
    assert rc == 2
