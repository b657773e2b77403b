"""Browser-viewer server tests (serve.py — the reference's web target,
treee-wasm/src/lib.rs:6-17, redesigned as chip-side remote rendering).

Mirrors the REPL e2e style of test_app.py: tiny session, real HTTP round
trips against a loopback server, PNG sanity-checked by parsing the chunks.
"""

import json
import struct
import time
import urllib.request
import zlib

import numpy as np
import pytest


def _decode_png(data: bytes) -> np.ndarray:
    """Tiny PNG reader for the encoder's own output (filter 0, RGB8)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert (depth, ctype) == (8, 2)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all()
    return raw[:, 1:].reshape(h, w, 3)


def test_png_encode_roundtrip():
    from treee_tpu.serve import png_encode

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (11, 7, 3), np.uint8)
    assert (_decode_png(png_encode(img)) == img).all()


@pytest.fixture(scope="module")
def server():
    from treee_tpu.config import (
        CharacteristicsConfig, Config, RenderConfig, SegmentationConfig,
    )
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.serve import ViewerServer

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        render=RenderConfig(width=192, height=108),
    )
    pts = las.synthetic_forest(n_trees=4, points_per_tree=4000,
                               ground_points=4000, seed=3)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    v = ViewerServer(s, port=0)  # port 0: pick a free loopback port
    v.serve_background()
    yield v
    v.shutdown()


def _get(server, path):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}{path}", timeout=60
        ) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def _cmd(server, line):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/cmd", data=line.encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_serve_page_and_info(server):
    status, ctype, body = _get(server, "/")
    assert status == 200 and ctype.startswith("text/html")
    assert b"/frame.png" in body and b"/cmd" in body
    # the display dropdown offers only what this scan can show: synthetic
    # points carry no source attributes, so no intensity/rgb/nir options
    assert b"<option>classification</option>" in body
    assert b"<option>hag</option>" in body
    assert b"nir" not in body and b"intensity" not in body

    status, ctype, body = _get(server, "/info")
    info = json.loads(body)
    assert info["points"] == 20000
    assert info["segments"] >= 1
    assert (info["width"], info["height"]) == (192, 108)

    status, _, _ = _get(server, "/nope")
    assert status == 404


def test_serve_frame_and_commands(server):
    # full frame renders on the session's backend and arrives as valid PNG
    status, ctype, body = _get(server, "/frame.png")
    assert status == 200 and ctype == "image/png"
    img = _decode_png(body)
    assert img.shape == (108, 192, 3)
    assert img.max() > 0  # the forest is not an all-black frame

    # the whole REPL surface is reachable over POST /cmd
    out = _cmd(server, "status")
    assert out["ok"] and "points" in out["output"] and not out["quit"]
    assert _cmd(server, "rotate 30 10")["ok"]
    assert _cmd(server, "mode delete")["ok"]
    out = _cmd(server, "click 96 54")
    assert out["ok"] and "error:" not in out["output"]

    # focused view: select something via the REPL, then fetch the focus frame
    _cmd(server, "mode view")
    sel = json.loads(_get(server, "/info")[2])["selected"]
    if sel is None:  # click may have hit ground; pick the first segment
        _cmd(server, "click 60 40")
    status, _, body = _get(server, "/frame.png?focus=1")
    # focus falls back to the plain frame when nothing is selected
    assert status == 200
    assert _decode_png(body).shape == (108, 192, 3)

    # bad commands surface as error text, never a dead server
    out = _cmd(server, "definitely-not-a-command")
    assert out["ok"] and "error:" in out["output"]
    status, _, _ = _get(server, "/frame.png")
    assert status == 200


# --- progressive preview (VERDICT r2 task 5) ------------------------------


def test_preview_frame_before_segmentation():
    """Height-colored imagery from a raw, never-segmented cloud."""
    from treee_tpu.config import Config, RenderConfig, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=64, max_bands=16, max_segments=64,
            max_trees_per_band=32),
        render=RenderConfig(width=128, height=96),
    )
    s = Session.from_points(
        las.synthetic_forest(n_trees=2, points_per_tree=2000,
                             ground_points=1000, seed=5), cfg)
    img = s.preview_frame()
    assert img.shape == (96, 128, 3) and img.dtype == np.uint8
    # the cloud actually shows up (not a flat background)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 10


def test_segment_preview_callback_count():
    """segment(preview_cb=...) fires the callback EXACTLY once with a
    segment-colored subsample frame, before the full result lands."""
    from treee_tpu.config import Config, RenderConfig, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=64, max_bands=16, max_segments=64,
            max_trees_per_band=32),
        render=RenderConfig(width=128, height=96),
    )
    s = Session.from_points(
        las.synthetic_forest(n_trees=3, points_per_tree=3000,
                             ground_points=1500, seed=6), cfg)
    got = []
    res = s.segment(0.75, preview_cb=lambda img: got.append(img),
                    preview_stride=8)
    assert len(got) == 1
    assert got[0].shape == (96, 128, 3) and got[0].dtype == np.uint8
    assert int(res.n_segments) > 0
    # no preview_cb -> no callback machinery in the path
    s2 = Session.from_points(
        las.synthetic_forest(n_trees=2, points_per_tree=2000,
                             ground_points=500, seed=7), cfg)
    assert int(s2.segment(0.75).n_segments) > 0


def test_frame_png_serves_preview_while_locked(server):
    """While a command holds the session lock, /frame.png returns the
    pushed preview instead of blocking on the device."""
    server._push_preview(np.full((4, 4, 3), 99, np.uint8))
    preview = server._preview_png
    assert preview is not None
    server.lock.acquire()
    try:
        assert server.frame_png() == preview
    finally:
        server.lock.release()
    # unlocked again: a real frame renders and refreshes the cache
    real = server.frame_png()
    assert real != preview and server._last_png == real


def test_distance_command_pushes_preview(server):
    pushed = []
    orig = server._push_preview
    server.repl.preview_hook = lambda img: (pushed.append(1), orig(img))
    try:
        out = _cmd(server, "distance 0.75")
        assert out["ok"]
        assert pushed  # the hook fired mid-command
    finally:
        server.repl.preview_hook = orig


# --- frame pipelining (VERDICT r3 weak #5 / r4 task 3) ---------------------


def _settle(server, timeout=30.0):
    """Wait until the render worker has caught up with all requests."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        with server._frame_cond:
            if server._req_gen == server._done_gen:
                return
        time.sleep(0.01)
    raise AssertionError("render worker never settled")


def test_commands_decoupled_from_render_latency(server):
    """With an artificially slow renderer, a burst of drag-rotate commands
    returns immediately and coalesces to ~1 render per render interval —
    input handling is decoupled from render latency (the reference's
    event-loop rendering, lib.rs:162-164)."""
    _settle(server)
    calls = []
    orig = server._frame_img_locked

    def slow(focus=False):
        calls.append(time.monotonic())
        time.sleep(0.2)
        return orig(focus)

    server._frame_img_locked = slow
    try:
        t0 = time.monotonic()
        for i in range(10):
            out = server.command(f"rotate {i + 1} 0")
            assert out["ok"]
        cmd_elapsed = time.monotonic() - t0
        # 10 commands, each NOT paying the 0.2 s render: far below 10*0.2
        assert cmd_elapsed < 1.0, f"commands blocked on renders: {cmd_elapsed:.2f}s"
        _settle(server)
        # burst coalesced: >=1 render ran, but nowhere near one per command
        assert 1 <= len(calls) <= 3, f"{len(calls)} renders for 10 commands"
    finally:
        server._frame_img_locked = orig
        _settle(server)


def test_raw_events_through_server(server):
    """The page posts RAW pointer events; the server folds them through
    the shared input.InputController (VERDICT r4 task 7) — a sub-2px
    down/up pair selects a segment end-to-end over HTTP."""
    _settle(server)
    _, _, body = _get(server, "/")
    assert b"event down" in body and b"event key" in body
    assert b"event wheel" in body
    w, h = server.repl.s.config.render.width, server.repl.s.config.render.height
    assert _cmd(server, f"event down left {w / 2} {h / 2}")["ok"]
    assert _cmd(server, f"event up left {w / 2} {h / 2}")["ok"]
    _, _, body = _get(server, "/info")
    assert json.loads(body)["selected"] is not None


def test_adaptive_by_default_above_threshold(server, monkeypatch):
    """VERDICT r4 task 6: sessions above the auto threshold serve the
    auto-tau adaptive path by default, /info carries the path + frame ms,
    and an explicit lod command overrides permanently."""
    import treee_tpu.repl as repl_mod

    # policy test: lower the threshold instead of building a >1M cloud
    monkeypatch.setattr(repl_mod, "AUTO_ADAPTIVE_MIN_POINTS", 1000)
    # the module-scoped server may have had an explicit `lod` command from
    # an earlier test (which disables auto permanently): restore a fresh
    # session's auto state for the policy under test
    server.repl._auto_view = True
    server.repl._reset_view_path()
    # ... and an earlier test may have left the focus variant on (the
    # `?focus=1` fetch is sticky state), which bypasses the whole-cloud
    # path entirely
    assert _cmd(server, "focusview off")["ok"]
    # let the worker resolve the auto path off-line first: under full-suite
    # CPU contention the tau solve + LOD build can outlast frame_png's
    # timeout, which would serve a stale frame and report "full"
    server.request_render()
    _settle(server, timeout=600)
    status, _, _ = _get(server, "/frame.png")
    assert status == 200
    _, _, body = _get(server, "/info")
    info = json.loads(body)
    assert info["view_path"].startswith("adaptive(tau="), info
    assert info["frame_ms"] is not None and info["frame_ms"] > 0
    assert info["lod"] is True

    # explicit choice wins and sticks (auto disabled for the session)
    out = _cmd(server, "lod off")
    assert out["ok"]
    _get(server, "/frame.png")
    _, _, body = _get(server, "/info")
    assert json.loads(body)["view_path"] == "full"


def test_full_path_below_threshold(server):
    """Small sessions keep the full-cloud frame (the fast path there)."""
    _get(server, "/frame.png")
    _, _, body = _get(server, "/info")
    info = json.loads(body)
    assert info["view_path"] == "full" and info["lod"] is False


def test_render_error_surfaces_after_first_frame(server):
    """A persistently failing render AFTER the first good frame must not
    freeze the canvas silently: /info carries render_error and stale
    /frame.png responses carry X-Render-Error (advisor r4)."""
    _settle(server)
    status, _, _ = _get(server, "/frame.png")
    assert status == 200  # a good frame exists

    orig = server._frame_img_locked

    def boom(focus=False):
        raise RuntimeError("bad viewer state xyzzy")

    server._frame_img_locked = boom
    try:
        server.request_render()
        deadline = time.monotonic() + 10
        while server._last_error_msg is None and time.monotonic() < deadline:
            time.sleep(0.05)
        assert server._last_error_msg and "xyzzy" in server._last_error_msg

        _, _, body = _get(server, "/info")
        assert "xyzzy" in json.loads(body)["render_error"]

        # the long-poll path serves the STALE frame — with the error header
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/frame.png?wait=1&seq=0",
            timeout=60,
        ) as r:
            assert r.status == 200
            assert "xyzzy" in r.headers.get("X-Render-Error", "")
    finally:
        server._frame_img_locked = orig
    # a successful render clears the sticky error
    server.request_render()
    _settle(server)
    deadline = time.monotonic() + 10
    while server._last_error_msg is not None and time.monotonic() < deadline:
        time.sleep(0.05)
    _, _, body = _get(server, "/info")
    assert json.loads(body)["render_error"] is None


def test_frame_seq_advances_and_long_poll_returns(server):
    _settle(server)
    seq0 = server.frame_seq
    server.command("rotate 5 0")
    png, seq1 = server.frame_wait(seq0, timeout=30.0)
    assert seq1 > seq0 and png[:8] == b"\x89PNG\r\n\x1a\n"
    # long poll with the current seq times out quickly and re-serves
    png2, seq2 = server.frame_wait(seq1, timeout=0.2)
    assert seq2 == seq1 and png2 == png


def test_frame_rgb_endpoint(server):
    server.command("rotate 1 0")
    _settle(server)
    status, ctype, body = _get(server, "/frame.rgb")
    assert status == 200 and ctype == "application/octet-stream"
    img, seq = server.frame_rgb()
    assert img is not None and len(body) == img.size
    assert img.shape == (108, 192, 3)


def test_focusview_command_switches_variant(server):
    _settle(server)
    assert server.command("focusview on")["ok"]
    _settle(server)
    with server._frame_cond:
        assert server._want_focus
    assert server.command("focusview off")["ok"]
    _settle(server)
    with server._frame_cond:
        assert not server._want_focus


def test_ingest_preview_streams_through_serve(server, tmp_path):
    """While a multi-chunk scan decodes inside 'add', ingest previews
    publish (seq bumps) BEFORE the command completes (VERDICT r4 task 6)."""
    from treee_tpu.io import las

    pos = np.random.default_rng(9).uniform(-8, 8, (24_000, 3)).astype(np.float32)
    pos[:, 1] = np.abs(pos[:, 1])
    p = str(tmp_path / "s.las")
    las.write_las(p, pos)
    seqs_during = []
    orig = server._push_preview

    def spy(img):
        orig(img)
        seqs_during.append(server.frame_seq)

    server.repl.preview_hook = spy
    try:
        n0 = json.loads(_get(server, "/info")[2])["points"]
        out = _cmd(server, f"add {p}")
        assert out["ok"]
        # slab previews published mid-decode (plus the final one)
        assert len(seqs_during) >= 2
        assert json.loads(_get(server, "/info")[2])["points"] == n0 + 24_000
    finally:
        server.repl.preview_hook = orig


def test_long_poll_does_not_reset_focusview(server):
    """The page's long-poll omits the focus param; it must NOT reset the
    focusview state the focusview command owns (regression: the default
    focus=0 cleared it on every poll)."""
    _settle(server)
    assert server.command("focusview on")["ok"]
    server.frame_wait(0, focus=None, timeout=0.1)
    with server._frame_cond:
        assert server._want_focus
    # explicit focus param still switches
    server.frame_png(focus=False)
    with server._frame_cond:
        assert not server._want_focus
