"""Headless GUI: panel renderer + HTTP viewer (reference train_gui.py
GUI class :57-465 / network_gui.py, re-imagined as a browser viewer)."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from das3r_tpu.data.synthetic import random_gaussian_scene
from das3r_tpu.gui import ViewerScene
from das3r_tpu.gui.server import ViewerApp, make_server
from das3r_tpu.ops.splat import RasterSettings


@pytest.fixture(scope="module")
def scene():
    params, meta, poses = random_gaussian_scene(
        n=400, n_frames=3, height=48, width=64, seed=0)
    settings = RasterSettings(
        image_height=48, image_width=64, sh_degree=3, max_per_tile=256,
        max_tiles_per_gaussian=32, max_total_entries=65_536)
    return ViewerScene(params=params, meta=meta, settings=settings,
                       train_poses7=np.asarray(poses.all_poses()),
                       backend="xla")


def test_panels_render_and_differ(scene):
    orbit = scene.default_orbit()
    rgb = scene.render_panel(orbit, "rgb")
    conf = scene.render_panel(orbit, "confidence")
    nosoft = scene.render_panel(orbit, "no_soft")
    for p in (rgb, conf, nosoft):
        assert p.shape == (48, 64, 3) and p.dtype == np.uint8
    assert rgb.any(), "orbit view should see the scene"
    assert not np.array_equal(rgb, conf)
    # orbiting changes the view
    orbit.orbit(400.0, 0.0)
    rgb2 = scene.render_panel(orbit, "rgb")
    assert not np.array_equal(rgb, rgb2)


def test_mask_blend_panel(scene):
    img = np.zeros((8, 8, 3))
    mask = np.zeros((8, 8))
    mask[:4] = 1.0
    out = scene.mask_blend_panel(img, mask)
    assert out[0, 0, 0] > 100 and out[0, 0, 1] < 40   # red overlay
    assert (out[4:] == 0).all()


def test_trajectory_panel(scene):
    panel = scene.trajectory_panel(size=120)
    assert panel.shape == (120, 120, 3)
    # the camera path must actually be drawn (non-background pixels)
    assert (panel != 24).any()


def test_bad_mode_raises(scene):
    with pytest.raises(ValueError):
        scene.render_panel(scene.default_orbit(), "nope")


@pytest.fixture(scope="module")
def server(scene):
    app = ViewerApp(scene)
    srv = make_server(app, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_server_index_and_state(server):
    code, ctype, body = _get(server + "/")
    assert code == 200 and "text/html" in ctype
    assert b"DAS3R-TPU viewer" in body
    code, ctype, body = _get(server + "/state")
    st = json.loads(body)
    assert st["n_gaussians"] == 400
    assert "rgb" in st["modes"] and "traj" in st["modes"]


def test_server_render_endpoints(server):
    from PIL import Image
    code, ctype, body = _get(server + "/render?mode=rgb&yaw=100&pitch=20")
    assert code == 200 and ctype == "image/png"
    img = Image.open(io.BytesIO(body))
    assert img.size == (64, 48)
    code, _, body2 = _get(server + "/render?mode=confidence")
    assert code == 200 and body2 != body
    code, _, body3 = _get(server + "/traj")
    assert code == 200 and body3[:4] == b"\x89PNG"


def test_server_rejects_bad_mode(server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/render?mode=evil")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e2:
        _get(server + "/nothing")
    assert e2.value.code == 404
