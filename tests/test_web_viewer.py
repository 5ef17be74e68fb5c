"""Web viewer client/server: serves the page and renders real frames."""

import io
import urllib.request

import jax.numpy as jnp
import numpy as np

from goi_tpu.raster import RasterConfig, render
from goi_tpu.viewer.web import WebViewer
from tests.conftest import make_random_scene


def test_web_viewer_page_and_frame():
    scene = make_random_scene(n=100, seed=1)
    cfg = RasterConfig(max_instances=1 << 13, tile_cap=256, chunk=32)
    calls = []

    def render_fn(cam, prompt):
        calls.append((cam.width, cam.height, prompt))
        return render(scene, cam, jnp.zeros(3), cfg)["render"]

    v = WebViewer(render_fn, host="127.0.0.1", port=0)
    v.start()
    base = f"http://127.0.0.1:{v.port}"
    try:
        page = urllib.request.urlopen(base + "/", timeout=30).read()
        assert b"goi_tpu web viewer" in page and b"/frame?" in page

        r = urllib.request.urlopen(
            base + "/frame?elev=10&azim=30&radius=4&w=64&h=48"
            "&prompt=chair", timeout=120)
        body = r.read()
        assert r.headers["Content-Type"] == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        import imageio.v2 as imageio
        img = imageio.imread(io.BytesIO(body))
        assert img.shape == (48, 64, 3)
        assert calls == [(64, 48, "chair")]

        # scale<1: reduced-resolution preview frames (the reference
        # GUI's interactive downscale policy, ref:utils/camera_utils.py
        # :28-71) — requested 64x48 at scale .5 renders 32x32 (16-px
        # aligned), the browser upscales
        r = urllib.request.urlopen(
            base + "/frame?elev=10&azim=30&radius=4&w=64&h=48"
            "&prompt=chair&scale=0.5", timeout=120)
        import imageio.v2 as iio2
        img = iio2.imread(io.BytesIO(r.read()))
        assert img.shape == (32, 32, 3)
        assert calls[-1] == (32, 32, "chair")

        import pytest
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(base + "/nope", timeout=30)
        assert exc.value.code == 404
    finally:
        v.stop()
