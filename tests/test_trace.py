"""trace() (2D->3D feature lifting) parity vs a numpy oracle."""

import jax.numpy as jnp
import numpy as np

from goi_tpu.raster import RasterConfig, trace
from goi_tpu.raster.preprocess import TILE, preprocess
from goi_tpu.raster.reference import ALPHA_CLAMP, ALPHA_MIN, T_EPS
from tests.conftest import make_random_scene, make_test_camera

CFG = RasterConfig(max_instances=1 << 14, tile_cap=512, chunk=64)


def oracle_trace(scene, cam, img_sem):
    """Per-pixel sequential walk implementing traceCUDA semantics
    (ref:cuda_rasterizer/forward.cu:422-551): blended instances with
    alpha > 0.005 accumulate the pixel's feature; hit counter
    increments once per semantic channel."""
    sp = preprocess(scene, cam)
    order = np.argsort(np.where(np.asarray(sp.valid),
                                np.asarray(sp.depth), np.inf),
                       kind="stable")
    mean2d = np.asarray(sp.mean2d)[order]
    conic = np.asarray(sp.conic)[order]
    opac = np.asarray(sp.opacity)[order]
    rmin = np.asarray(sp.rect_min)[order]
    rmax = np.asarray(sp.rect_max)[order]
    valid = np.asarray(sp.valid)[order]
    img = np.asarray(img_sem)
    s = img.shape[0]
    p = scene.capacity
    gau_sem = np.zeros((p, s), np.float64)
    hits = np.zeros((p,), np.int64)

    for y in range(cam.height):
        for x in range(cam.width):
            tx, ty = x // TILE, y // TILE
            t = 1.0
            for i in range(len(order)):
                if not valid[i]:
                    continue
                if not (rmin[i, 0] <= tx < rmax[i, 0]
                        and rmin[i, 1] <= ty < rmax[i, 1]):
                    continue
                dx = mean2d[i, 0] - x
                dy = mean2d[i, 1] - y
                a, b, c = conic[i]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = min(ALPHA_CLAMP,
                            float(opac[i]) * np.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                if t * (1 - alpha) < T_EPS:
                    break
                if alpha > 0.005:
                    g = order[i]
                    gau_sem[g] += img[:, y, x]
                    hits[g] += 1
                t *= 1 - alpha
    return gau_sem, hits * s


def test_trace_matches_oracle():
    scene = make_random_scene(n=80, seed=6)
    cam = make_test_camera(width=32, height=32)
    rng = np.random.default_rng(0)
    img_sem = jnp.asarray(rng.normal(
        0, 1, (10, 32, 32)).astype(np.float32))

    out = trace(scene, cam, img_sem, jnp.zeros(3), CFG)
    exp_sem, exp_cnt = oracle_trace(scene, cam, img_sem)

    np.testing.assert_array_equal(np.asarray(out["num_gsem"]), exp_cnt)
    np.testing.assert_allclose(np.asarray(out["gaussian_semantics"]),
                               exp_sem, rtol=1e-4, atol=1e-4)


def test_trace_pallas_matches_oracle():
    """Fused pallas blend+trace kernel vs the same numpy oracle, with a
    non-tile-multiple frame so the hit-counter ones channel is
    exercised against tile padding."""
    scene = make_random_scene(n=80, seed=6)
    cam = make_test_camera(width=28, height=24)
    rng = np.random.default_rng(0)
    img_sem = jnp.asarray(rng.normal(
        0, 1, (10, 24, 28)).astype(np.float32))

    cfg = RasterConfig(max_instances=1 << 14, backend="pallas")
    out = trace(scene, cam, img_sem, jnp.zeros(3), cfg)
    exp_sem, exp_cnt = oracle_trace(scene, cam, img_sem)

    np.testing.assert_array_equal(np.asarray(out["num_gsem"]), exp_cnt)
    np.testing.assert_allclose(np.asarray(out["gaussian_semantics"]),
                               exp_sem, rtol=1e-4, atol=1e-4)

    # embedded color render must match the plain render() output
    from goi_tpu.raster import render
    ref = render(scene, cam, jnp.zeros(3), cfg)
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]),
                               rtol=1e-5, atol=1e-5)
