"""Chunked (round-3) binning layout vs the aligned reference layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goi_tpu.raster.binning import (bin_splats, bin_splats_chunked,
                                    chunk_capacity)
from goi_tpu.raster.preprocess import TILE, preprocess
from tests.conftest import make_random_scene, make_test_camera

K = 128


def _splats(n=500, seed=0, w=64, h=48):
    scene = make_random_scene(n=n, seed=seed)
    cam = make_test_camera(width=w, height=h)
    sp = jax.jit(lambda s: preprocess(s, cam))(scene)
    gx, gy = (w + TILE - 1) // TILE, (h + TILE - 1) // TILE
    return sp, gx, gy


@pytest.mark.parametrize("use_mono", [False, True])
@pytest.mark.parametrize("cull", [True, False])
def test_chunked_matches_aligned_segments(use_mono, cull):
    sp, gx, gy = _splats()
    n_inst = 1 << 13
    a = bin_splats(sp, grid_x=gx, grid_y=gy, max_instances=n_inst,
                   align=K, cull=cull)
    c = bin_splats_chunked(sp, grid_x=gx, grid_y=gy,
                           max_instances=n_inst + 2048, chunk_k=K,
                           cull=cull, use_mono=use_mono)
    a_pl = np.asarray(a.point_list)
    c_pl = np.asarray(c.point_list)
    a_s, a_e = np.asarray(a.tile_start), np.asarray(a.tile_end)
    c_s, c_e = np.asarray(c.tile_start), np.asarray(c.tile_end)
    assert int(a.num_instances) == int(c.num_instances)
    for t in range(gx * gy):
        np.testing.assert_array_equal(
            c_pl[c_s[t]:c_e[t]], a_pl[a_s[t]:a_e[t]],
            err_msg=f"tile {t}")
    # chunked stream is contiguous: segments tile the stream w/o gaps
    lens = (c_e - c_s)
    assert (c_s[1:] == c_e[:-1]).all()
    assert c_s[0] == 0
    # chunk_base consistency
    walk = (c_s // K) * K
    nch = np.where(c_e > c_s, -(-(c_e - walk) // K), 0)
    cb = np.asarray(c.chunk_base)
    np.testing.assert_array_equal(cb, np.concatenate(
        [[0], np.cumsum(nch)[:-1]]))
    assert cb[-1] + nch[-1] <= chunk_capacity(
        n_inst + 2048, gx * gy, K)


def test_chunked_mono_equals_plain_gather_path():
    sp, gx, gy = _splats(n=900, seed=5)
    kw = dict(grid_x=gx, grid_y=gy, max_instances=1 << 13, chunk_k=K)
    a = bin_splats_chunked(sp, use_mono=False, **kw)
    b = bin_splats_chunked(sp, use_mono=True, **kw)
    for f in ("point_list", "tile_start", "tile_end", "chunk_base"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), f)


def test_chunked_overflow_reports_demand():
    sp, gx, gy = _splats(n=900, seed=2)
    big = bin_splats_chunked(sp, grid_x=gx, grid_y=gy,
                             max_instances=1 << 14, chunk_k=K)
    demand = int(big.num_slots)
    small = bin_splats_chunked(sp, grid_x=gx, grid_y=gy,
                               max_instances=512, chunk_k=K)
    assert int(small.num_slots) == demand > 512
    assert int(small.num_instances) == int(big.num_instances)
