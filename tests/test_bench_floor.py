"""Throughput regression gates (VERDICT r3 item 3): the two headline
configs must not silently regress. Chip-only (GOI_SCALE_TEST=1, like
the scale-training test); CI covers correctness, these pin SPEED.

Floors are set ~10% under the measured numbers committed in
BENCH_DETAIL.json — the SAME artifact, refreshed in the same round, so
provenance is checkable (VERDICT r4 weak #2 called out floors citing a
measurement that existed nowhere in the repo). Regressions past the
floor are real, not noise — round 3 lost 28% at 100k (13 -> 9.3
Mrays/s) without any gate noticing, which is what this prevents.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GOI_SCALE_TEST"),
    reason="set GOI_SCALE_TEST=1 on a TPU host (bench floors are "
           "hardware numbers; CPU interpret mode is meaningless)")

# floors: ~10% under BENCH_DETAIL.json's round-5 refresh
# (train_mrays_per_s_1M = 2.021, train_mrays_per_s_100k = 10.635,
# measured by `python bench.py --detail` on the v5e chip)
FLOOR_1M_MRAYS = 1.8       # measured 2.021 (fwd+bwd, 1M, 512^2)
FLOOR_100K_MRAYS = 9.5     # measured 10.635 (fwd+bwd, 100k, 512^2)


def _measure(n_gauss):
    import bench
    import jax.numpy as jnp
    from goi_tpu.core.camera import Camera

    cam = Camera.look_at([0.3, 0.4, -4.0], [0, 0, 0], [0, 1, 0],
                         fovx=0.9, fovy=0.9, width=512, height=512)
    scene = bench._make_scene(n_gauss, 10, seed=1)
    return bench._train_mrays(scene, cam, "auto")


def test_1m_headline_floor():
    mrays = _measure(1_000_000)
    print(f"1M fwd+bwd: {mrays:.3f} Mrays/s (floor {FLOOR_1M_MRAYS})")
    assert mrays >= FLOOR_1M_MRAYS


def test_100k_floor():
    mrays = _measure(100_000)
    print(f"100k fwd+bwd: {mrays:.3f} Mrays/s "
          f"(floor {FLOOR_100K_MRAYS})")
    assert mrays >= FLOOR_100K_MRAYS
