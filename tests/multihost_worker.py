"""Worker process for tests/test_multihost.py: joins a 2-process CPU
jax.distributed job, renders a sharded scene over the global 8-device
mesh, and prints scalar checksums for cross-process comparison."""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from goi_tpu.dist.multihost import (init_multihost,
                                        local_camera_indices,
                                        make_global_mesh,
                                        shard_scene_global)

    assert init_multihost()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    from goi_tpu.core.camera import Camera
    from goi_tpu.core.scene import GaussianScene
    from goi_tpu.dist.render import render_sharded
    from goi_tpu.raster import RasterConfig

    rng = np.random.default_rng(7)
    n = 256
    xyz = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scene = GaussianScene.create(
        xyz, colors, sh_degree=1, sem_dim=4,
        scales=rng.uniform(0.05, 0.15, n).astype(np.float32))
    scene = scene.replace(active_sh_degree=1)
    cam = Camera.look_at([0, 0.4, -4], [0, 0, 0], [0, 1, 0],
                         fovx=0.9, fovy=0.9, width=128, height=128)
    cfg = RasterConfig(max_instances=1 << 14, tile_cap=512, chunk=64)

    mesh = make_global_mesh(n_data=1, n_model=8)
    gscene = shard_scene_global(scene, mesh)

    def loss_fn(params, valid):
        # globally-sharded arrays must arrive as jit ARGUMENTS (closing
        # over non-addressable arrays is an error in multi-process jax)
        s = gscene.with_params(params).replace(valid=valid)
        out = render_sharded(s, cam, jnp.zeros(3), cfg, mesh)
        return (jnp.mean(out["render"]) * 3.0
                + jnp.mean(out["semantics"])), out["render"]

    (loss, img), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(
        gscene.params(), gscene.valid)
    gnorm = jax.jit(lambda g: sum(
        jnp.sum(v * v) for v in jax.tree.leaves(g)))(grads)
    img_sum = jnp.sum(img)  # replicated output -> identical everywhere

    local = local_camera_indices(4)
    print("RESULT " + json.dumps({
        "pid": jax.process_index(),
        "loss": float(loss), "gnorm": float(gnorm),
        "img_sum": float(img_sum),
        "local_cams": local,
    }), flush=True)


if __name__ == "__main__":
    main()
