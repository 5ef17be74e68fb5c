"""Adaptive density control: clone / split / prune with static capacity.

Reference behavior (ref:scene/gaussian_model.py:360-514):
  - accumulate per-Gaussian screen-space gradient norms + counts
  - clone small Gaussians with grad >= threshold (copy in place)
  - split large ones into N=2 samples drawn from the Gaussian itself,
    scale/(0.8*N), pruning the original
  - prune by min opacity / large screen radius / large world scale
  - optimizer moments of new Gaussians start at zero
    (cat_tensors_to_optimizer, ref::410-430)

TPU re-design: arrays never change shape. The scene has spare capacity
and a validity mask; clones/splits scatter into free slots (allocation
by prefix-sum over the free mask), prunes just clear validity, and the
optax state is surgically zeroed for newly-allocated rows. Everything
is one jit (no host sync in the decision path).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from goi_tpu.core.scene import GaussianScene, build_rotation_matrix


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyStats:
    xyz_grad_accum: jax.Array   # (N,)
    denom: jax.Array            # (N,)
    max_radii: jax.Array        # (N,) int32

    @staticmethod
    def create(capacity: int) -> "DensifyStats":
        return DensifyStats(
            xyz_grad_accum=jnp.zeros((capacity,)),
            denom=jnp.zeros((capacity,)),
            max_radii=jnp.zeros((capacity,), jnp.int32),
        )


def add_stats(stats: DensifyStats, mean2d_grad_pixel: jax.Array,
              radii: jax.Array, width: int, height: int) -> DensifyStats:
    """Accumulate the NDC-scaled viewspace gradient norm for visible
    Gaussians (ref:scene/gaussian_model.py:512-514; the CUDA backward
    stores dL/dmean2D in NDC units via the 0.5*W/H factors,
    ref:cuda_rasterizer/backward.cu:498-499)."""
    vis = radii > 0
    g = mean2d_grad_pixel * jnp.array([[0.5 * width, 0.5 * height]])
    norm = jnp.linalg.norm(g, axis=-1)
    return DensifyStats(
        xyz_grad_accum=stats.xyz_grad_accum + jnp.where(vis, norm, 0.0),
        denom=stats.denom + vis.astype(jnp.float32),
        max_radii=jnp.maximum(stats.max_radii, radii),
    )


def _allocate_slots(valid: jax.Array, want: jax.Array):
    """Rank free slots: returns (slot_index_for_rank (N,), num_free).
    rank r (0-based) -> index of the r-th free slot; ranks >= num_free
    map to N (out of bounds, dropped by scatter mode='drop')."""
    n = valid.shape[0]
    free = ~valid
    rank_of_slot = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_of_rank = jnp.full((n,), n, jnp.int32).at[
        jnp.where(free, rank_of_slot, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return slot_of_rank, jnp.sum(free.astype(jnp.int32))


def _scatter_rows(tree, idx, rows_tree):
    """Scatter rows_tree rows into tree at idx (mode drop)."""
    return jax.tree.map(
        lambda a, r: a.at[idx].set(r, mode="drop"), tree, rows_tree)


@partial(jax.jit, static_argnames=("max_screen_size",))
def densify_and_prune(
    scene: GaussianScene,
    opt_state,
    stats: DensifyStats,
    key: jax.Array,
    *,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    percent_dense: float = 0.01,
    max_screen_size: int = 0,
) -> Tuple[GaussianScene, object, DensifyStats, dict]:
    n = scene.capacity
    grads = stats.xyz_grad_accum / jnp.maximum(stats.denom, 1.0)
    grads = jnp.where(stats.denom > 0, grads, 0.0)
    scaling = scene.get_scaling()
    max_scale = jnp.max(scaling, axis=-1)
    hot = (grads >= grad_threshold) & scene.valid

    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # ---- allocation: clones first, then 2 children per split ----
    slot_of_rank, num_free = _allocate_slots(scene.valid, None)
    c_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    s_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1
    n_split = jnp.sum(split_mask.astype(jnp.int32))

    def rank_to_slot(r):
        return slot_of_rank[jnp.minimum(r, n - 1)]

    # Overflow gating: when free capacity runs out, ranks >= num_free
    # map out of bounds and their scatters drop. A split whose children
    # would be dropped must NOT prune its parent (otherwise the
    # highest-gradient Gaussians are silently destroyed) — gate the
    # whole split on its LAST child rank fitting.
    split_ok = split_mask & (n_clone + 2 * s_rank + 1 < num_free)

    params = scene.params()

    # clones: exact copies (ref::480-494)
    c_slots = jnp.where(clone_mask, rank_to_slot(c_rank), n)
    new_tree = _scatter_rows(params, c_slots, params)

    # splits: two children each, sampled from the parent Gaussian
    # (ref::454-478); child scale = log(scale / (0.8*N))
    rot = build_rotation_matrix(scene.get_rotation())
    for child in range(2):
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, (n, 3)) * scaling
        new_xyz = scene.xyz + jnp.einsum("nij,nj->ni", rot, eps)
        child_rank = n_clone + 2 * s_rank + child
        s_slots = jnp.where(split_ok, rank_to_slot(child_rank), n)
        child_rows = dict(params)
        child_rows["xyz"] = new_xyz
        child_rows["scaling"] = jnp.log(scaling / (0.8 * 2))
        new_tree = _scatter_rows(new_tree, s_slots, child_rows)

    # validity of newly written slots
    all_slots = jnp.concatenate([
        c_slots,
        jnp.where(split_ok, rank_to_slot(n_clone + 2 * s_rank), n),
        jnp.where(split_ok, rank_to_slot(n_clone + 2 * s_rank + 1), n),
    ])
    new_valid = scene.valid.at[all_slots].set(True, mode="drop")

    # prune: split parents (only those whose children were written) +
    # low opacity + oversized (ref::496-508)
    opacity = jax.nn.sigmoid(new_tree["opacity"][:, 0])
    prune = split_ok | (opacity < min_opacity)
    if max_screen_size:
        prune = prune | (stats.max_radii > max_screen_size) \
            | (max_scale > 0.1 * extent)
    # never prune slots we just wrote (their stats are stale zeros)
    just_written = jnp.zeros((n,), bool).at[all_slots].set(
        True, mode="drop")
    prune = prune & ~just_written
    new_valid = new_valid & ~prune

    new_scene = scene.with_params(new_tree).replace(valid=new_valid)

    # optimizer-state surgery: zero Adam moments of newly written rows
    # (ref:scene/gaussian_model.py:410-430)
    def fix_leaf(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 \
                and leaf.shape[0] == n and jnp.issubdtype(
                    leaf.dtype, jnp.floating):
            return leaf.at[all_slots].set(0.0, mode="drop")
        return leaf

    new_opt = jax.tree.map(fix_leaf, opt_state)

    info = {
        "n_clone": n_clone,
        "n_split": n_split,
        "n_pruned": jnp.sum(prune.astype(jnp.int32)),
        "n_valid": jnp.sum(new_valid.astype(jnp.int32)),
        "overflow": jnp.maximum(
            n_clone + 2 * n_split - num_free, 0),
    }
    return new_scene, new_opt, DensifyStats.create(n), info


def grow_capacity(scene: GaussianScene, opt_state,
                  stats: DensifyStats, new_capacity: int):
    """Host-side capacity growth: pad every per-Gaussian leaf (scene
    params, validity, optimizer moments, densify stats) from the current
    capacity to `new_capacity`. The CUDA reference reallocates tensors
    freely (ref:scene/gaussian_model.py:432-452); under XLA shapes are
    static, so growth re-jits — call this only when densify_and_prune
    reports overflow."""
    n = scene.capacity
    assert new_capacity >= n

    def pad_leaf(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 \
                and leaf.shape[0] == n:
            cfg = [(0, new_capacity - n)] + [(0, 0)] * (leaf.ndim - 1)
            return jnp.pad(leaf, cfg)  # zeros: invalid + zero moments
        return leaf

    new_scene = scene.replace(
        valid=pad_leaf(scene.valid),
        **{k: pad_leaf(v) for k, v in scene.params().items()})
    return (new_scene, jax.tree.map(pad_leaf, opt_state),
            jax.tree.map(pad_leaf, stats))


@jax.jit
def reset_opacity(scene: GaussianScene, opt_state):
    """Clamp opacities to <= 0.01 (ref:scene/gaussian_model.py:291-294)
    and zero the opacity optimizer moments (replace_tensor_to_optimizer)."""
    new_op = jnp.minimum(scene.get_opacity(), 0.01)
    logit = jnp.log(new_op / (1.0 - new_op))

    # zero Adam moments for opacity: match leaves by the opacity shape
    def zero_opacity(leaf):
        if hasattr(leaf, "shape") and leaf.shape == scene.opacity.shape \
                and jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return leaf

    return (scene.replace(opacity=logit),
            jax.tree.map(zero_opacity, opt_state))
