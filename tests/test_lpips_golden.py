"""LPIPS validation against an independent torch execution.

Builds a random-weight state dict in the REAL `lpips` package layout
(net.slice{k}.{torchvision_idx}.weight, lin{i}.model.1.weight), runs
our JAX LPIPS through normalize_lpips_state, and compares against a
from-scratch torch re-execution of the LPIPS-alex pipeline (scaling
layer -> 5 conv/relu slices with maxpools after slices 1-2 -> unit-
normalize -> squared diff -> 1x1 lin -> spatial mean -> sum).
"""

import jax.numpy as jnp
import numpy as np

from goi_tpu.eval.lpips import lpips, normalize_lpips_state

_CONVS = [(64, 3, 11, 4, 2), (192, 64, 5, 1, 2), (384, 192, 3, 1, 1),
          (256, 384, 3, 1, 1), (256, 256, 3, 1, 1)]
_IDX = [0, 3, 6, 8, 10]


def _random_state(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for k, ((o, i, ks, _, _), idx) in enumerate(zip(_CONVS, _IDX)):
        sd[f"net.slice{k+1}.{idx}.weight"] = rng.normal(
            0, 0.05, (o, i, ks, ks)).astype(np.float32)
        sd[f"net.slice{k+1}.{idx}.bias"] = rng.normal(
            0, 0.05, (o,)).astype(np.float32)
        sd[f"lin{k}.model.1.weight"] = np.abs(rng.normal(
            0, 0.1, (1, o, 1, 1))).astype(np.float32)
    return sd


def _torch_lpips(sd, a, b):
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = torch.tensor(x)[None] * 2.0 - 1.0
        x = (x - shift) / scale
        out = []
        for k, ((_, _, _, st, pd), idx) in enumerate(zip(_CONVS, _IDX)):
            w = torch.tensor(sd[f"net.slice{k+1}.{idx}.weight"])
            bia = torch.tensor(sd[f"net.slice{k+1}.{idx}.bias"])
            x = F.relu(F.conv2d(x, w, bia, stride=st, padding=pd))
            out.append(x)
            if k in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for k, (x, y) in enumerate(zip(fa, fb)):
        x = x / x.norm(dim=1, keepdim=True).clamp_min(1e-10)
        y = y / y.norm(dim=1, keepdim=True).clamp_min(1e-10)
        lin = torch.tensor(sd[f"lin{k}.model.1.weight"])
        d = F.conv2d((x - y) ** 2, lin)
        total = total + d.mean(dim=(2, 3)).sum()
    return float(total)


def test_lpips_matches_independent_torch():
    sd = _random_state()
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32),
                0, 1)
    ours = float(lpips(jnp.asarray(a), jnp.asarray(b),
                       weights=normalize_lpips_state(sd)))
    ref = _torch_lpips(sd, a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
    assert ours > 0
    same = float(lpips(jnp.asarray(a), jnp.asarray(a),
                       weights=normalize_lpips_state(sd)))
    assert same < 1e-10


# --- VGG16 backbone (the reference's metric protocol,
# ref:metrics.py:63 net_type='vgg') -------------------------------------

_VGG_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
_VGG_CH = [64, 128, 256, 512, 512]


def _random_vgg_state(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    in_ch = 3
    for k, idxs in enumerate(_VGG_IDX):
        for idx in idxs:
            o = _VGG_CH[k]
            sd[f"net.slice{k+1}.{idx}.weight"] = rng.normal(
                0, 0.08, (o, in_ch, 3, 3)).astype(np.float32)
            sd[f"net.slice{k+1}.{idx}.bias"] = rng.normal(
                0, 0.05, (o,)).astype(np.float32)
            in_ch = o
        sd[f"lin{k}.model.1.weight"] = np.abs(rng.normal(
            0, 0.1, (1, _VGG_CH[k], 1, 1))).astype(np.float32)
    return sd


def _torch_lpips_vgg(sd, a, b):
    """From-scratch torch transcription of the REFERENCE lpipsPyTorch
    vgg pipeline (ref:lpipsPyTorch/modules/networks.py:36-62,86-96 and
    modules/utils.py:6-8): z_score DIRECTLY on the [0,1] input (no
    [-1,1] rescale), relu1_2..relu5_3 taps, eps-ADDED channel norms,
    1x1 lin conv -> spatial mean -> sum over layers."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (torch.tensor(x)[None] - shift) / scale
        out = []
        for k, idxs in enumerate(_VGG_IDX):
            if k > 0:
                x = F.max_pool2d(x, 2, 2)
            for idx in idxs:
                w = torch.tensor(sd[f"net.slice{k+1}.{idx}.weight"])
                bia = torch.tensor(sd[f"net.slice{k+1}.{idx}.bias"])
                x = F.relu(F.conv2d(x, w, bia, stride=1, padding=1))
            out.append(x)
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for k, (x, y) in enumerate(zip(fa, fb)):
        x = x / (x.norm(dim=1, keepdim=True) + 1e-10)
        y = y / (y.norm(dim=1, keepdim=True) + 1e-10)
        lin = torch.tensor(sd[f"lin{k}.model.1.weight"])
        d = F.conv2d((x - y) ** 2, lin)
        total = total + d.mean(dim=(2, 3)).sum()
    return float(total)


def test_lpips_vgg_matches_reference_torch_pipeline():
    sd = _random_vgg_state()
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32),
                0, 1)
    ours = float(lpips(jnp.asarray(a), jnp.asarray(b),
                       weights=normalize_lpips_state(sd, "vgg"),
                       net="vgg"))
    ref = _torch_lpips_vgg(sd, a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
    assert ours > 0
    same = float(lpips(jnp.asarray(a), jnp.asarray(a),
                       weights=normalize_lpips_state(sd, "vgg"),
                       net="vgg"))
    assert same < 1e-10


def test_lpips_vgg_shape_contract_matches_lpips_package():
    """Every key the real lpips.LPIPS(net='vgg').state_dict() emits
    maps onto a canonical conv/lin slot with the right shape."""
    sd = _random_vgg_state(1)
    canon = normalize_lpips_state(sd, "vgg")
    in_ch = 3
    for k, idxs in enumerate(_VGG_IDX):
        for j in range(len(idxs)):
            w = canon[f"net.slice{k+1}.conv{j}.weight"]
            assert w.shape == (_VGG_CH[k], in_ch, 3, 3)
            in_ch = _VGG_CH[k]
        assert canon[f"lin{k}.model.1.weight"].shape == (
            1, _VGG_CH[k], 1, 1)
