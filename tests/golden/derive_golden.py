"""Derive independent golden vectors for the rasterizer parity gate.

This is a from-scratch float64 transcription of the reference CUDA
rasterizer math — preprocess (ref:cuda_rasterizer/forward.cu:155-256),
computeCov3D/computeCov2D (ref:forward.cu:74-152), and the sequential
per-pixel blend (ref:forward.cu:300-386) — written in torch so
torch.autograd supplies analytic gradients of the SAME branch structure
autodiff uses. It shares NO code with goi_tpu/raster (in particular not
raster/reference.py, the oracle every other parity test trusts), so a
misreading in the oracle cannot hide here.

Running it writes tests/golden/golden_vectors.json, which
tests/test_golden_vectors.py checks render() against. The JSON is
committed; re-run this script only to regenerate after changing the
scene definition below.

Usage: PYTHONPATH=/root/repo python tests/golden/derive_golden.py
"""

import json
import math
import os

import torch

torch.set_default_dtype(torch.float64)

SH_C0 = 0.28209479177387814
W = H = 16
TAN_FOV = 1.0  # fovx = fovy = 90 deg
FOCAL = W / (2.0 * TAN_FOV)
ZNEAR, ZFAR = 0.01, 100.0

# ---- scene definition (3 Gaussians, one 16x16 tile) ----
XYZ = [[0.3, -0.2, 3.0], [-0.5, 0.4, 4.5], [0.0, 0.0, 6.0]]
SCALE = [[0.4, 0.3, 0.5], [0.6, 0.5, 0.4], [0.8, 0.8, 0.8]]
QUAT = [[1.0, 0.3, -0.2, 0.1], [0.9, -0.1, 0.2, 0.3],
        [1.0, 0.0, 0.0, 0.0]]
OPA_LOGIT = [0.5, 0.0, 1.0]
DC = [[0.8, 0.2, 0.3], [0.1, 0.7, 0.4], [0.5, 0.5, 0.9]]
SEM = [[(0.1 * (g + 1)) * math.cos(0.7 * s + g) for s in range(10)]
       for g in range(3)]
BG = [0.15, 0.25, 0.35]


def projection_matrix():
    # ref:utils/graphics_utils.py:51-71 (z' = zfar(z-znear)/(zfar-znear),
    # w' = z)
    P = torch.zeros(4, 4)
    P[0, 0] = ZNEAR / (TAN_FOV * ZNEAR)
    P[1, 1] = ZNEAR / (TAN_FOV * ZNEAR)
    P[3, 2] = 1.0
    P[2, 2] = ZFAR / (ZFAR - ZNEAR)
    P[2, 3] = -(ZFAR * ZNEAR) / (ZFAR - ZNEAR)
    return P


def forward(xyz, scale, quat, opa_logit, dc, sem):
    """Sequential CUDA-semantics forward. World_view = identity (camera
    at origin looking +z), so view == world coords."""
    P = projection_matrix()
    n = xyz.shape[0]

    # --- preprocess, per Gaussian ---
    mean2d, conic_l, opac, color, depth = [], [], [], [], []
    for i in range(n):
        p = xyz[i]
        p_view_z = p[2]
        assert p_view_z > 0.2  # near cull would zero this Gaussian
        hom = torch.cat([p, torch.ones(1)])
        p_hom = P @ hom
        p_w = 1.0 / (p_hom[3] + 1e-7)
        p_proj = p_hom[:3] * p_w

        # computeCov3D (ref:forward.cu:118-152) — NOTE the CUDA kernel
        # does NOT normalize the quaternion (callers pre-normalize)
        q = quat[i] / torch.linalg.norm(quat[i])
        r, x, y, z = q[0], q[1], q[2], q[3]
        R = torch.stack([
            torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z),
                         2 * (x * z + r * y)]),
            torch.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z),
                         2 * (y * z - r * x)]),
            torch.stack([2 * (x * z - r * y), 2 * (y * z + r * x),
                         1 - 2 * (x * x + y * y)]),
        ])
        S = torch.diag(scale[i])
        M = R @ S  # glm S*R with column-major transposes == R @ S
        sigma = M @ M.T

        # computeCov2D (ref:forward.cu:74-113); viewmatrix = I
        t = p.clone()
        lim = 1.3 * TAN_FOV
        tx = torch.clamp(t[0] / t[2], -lim, lim) * t[2]
        ty = torch.clamp(t[1] / t[2], -lim, lim) * t[2]
        tz = t[2]
        J = torch.zeros(2, 3)
        J[0, 0] = FOCAL / tz
        J[0, 2] = -(FOCAL * tx) / (tz * tz)
        J[1, 1] = FOCAL / tz
        J[1, 2] = -(FOCAL * ty) / (tz * tz)
        cov = J @ sigma @ J.T
        cxx = cov[0, 0] + 0.3
        cxy = cov[0, 1]
        cyy = cov[1, 1] + 0.3

        det = cxx * cyy - cxy * cxy
        conic = torch.stack([cyy / det, -cxy / det, cxx / det])

        px = ((p_proj[0] + 1.0) * W - 1.0) * 0.5  # ndc2Pix
        py = ((p_proj[1] + 1.0) * H - 1.0) * 0.5

        # SH degree 0: C0 * dc + 0.5, clamped at 0 (ref:forward.cu:27-70)
        col = torch.clamp(SH_C0 * dc[i] + 0.5, min=0.0)

        mean2d.append(torch.stack([px, py]))
        conic_l.append(conic)
        opac.append(torch.sigmoid(opa_logit[i]))
        color.append(col)
        depth.append(p_view_z)

    order = sorted(range(n), key=lambda i: float(depth[i]))

    # --- per-pixel sequential blend (ref:forward.cu:331-386) ---
    bg = torch.tensor(BG)
    out_c = torch.zeros(H, W, 3)
    out_s = torch.zeros(H, W, 10)
    out_d = torch.zeros(H, W)
    out_a = torch.zeros(H, W)
    for yy in range(H):
        for xx in range(W):
            T = torch.tensor(1.0)
            C = torch.zeros(3)
            Cs = torch.zeros(10)
            D = torch.tensor(0.0)
            for i in order:
                dx = mean2d[i][0] - xx
                dy = mean2d[i][1] - yy
                a, b, c = conic_l[i]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if float(power) > 0.0:
                    continue
                alpha = torch.clamp(opac[i] * torch.exp(power), max=0.99)
                if float(alpha) < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if float(test_T) < 1e-4:
                    break  # done flag: sticky stop
                C = C + color[i] * alpha * T
                Cs = Cs + sem[i] * alpha * T
                D = D + depth[i] * alpha * T
                T = test_T
            out_c[yy, xx] = C + T * bg
            out_s[yy, xx] = Cs
            out_d[yy, xx] = D
            out_a[yy, xx] = 1 - T
    return out_c, out_s, out_d, out_a


def main():
    xyz = torch.tensor(XYZ, requires_grad=True)
    scale = torch.tensor(SCALE, requires_grad=True)
    quat = torch.tensor(QUAT, requires_grad=True)
    opa = torch.tensor(OPA_LOGIT, requires_grad=True)
    dc = torch.tensor(DC, requires_grad=True)
    sem = torch.tensor(SEM, requires_grad=True)

    out_c, out_s, out_d, out_a = forward(xyz, scale, quat, opa, dc, sem)

    # deterministic cotangents (same formulas in the test)
    idx = torch.arange(H * W, dtype=torch.float64).reshape(H, W)
    wc = torch.stack([torch.cos(0.1 * idx + c) for c in range(3)], -1)
    ws = torch.stack([math.cos(0.3 * s + 1.0) * torch.ones(H, W)
                      for s in range(10)], -1)
    loss = (out_c * wc).sum() + (out_s * ws).sum() \
        + 0.05 * out_d.sum() + 0.07 * out_a.sum()
    loss.backward()

    probes = [(4, 5), (7, 7), (8, 10), (12, 3), (0, 0), (15, 15)]
    data = {
        "scene": {"xyz": XYZ, "scale": SCALE, "quat": QUAT,
                  "opa_logit": OPA_LOGIT, "dc": DC, "sem": SEM,
                  "bg": BG, "wh": [W, H], "tan_fov": TAN_FOV,
                  "znear": ZNEAR, "zfar": ZFAR},
        "probes": [
            {"yx": [y, x],
             "color": out_c[y, x].tolist(),
             "sem": out_s[y, x].tolist(),
             "depth": float(out_d[y, x]),
             "alpha": float(out_a[y, x])} for (y, x) in probes],
        "sums": {"color": out_c.sum(dim=(0, 1)).tolist(),
                 "sem": out_s.sum(dim=(0, 1)).tolist(),
                 "depth": float(out_d.sum()),
                 "alpha": float(out_a.sum())},
        "loss": float(loss),
        "grads": {"xyz": xyz.grad.tolist(),
                  "scaling_log": (scale.grad * scale).detach().tolist(),
                  # chain exp: d/d(log s) = s * d/ds
                  "quat": quat.grad.tolist(),
                  "opa_logit": opa.grad.tolist(),
                  "dc": dc.grad.tolist(),
                  "sem": sem.grad.tolist()},
    }
    path = os.path.join(os.path.dirname(__file__), "golden_vectors.json")
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {path}; loss={float(loss):.12f}")


if __name__ == "__main__":
    main()
