"""QueryWebApp: the full GUI-operation surface over loopback HTTP
(ref:gui/main.py button handlers; see goi_tpu/viewer/app.py)."""

import json
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from goi_tpu.app.session import QuerySession
from goi_tpu.core.scene import GaussianScene
from goi_tpu.raster import RasterConfig
from goi_tpu.semantic.codebook import SemanticDecoder
from goi_tpu.viewer.app import QueryWebApp

N_OBJ = 2
APE_DIM = 16


def _session():
    """Two separated objects with an identity-style decode chain so the
    query fires on exactly one of them."""
    rng = np.random.default_rng(7)
    centers = np.array([[-0.8, 0, 0], [0.8, 0, 0]], np.float32)
    xyz = np.concatenate([c + rng.normal(0, 0.12, (150, 3))
                          .astype(np.float32) for c in centers])
    obj = np.repeat(np.arange(N_OBJ), 150)
    scene = GaussianScene.create(
        xyz, rng.uniform(0.2, 1, (300, 3)).astype(np.float32),
        sh_degree=0, sem_dim=10,
        scales=np.full(300, 0.06, np.float32))
    sems = np.zeros((300, 10), np.float32)
    sems[np.arange(300), obj] = 4.0
    scene = scene.replace(opacity=jnp.full_like(scene.opacity, 1.8),
                          semantics=jnp.asarray(sems))

    # simplex features (see examples/full_pipeline_demo.py step 2)
    q, _ = np.linalg.qr(rng.normal(0, 1, (APE_DIM, N_OBJ + 1)))
    basis = q.T.astype(np.float32)
    feats = basis - basis.mean(0, keepdims=True)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)

    # decoder: identity-ish (softmax over 10 -> codes 0..9); LUT rows
    # 0/1 carry the object features
    decoder = SemanticDecoder(weights=[25.0 * jnp.eye(10)],
                              biases=[None])
    lut = jnp.asarray(np.tile(feats[N_OBJ], (10, 1)))
    lut = lut.at[0].set(feats[0]).at[1].set(feats[1])
    cfg = RasterConfig(max_instances=1 << 14, tile_cap=512, chunk=32,
                       backend="xla")
    sess = QuerySession(scene, decoder, lut, cfg, sim_thresh=0.86,
                        white_background=False)
    text = {"left thing": feats[0] * 12.0, "right thing": feats[1] * 12.0}
    return sess, text


def _post(base, payload):
    req = urllib.request.Request(
        base + "/op", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return json.loads(urllib.request.urlopen(req, timeout=300).read())


def test_query_web_app_full_surface(tmp_path):
    sess, text = _session()
    app = QueryWebApp(sess, text_fn=lambda p: text[p],
                      host="127.0.0.1", port=0)
    app.start()
    base = f"http://127.0.0.1:{app.port}"
    try:
        page = urllib.request.urlopen(base + "/", timeout=30).read()
        assert b"goi_tpu query app" in page and b"/op" in page

        # frames in every mode
        for mode in ("image", "depth", "alpha"):
            r = urllib.request.urlopen(
                base + f"/frame?elev=10&azim=20&radius=3.5&w=64&h=48"
                f"&mode={mode}", timeout=300)
            assert r.headers["Content-Type"] == "image/png"
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"

        # query + retrieve: only the left object's gaussians match
        assert _post(base, {"op": "set_text",
                            "prompt": "left thing"})["ok"]
        got = _post(base, {"op": "retrieve"})
        assert 100 <= got["retrieved"] <= 200, got

        st = json.loads(urllib.request.urlopen(base + "/state",
                                               timeout=30).read())
        assert st["prompt"] == "left thing"
        assert st["retrieved"] == got["retrieved"]
        assert st["num_valid"] == 300

        # view ops + move/reset round-trip preserves geometry
        xyz_before = np.asarray(sess.scene.xyz).copy()
        assert _post(base, {"op": "segment"})["ok"]
        assert _post(base, {"op": "delete_view"})["ok"]
        assert _post(base, {"op": "move", "delta": [0.2, 0, 0]})["ok"]
        assert not np.allclose(np.asarray(sess.scene.xyz), xyz_before)
        assert _post(base, {"op": "reset"})["ok"]
        np.testing.assert_allclose(np.asarray(sess.scene.xyz),
                                   xyz_before, atol=1e-6)

        # OSH finetune from a client-supplied mask: mask = current
        # query's own rendering, so IoU must come out high
        cam_q = {"elev": 10, "azim": 20, "radius": 3.5,
                 "w": 64, "h": 48}
        from goi_tpu.app.orbit_ngp import NGPOrbitCamera
        oc = NGPOrbitCamera(64, 48, r=3.5, fovy=50.0)
        oc.orbit_to(10, 20)
        from goi_tpu.raster import render
        out = render(sess.scene, oc.to_camera(), jnp.zeros(3),
                     sess.raster_cfg)
        sim = sess.compute_similarity(
            out["semantics"].reshape(10, -1).T)
        mask = np.asarray(sim > 0).reshape(48, 64).astype(float)
        assert mask.sum() > 10
        ft = _post(base, dict(op="finetune", mask=mask.tolist(),
                              max_epochs=1500, **cam_q))
        assert ft["ok"] and ft["iou"] > 0.6, ft

        # video along two anchors
        c2w = np.linalg.inv(np.asarray(oc.to_camera().world_view))
        oc.orbit_to(10, 60)
        c2w2 = np.linalg.inv(np.asarray(oc.to_camera().world_view))
        vid = _post(base, {"op": "video",
                           "anchors": [c2w.tolist(), c2w2.tolist()],
                           "w": 48, "h": 32, "steps": 3,
                           "out": str(tmp_path / "path.mp4")})
        assert vid["ok"] and vid["frames"] >= 3
        assert (tmp_path / "path.mp4").exists()

        # permanent delete prunes the retrieved object
        assert _post(base, {"op": "retrieve"})["retrieved"] > 0
        got = _post(base, {"op": "delete_perm"})
        assert got["num_valid"] < 300

        # unknown op -> 500 with an error body
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base, {"op": "nope"})
        assert exc.value.code == 500

        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(base + "/bogus", timeout=30)
        assert exc.value.code == 404
    finally:
        app.stop()


def test_query_web_app_edit_flow(tmp_path):
    """SDS editing over HTTP: precompute relative cameras from the
    current query, train a few epochs with the analytic backend, and
    require that only target Gaussians changed (ref:gui/main_edit.py
    edit loop driven through the web surface)."""
    from goi_tpu.app.edit import EditSession
    from goi_tpu.guidance.sds import InpaintSDS
    from tests.test_app_edit import _ToyBackend
    from tests.conftest import make_test_camera

    sess, text = _session()
    sds = InpaintSDS(_ToyBackend(target=0.9),
                     pos_embedding=jnp.zeros((1, 8)),
                     neg_embedding=jnp.zeros((1, 8)))
    edit = EditSession(sess.scene, sds, sess.raster_cfg, batch_size=1,
                       guidance_scale=1.0, lambda_sd=1.0)
    cams = [make_test_camera(width=32, height=32, angle=a)
            for a in (0.0, 0.4)]
    app = QueryWebApp(sess, text_fn=lambda p: text[p], edit=edit,
                      edit_cameras=cams, host="127.0.0.1", port=0)
    app.start()
    base = f"http://127.0.0.1:{app.port}"
    try:
        _post(base, {"op": "set_text", "prompt": "left thing"})
        got = _post(base, {"op": "edit_precompute"})
        assert got["ok"] and got["relative_cameras"] >= 1

        before = np.asarray(sess.scene.features_dc).copy()
        got = _post(base, {"op": "edit_train", "epochs": 2,
                           "log_every": 100})
        assert got["ok"]
        after = np.asarray(sess.scene.features_dc)  # synced back
        changed = np.abs(after - before).sum(axis=(1, 2)) > 1e-7
        gm = np.asarray(edit.grad_mask) > 0
        assert changed[gm].any()
        assert not changed[~gm].any()
    finally:
        app.stop()
