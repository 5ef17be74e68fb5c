"""Codebook, losses, similarity, OSH, and metric tests."""

import jax
import jax.numpy as jnp
import numpy as np

from goi_tpu.eval.metrics import iou_metrics, psnr, ssim
from goi_tpu.query.align import VisionLanguageAlign
from goi_tpu.query.osh import (OSHState, hinge_loss, osh_finetune, osh_init,
                               osh_predict)
from goi_tpu.query.similarity import (ape_similarity, clip_relevancy,
                                      decode_semantic_features)
from goi_tpu.semantic.codebook import SemanticDecoder, kmeans
from goi_tpu.semantic.losses import distillation_loss


def test_kmeans_clusters_separate_data():
    rng = np.random.default_rng(0)
    a = rng.normal([4, 0, 0, 0], 0.05, (100, 4))
    b = rng.normal([0, 4, 0, 0], 0.05, (100, 4))
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    centers = kmeans(jax.random.PRNGKey(0), x, 2, niter=10)
    c = np.asarray(centers / np.linalg.norm(centers, axis=1, keepdims=True))
    # one center near each mode
    modes = np.eye(4)[:2]
    d = c @ modes.T
    assert d.max(axis=0).min() > 0.95


def test_decoder_shapes_and_save_load(tmp_path):
    dec = SemanticDecoder.create(jax.random.PRNGKey(0), dim_in=10,
                                 dim_out=300, num_layer=1, use_bias=True)
    x = jnp.ones((7, 10))
    y = dec(x)
    assert y.shape == (7, 300)
    p = str(tmp_path / "mlp.pkl")
    dec.save(p)
    back = SemanticDecoder.load(p)
    np.testing.assert_allclose(np.asarray(back(x)), np.asarray(y))


def test_distillation_loss_structure():
    key = jax.random.PRNGKey(1)
    dec = SemanticDecoder.create(key, dim_in=10, dim_out=32, num_layer=1)
    lut = jax.random.normal(key, (32, 64))
    sem = jax.random.normal(key, (128, 10))
    gt = jax.random.normal(key, (128, 64))
    total, aux = distillation_loss(dec, lut, sem, gt, jnp.float32(1.0))
    assert np.isfinite(float(total))
    expect = (float(aux["lab"]) + float(aux["sl"])
              + 0.3 * float(aux["sl1"]) + float(aux["recc"]))
    assert abs(float(total) - expect) < 1e-5
    # gradient flows into all three groups
    g = jax.grad(lambda d, l, s: distillation_loss(
        d, l, s, gt, jnp.float32(1.0))[0], argnums=(0, 1, 2))(dec, lut, sem)
    assert float(jnp.abs(g[1]).sum()) > 0
    assert float(jnp.abs(g[2]).sum()) > 0


def test_decode_and_similarity_pipeline():
    key = jax.random.PRNGKey(2)
    dec = SemanticDecoder.create(key, dim_in=10, dim_out=16)
    lut = jax.random.normal(key, (16, 256))
    sem_map = jax.random.normal(key, (50, 10))
    feats = decode_semantic_features(dec, lut, sem_map)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=1), 1.0, atol=1e-5)

    align = VisionLanguageAlign.create()
    tokens, bias = align.text_embedding_align(
        jax.random.normal(key, (1, 1024)))
    assert tokens.shape == (1, 256)
    sim = ape_similarity(feats, tokens[0], log_scale=align.log_scale[0])
    assert sim.shape == (50,)
    assert float(sim.min()) >= 0 and float(sim.max()) <= 1

    rel = clip_relevancy(feats[:, :128], jax.random.normal(key, (128,)),
                         jax.random.normal(key, (4, 128)))
    assert rel.shape == (50,)


def test_osh_learns_linear_boundary():
    """OSH must improve IoU on linearly separable data and stop when the
    0.9 target is reached (ref:gui/main.py:1707-1763 loop semantics)."""
    rng = np.random.default_rng(3)
    dim = 64
    w_true = rng.normal(size=dim).astype(np.float32)
    feats = rng.normal(size=(500, dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = (feats @ w_true > 0).astype(np.float32)

    w0 = (0.3 * w_true
          + 0.1 * rng.normal(size=dim).astype(np.float32))
    state0 = osh_init(jnp.asarray(w0))
    from goi_tpu.query.osh import osh_predict as pred
    iou0 = float(jnp.sum((pred(state0, jnp.asarray(feats)) > 0)
                         & (jnp.asarray(labels) > 0))
                 / jnp.sum((pred(state0, jnp.asarray(feats)) > 0)
                           | (jnp.asarray(labels) > 0)))
    state, iou, epochs = osh_finetune(
        state0, jnp.asarray(feats), jnp.asarray(labels), max_epochs=3000)
    assert float(iou) >= max(0.85, iou0), (iou0, float(iou))


def test_hinge_loss_values():
    out = jnp.array([2.0, -2.0, 0.5])
    y = jnp.array([1.0, 0.0, 1.0])
    # margins: 1-2=-1 -> 0 ; 1-(-2)(-1)=1-2=-1 -> 0 ; 1-0.5=0.5
    assert abs(float(hinge_loss(out, y)) - 0.5 / 3) < 1e-6


def test_osh_bias_init():
    st = osh_init(jnp.zeros(256), set_bias=0.86)
    expect = 2.0 - np.log(0.86 / 0.14)
    assert abs(float(st.bias) - expect) < 1e-4


def test_psnr_ssim_sanity():
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (3, 32, 32)).astype(np.float32))
    assert float(psnr(img, img)) > 80
    assert abs(float(ssim(img, img)) - 1.0) < 1e-4
    noisy = jnp.clip(img + 0.1, 0, 1)
    assert float(psnr(img, noisy)) < 25
    assert float(ssim(img, noisy)) < 1.0


def test_iou_metrics_match_reference_defs():
    gt = jnp.asarray(np.array([[1, 1, 0, 0]], bool))
    pred = jnp.asarray(np.array([[1, 0, 1, 0]], bool))
    m = iou_metrics(pred, gt)
    assert abs(float(m["iou"]) - 1 / 3) < 1e-6
    # acc1 = 1/2, acc0 = 1/2 -> mPA = 0.5
    assert abs(float(m["mpa"]) - 0.5) < 1e-6
    # prec1 = 1/2, prec0 = 1/2 -> mP = 0.5
    assert abs(float(m["mp"]) - 0.5) < 1e-6
