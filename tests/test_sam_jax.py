"""JAX SAM vs the official torch implementation (tiny dims).

The oracle is the vendored upstream Segment-Anything torch code (data
dependency only — imported from the read-only reference checkout, skip
if absent). Both models get the SAME random weights through the
checkpoint state_dict contract, so this validates the whole key-naming
+ math chain end-to-end."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from goi_tpu.query.sam import (SAMConfig, SamJax, dense_pe, encode_boxes,
                               encode_points, image_encoder,
                               init_sam_params, mask_decoder,
                               no_mask_embed, sam_param_shapes)

torch = pytest.importorskip("torch")

REF = "/root/reference/ext"
TINY = SAMConfig(embed_dim=32, depth=3, num_heads=2, global_attn=(1,),
                 window=4, img_size=64, patch=8, prompt_dim=16,
                 decoder_mlp=32)


def _torch_sam():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the package __init__ pulls in torchvision (absent here) for the
    # predictor; we only need .modeling — stub it out
    import types
    if "torchvision" not in sys.modules:
        mods = {}
        for name in ("torchvision", "torchvision.transforms",
                     "torchvision.transforms.functional",
                     "torchvision.ops", "torchvision.ops.boxes"):
            m = types.ModuleType(name)
            m.__path__ = []          # mark as package for submodules
            mods[name] = m
        mods["torchvision.transforms.functional"].resize = \
            mods["torchvision.transforms.functional"].to_pil_image = \
            lambda *a, **k: None
        mods["torchvision.ops.boxes"].batched_nms = \
            mods["torchvision.ops.boxes"].box_area = lambda *a, **k: None
        mods["torchvision"].transforms = mods["torchvision.transforms"]
        mods["torchvision.transforms"].functional = \
            mods["torchvision.transforms.functional"]
        mods["torchvision"].ops = mods["torchvision.ops"]
        mods["torchvision.ops"].boxes = mods["torchvision.ops.boxes"]
        sys.modules.update(mods)
    else:
        # another test (test_grounding) may have stubbed torchvision
        # first — patch in whatever segment_anything's import needs
        import types
        noop = lambda *a, **k: None
        tf_name = "torchvision.transforms.functional"
        if tf_name not in sys.modules:
            tr = sys.modules.setdefault(
                "torchvision.transforms",
                types.ModuleType("torchvision.transforms"))
            tr.__path__ = getattr(tr, "__path__", [])
            trf = types.ModuleType(tf_name)
            trf.resize = trf.to_pil_image = noop
            sys.modules[tf_name] = trf
            tr.functional = trf
            sys.modules["torchvision"].transforms = tr
        bx = sys.modules.get("torchvision.ops.boxes")
        if bx is not None:
            for a in ("batched_nms", "box_area"):
                if not hasattr(bx, a):
                    setattr(bx, a, noop)
    try:
        from segment_anything.modeling import (ImageEncoderViT,
                                               MaskDecoder, PromptEncoder,
                                               Sam, TwoWayTransformer)
    except ImportError:
        pytest.skip("reference segment_anything not available")
    from functools import partial
    c = TINY
    sam = Sam(
        image_encoder=ImageEncoderViT(
            depth=c.depth, embed_dim=c.embed_dim, img_size=c.img_size,
            mlp_ratio=4,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            num_heads=c.num_heads, patch_size=c.patch, qkv_bias=True,
            use_rel_pos=True, global_attn_indexes=c.global_attn,
            window_size=c.window, out_chans=c.prompt_dim),
        prompt_encoder=PromptEncoder(
            embed_dim=c.prompt_dim,
            image_embedding_size=(c.grid, c.grid),
            input_image_size=(c.img_size, c.img_size), mask_in_chans=16),
        mask_decoder=MaskDecoder(
            num_multimask_outputs=3,
            transformer=TwoWayTransformer(
                depth=c.decoder_depth, embedding_dim=c.prompt_dim,
                mlp_dim=c.decoder_mlp, num_heads=c.decoder_heads),
            transformer_dim=c.prompt_dim, iou_head_depth=3,
            iou_head_hidden_dim=256),
        pixel_mean=[123.675, 116.28, 103.53],
        pixel_std=[58.395, 57.12, 57.375])
    sam.eval()
    return sam


@pytest.fixture(scope="module")
def models():
    sam = _torch_sam()
    torch.manual_seed(0)
    for p_ in sam.parameters():
        with torch.no_grad():
            p_.copy_(torch.randn_like(p_) * 0.1)
    sd = {k: np.asarray(v.detach(), np.float32)
          for k, v in sam.state_dict().items()}
    return sam, sd


def test_param_shapes_match_official_state_dict(models):
    sam, sd = models
    shapes = sam_param_shapes(TINY)
    official = {k: tuple(v.shape) for k, v in sd.items()}
    assert shapes == official, (
        set(shapes) ^ set(official),
        {k: (shapes.get(k), official.get(k))
         for k in shapes if shapes.get(k) != official.get(k)})


def test_image_encoder_parity(models):
    sam, sd = models
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = sam.image_encoder(torch.from_numpy(x)).numpy()
    got = np.asarray(image_encoder(
        {k: jnp.asarray(v) for k, v in sd.items()}, TINY,
        jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_prompt_and_mask_decoder_parity(models):
    sam, sd = models
    p = {k: jnp.asarray(v) for k, v in sd.items()}
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(1, TINY.prompt_dim, TINY.grid, TINY.grid)) \
        .astype(np.float32)
    boxes = np.asarray([[4.0, 6.0, 40.0, 50.0],
                        [0.0, 0.0, 30.0, 20.0]], np.float32)

    with torch.no_grad():
        sparse_t, dense_t = sam.prompt_encoder(
            points=None, boxes=torch.from_numpy(boxes), masks=None)
        pe_t = sam.prompt_encoder.get_dense_pe()
        masks_t, iou_t, _ = sam.mask_decoder(
            image_embeddings=torch.from_numpy(emb),
            image_pe=pe_t,
            sparse_prompt_embeddings=sparse_t,
            dense_prompt_embeddings=dense_t,
            multimask_output=False)

    sparse = encode_boxes(p, TINY, jnp.asarray(boxes))
    dense = no_mask_embed(p, TINY, 2)
    np.testing.assert_allclose(np.asarray(sparse), sparse_t.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense), dense_t.detach().numpy(),
                               atol=1e-6)
    pe = dense_pe(p, TINY)
    np.testing.assert_allclose(np.asarray(pe), pe_t.numpy(), atol=1e-5)

    masks, iou = mask_decoder(
        p, TINY, jnp.broadcast_to(jnp.asarray(emb), (2,) + emb.shape[1:]),
        pe, sparse, dense, multimask=False)
    np.testing.assert_allclose(np.asarray(masks), masks_t.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(iou), iou_t.numpy(), atol=2e-4)


def test_point_prompts_parity(models):
    sam, sd = models
    p = {k: jnp.asarray(v) for k, v in sd.items()}
    pts = np.asarray([[[10.0, 12.0], [33.0, 7.0]]], np.float32)
    lab = np.asarray([[1, 0]], np.float32)
    with torch.no_grad():
        want, _ = sam.prompt_encoder(
            points=(torch.from_numpy(pts), torch.from_numpy(lab)),
            boxes=None, masks=None)
    got = encode_points(p, TINY, jnp.asarray(pts), jnp.asarray(lab))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_predictor_end_to_end_shapes():
    params = init_sam_params(jax.random.key(0), TINY)
    sj = SamJax(params, TINY)
    img = (np.random.default_rng(2).uniform(0, 255, (48, 64, 3))
           .astype(np.uint8))
    sj.set_image(img)
    masks, iou = sj.predict_boxes(np.asarray([[5.0, 5.0, 40.0, 30.0]]))
    assert masks.shape == (1, 1, 48, 64) and masks.dtype == bool
    assert iou.shape == (1, 1)
