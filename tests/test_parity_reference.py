"""Numerical parity vs the reference torch implementation.

Builds the reference CLIP with random weights, converts its state_dict
through our torch-interop layer, and checks encode_image / encode_text /
get_similarity agree to fp32 tolerance. Skipped when /root/reference or
torch is unavailable.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import requires_reference  # noqa: E402
from tests.ref_loader import (TINY_RN_KWARGS, TINY_VIT_KWARGS,
                              load_reference_clip, tiny_config)  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nans_clip_tpu.models import ModelOptions  # noqa: E402
from nans_clip_tpu.models.clip import (encode_image, encode_text,
                                       get_similarity)  # noqa: E402
from nans_clip_tpu.utils.torch_interop import (normalize_state_dict,
                                               params_from_state_dict,
                                               state_dict_from_params)  # noqa: E402


def _setup(kwargs):
    ref_mod = load_reference_clip()
    torch.manual_seed(0)
    model = ref_mod.CLIP(**kwargs).float().eval()
    sd = normalize_state_dict(model.state_dict())
    cfg = tiny_config(kwargs)
    params, stats = params_from_state_dict(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    return model, cfg, params, stats


def _rand_inputs(cfg, b=3):
    rs = np.random.RandomState(0)
    img = rs.randn(b, 3, cfg.vision.image_resolution, cfg.vision.image_resolution).astype(np.float32)
    txt = np.zeros((b, 52), np.int64)
    for i, n in enumerate((52, 30, 7)[:b]):
        txt[i, 0] = 101
        txt[i, 1:n - 1] = rs.randint(1000, 20000, n - 2)
        txt[i, n - 1] = 102
    return img, txt


@requires_reference
@pytest.mark.parametrize("kwargs", [TINY_VIT_KWARGS, TINY_RN_KWARGS],
                         ids=["vit", "rn"])
def test_tower_parity(kwargs):
    model, cfg, params, stats = _setup(kwargs)
    img, txt = _rand_inputs(cfg)

    with torch.no_grad():
        ref_img = model.encode_image(torch.from_numpy(img)).numpy()
        ref_txt = model.encode_text(torch.from_numpy(txt)).numpy()
        ref_li, ref_lt = model.get_similarity(torch.from_numpy(img), torch.from_numpy(txt))

    opts = ModelOptions(attn_impl="xla")
    ours_img = np.asarray(encode_image(params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)),
                                       opts, batch_stats=stats if cfg.is_resnet else None))
    ours_txt = np.asarray(encode_text(params, cfg, jnp.asarray(txt.astype(np.int32)), opts))

    np.testing.assert_allclose(ours_img, ref_img, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours_txt, ref_txt, atol=2e-4, rtol=2e-4)

    li, lt = get_similarity(params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)),
                            jnp.asarray(txt.astype(np.int32)), opts,
                            batch_stats=stats if cfg.is_resnet else None)
    np.testing.assert_allclose(np.asarray(li), ref_li.numpy(), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(lt), ref_lt.numpy(), atol=2e-3, rtol=2e-3)


@requires_reference
def test_pallas_attention_tower_parity():
    """Same check but through the pallas kernel (interpret mode on CPU)."""
    model, cfg, params, stats = _setup(TINY_VIT_KWARGS)
    img, txt = _rand_inputs(cfg)
    with torch.no_grad():
        ref_img = model.encode_image(torch.from_numpy(img)).numpy()
        ref_txt = model.encode_text(torch.from_numpy(txt)).numpy()

    import nans_clip_tpu.ops.attention as attn_mod
    # Route "auto" to pallas-interpret for this test.
    orig = attn_mod._pick_impl
    attn_mod._pick_impl = lambda impl: "pallas"
    try:
        opts = ModelOptions(attn_impl="pallas")
        pallas_orig = attn_mod.attention_pallas
        if jax.default_backend() != "tpu":
            def forced(q, k, v, key_bias=None, block_q=128, interpret=False):
                return pallas_orig(q, k, v, key_bias, block_q, interpret=True)
            attn_mod.attention_pallas = forced
        ours_img = np.asarray(encode_image(params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)), opts))
        ours_txt = np.asarray(encode_text(params, cfg, jnp.asarray(txt.astype(np.int32)), opts))
    finally:
        attn_mod._pick_impl = orig
        attn_mod.attention_pallas = pallas_orig
    np.testing.assert_allclose(ours_img, ref_img, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(ours_txt, ref_txt, atol=5e-4, rtol=5e-4)


@requires_reference
def test_train_loss_and_grad_parity():
    """Full train-step parity: the contrastive loss AND every parameter
    gradient match torch autograd through the reference model.

    Reproduces the reference's non-aggregate ``get_loss`` branch
    (training/train.py:103-115: logits = scale * img @ txt.T, symmetric CE)
    on identical weights and batch; grads are compared in the torch
    state_dict layout via the same interop transposes (pure permutations,
    so they map gradients exactly as they map parameters)."""
    import torch.nn.functional as F

    # Dropout off on both sides — parity needs a deterministic forward.
    kwargs = dict(TINY_VIT_KWARGS, text_attention_probs_dropout_prob=0.0,
                  text_hidden_dropout_prob=0.0)
    model, cfg, params, stats = _setup(kwargs)
    img, txt = _rand_inputs(cfg)

    model.train()  # reference trains in train mode; dropout zeroed above
    img_f, txt_f, scale = model(torch.from_numpy(img), torch.from_numpy(txt))
    logits_per_image = scale * img_f @ txt_f.t()
    logits_per_text = logits_per_image.t()
    gt = torch.arange(len(logits_per_image))
    ref_loss = (F.cross_entropy(logits_per_image, gt)
                + F.cross_entropy(logits_per_text, gt)) / 2
    ref_loss.backward()
    ref_grads = {}
    for name, p in model.named_parameters():
        if p.grad is not None:
            ref_grads[name] = p.grad.numpy().copy()
    ref_grads = normalize_state_dict(ref_grads)

    from nans_clip_tpu.models.clip import normalize
    from nans_clip_tpu.parallel.loss import clip_loss

    opts = ModelOptions(attn_impl="xla", deterministic=True)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    txt_j = jnp.asarray(txt.astype(np.int32))

    def loss_fn(p):
        fi = encode_image(p, cfg, img_j, opts)
        ft = encode_text(p, cfg, txt_j, opts)
        s = jnp.exp(p["logit_scale"].astype(jnp.float32))
        loss, _ = clip_loss(normalize(fi), normalize(ft), s, constrain=False)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(ref_loss.detach()),
                               rtol=1e-5, atol=1e-6)

    ours = state_dict_from_params(jax.tree.map(np.asarray, grads), cfg)
    gscale = max(np.abs(g).max() for g in ref_grads.values())
    compared = 0
    for k, ref_g in ref_grads.items():
        if k not in ours:  # pooler etc. — dropped, and grad-free here anyway
            continue
        g = ours[k]
        denom = np.abs(ref_g).max()
        if denom < 1e-3 * gscale:
            # True gradient ~0 (e.g. attention key bias: a uniform key shift
            # cancels in softmax) — both sides are cancellation noise; just
            # check ours is equally negligible.
            assert np.abs(g).max() < 1e-2 * gscale, f"grad not ~0: {k}"
        else:
            np.testing.assert_allclose(g / denom, ref_g / denom, atol=2e-4,
                                       err_msg=f"grad mismatch: {k}")
        compared += 1
    assert compared >= 30, f"only {compared} gradient tensors compared"


@requires_reference
def test_state_dict_roundtrip():
    model, cfg, params, stats = _setup(TINY_VIT_KWARGS)
    sd0 = normalize_state_dict(model.state_dict())
    sd1 = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
    missing = set(sd0) - set(sd1)
    assert not missing, f"round trip dropped keys: {sorted(missing)[:5]}"
    for k in sd0:
        np.testing.assert_allclose(sd1[k], sd0[k], atol=1e-6, err_msg=k)


@requires_reference
def test_pos_embed_resize_matches_torch():
    import torch.nn.functional as F

    from nans_clip_tpu.utils.torch_interop import resize_pos_embed

    rs = np.random.RandomState(1)
    old = rs.randn(14 * 14 + 1, 64).astype(np.float32)
    ours = resize_pos_embed(old, 24)

    img = torch.from_numpy(old[1:]).reshape(1, 14, 14, 64).permute(0, 3, 1, 2)
    ref = F.interpolate(img, size=(24, 24), mode="bicubic", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).reshape(24 * 24, 64).numpy()

    np.testing.assert_allclose(ours[1:], ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(ours[0], old[0])
