"""Vision Transformer tower (functional, scan-over-layers).

Re-designs the reference ``VisualTransformer`` (clip/model.py:230-287) for
TPU:

* patch embedding is a single reshape + matmul (stride == kernel conv is
  exactly a per-patch projection) so the whole op lands on the MXU as one
  ``[B*N, p*p*3] @ [p*p*3, W]`` contraction instead of a convolution;
* the transformer blocks are parameter-stacked and driven by ``lax.scan``
  (one compiled block body instead of L unrolled ones) with optional
  ``jax.checkpoint`` rematerialisation per block (reference used
  torch.utils.checkpoint, clip/model.py:222-227);
* attention runs through the fused Pallas kernel (ops/attention.py).

FLIP random token masking (reference clip/model.py:252-266) keeps the CLS
token plus a random ``(L-1)*(1-mask_ratio)`` subset of patch tokens,
implemented with argsort-of-uniform + take_along_axis so it stays fully
inside the jitted step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nans_clip_tpu.configs import VisionConfig
from nans_clip_tpu.models.common import ModelOptions, cast_tree, ln_params, normal
from nans_clip_tpu.ops import layer_norm, mha, quick_gelu


def init_vit(rng: jax.Array, cfg: VisionConfig) -> dict:
    """Initialize a ViT parameter pytree (CLIP init scheme)."""
    w = cfg.width
    keys = jax.random.split(rng, 8)
    scale = w ** -0.5
    proj_std = (w ** -0.5) * ((2 * cfg.layers) ** -0.5)
    attn_std = w ** -0.5
    fc_std = (2 * w) ** -0.5
    L = cfg.layers

    def stacked(key, shape, std):
        return normal(key, (L,) + shape, std)

    bkeys = jax.random.split(keys[4], 6)
    blocks = {
        "ln_1": {"scale": jnp.ones((L, w)), "bias": jnp.zeros((L, w))},
        "attn": {
            "wqkv": stacked(bkeys[0], (w, 3 * w), attn_std),
            "bqkv": jnp.zeros((L, 3 * w)),
            "wo": stacked(bkeys[1], (w, w), proj_std),
            "bo": jnp.zeros((L, w)),
        },
        "ln_2": {"scale": jnp.ones((L, w)), "bias": jnp.zeros((L, w))},
        "mlp": {
            "w1": stacked(bkeys[2], (w, 4 * w), fc_std),
            "b1": jnp.zeros((L, 4 * w)),
            "w2": stacked(bkeys[3], (4 * w, w), proj_std),
            "b2": jnp.zeros((L, w)),
        },
    }
    return {
        "conv1": {"kernel": normal(keys[0], (cfg.patch_size, cfg.patch_size, 3, w), scale)},
        "class_embedding": normal(keys[1], (w,), scale),
        "positional_embedding": normal(keys[2], (cfg.seq_len, w), scale),
        "ln_pre": ln_params(w),
        "transformer": blocks,
        "ln_post": ln_params(w),
        "proj": normal(keys[3], (w, cfg.embed_dim), scale),
    }


def random_masking(x: jax.Array, mask_ratio: float, rng: jax.Array) -> jax.Array:
    """FLIP token dropping; keeps CLS + random subset (clip/model.py:252-266)."""
    n, l, d = x.shape
    len_keep = int((l - 1) * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (n, l - 1))
    ids_keep = jnp.argsort(noise, axis=1)[:, :len_keep] + 1  # +1: skip CLS slot
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    return jnp.concatenate([x[:, :1, :], x_masked], axis=1)


def vit_features(params: dict, images: jax.Array, cfg: VisionConfig,
                 options: ModelOptions = ModelOptions(),
                 mask_ratio: float = 0.0,
                 rng: Optional[jax.Array] = None) -> jax.Array:
    """Full ViT forward. images: [B, R, R, 3] NHWC. Returns [B, embed_dim]."""
    assert options.tp == 1 or options.pp == 1, \
        "tp>1 and pp>1 are mutually exclusive"
    params = cast_tree(params, options)
    images = options.cast(images)
    b = images.shape[0]
    p, g, w = cfg.patch_size, cfg.grid_size, cfg.width

    # Patch embed: [B, g, p, g, p, 3] -> [B, g*g, p*p*3] @ [p*p*3, W]
    x = images.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
    x = x @ params["conv1"]["kernel"].reshape(p * p * 3, w)

    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, w)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(x.dtype)

    if mask_ratio > 0:
        if rng is None:
            raise ValueError("mask_ratio > 0 requires an rng")
        x = random_masking(x, mask_ratio, rng)

    x = layer_norm(x, **params["ln_pre"])

    heads = cfg.heads
    # 'auto' on TPU routes ViT attention through the fused Pallas block:
    # measured 1.46x over the XLA path (3690 vs 2531 img/s, ViT-B/16 bs=256
    # on v5e) by keeping LN/QKV/probs/ctx in VMEM.
    use_fused = options.attn_impl == "fused" or (
        options.attn_impl == "auto" and jax.default_backend() == "tpu")
    # explicit "fused" off-TPU (CPU test meshes) runs the kernels in
    # interpreter mode instead of failing to lower
    fused_interpret = jax.default_backend() != "tpu"

    def _tower_route(q: bool) -> bool:
        # THE single whole-tower routing predicate — decides both whether
        # int8 params can stream directly (below) and whether the
        # mega-kernel branch itself is taken (tp > 1 returns before that
        # branch, hence the explicit tp == 1 here).
        from nans_clip_tpu.ops.tower_kernel import fits_tower
        return (use_fused and options.deterministic and options.pp == 1
                and options.tp == 1
                and fits_tower(b, x.shape[1], w, 4 * w,
                               jnp.dtype(x.dtype).itemsize, quant=q))

    # int8-quantized serving params (utils/quantize.py): the whole-tower
    # kernel streams them directly (half the HBM bytes — the batch-1
    # bottleneck); every other path dequantizes up front and runs the
    # normal routing unchanged.
    from nans_clip_tpu.utils.quantize import (dequantize_layer_tree,
                                              layer_tree_quantized)
    quant = layer_tree_quantized(params["transformer"])
    if quant and not _tower_route(True):
        params = dict(params)
        params["transformer"] = dequantize_layer_tree(
            params["transformer"], x.dtype)
        quant = False

    if options.tp > 1:
        # Tensor parallel: shard_map over the mesh's 'model' axis with
        # head-split attention and column/row-split MLP (parallel/tp.py).
        from nans_clip_tpu.ops.fused_block import fits_fused, fits_fused_mlp
        from nans_clip_tpu.parallel.tp import tp_attention_block, tp_mlp_block
        a_impl = "fused" if (use_fused and fits_fused(x.shape[1], w)) else "xla"
        m_impl = "fused" if (use_fused and fits_fused_mlp(x.shape[1], w)) else "xla"

        def tp_block(x, lp):
            x = tp_attention_block(
                x, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"], lp["attn"]["wo"],
                lp["attn"]["bo"], heads, options.tp, impl=a_impl,
                interpret=fused_interpret)
            return tp_mlp_block(
                x, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                lp["mlp"]["w1"], lp["mlp"]["b1"], lp["mlp"]["w2"],
                lp["mlp"]["b2"], "quick_gelu", options.tp, impl=m_impl,
                interpret=fused_interpret)

        body = jax.checkpoint(tp_block) if options.remat else tp_block
        x, _ = jax.lax.scan(lambda c, lp: (body(c, lp), None), x,
                            params["transformer"])
        x = layer_norm(x[:, 0, :], **params["ln_post"])
        return x @ params["proj"]

    # Low-latency serving: the whole-tower mega-kernel (ONE pallas_call,
    # grid over layers, per-layer weights double-buffered, activations
    # VMEM-resident across layers — ops/tower_kernel.py). Routed for
    # deterministic forwards at VMEM-fitting batch sizes, where the
    # per-sub-block path's 2L launches + activation HBM round trips
    # dominate latency.
    if _tower_route(quant):
        from nans_clip_tpu.ops.tower_kernel import fused_tower
        tr = params["transformer"]
        x = fused_tower(x, None, tr["ln_1"]["scale"], tr["ln_1"]["bias"],
                        tr["attn"]["wqkv"], tr["attn"]["bqkv"],
                        tr["attn"]["wo"], tr["attn"]["bo"],
                        tr["ln_2"]["scale"], tr["ln_2"]["bias"],
                        tr["mlp"]["w1"], tr["mlp"]["b1"],
                        tr["mlp"]["w2"], tr["mlp"]["b2"], heads, 1e-5,
                        "quick_gelu", False, interpret=fused_interpret)
        x = layer_norm(x[:, 0, :], **params["ln_post"])
        return x @ params["proj"]

    use_fused_mlp = False
    use_wide = False
    use_flash_train = False
    if use_fused:
        from nans_clip_tpu.ops.fused_block import (fits_fused,
                                                   fits_fused_mlp_oneshot,
                                                   fits_fused_wide,
                                                   fused_attention_block,
                                                   fused_attention_block_wide,
                                                   fused_mlp_block,
                                                   fused_mlp_routable)
        # One-shot widths always. Chunk-streamed widths (ViT-L/H image
        # shapes) only when TRAINING or forced: there the fused MLP's
        # custom_vjp stores only block inputs — what makes ViT-L/H fit HBM
        # (the inline XLA MLP under scan saves [L, B, S, 4W] gelu
        # intermediates, 12 GB at L bs64) — but for pure inference XLA is
        # faster (L bs64 full-encode same-process A/B: 793.9 XLA vs 729.3
        # regrid tile2 / 736.3 tile4 img/s; H: 337 vs 302 tiled), so
        # deterministic forwards route the XLA MLP. A checkpointed XLA
        # MLP (input-only residuals, like the regrid vjp) beat the regrid
        # in ISOLATED fwd+grad A/Bs at every wide shape (L224 13.17 vs
        # 13.99 ms, L336 8.15 vs 8.48, H 6.17 vs 6.54) but measured
        # NEUTRAL-to-SLOWER in the full train step (L224 176.5 vs 176.9,
        # L336 63.9 vs 63.7, H 77.3 vs 79.3 pairs/s — the checkpoint
        # boundary defeats scheduling/fusion wins the kernel path keeps),
        # so the regrid stays routed for wide training forwards.
        # Batch-dependent gates must see the batch the kernel EXECUTES at:
        # under pp that is the per-data-shard microbatch, not the global b.
        gate_b = x.shape[0]
        if options.pp > 1:
            from nans_clip_tpu.parallel.pp import pp_kernel_batch
            gate_b = pp_kernel_batch(x.shape[0], options.pp,
                                     options.pp_microbatches)
        use_fused_mlp = fused_mlp_routable(
            gate_b, x.shape[1], cfg.width, 4 * cfg.width,
            jnp.dtype(x.dtype).itemsize) and (
                fits_fused_mlp_oneshot(x.shape[1], cfg.width)
                or options.attn_impl == "fused"
                or not options.deterministic)
        # ViT-H class: the wide fused kernel only pays in TRAINING — its
        # custom_vjp stores block inputs where the XLA path scan-saves
        # [L, B, H, S, S] fp32 probs (an HBM OOM) — while for inference
        # XLA is faster (337 vs 323 img/s at bs16: the dh=80 per-head
        # shapes underfill the lanes). 'auto' therefore routes wide fused
        # only when training (non-deterministic); explicit "fused" forces.
        use_wide = fits_fused_wide(x.shape[1], cfg.width) and (
            options.attn_impl == "fused" or not options.deterministic)
        use_fused = fits_fused(x.shape[1], cfg.width)
        # Long-seq training (ViT-L-336, S=577): the one-shot attention bwd
        # cell doesn't fit VMEM (74MB > the 48MB gate), so the backward
        # runs the head-chunked bwd kernel (hpc=4 at the relaxed 24MB
        # budget — same-process block fwd+grad 9.709 ms, the best of
        # flash-block 11.024 / XLA-recompute 15.6 / hpc 2/8 variants).
        # Only when the chunked cell doesn't fit either does 'auto' route
        # the flash-block path (ops/attention.py custom_vjp: per-layer
        # x/ctx/lse residuals, no [B,H,S,S] probs), which beat the
        # XLA-recompute vjp 12.3 vs 15.6 ms and trains L-336 at 63.7
        # pairs/s where plain AD through the flash kernel OOMed.
        if (use_fused and not options.deterministic
                and not fused_interpret):
            from nans_clip_tpu.ops.fused_block_bwd import (
                attn_bwd_head_chunk, fits_attention_bwd)
            if (not fits_attention_bwd(x.shape[1], cfg.width, heads)
                    and attn_bwd_head_chunk(x.shape[1], cfg.width,
                                            heads) is None):
                use_fused = False
                use_flash_train = True

    # Deterministic forwards at one-shot shapes: the whole-LAYER kernel
    # (attn + MLP in one pallas_call, ops/layer_kernel.py) removes the
    # hidden-state HBM round trip between the sub-blocks and halves the
    # launches. Training keeps the split (per-sub-block custom_vjps).
    # Whole-LAYER training backward (ops/layer_bwd.py, r4): one combined
    # attn+MLP bwd pallas_call per layer keeps the inter-sub-block dx in
    # VMEM. Routed by the measured LAYER_BWD_ROUTE gate (NANS_LAYER_BWD
    # overrides for drives); forward stays the shipping two kernels.
    use_layer_train = False
    if use_fused and use_fused_mlp and not options.deterministic:
        from nans_clip_tpu.ops.layer_bwd import route_layer_bwd
        use_layer_train = route_layer_bwd(x.shape[1], cfg.width, heads,
                                          4 * cfg.width,
                                          jnp.dtype(x.dtype).itemsize)

    use_layer = False
    if use_fused and use_fused_mlp and options.deterministic:
        from nans_clip_tpu.ops.layer_kernel import (fused_layer_block,
                                                    route_layer)
        lb = x.shape[0]
        if options.pp > 1:
            from nans_clip_tpu.parallel.pp import pp_kernel_batch
            lb = pp_kernel_batch(x.shape[0], options.pp,
                                 options.pp_microbatches)
        use_layer = route_layer(lb, x.shape[1], cfg.width,
                                4 * cfg.width, jnp.dtype(x.dtype).itemsize)

    def block(x, lp):
        if use_layer_train:
            from nans_clip_tpu.ops.layer_bwd import fused_layer_train
            return fused_layer_train(
                x, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"], lp["attn"]["wo"],
                lp["attn"]["bo"], lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                lp["mlp"]["w1"], lp["mlp"]["b1"], lp["mlp"]["w2"],
                lp["mlp"]["b2"], heads, "quick_gelu", 1e-5, fused_interpret)
        if use_layer:
            return fused_layer_block(
                x, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"], lp["attn"]["wo"],
                lp["attn"]["bo"], lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                lp["mlp"]["w1"], lp["mlp"]["b1"], lp["mlp"]["w2"],
                lp["mlp"]["b2"], heads, 1e-5, "quick_gelu", False,
                interpret=fused_interpret)
        if use_fused:
            x = fused_attention_block(x, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                                      lp["attn"]["wqkv"], lp["attn"]["bqkv"],
                                      lp["attn"]["wo"], lp["attn"]["bo"], heads,
                                      interpret=fused_interpret)
        elif use_wide:
            # single-sample cells, 4 heads/chunk: the batch-tiled regrid
            # MEASURED SLOWER (277 vs 323 img/s at H bs16 — the
            # (T, H, S, 80) ctx scratch relayout dominates what the
            # T-fold weight-stream amortization saves); the batched
            # kernel stays available as the tested opt-in batch_tile > 1.
            x = fused_attention_block_wide(
                x, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"],
                lp["attn"]["wo"], lp["attn"]["bo"], heads, 1e-5,
                4, fused_interpret, 1)
        elif use_flash_train:
            # Block-level custom_vjp: stores only x/ctx/lse and recomputes
            # LN+QKV in bwd — plain AD through the flash kernel saved the
            # padded per-head q/k/v/o under the scan (17.6 GB at bs32 OOM).
            from nans_clip_tpu.ops.attention import flash_attention_block
            x = flash_attention_block(
                x, lp["ln_1"]["scale"], lp["ln_1"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"], lp["attn"]["wo"],
                lp["attn"]["bo"], heads, 1e-5, 128, fused_interpret)
        else:
            impl = "xla" if options.attn_impl in ("fused", "auto") else options.attn_impl
            x = x + mha(layer_norm(x, **lp["ln_1"]), lp["attn"], heads, impl=impl)
        if use_fused_mlp:
            return fused_mlp_block(x, lp["ln_2"]["scale"], lp["ln_2"]["bias"],
                                   lp["mlp"]["w1"], lp["mlp"]["b1"],
                                   lp["mlp"]["w2"], lp["mlp"]["b2"],
                                   "quick_gelu", interpret=fused_interpret)
        h = layer_norm(x, **lp["ln_2"])
        h = quick_gelu(h @ lp["mlp"]["w1"] + lp["mlp"]["b1"])
        h = h @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
        return x + h

    body = jax.checkpoint(block) if options.remat else block

    if options.pp > 1:
        # Pipeline the stacked blocks over the 'pipe' mesh axis
        # (parallel/pp.py): each stage scans its own L/pp layers, the
        # activation rides a ppermute ring. The block body (incl. any
        # fused-kernel routing above) is unchanged.
        from nans_clip_tpu.parallel.pp import pp_transformer

        def stage_fn(state, local_params, stage, mb_idx, aux_mb):
            out, _ = jax.lax.scan(lambda c, lp: (body(c, lp), None),
                                  state, local_params)
            return out

        x = pp_transformer(x, params["transformer"], stage_fn, options.pp,
                           options.pp_microbatches)
    else:
        x, _ = jax.lax.scan(lambda c, lp: (body(c, lp), None), x,
                            params["transformer"])

    x = layer_norm(x[:, 0, :], **params["ln_post"])
    return x @ params["proj"]
