"""Chinese BERT/RoBERTa text tower (functional, scan-over-layers).

Behavioral twin of the reference's HF-lineage encoder
(cn_clip/clip/modeling_bert.py): word+position+type embeddings with
LayerNorm eps 1e-12 (modeling_bert.py:62-91), post-LN self-attention and
MLP sub-blocks with erf-GELU, additive ``(1 - mask) * -10000`` padding bias
(modeling_bert.py:450-458), pooler omitted (modeling_bert.py:427,480-481).
The unused MLM/NSP pretraining heads are intentionally not carried over.

TPU redesign: fused-QKV attention through the Pallas kernel, layers
parameter-stacked under ``lax.scan`` with optional per-layer remat
(reference modeling_bert.py:266-267 used torch checkpointing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nans_clip_tpu.configs import TextConfig
from nans_clip_tpu.models.common import ModelOptions, cast_tree, normal
from nans_clip_tpu.ops import ACT2FN, dropout, layer_norm, mha


def init_bert(rng: jax.Array, cfg: TextConfig) -> dict:
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    std = cfg.initializer_range
    keys = jax.random.split(rng, 9)
    return {
        "embeddings": {
            "word": normal(keys[0], (cfg.vocab_size, h), std),
            "position": normal(keys[1], (cfg.max_position_embeddings, h), std),
            "token_type": normal(keys[2], (cfg.type_vocab_size, h), std),
            "ln": {"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))},
        },
        "encoder": {
            "attn": {
                "wqkv": normal(keys[3], (L, h, 3 * h), std),
                "bqkv": jnp.zeros((L, 3 * h)),
                "wo": normal(keys[4], (L, h, h), std),
                "bo": jnp.zeros((L, h)),
            },
            "attn_ln": {"scale": jnp.ones((L, h)), "bias": jnp.zeros((L, h))},
            "mlp": {
                "w1": normal(keys[5], (L, h, i), std),
                "b1": jnp.zeros((L, i)),
                "w2": normal(keys[6], (L, i, h), std),
                "b2": jnp.zeros((L, h)),
            },
            "mlp_ln": {"scale": jnp.ones((L, h)), "bias": jnp.zeros((L, h))},
        },
    }


def bert_features(params: dict, input_ids: jax.Array,
                  attention_mask: Optional[jax.Array], cfg: TextConfig,
                  options: ModelOptions = ModelOptions(),
                  rng: Optional[jax.Array] = None,
                  token_type_ids: Optional[jax.Array] = None) -> jax.Array:
    """Sequence output [B, S, H]. ``attention_mask``: [B, S] 1=keep, 0=pad."""
    assert options.tp == 1 or options.pp == 1, \
        "tp>1 and pp>1 are mutually exclusive"
    params = cast_tree(params, options)
    b, s = input_ids.shape
    emb = params["embeddings"]

    x = emb["word"][input_ids]
    x = x + emb["position"][:s][None, :, :]
    if token_type_ids is None:
        x = x + emb["token_type"][0][None, None, :]
    else:
        x = x + emb["token_type"][token_type_ids]
    x = layer_norm(x, **emb["ln"], eps=cfg.layer_norm_eps)

    det = options.deterministic or rng is None
    if not det:
        rng, erng = jax.random.split(rng)
        x = dropout(x, cfg.hidden_dropout_prob, erng, det)

    key_bias = None
    if attention_mask is not None:
        key_bias = (1.0 - attention_mask.astype(jnp.float32)) * -10000.0

    act = ACT2FN[cfg.hidden_act]
    heads = cfg.num_attention_heads
    hd, ad = cfg.hidden_dropout_prob, cfg.attention_probs_dropout_prob

    # Fused attention sub-block (Pallas) when dropout is off: LN/QKV/probs/
    # ctx stay in VMEM (see ops/fused_block.py); dropout training uses the
    # unfused path.
    on_tpu = jax.default_backend() == "tpu"
    # Training with dropout stays fused ON TPU: the kernels draw keep masks
    # from the Mosaic PRNG and the bwd kernels re-seed the same stream
    # (ops/fused_block_bwd.py). Off-TPU there is no hardware PRNG, so
    # non-deterministic mode falls back to the unfused XLA dropout path.
    use_fused = (det or on_tpu) and (options.attn_impl == "fused" or (
        options.attn_impl == "auto" and on_tpu))
    if options.tp > 1:
        # only the deterministic TP branch above runs kernels per-shard;
        # dropout training under TP must take the annotation-sharded XLA
        # path — a pallas_call on the globally-sharded arrays would make
        # GSPMD gather/replicate them, silently defeating the TP split
        use_fused = False
    # explicit "fused" off-TPU (CPU test meshes) runs in interpreter mode
    fused_interpret = not on_tpu

    def _tower_route(q: bool) -> bool:
        # THE single whole-tower routing predicate — used both to decide
        # whether int8 params can stream directly (below) and to take the
        # route itself (the mega-kernel branch). `use_fused` is read at
        # call time; the later fits_fused refinement is folded in
        # explicitly so both call sites agree.
        from nans_clip_tpu.ops.fused_block import fits_fused
        from nans_clip_tpu.ops.tower_kernel import fits_tower
        return (use_fused and det and cfg.hidden_act == "gelu"
                and options.pp == 1 and options.tp == 1
                and fits_fused(s, cfg.hidden_size)
                and fits_tower(b, s, cfg.hidden_size, cfg.intermediate_size,
                               jnp.dtype(x.dtype).itemsize, quant=q))

    # int8-quantized serving params (utils/quantize.py): only the
    # whole-tower kernel streams them directly (half the weight HBM bytes
    # — the batch-1 bottleneck); any other path dequantizes up front and
    # runs the normal routing unchanged.
    from nans_clip_tpu.utils.quantize import (dequantize_layer_tree,
                                              layer_tree_quantized)
    quant = layer_tree_quantized(params["encoder"])
    if quant and not _tower_route(True):
        params = dict(params)
        params["encoder"] = dequantize_layer_tree(params["encoder"], x.dtype)
        quant = False

    if options.tp > 1 and det:
        # Tensor parallel (deterministic path): shard_map head/column-split
        # sub-blocks over the 'model' axis (parallel/tp.py). Dropout
        # training under TP uses the annotation-sharded unfused path below.
        from nans_clip_tpu.ops.fused_block import fits_fused, fits_fused_mlp
        from nans_clip_tpu.parallel.tp import tp_attention_block, tp_mlp_block
        h_sz = cfg.hidden_size
        a_impl = "fused" if (use_fused and fits_fused(s, h_sz)) else "xla"
        m_impl = "fused" if (use_fused and fits_fused_mlp(s, h_sz)
                             and cfg.hidden_act == "gelu") else "xla"

        def tp_layer(carry, lp):
            x, idx = carry
            x = tp_attention_block(
                x, lp["attn_ln"]["scale"], lp["attn_ln"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"], lp["attn"]["wo"],
                lp["attn"]["bo"], heads, options.tp, eps=cfg.layer_norm_eps,
                post_ln=True, key_bias=key_bias, impl=a_impl,
                interpret=fused_interpret)
            x = tp_mlp_block(
                x, lp["mlp_ln"]["scale"], lp["mlp_ln"]["bias"],
                lp["mlp"]["w1"], lp["mlp"]["b1"], lp["mlp"]["w2"],
                lp["mlp"]["b2"], cfg.hidden_act, options.tp,
                eps=cfg.layer_norm_eps, post_ln=True, impl=m_impl,
                interpret=fused_interpret)
            return (x, idx + 1), None

        body = jax.checkpoint(tp_layer) if options.remat else tp_layer
        (x, _), _ = jax.lax.scan(body, (x, 0), params["encoder"])
        return x

    use_fused_mlp = False
    if use_fused:
        from nans_clip_tpu.ops.fused_block import (fits_fused,
                                                   fits_fused_mlp_oneshot,
                                                   fused_bert_attention_block,
                                                   fused_mlp_block)
        from nans_clip_tpu.ops.fused_block_bwd import (fits_bert_attention_bwd,
                                                       fits_fused_mlp_bwd)
        use_fused_mlp = (fits_fused_mlp_oneshot(s, cfg.hidden_size)
                         and cfg.hidden_act == "gelu")
        use_fused = fits_fused(s, cfg.hidden_size)
        if not det:  # dropout active: the bwd kernels must also fit VMEM
            use_fused = use_fused and fits_bert_attention_bwd(
                s, cfg.hidden_size, heads)
            use_fused_mlp = use_fused_mlp and fits_fused_mlp_bwd(
                s, cfg.hidden_size)

    # Low-latency serving: whole-tower mega-kernel (ONE pallas_call for all
    # L layers — ops/tower_kernel.py), deterministic forwards only.
    if _tower_route(quant):
        from nans_clip_tpu.ops.tower_kernel import fused_tower
        enc = params["encoder"]
        return fused_tower(
            x, key_bias, enc["attn_ln"]["scale"], enc["attn_ln"]["bias"],
            enc["attn"]["wqkv"], enc["attn"]["bqkv"], enc["attn"]["wo"],
            enc["attn"]["bo"], enc["mlp_ln"]["scale"],
            enc["mlp_ln"]["bias"], enc["mlp"]["w1"], enc["mlp"]["b1"],
            enc["mlp"]["w2"], enc["mlp"]["b2"], heads,
            cfg.layer_norm_eps, "gelu", True, interpret=fused_interpret)

    # Deterministic forwards at one-shot shapes: whole-layer kernel (see
    # models/vit.py note; ops/layer_kernel.py).
    use_layer = False
    if use_fused and use_fused_mlp and det and cfg.hidden_act == "gelu":
        from nans_clip_tpu.ops.layer_kernel import (fused_layer_block,
                                                    route_layer)
        # under pp the kernel executes at the per-shard microbatch, so the
        # batch-dependent tile gate must be evaluated there
        lb = b
        if options.pp > 1:
            from nans_clip_tpu.parallel.pp import pp_kernel_batch
            lb = pp_kernel_batch(b, options.pp, options.pp_microbatches)
        use_layer = route_layer(lb, s, cfg.hidden_size,
                                cfg.intermediate_size,
                                jnp.dtype(x.dtype).itemsize)

    def layer(carry, lp, kb, mb_idx=None, shard_idx=None):
        x, idx = carry
        if use_layer:
            x = fused_layer_block(
                x, lp["attn_ln"]["scale"], lp["attn_ln"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"], lp["attn"]["wo"],
                lp["attn"]["bo"], lp["mlp_ln"]["scale"], lp["mlp_ln"]["bias"],
                lp["mlp"]["w1"], lp["mlp"]["b1"], lp["mlp"]["w2"],
                lp["mlp"]["b2"], heads, cfg.layer_norm_eps, "gelu", True,
                key_bias=kb, interpret=fused_interpret)
            return (x, idx + 1), None
        if det:
            a_rng = h1 = h2 = seed_a = seed_m = None
        else:
            lrng = jax.random.fold_in(rng, idx)
            if mb_idx is not None:  # decorrelate pipeline microbatches
                lrng = jax.random.fold_in(lrng, mb_idx)
            if shard_idx is not None:  # ...and data shards: inside the pp
                # shard_map the closed-over rng is replicated, so without
                # this every data shard would draw identical dropout masks
                lrng = jax.random.fold_in(lrng, shard_idx)
            a_rng, h1, h2 = jax.random.split(lrng, 3)
            # int32 seeds for the in-kernel Mosaic PRNG (offset per sample
            # inside the kernel); independent draws per layer and sub-block
            seed_a = jax.random.randint(a_rng, (), 0, 2 ** 31 - 1, jnp.int32)
            seed_m = jax.random.randint(h2, (), 0, 2 ** 31 - 1, jnp.int32)
        if use_fused:
            x = fused_bert_attention_block(
                x, lp["attn_ln"]["scale"], lp["attn_ln"]["bias"],
                lp["attn"]["wqkv"], lp["attn"]["bqkv"],
                lp["attn"]["wo"], lp["attn"]["bo"], kb, heads,
                cfg.layer_norm_eps, interpret=fused_interpret,
                attn_dropout=0.0 if det else ad,
                hidden_dropout=0.0 if det else hd, seed=seed_a)
        else:
            impl = "xla" if options.attn_impl in ("fused", "auto") else options.attn_impl
            a = mha(x, lp["attn"], heads, kb, impl=impl,
                    dropout_rate=ad, dropout_rng=a_rng, deterministic=det)
            a = dropout(a, hd, h1, det)
            x = layer_norm(x + a, **lp["attn_ln"], eps=cfg.layer_norm_eps)
        if use_fused_mlp:
            x = fused_mlp_block(x, lp["mlp_ln"]["scale"], lp["mlp_ln"]["bias"],
                                lp["mlp"]["w1"], lp["mlp"]["b1"],
                                lp["mlp"]["w2"], lp["mlp"]["b2"],
                                "gelu", cfg.layer_norm_eps, True,
                                fused_interpret,
                                0.0 if det else hd, seed_m)
        else:
            h = act(x @ lp["mlp"]["w1"] + lp["mlp"]["b1"])
            h = h @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
            h = dropout(h, hd, h2, det)
            x = layer_norm(x + h, **lp["mlp_ln"], eps=cfg.layer_norm_eps)
        return (x, idx + 1), None

    if options.pp > 1:
        # Pipeline the encoder layers over the 'pipe' mesh axis
        # (parallel/pp.py). The key bias rides as the microbatched aux;
        # the per-layer rng folds in the GLOBAL layer index (stage offset
        # + local position) and the microbatch index.
        from nans_clip_tpu.parallel.mesh import DATA_AXIS
        from nans_clip_tpu.parallel.pp import pp_transformer
        l_total = params["encoder"]["attn"]["bo"].shape[0]
        l_local = l_total // options.pp
        masked = key_bias is not None

        def stage_fn(state, local_params, stage, mb_idx, aux_mb):
            kb = aux_mb if masked else None
            didx = jax.lax.axis_index(DATA_AXIS)

            def body(c, lp):
                return layer(c, lp, kb, mb_idx, didx)

            if options.remat:
                body = jax.checkpoint(body)
            (out, _), _ = jax.lax.scan(body, (state, stage * l_local),
                                       local_params)
            return out

        return pp_transformer(x, params["encoder"], stage_fn, options.pp,
                              options.pp_microbatches, aux=key_bias)

    def body(c, lp):
        return layer(c, lp, key_bias)

    if options.remat:
        body = jax.checkpoint(body)
    (x, _), _ = jax.lax.scan(body, (x, 0), params["encoder"])
    return x
