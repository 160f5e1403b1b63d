"""Weight-only int8 quantization for low-latency serving.

Rationale: batch-1/low-batch serving through the whole-tower mega-kernel
(ops/tower_kernel.py) is weight-STREAMING bound — every call reads the
full stacked layer weights from HBM (RoBERTa-base ~14 MB/layer, ViT-H
~39 MB/layer) while the per-layer matmul work at batch 1 is far below
the DMA time. Storing the four big weight matrices per layer (wqkv, wo,
w1, w2) as int8 with a per-output-channel fp32 scale halves the streamed
bytes; the kernel dequantizes in VMEM (int8 -> fp32 * scale -> bf16, a
VPU op that overlaps the next layer's weight DMA in the double-buffered
grid pipeline). The MXU math is unchanged bf16 — this deliberately does
NOT use int8 matmuls: a direct Pallas probe measured bf16 and int8 at
identical MXU rates on v5e (PARITY.md int8 note), so the only win
available is bandwidth, which is exactly what batch-1 serving pays.

This is the TPU analog of the reference deployment path's quantized
TensorRT engines (reference cn_clip/deploy/onnx_to_tensorrt.py --fp16;
TRT's int8 mode is the same weight-compression lever). Opt-in:
``quantize_for_serving(params)`` returns a new param tree; every encode
entry point accepts it (non-tower paths transparently dequantize).

Layout: a quantized weight leaf is the dict
    {"int8": int8[..., in, out], "scale": fp32[..., 1, out]}
(per-OUTPUT-channel symmetric scales — the max over the contraction axis
— so dequantization broadcasts over rows). LayerNorms, biases,
embeddings and projections stay in the original dtype: they are a
rounding error of the streamed bytes and carry most of the precision
sensitivity.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# the four streamed-bulk weight leaves of one stacked encoder-layer tree
# (identical names in the ViT tree models/vit.py and the BERT tree
# models/bert.py)
_QUANT_LEAVES = (("attn", "wqkv"), ("attn", "wo"), ("mlp", "w1"),
                 ("mlp", "w2"))


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8: scale = max|w| over the
    contraction (second-to-last) axis / 127."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(a, 1e-12) / 127.0
    q = jnp.clip(jnp.rint(w.astype(jnp.float32) / scale), -127, 127)
    return {"int8": q.astype(jnp.int8), "scale": scale}


def dequantize_weight(d: Dict[str, jax.Array], dtype) -> jax.Array:
    return (d["int8"].astype(jnp.float32) * d["scale"]).astype(dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and "int8" in leaf and "scale" in leaf


def quantize_layer_tree(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the four weight leaves of a stacked encoder-layer tree
    ({"attn": {...}, "mlp": {...}, ...}); everything else unchanged."""
    if layer_tree_quantized(tree):
        raise ValueError(
            "tree is already int8-quantized; quantization is not "
            "idempotent (and must come AFTER any LoRA merge — "
            "merge_lora cannot apply deltas to int8 leaves)")
    out = dict(tree)
    for grp, name in _QUANT_LEAVES:
        out[grp] = dict(out[grp])
        out[grp][name] = quantize_weight(tree[grp][name])
    return out


def dequantize_layer_tree(tree: Dict[str, Any], dtype) -> Dict[str, Any]:
    out = dict(tree)
    for grp, name in _QUANT_LEAVES:
        leaf = tree[grp][name]
        if is_quantized(leaf):
            out[grp] = dict(out[grp])
            out[grp][name] = dequantize_weight(leaf, dtype)
    return out


def layer_tree_quantized(tree: Dict[str, Any]) -> bool:
    return is_quantized(tree["attn"]["wqkv"])


def params_quantized(params: Dict[str, Any]) -> bool:
    """True if either tower's stacked encoder carries int8 leaves."""
    for tower_keys in (("visual", "transformer"), ("bert", "encoder")):
        node = params
        for k in tower_keys:
            node = node.get(k) if isinstance(node, dict) else None
            if node is None:
                break
        if node is not None and "attn" in node and layer_tree_quantized(node):
            return True
    return False


def dequantize_params(params: Dict[str, Any], dtype=None) -> Dict[str, Any]:
    """Inverse of :func:`quantize_for_serving` up to int8 rounding: every
    quantized stack goes back to dense weights (for checkpoint export or
    paths that need plain arrays). ``dtype`` defaults to fp32."""
    import jax.numpy as _jnp
    dtype = dtype or _jnp.float32
    out = dict(params)
    for outer, inner in (("visual", "transformer"), ("bert", "encoder")):
        if outer in out and isinstance(out[outer], dict) \
                and inner in out[outer] and "attn" in out[outer][inner] \
                and layer_tree_quantized(out[outer][inner]):
            out[outer] = dict(out[outer])
            out[outer][inner] = dequantize_layer_tree(out[outer][inner], dtype)
    return out


def towers_for_mode(mode: str):
    """Map a CLI ``--quantize`` mode to the tower set: ``int8`` = both,
    ``int8-text`` = text only (the measured batch-1 win — image towers
    are compute-bound, see the module docstring)."""
    if mode == "int8":
        return ("text", "image")
    if mode == "int8-text":
        return ("text",)
    raise ValueError(f"unknown quantize mode: {mode!r}")


def quantize_for_serving(params: Dict[str, Any],
                         towers=("text", "image")) -> Dict[str, Any]:
    """Quantize a CLIP param tree's transformer stacks for serving.

    ``towers`` selects which stacks to quantize: "text" = the BERT tower
    (``params["bert"]["encoder"]``), "image" = the ViT tower
    (``params["visual"]["transformer"]``; ResNet towers have no stacked
    transformer and are left untouched). The result feeds every encode/
    forward entry point: the whole-tower serving kernel streams int8
    directly; all other paths dequantize on entry (models/vit.py,
    models/bert.py).

    Measured batch-1 guidance (v5e, PARITY.md): TEXT towers are
    weight-DMA bound and win decisively (1.21x at W=768/L12, 1.45x at
    W=1024/L24); image towers' longer rows make the cell compute-bound,
    measured 1.03x at ViT-B (S=197) and 0.89x at ViT-H (S=257, W=1280)
    where the in-VMEM dequant lands on the critical path. For mixed
    deployments quantize the text tower only: ``towers=("text",)``.
    """
    unknown = set(towers) - {"text", "image"}
    if unknown:
        raise ValueError(f"unknown towers: {sorted(unknown)}")
    out = dict(params)
    if "image" in towers and "visual" in out and isinstance(out["visual"], dict) \
            and "transformer" in out["visual"]:
        out["visual"] = dict(out["visual"])
        out["visual"]["transformer"] = quantize_layer_tree(
            out["visual"]["transformer"])
    if "text" in towers and "bert" in out and "encoder" in out["bert"]:
        out["bert"] = dict(out["bert"])
        out["bert"]["encoder"] = quantize_layer_tree(out["bert"]["encoder"])
    return out
