"""PyTorch checkpoint <-> JAX pytree conversion.

Lets the 5 published CN-CLIP ``.pt`` checkpoints load directly into this
framework, and lets our checkpoints be exported back to the reference's
``state_dict`` layout.

Handles (reference semantics in parens):
* ``module.`` prefix stripping and ``bert.pooler`` dropping
  (clip/utils.py:213-215, clip/model.py:480);
* both attention layouts — separate ``in_proj``/``query,key,value`` and
  flash-attn fused ``Wqkv`` (clip/model.py:493-548) — normalized into our
  single fused-QKV layout;
* torch OIHW conv kernels -> JAX HWIO, torch [out,in] Linear weights ->
  [in,out];
* fp16-stored weights -> fp32;
* bicubic positional-embedding resize for resolution changes, numerically
  matching ``F.interpolate(mode='bicubic', align_corners=True)``
  (clip/model.py:551-582).

Pure numpy except for reading/writing ``.pt`` files (torch CPU only).
"""

from __future__ import annotations

import math
import re
from typing import Dict, Optional, Tuple

import numpy as np

from nans_clip_tpu.configs import CLIPConfig

# --------------------------------------------------------------------------
# .pt IO
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {key: float32 numpy array}."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return normalize_state_dict({k: v for k, v in obj.items()})


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray], meta: Optional[dict] = None):
    """Write a reference-layout checkpoint ``{"state_dict": ..., **meta}``."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()}
    torch.save({"state_dict": sd, **(meta or {})}, path)


def normalize_state_dict(sd: dict) -> Dict[str, np.ndarray]:
    """Strip ``module.``, drop ``bert.pooler``, de-fuse flash-attn Wqkv keys,
    convert tensors to fp32 numpy. HF ``ChineseCLIPModel`` checkpoints
    (``vision_model.* / text_model.*`` keys) are detected and translated
    into the reference layout first, so every ``.pt`` entry point accepts
    both published formats."""
    from nans_clip_tpu.utils.hf_interop import (hf_to_reference_state_dict,
                                                is_hf_layout)

    if is_hf_layout(sd):
        sd = hf_to_reference_state_dict(sd)
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if "bert.pooler" in k:
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        else:
            v = np.asarray(v, dtype=np.float32)
        out[k] = v

    # visual tower: flash-attn fused layout -> torch MHA layout
    for k in list(out):
        if "attn.Wqkv.weight" in k:
            out[k.replace("attn.Wqkv.weight", "attn.in_proj_weight")] = out.pop(k)
        elif "attn.Wqkv.bias" in k:
            out[k.replace("attn.Wqkv.bias", "attn.in_proj_bias")] = out.pop(k)

    # bert tower: flash-attn fused layout -> separate q/k/v + output.dense
    i = 0
    while f"bert.encoder.layer.{i}.attention.self.Wqkv.weight" in out:
        base = f"bert.encoder.layer.{i}.attention"
        wq, wk, wv = np.split(out.pop(f"{base}.self.Wqkv.weight"), 3, axis=0)
        bq, bk, bv = np.split(out.pop(f"{base}.self.Wqkv.bias"), 3, axis=0)
        out[f"{base}.self.query.weight"], out[f"{base}.self.query.bias"] = wq, bq
        out[f"{base}.self.key.weight"], out[f"{base}.self.key.bias"] = wk, bk
        out[f"{base}.self.value.weight"], out[f"{base}.self.value.bias"] = wv, bv
        out[f"{base}.output.dense.weight"] = out.pop(f"{base}.self.out_proj.weight")
        out[f"{base}.output.dense.bias"] = out.pop(f"{base}.self.out_proj.bias")
        i += 1
    return out


# --------------------------------------------------------------------------
# pos-embed resize (torch-bicubic parity)
# --------------------------------------------------------------------------

def _cubic_weights(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (torch uses a = -0.75)."""
    ax = np.abs(x)
    w = np.where(ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
                 np.where(ax < 2, a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a, 0.0))
    return w


def _bicubic_1d(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] interpolation matrix, align_corners=True."""
    if n_in == 1:
        return np.ones((n_out, 1), np.float64)
    if n_out == 1:
        src = np.zeros(1)
    else:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    mat = np.zeros((n_out, n_in), np.float64)
    base = np.floor(src).astype(int)
    frac = src - base
    for off in (-1, 0, 1, 2):
        idx = np.clip(base + off, 0, n_in - 1)
        w = _cubic_weights(frac - off)
        np.add.at(mat, (np.arange(n_out), idx), w)
    return mat


def resize_grid_bicubic(grid: np.ndarray, new_hw: Tuple[int, int]) -> np.ndarray:
    """grid: [H, W, C] -> [H', W', C], torch bicubic align_corners=True."""
    h, w, _ = grid.shape
    mh = _bicubic_1d(h, new_hw[0])
    mw = _bicubic_1d(w, new_hw[1])
    out = np.einsum("oh,hwc->owc", mh, grid.astype(np.float64))
    out = np.einsum("pw,hwc->hpc", mw, out)
    return out.astype(grid.dtype)


def resize_pos_embed(pos: np.ndarray, new_grid: int, extra_tokens: int = 1) -> np.ndarray:
    """[(g0*g0)+extra, W] -> [(new_grid**2)+extra, W] (clip/model.py:551-582)."""
    if pos.shape[0] == new_grid * new_grid + extra_tokens:
        return pos
    tok, img = pos[:extra_tokens], pos[extra_tokens:]
    g0 = int(math.sqrt(img.shape[0]))
    grid = img.reshape(g0, g0, -1)
    grid = resize_grid_bicubic(grid, (new_grid, new_grid))
    return np.concatenate([tok, grid.reshape(new_grid * new_grid, -1)], axis=0)


# --------------------------------------------------------------------------
# torch state_dict -> pytree
# --------------------------------------------------------------------------

def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _vit_from_sd(sd: dict, cfg) -> dict:
    L, w = cfg.layers, cfg.width
    pos = sd["visual.positional_embedding"]
    if pos.shape[0] != cfg.seq_len:
        pos = resize_pos_embed(pos, cfg.grid_size)

    def stack(fmt, transpose=False):
        arrs = [sd[fmt.format(i)] for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    r = "visual.transformer.resblocks.{}"
    return {
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": pos,
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "transformer": {
            "ln_1": {"scale": stack(r + ".ln_1.weight"), "bias": stack(r + ".ln_1.bias")},
            "attn": {
                "wqkv": stack(r + ".attn.in_proj_weight", transpose=True),
                "bqkv": stack(r + ".attn.in_proj_bias"),
                "wo": stack(r + ".attn.out_proj.weight", transpose=True),
                "bo": stack(r + ".attn.out_proj.bias"),
            },
            "ln_2": {"scale": stack(r + ".ln_2.weight"), "bias": stack(r + ".ln_2.bias")},
            "mlp": {
                "w1": stack(r + ".mlp.c_fc.weight", transpose=True),
                "b1": stack(r + ".mlp.c_fc.bias"),
                "w2": stack(r + ".mlp.c_proj.weight", transpose=True),
                "b2": stack(r + ".mlp.c_proj.bias"),
            },
        },
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
    }


def _resnet_from_sd(sd: dict, cfg) -> Tuple[dict, dict]:
    def conv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}

    def bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
                {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]})

    params, stats = {}, {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = conv(f"visual.conv{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = bn(f"visual.bn{i}")

    for stage, blocks in enumerate(cfg.layers, start=1):
        bp_list, bs_list = [], []
        for i in range(blocks):
            base = f"visual.layer{stage}.{i}"
            p, s = {}, {}
            for j in (1, 2, 3):
                p[f"conv{j}"] = conv(f"{base}.conv{j}")
                p[f"bn{j}"], s[f"bn{j}"] = bn(f"{base}.bn{j}")
            if f"{base}.downsample.0.weight" in sd:
                dp, ds = bn(f"{base}.downsample.1")
                p["downsample"] = {"conv": conv(f"{base}.downsample.0"), "bn": dp}
                s["downsample_bn"] = ds
            bp_list.append(p)
            bs_list.append(s)
        params[f"layer{stage}"] = bp_list
        stats[f"layer{stage}"] = bs_list

    ap = "visual.attnpool"
    params["attnpool"] = {
        "positional_embedding": sd[f"{ap}.positional_embedding"],
        "q": {"kernel": sd[f"{ap}.q_proj.weight"].T, "bias": sd[f"{ap}.q_proj.bias"]},
        "k": {"kernel": sd[f"{ap}.k_proj.weight"].T, "bias": sd[f"{ap}.k_proj.bias"]},
        "v": {"kernel": sd[f"{ap}.v_proj.weight"].T, "bias": sd[f"{ap}.v_proj.bias"]},
        "c": {"kernel": sd[f"{ap}.c_proj.weight"].T, "bias": sd[f"{ap}.c_proj.bias"]},
    }
    return params, stats


def _bert_from_sd(sd: dict, cfg) -> dict:
    L = cfg.num_hidden_layers
    e = "bert.embeddings"

    def stack_qkv(i):
        base = f"bert.encoder.layer.{i}.attention.self"
        w = np.concatenate([sd[f"{base}.query.weight"].T, sd[f"{base}.key.weight"].T,
                            sd[f"{base}.value.weight"].T], axis=1)
        b = np.concatenate([sd[f"{base}.query.bias"], sd[f"{base}.key.bias"],
                            sd[f"{base}.value.bias"]])
        return w, b

    qkv = [stack_qkv(i) for i in range(L)]
    lyr = "bert.encoder.layer.{}"

    def stack(fmt, transpose=False):
        arrs = [sd[fmt.format(i)] for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs)

    return {
        "embeddings": {
            "word": sd[f"{e}.word_embeddings.weight"],
            "position": sd[f"{e}.position_embeddings.weight"],
            "token_type": sd[f"{e}.token_type_embeddings.weight"],
            "ln": _ln(sd, f"{e}.LayerNorm"),
        },
        "encoder": {
            "attn": {
                "wqkv": np.stack([w for w, _ in qkv]),
                "bqkv": np.stack([b for _, b in qkv]),
                "wo": stack(lyr + ".attention.output.dense.weight", transpose=True),
                "bo": stack(lyr + ".attention.output.dense.bias"),
            },
            "attn_ln": {"scale": stack(lyr + ".attention.output.LayerNorm.weight"),
                        "bias": stack(lyr + ".attention.output.LayerNorm.bias")},
            "mlp": {
                "w1": stack(lyr + ".intermediate.dense.weight", transpose=True),
                "b1": stack(lyr + ".intermediate.dense.bias"),
                "w2": stack(lyr + ".output.dense.weight", transpose=True),
                "b2": stack(lyr + ".output.dense.bias"),
            },
            "mlp_ln": {"scale": stack(lyr + ".output.LayerNorm.weight"),
                       "bias": stack(lyr + ".output.LayerNorm.bias")},
        },
    }


def params_from_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> Tuple[dict, dict]:
    """Convert a normalized reference state_dict into (params, batch_stats).

    Missing towers are left out of the result (e.g. a BERT-only checkpoint),
    mirroring ``restore_model``'s merge semantics (clip/model.py:468-490).
    """
    params: dict = {}
    stats: dict = {}
    if any(k.startswith("visual.") for k in sd):
        if cfg.is_resnet:
            params["visual"], stats = _resnet_from_sd(sd, cfg.vision)
        else:
            params["visual"] = _vit_from_sd(sd, cfg.vision)
    if any(k.startswith("bert.") for k in sd):
        params["bert"] = _bert_from_sd(sd, cfg.text)
    if "text_projection" in sd:
        params["text_projection"] = sd["text_projection"]
    if "logit_scale" in sd:
        params["logit_scale"] = sd["logit_scale"].reshape(())
    return params, stats


def merge_pretrained(params: dict, batch_stats: dict, cfg: CLIPConfig,
                     clip_sd: Optional[dict] = None,
                     bert_sd: Optional[dict] = None) -> Tuple[dict, dict]:
    """Initialize towers from separate CLIP-visual + Chinese-BERT state
    dicts (reference restore_model, clip/model.py:468-490)."""
    merged: Dict[str, np.ndarray] = {}
    if clip_sd:
        merged.update({k: v for k, v in clip_sd.items()
                       if k.startswith("visual") or k == "logit_scale"})
    if bert_sd:
        merged.update({k: v for k, v in bert_sd.items()
                       if k.startswith("bert") and "bert.pooler" not in k})
    loaded, loaded_stats = params_from_state_dict(merged, cfg)
    params = {**params, **loaded}
    if loaded_stats:
        batch_stats = loaded_stats
    return params, batch_stats


# --------------------------------------------------------------------------
# pytree -> torch state_dict (export)
# --------------------------------------------------------------------------

def state_dict_from_params(params: dict, cfg: CLIPConfig,
                           batch_stats: Optional[dict] = None) -> Dict[str, np.ndarray]:
    """Export our pytree to the reference's (non-flash) state_dict layout."""
    from nans_clip_tpu.utils.quantize import params_quantized
    if params_quantized(params):
        raise ValueError(
            "param tree is int8-quantized for serving; checkpoints are "
            "exported from the original weights — dequantize first "
            "(utils.quantize.dequantize_params) or export the tree you "
            "quantized from")
    sd: Dict[str, np.ndarray] = {}

    def put(key, val):
        sd[key] = np.asarray(val, dtype=np.float32)

    if "visual" in params:
        v = params["visual"]
        if cfg.is_resnet:
            _resnet_to_sd(v, batch_stats or {}, sd, put)
        else:
            put("visual.conv1.weight", np.transpose(v["conv1"]["kernel"], (3, 2, 0, 1)))
            put("visual.class_embedding", v["class_embedding"])
            put("visual.positional_embedding", v["positional_embedding"])
            put("visual.ln_pre.weight", v["ln_pre"]["scale"])
            put("visual.ln_pre.bias", v["ln_pre"]["bias"])
            t = v["transformer"]
            L = t["ln_1"]["scale"].shape[0]
            for i in range(L):
                r = f"visual.transformer.resblocks.{i}"
                put(f"{r}.ln_1.weight", t["ln_1"]["scale"][i])
                put(f"{r}.ln_1.bias", t["ln_1"]["bias"][i])
                put(f"{r}.attn.in_proj_weight", np.transpose(t["attn"]["wqkv"][i]))
                put(f"{r}.attn.in_proj_bias", t["attn"]["bqkv"][i])
                put(f"{r}.attn.out_proj.weight", np.transpose(t["attn"]["wo"][i]))
                put(f"{r}.attn.out_proj.bias", t["attn"]["bo"][i])
                put(f"{r}.ln_2.weight", t["ln_2"]["scale"][i])
                put(f"{r}.ln_2.bias", t["ln_2"]["bias"][i])
                put(f"{r}.mlp.c_fc.weight", np.transpose(t["mlp"]["w1"][i]))
                put(f"{r}.mlp.c_fc.bias", t["mlp"]["b1"][i])
                put(f"{r}.mlp.c_proj.weight", np.transpose(t["mlp"]["w2"][i]))
                put(f"{r}.mlp.c_proj.bias", t["mlp"]["b2"][i])
            put("visual.ln_post.weight", v["ln_post"]["scale"])
            put("visual.ln_post.bias", v["ln_post"]["bias"])
            put("visual.proj", v["proj"])

    if "bert" in params:
        b = params["bert"]
        e = b["embeddings"]
        put("bert.embeddings.word_embeddings.weight", e["word"])
        put("bert.embeddings.position_embeddings.weight", e["position"])
        put("bert.embeddings.token_type_embeddings.weight", e["token_type"])
        put("bert.embeddings.LayerNorm.weight", e["ln"]["scale"])
        put("bert.embeddings.LayerNorm.bias", e["ln"]["bias"])
        enc = b["encoder"]
        L = enc["attn"]["wqkv"].shape[0]
        h = enc["attn"]["wqkv"].shape[1]
        for i in range(L):
            base = f"bert.encoder.layer.{i}"
            wqkv = enc["attn"]["wqkv"][i]  # [H, 3H]
            bqkv = enc["attn"]["bqkv"][i]
            for j, name in enumerate(("query", "key", "value")):
                put(f"{base}.attention.self.{name}.weight", np.transpose(wqkv[:, j * h:(j + 1) * h]))
                put(f"{base}.attention.self.{name}.bias", bqkv[j * h:(j + 1) * h])
            put(f"{base}.attention.output.dense.weight", np.transpose(enc["attn"]["wo"][i]))
            put(f"{base}.attention.output.dense.bias", enc["attn"]["bo"][i])
            put(f"{base}.attention.output.LayerNorm.weight", enc["attn_ln"]["scale"][i])
            put(f"{base}.attention.output.LayerNorm.bias", enc["attn_ln"]["bias"][i])
            put(f"{base}.intermediate.dense.weight", np.transpose(enc["mlp"]["w1"][i]))
            put(f"{base}.intermediate.dense.bias", enc["mlp"]["b1"][i])
            put(f"{base}.output.dense.weight", np.transpose(enc["mlp"]["w2"][i]))
            put(f"{base}.output.dense.bias", enc["mlp"]["b2"][i])
            put(f"{base}.output.LayerNorm.weight", enc["mlp_ln"]["scale"][i])
            put(f"{base}.output.LayerNorm.bias", enc["mlp_ln"]["bias"][i])

    if "text_projection" in params:
        put("text_projection", params["text_projection"])
    if "logit_scale" in params:
        put("logit_scale", np.asarray(params["logit_scale"]).reshape(()))
    return sd


def _resnet_to_sd(v: dict, stats: dict, sd: dict, put):
    def conv_out(key, kernel):
        put(key, np.transpose(kernel, (3, 2, 0, 1)))

    def bn_out(key, p, s):
        # missing running stats (export without batch_stats) synthesize the
        # torch BatchNorm2d init: mean 0 / var 1 — for every BN, not just
        # the stem (block BNs used to KeyError on an empty stats dict)
        if not s:
            s = {"mean": 0 * p["bias"], "var": 0 * p["bias"] + 1}
        put(f"{key}.weight", p["scale"])
        put(f"{key}.bias", p["bias"])
        put(f"{key}.running_mean", s["mean"])
        put(f"{key}.running_var", s["var"])

    for i in (1, 2, 3):
        conv_out(f"visual.conv{i}.weight", v[f"conv{i}"]["kernel"])
        bn_out(f"visual.bn{i}", v[f"bn{i}"], stats.get(f"bn{i}", {}))
    for stage in range(1, 5):
        for i, (bp, bs) in enumerate(zip(v[f"layer{stage}"], stats.get(f"layer{stage}", [{}] * len(v[f"layer{stage}"])))):
            base = f"visual.layer{stage}.{i}"
            for j in (1, 2, 3):
                conv_out(f"{base}.conv{j}.weight", bp[f"conv{j}"]["kernel"])
                bn_out(f"{base}.bn{j}", bp[f"bn{j}"], bs.get(f"bn{j}", {}))
            if "downsample" in bp:
                conv_out(f"{base}.downsample.0.weight", bp["downsample"]["conv"]["kernel"])
                bn_out(f"{base}.downsample.1", bp["downsample"]["bn"], bs.get("downsample_bn", {}))
    ap = v["attnpool"]
    put("visual.attnpool.positional_embedding", ap["positional_embedding"])
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("c", "c_proj")):
        put(f"visual.attnpool.{theirs}.weight", np.transpose(ap[ours]["kernel"]))
        put(f"visual.attnpool.{theirs}.bias", ap[ours]["bias"])
