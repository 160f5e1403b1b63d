"""LoRA-trainer trajectory parity against the reference's OWN script.

Completes the trainer-equivalence story (test_train_parity.py covers the
production trainer): the fork's root-level ``train_lora.py`` runs
UNMODIFIED on CPU via ``tests/_shims/run_ref_lora.py`` (lmdb/torchvision
shims, CUDA no-ops, seeded, data order pinned sequential — see the shim
docstring) over a reference-built LMDB split, from a shared fp16-rounded
base checkpoint and a CAPTURED LoRA init (an ``--epochs 0`` run saves
``lora_final.pt`` before any training, and both runs are identically
seeded up to injection). Our side then reproduces the trajectory with the
reference's EXACT update-wise LR sequence injected:

* per-epoch average training loss (the only loss granularity the script
  logs — its ``training_log.csv``);
* the logged per-epoch LR (torch ``LambdaLR`` semantics: the first update
  runs at lr=0, and the cosine horizon is the script's
  ``epochs*(len//bs+1)`` MICRO-batch count even though it steps per
  UPDATE — quirks reproduced verbatim here);
* final LoRA parameters, leaf-wise.

What this catches that unit tests cannot: the LoRA merge semantics
(out_proj-only ViT injection + query/value BERT injection, alpha/r
scaling into the fused wqkv layout), label-smoothed InfoNCE equivalence
(train_lora.py:96-110 vs parallel/loss.py), the feature-concat
accumulation protocol (train_lora.py:242-269 vs our scan+checkpoint),
and AdamW-on-adapters with decay on ALL LoRA leaves (torch defaults
b2=0.999, eps=1e-8).

Known deliberate divergence (documented in training/train_lora.py): our
CLI's cosine_with_warmup gives a non-zero first-step LR and counts
UPDATE steps for the horizon; this test injects the reference's schedule
to pin everything else. The base checkpoint is saved pre-rounded through
fp16 because the reference's ``create_model`` converts weights to fp16
before loading (utils.py:210) and ``model.float()`` after — pre-rounding
makes both sides' effective base weights bit-identical without
replicating the per-leaf conversion set.
"""

import base64
import filecmp
import io
import json
import math
import os
import pickle
import shutil
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import REFERENCE, requires_reference  # noqa: E402
from tests.ref_loader import load_reference_clip, tiny_config  # noqa: E402

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_shims")
RUN_REF_LORA = os.path.join(SHIMS, "run_ref_lora.py")

pytestmark = requires_reference

# ---- shared hyperparameters -------------------------------------------------
RES = 224                 # load_from_name("ViT-B-16") hardcodes 224
CONTEXT = 52              # LMDBDataset max_txt_length default
N_IMGS, N_TEXTS = 8, 16
BS, ACCUM = 4, 2          # 4 microbatches/epoch -> 2 updates/epoch
EPOCHS = 2
RANK, ALPHA = 4, 16.0
LR, WD = 1e-3, 0.05
WRATIO = 0.2
# the script's horizon formula (train_lora.py:187): MICRO-batch count + 1
REF_TOTAL = EPOCHS * (N_TEXTS // BS + 1)          # 10
REF_WARMUP = int(REF_TOTAL * WRATIO)              # 2
UPDATES_PER_EPOCH = (N_TEXTS // BS) // ACCUM      # 2

VISION_JSON = {
    "embed_dim": 64,
    "image_resolution": RES,
    "vision_layers": 2,
    "vision_width": 64,
    "vision_patch_size": 32,
    "vision_head_width": 32,
}
TEXT_JSON = {
    "vocab_size": 21128,
    "text_attention_probs_dropout_prob": 0.0,
    "text_hidden_act": "gelu",
    "text_hidden_dropout_prob": 0.0,
    "text_hidden_size": 64,
    "text_initializer_range": 0.02,
    "text_intermediate_size": 128,
    "text_max_position_embeddings": 512,
    "text_num_attention_heads": 4,
    "text_num_hidden_layers": 2,
    "text_type_vocab_size": 2,
}
KWARGS = {**VISION_JSON, **TEXT_JSON}


def _ref_lr(update: int) -> float:
    """train_lora.py:189-195 verbatim (LambdaLR: factor at update index)."""
    if update < REF_WARMUP:
        return LR * float(update) / float(max(1, REF_WARMUP))
    progress = float(update - REF_WARMUP) / float(max(1, REF_TOTAL - REF_WARMUP))
    return LR * max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))


def _jpeg(rs):
    from PIL import Image
    arr = rs.randint(0, 255, (RES, RES, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _build_train_split(root):
    """train_imgs.tsv/train_texts.jsonl -> LMDB via the reference's own
    builder. STANDARD base64 in the tsv: the LoRA script decodes with
    base64.b64decode (train_lora.py:85), whose default non-validating mode
    would silently corrupt urlsafe-encoded bytes."""
    rs = np.random.RandomState(7)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "train_imgs.tsv"), "w") as f:
        for i in range(N_IMGS):
            f.write(f"{i}\t{base64.b64encode(_jpeg(rs)).decode()}\n")
    with open(os.path.join(root, "train_texts.jsonl"), "w") as f:
        for t in range(N_TEXTS):
            f.write(json.dumps(
                {"text_id": t, "text": f"LoRA轨迹对齐测试第{t}句",
                 "image_ids": [t % N_IMGS]}, ensure_ascii=False) + "\n")
    builder = os.path.join(REFERENCE, "cn_clip/preprocess/build_lmdb_dataset.py")
    run_ref = os.path.join(SHIMS, "run_ref.py")
    subprocess.run([sys.executable, run_ref, builder, "--data_dir", root,
                    "--splits", "train"],
                   check=True, capture_output=True, text=True)
    return os.path.join(root, "lmdb", "train")


def _copy_reference_tree(root):
    """cn_clip + the root train_lora.py, code byte-identical (asserted);
    tiny configs written over the ViT-B-16 pair's JSONs (configs are data)."""
    dst = os.path.join(root, "reftree")
    tree = os.path.join(dst, "cn_clip")
    shutil.copytree(os.path.join(REFERENCE, "cn_clip"), tree,
                    ignore=shutil.ignore_patterns("__pycache__"))
    shutil.copy2(os.path.join(REFERENCE, "train_lora.py"),
                 os.path.join(dst, "train_lora.py"))
    for dirpath, _, files in os.walk(dst):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            copied = os.path.join(dirpath, fn)
            orig = os.path.join(REFERENCE, os.path.relpath(copied, dst))
            assert filecmp.cmp(copied, orig, shallow=False), \
                f"copied reference file differs: {copied}"
    cfg_dir = os.path.join(tree, "clip", "model_configs")
    with open(os.path.join(cfg_dir, "ViT-B-16.json"), "w") as f:
        json.dump(VISION_JSON, f)
    with open(os.path.join(cfg_dir, "RoBERTa-wwm-ext-base-chinese.json"), "w") as f:
        json.dump(TEXT_JSON, f)
    return dst


def _save_base_ckpt(predir):
    """Tiny reference init at load_from_name's expected filename, every
    float leaf PRE-ROUNDED through fp16 (see module docstring)."""
    ref_mod = load_reference_clip()
    torch.manual_seed(42)
    model = ref_mod.CLIP(**KWARGS).float()
    sd = {k: (v.half().float() if v.is_floating_point() else v)
          for k, v in model.state_dict().items()}
    os.makedirs(predir, exist_ok=True)
    torch.save({"state_dict": sd}, os.path.join(predir, "clip_cn_vit-b-16.pt"))
    return os.path.join(predir, "clip_cn_vit-b-16.pt")


def _run_reference(tree, data_dir, predir, outdir, epochs):
    cmd = [sys.executable, RUN_REF_LORA,
           os.path.join(tree, "train_lora.py"),
           "--data_dir", data_dir,
           "--val_dir", os.path.join(outdir, "no_such_val"),
           "--pretrained", predir,
           "--output_dir", outdir,
           "--rank", str(RANK), "--alpha", str(ALPHA),
           "--batch_size", str(BS), "--accum_freq", str(ACCUM),
           "--lr", str(LR), "--wd", str(WD),
           "--epochs", str(epochs), "--warmup_ratio", str(WRATIO),
           "--save_every", "1000"]
    out = subprocess.run(cmd, capture_output=True, text=True)
    assert out.returncode == 0, \
        f"reference train_lora failed:\n{out.stdout[-4000:]}\n{out.stderr[-4000:]}"
    lora = torch.load(os.path.join(outdir, "lora_final.pt"),
                      map_location="cpu", weights_only=False)
    rows = []
    with open(os.path.join(outdir, "training_log.csv")) as f:
        next(f)  # header
        for line in f:
            cells = line.rstrip("\n").split(",")
            rows.append((int(cells[0]), float(cells[1]), float(cells[3])))
    return lora, rows           # state_dict, [(epoch, train_loss, lr)]


def _adapters_from_ref(sd):
    """Map get_lora_state_dict keys into our adapter pytree layout
    (models/lora.py): visual out_proj A/B stacked over layers; BERT
    query/value stacked over (layer, j)."""
    import jax.numpy as jnp
    Lv, Lt = VISION_JSON["vision_layers"], TEXT_JSON["text_num_hidden_layers"]
    assert len(sd) == Lv * 2 + Lt * 4, sorted(sd)
    va = np.stack([sd[f"visual.transformer.resblocks.{l}.attn.out_proj.lora_A"]
                   .numpy() for l in range(Lv)])
    vb = np.stack([sd[f"visual.transformer.resblocks.{l}.attn.out_proj.lora_B"]
                   .numpy() for l in range(Lv)])
    ta = np.stack([np.stack(
        [sd[f"bert.encoder.layer.{l}.attention.self.{m}.lora_A"].numpy()
         for m in ("query", "value")]) for l in range(Lt)])
    tb = np.stack([np.stack(
        [sd[f"bert.encoder.layer.{l}.attention.self.{m}.lora_B"].numpy()
         for m in ("query", "value")]) for l in range(Lt)])
    return {"visual": {"wo": {"a": jnp.asarray(va), "b": jnp.asarray(vb)}},
            "bert": {"wqkv_qv": {"a": jnp.asarray(ta), "b": jnp.asarray(tb)}}}


def _load_samples(split):
    """Decode+transform each pair exactly as the script's LMDBDataset
    does (PIL decode, identity resize at the pre-sized resolution, OpenAI
    normalize; raw-text tokenize — NO cleanup, train_lora.py:90)."""
    from PIL import Image

    from nans_clip_tpu.data import lmdb_store as L
    from nans_clip_tpu.tokenizer import tokenize
    from nans_clip_tpu.utils.transform import image_transform

    env_p = L.open(os.path.join(split, "pairs"))
    env_i = L.open(os.path.join(split, "imgs"))
    tp, ti = env_p.begin(), env_i.begin()
    n = int(bytes(tp.get(b"num_samples")).decode())
    assert n == N_TEXTS
    t = image_transform(RES)
    images, texts = [], []
    for i in range(n):
        image_id, _tid, raw = pickle.loads(bytes(tp.get(str(i).encode())))
        b64 = bytes(ti.get(str(image_id).encode())).decode()
        img = Image.open(io.BytesIO(base64.b64decode(b64)))
        images.append(t(img))
        texts.append(tokenize([raw], context_length=CONTEXT)[0])
    env_p.close()
    env_i.close()
    return np.stack(images).astype(np.float32), np.stack(texts).astype(np.int32)


def _run_ours(base_ckpt, init_lora_sd, samples):
    import jax
    import jax.numpy as jnp
    import optax

    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import init_clip
    from nans_clip_tpu.training.train_lora import make_lora_step
    from nans_clip_tpu.utils.torch_interop import (load_torch_state_dict,
                                                   params_from_state_dict)

    cfg = tiny_config(KWARGS)
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    loaded, _stats = params_from_state_dict(load_torch_state_dict(base_ckpt), cfg)
    params.update(loaded)
    params = jax.tree.map(jnp.asarray, params)
    adapters = _adapters_from_ref(init_lora_sd)

    def sched(count):
        c = jnp.asarray(count, jnp.float32)
        lin = c / max(1, REF_WARMUP)
        prog = (c - REF_WARMUP) / max(1, REF_TOTAL - REF_WARMUP)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * prog)))
        return LR * jnp.where(c < REF_WARMUP, lin, cos)

    tx = optax.adamw(sched, weight_decay=WD)   # torch AdamW defaults
    opt_state = tx.init(adapters)
    options = ModelOptions(attn_impl="xla")
    train_step, _ = make_lora_step(cfg, options, ALPHA,
                                   label_smoothing=0.05, accum=ACCUM, tx=tx)

    images, texts = samples
    eff = BS * ACCUM
    epoch_avgs = []
    for epoch in range(EPOCHS):
        losses = []
        for u in range(UPDATES_PER_EPOCH):
            # shuffle=False: the reference consumes the same sequential
            # order every epoch
            sel = slice(u * eff, (u + 1) * eff)
            adapters, opt_state, loss, _m = train_step(
                params, adapters, opt_state, jnp.asarray(images[sel]),
                jnp.asarray(texts[sel]), jax.random.PRNGKey(0))
            losses.append(float(loss))
        epoch_avgs.append(float(np.mean(losses)))
    return epoch_avgs, jax.tree.map(np.asarray, adapters)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lora_parity"))
    split = _build_train_split(os.path.join(root, "data"))
    tree = _copy_reference_tree(root)
    base_ckpt = _save_base_ckpt(os.path.join(root, "pretrained"))
    init_sd, init_rows = _run_reference(tree, split, os.path.dirname(base_ckpt),
                                        os.path.join(root, "out0"), epochs=0)
    ref_sd, rows = _run_reference(tree, split, os.path.dirname(base_ckpt),
                                  os.path.join(root, "outN"), epochs=EPOCHS)
    return dict(split=split, base_ckpt=base_ckpt, init_sd=init_sd,
                init_rows=init_rows, ref_sd=ref_sd, rows=rows)


def test_lora_trajectory_matches_reference(artifacts):
    # the epochs=0 run captured the UNTRAINED adapters: B exactly zero,
    # A kaiming (both runs share the seed, so this IS the N-epoch init)
    init = artifacts["init_sd"]
    assert artifacts["init_rows"] == []
    for k, v in init.items():
        if k.endswith("lora_B"):
            assert float(v.abs().max()) == 0.0, k
        else:
            assert float(v.abs().max()) > 0.0, k

    samples = _load_samples(artifacts["split"])
    ours_avgs, ours_final = _run_ours(artifacts["base_ckpt"], init,
                                      samples)

    rows = artifacts["rows"]
    assert [r[0] for r in rows] == list(range(1, EPOCHS + 1))
    # per-epoch average loss (the script's only loss log)
    for (epoch, ref_loss, _lr), ours in zip(rows, ours_avgs):
        assert abs(ref_loss - ours) < 1e-3, (epoch, ref_loss, ours)
    # the logged LR is the post-epoch LambdaLR value — our injected
    # schedule at the same update count must agree
    for (epoch, _loss, ref_lr) in rows:
        # the CSV logs lr at 8 decimals
        assert abs(ref_lr - _ref_lr(epoch * UPDATES_PER_EPOCH)) < 5e-9

    ref_final = _adapters_from_ref(artifacts["ref_sd"])
    init_tree = _adapters_from_ref(init)
    import jax
    moved = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a)
                                                   - np.asarray(b)).max()),
                         ref_final, init_tree)
    assert max(jax.tree.leaves(moved)) > 1e-4, f"reference never trained: {moved}"

    def cmp(path, a, b):
        d = float(np.abs(np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)).max())
        assert d < 1e-4, f"{path}: final adapter diff {d}"
    for tower in ("visual", "bert"):
        for mod, leaves in ref_final[tower].items():
            for name in ("a", "b"):
                cmp(f"{tower}/{mod}/{name}", leaves[name],
                    ours_final[tower][mod][name])
