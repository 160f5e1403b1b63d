"""Training-trajectory parity against the reference's OWN trainer.

VERDICT round-2 item 1: the last untested product-level equivalence. The
reference's ``cn_clip/training/main.py`` runs UNMODIFIED on CPU, single
process, via ``tests/_shims/run_ref_train.py`` (gloo process group, CPU
DDP, the lmdb/torchvision/timm shims) over a reference-format LMDB split,
resumed from a shared random ``.pt`` init. Our trainer then runs from the
SAME initial parameters over the SAME batch sequence (the torch
``DistributedSampler`` order, identical PIL transform and tokenization)
and must reproduce the whole trajectory:

* per-step training loss, every step, within fp32 tolerance;
* per-step LR (our ``cosine_with_warmup`` vs the logged reference LR) and
  logit_scale;
* final parameters, leaf-wise;
* once more with ``--accum-freq 2`` (the reference's two-pass
  feature-cache protocol, train.py:206-253, vs our scan+remat) — weight
  decay is ON in every run so the decay-set membership is exercised.

This catches the class of bug no unit test here can: weight-decay set
membership (main.py:147-166), LR indexing off-by-ones
(scheduler.py:10-20), CE label offsets in the global loss
(train.py:104-113), clamp semantics (train.py:261-262), Adam
bias-correction/eps placement. The model is a tiny ViT+BERT with dropout
ZEROED in the config (torch dropout RNG cannot be replicated in JAX; the
semantics under test are the trainer's, not the RNG's), and the fixture
images are stored pre-sized at the model resolution so the reference's
``Resize`` is an exact identity and both sides see the same pixels.

The reference tree is copied to a tmpdir only so tiny model-config JSONs
can sit beside the real ones (``/root/reference`` is read-only); the test
asserts every copied ``.py`` is byte-identical to the original.
"""

import base64
import filecmp
import io
import json
import os
import pickle
import re
import shutil
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import REFERENCE, requires_reference  # noqa: E402
from tests.ref_loader import load_reference_clip, tiny_config  # noqa: E402

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_shims")
RUN_REF_TRAIN = os.path.join(SHIMS, "run_ref_train.py")

pytestmark = requires_reference

# ---- shared hyperparameters -------------------------------------------------
RES = 32
CONTEXT = 24
N_IMGS, N_TEXTS = 16, 32          # 32 pairs, each text -> one image
GLOBAL_BATCH = 4
EPOCHS = 2
TOTAL_STEPS = (N_TEXTS // GLOBAL_BATCH) * EPOCHS   # 16
LR, WD = 1e-3, 0.1
BETA1, BETA2, EPS = 0.9, 0.98, 1e-6
WARMUP = 4
SEED = 0

# tiny tower pair with dropout ZEROED (see module docstring)
VISION_JSON = {
    "embed_dim": 64,
    "image_resolution": RES,
    "vision_layers": 2,
    "vision_width": 64,
    "vision_patch_size": 16,
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
PARITY_KWARGS = {**VISION_JSON, **TEXT_JSON}

_LOG_RE = re.compile(
    r"Global Steps: (\d+)/\d+ .*?Loss: ([\d.]+) \|.*?"
    r"LR: ([\d.]+) \| logit_scale: ([\d.]+)")

# distinct tiny teacher (same embed_dim: the reference KD loss bilinear-
# interpolates the STUDENT onto the teacher's shape, train.py:406-419 —
# same dims make that an identity, which is what the CN-CLIP-family
# teachers the mapping supports look like relative to a student of the
# same embed width); dropout zeroed like the student
TEACHER_KWARGS = {
    "embed_dim": 64,
    "image_resolution": RES,
    "vision_layers": 1,
    "vision_width": 64,
    "vision_patch_size": 16,
    "vision_head_width": 32,
    "vocab_size": 21128,
    "text_attention_probs_dropout_prob": 0.0,
    "text_hidden_act": "gelu",
    "text_hidden_dropout_prob": 0.0,
    "text_hidden_size": 64,
    "text_initializer_range": 0.02,
    "text_intermediate_size": 128,
    "text_max_position_embeddings": 512,
    "text_num_attention_heads": 4,
    "text_num_hidden_layers": 1,
    "text_type_vocab_size": 2,
}
KD_WEIGHT = 0.5


def _jpeg(rs, size=RES):
    from PIL import Image
    arr = rs.randint(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _build_train_split(root):
    """Reference raw-input files -> LMDB 'train' split via the reference's
    own builder (tests/_shims provides lmdb)."""
    rs = np.random.RandomState(11)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "train_imgs.tsv"), "w") as f:
        for i in range(N_IMGS):
            f.write(f"{i}\t{base64.urlsafe_b64encode(_jpeg(rs)).decode()}\n")
    with open(os.path.join(root, "train_texts.jsonl"), "w") as f:
        for t in range(N_TEXTS):
            f.write(json.dumps(
                {"text_id": t, "text": f"训练轨迹对齐测试第{t}句文本",
                 "image_ids": [t % N_IMGS]}, ensure_ascii=False) + "\n")
    builder = os.path.join(REFERENCE, "cn_clip/preprocess/build_lmdb_dataset.py")
    run_ref = os.path.join(SHIMS, "run_ref.py")
    subprocess.run([sys.executable, run_ref, builder, "--data_dir", root,
                    "--splits", "train"],
                   check=True, capture_output=True, text=True)
    return os.path.join(root, "lmdb", "train")


def _copy_reference_tree(root):
    """Copy cn_clip (code UNMODIFIED — asserted) + add tiny config JSONs."""
    dst = os.path.join(root, "reftree")
    tree = os.path.join(dst, "cn_clip")
    shutil.copytree(os.path.join(REFERENCE, "cn_clip"), tree,
                    ignore=shutil.ignore_patterns("__pycache__"))
    for dirpath, _, files in os.walk(tree):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            copied = os.path.join(dirpath, fn)
            orig = os.path.join(REFERENCE, "cn_clip",
                                os.path.relpath(copied, tree))
            assert filecmp.cmp(copied, orig, shallow=False), \
                f"copied reference file differs: {copied}"
    # params.py restricts --vision-model/--text-model to a fixed choices
    # list, so the tiny configs are written OVER two existing names in the
    # copy (configs are data; the code above is asserted byte-identical).
    # The explicit --lr/--beta*/--eps flags below override the per-name
    # default hyperparameters (params.py:228-234 only fills None).
    cfg_dir = os.path.join(tree, "clip", "model_configs")
    with open(os.path.join(cfg_dir, "ViT-B-16.json"), "w") as f:
        json.dump(VISION_JSON, f)
    with open(os.path.join(cfg_dir, "RBT3-chinese.json"), "w") as f:
        json.dump(TEXT_JSON, f)
    return tree


def _save_shared_init(path):
    """Random reference-module init, saved in the reference's own resume
    layout (module.-prefixed state_dict)."""
    ref_mod = load_reference_clip()
    torch.manual_seed(0)
    model = ref_mod.CLIP(**PARITY_KWARGS).float()
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    torch.save({"epoch": 0, "step": 0, "name": "init", "state_dict": sd}, path)


def _run_reference(tree, data_dir, init_ckpt, logs, name, batch_size,
                   accum_freq, distill_env=None):
    cmd = [
        sys.executable, RUN_REF_TRAIN,
        os.path.join(tree, "training", "main.py"),
        "--train-data", data_dir,
        "--vision-model", "ViT-B-16",
        "--text-model", "RBT3-chinese",
        "--batch-size", str(batch_size),
        "--accum-freq", str(accum_freq),
        "--lr", str(LR), "--wd", str(WD),
        "--beta1", str(BETA1), "--beta2", str(BETA2), "--eps", str(EPS),
        "--warmup", str(WARMUP),
        "--max-epochs", str(EPOCHS),
        "--log-interval", "1",
        "--context-length", str(CONTEXT),
        "--num-workers", "0", "--valid-num-workers", "0",
        "--seed", str(SEED),
        "--mask-ratio", "0.0",
        "--precision", "fp32",
        "--logs", logs, "--name", name,
        "--resume", init_ckpt, "--reset-optimizer",
    ]
    env = {**os.environ, "MASTER_PORT": "29413"}
    if distill_env:
        cmd += ["--distillation", "--teacher-model-name",
                "damo/multi-modal_clip-vit-large-patch14_zh",
                "--kd_loss_weight", str(KD_WEIGHT)]
        env.update(distill_env)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert out.returncode == 0, \
        f"reference trainer failed:\n{out.stdout}\n{out.stderr}"
    # parse the per-step log lines
    log_dir = os.path.join(logs, name)
    log_files = [f for f in os.listdir(log_dir) if f.startswith("out_")]
    assert log_files, f"no reference log under {log_dir}"
    steps = {}
    with open(os.path.join(log_dir, sorted(log_files)[-1])) as f:
        for line in f:
            m = _LOG_RE.search(line)
            if m:
                steps[int(m.group(1))] = (float(m.group(2)),   # loss
                                          float(m.group(3)),   # lr
                                          float(m.group(4)))   # logit_scale
    traj = [steps[s] for s in range(1, TOTAL_STEPS + 1)]
    final = torch.load(
        os.path.join(log_dir, "checkpoints", "epoch_latest.pt"),
        map_location="cpu", weights_only=False)
    assert final["step"] == TOTAL_STEPS
    return traj, final["state_dict"]


def _ref_epoch_order(n, epoch, seed):
    """The exact index order the reference consumed: a world-size-1 torch
    DistributedSampler (training/data.py:167) at ``epoch``."""
    from torch.utils.data.distributed import DistributedSampler

    class _Len:
        def __len__(self):
            return n

    s = DistributedSampler(_Len(), num_replicas=1, rank=0, shuffle=True,
                           seed=seed)
    s.set_epoch(epoch)
    return np.asarray(list(iter(s)))


def _load_samples(split):
    """Decode + transform every pair exactly as the reference dataloader
    did (LMDBDataset.__getitem__, training/data.py:103-117): PIL decode,
    identity-size bicubic resize, OpenAI normalize; our tokenizer (golden
    parity-tested vs the reference's) with the reference's text cleanup."""
    from PIL import Image

    from nans_clip_tpu.data import lmdb_store as L
    from nans_clip_tpu.data.dataset import preprocess_text
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
        img = Image.open(io.BytesIO(base64.urlsafe_b64decode(b64)))
        images.append(t(img))
        texts.append(tokenize([preprocess_text(raw)],
                              context_length=CONTEXT)[0])
    env_p.close()
    env_i.close()
    return np.stack(images).astype(np.float32), np.stack(texts).astype(np.int32)


def _run_ours(init_ckpt, samples, accum_freq, teacher_ckpt=None):
    import jax
    import jax.numpy as jnp

    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import init_clip
    from nans_clip_tpu.training import (TrainConfig, create_train_state,
                                        make_train_step)
    from nans_clip_tpu.utils.torch_interop import (load_torch_state_dict,
                                                   params_from_state_dict)

    cfg = tiny_config(PARITY_KWARGS)
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    loaded, _stats = params_from_state_dict(load_torch_state_dict(init_ckpt), cfg)
    params.update(loaded)
    params = jax.tree.map(jnp.asarray, params)

    teacher = None
    if teacher_ckpt is not None:
        t_cfg = tiny_config(TEACHER_KWARGS)
        t_params, _ = init_clip(jax.random.PRNGKey(1), t_cfg)
        t_loaded, _ = params_from_state_dict(
            load_torch_state_dict(teacher_ckpt), t_cfg)
        t_params.update(t_loaded)
        teacher = (t_cfg, jax.tree.map(jnp.asarray, t_params))

    tcfg = TrainConfig(lr=LR, beta1=BETA1, beta2=BETA2, eps=EPS, wd=WD,
                       warmup=WARMUP, max_steps=TOTAL_STEPS,
                       accum_freq=accum_freq,
                       distillation=teacher is not None,
                       kd_loss_weight=KD_WEIGHT)
    options = ModelOptions(attn_impl="xla")
    step = make_train_step(cfg, tcfg, options, teacher=teacher,
                           constrain=False)
    state = create_train_state(params, {}, tcfg)

    images, texts = samples
    losses, scales = [], []
    for epoch in range(EPOCHS):
        order = _ref_epoch_order(N_TEXTS, epoch, SEED)
        for b in range(len(order) // GLOBAL_BATCH):
            sel = order[b * GLOBAL_BATCH:(b + 1) * GLOBAL_BATCH]
            state, m = step(state, jnp.asarray(images[sel]),
                            jnp.asarray(texts[sel]), jax.random.PRNGKey(0))
            losses.append(float(m["loss"]))
            scales.append(float(m["logit_scale"]))
    final = jax.tree.map(np.asarray, state.params)
    return losses, scales, final


def _final_param_diff(ref_sd, ours, kwargs):
    """Max |Δ| over every parameter the two final checkpoints share."""
    from nans_clip_tpu.utils.torch_interop import (normalize_state_dict,
                                                   params_from_state_dict)

    cfg = tiny_config(kwargs)
    ref_params, _ = params_from_state_dict(normalize_state_dict(ref_sd), cfg)

    diffs = {}

    def walk(path, a, b):
        if isinstance(a, dict):
            for k in a:
                walk(path + (k,), a[k], b[k])
        else:
            diffs["/".join(path)] = float(
                np.max(np.abs(np.asarray(a, np.float64)
                              - np.asarray(b, np.float64))))

    walk((), ref_params, {k: ours[k] for k in ref_params})
    return diffs


@pytest.fixture(scope="module")
def parity_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("train_parity"))
    split = _build_train_split(root)
    tree = _copy_reference_tree(root)
    init_ckpt = os.path.join(root, "init.pt")
    _save_shared_init(init_ckpt)
    samples = _load_samples(split)
    return root, split, tree, init_ckpt, samples


def _save_teacher(root):
    """Random tiny teacher in the ModelScope-snapshot role: config json +
    torch checkpoint, shared by the reference's shimmed
    ``Model.from_pretrained`` and our ``params_from_state_dict`` load."""
    ref_mod = load_reference_clip()
    torch.manual_seed(123)
    teacher = ref_mod.CLIP(**TEACHER_KWARGS).float()
    cfg_json = os.path.join(root, "teacher_cfg.json")
    with open(cfg_json, "w") as f:
        json.dump(TEACHER_KWARGS, f)
    ckpt = os.path.join(root, "teacher.pt")
    torch.save({"state_dict": teacher.state_dict()}, ckpt)
    return cfg_json, ckpt


def test_trajectory_matches_reference_distillation(parity_env):
    """KD leg (r3 VERDICT missing #4): the reference trainer runs its OWN
    distillation path (--distillation + ModelScope teacher via the
    tests/_shims/modelscope shim, teacher DDP-wrapped, cosine KD on image
    features, train.py:89-124,406-419) and our trainer must reproduce the
    whole trajectory with the same teacher weights."""
    root, split, tree, init_ckpt, samples = parity_env
    cfg_json, teacher_ckpt = _save_teacher(root)
    name = "ref_parity_kd"
    ref_traj, ref_final_sd = _run_reference(
        tree, split, init_ckpt, os.path.join(root, "logs"), name,
        batch_size=GLOBAL_BATCH, accum_freq=1,
        distill_env={"NANS_SHIM_TEACHER_CONFIG": cfg_json,
                     "NANS_SHIM_TEACHER_CKPT": teacher_ckpt})
    losses, scales, final = _run_ours(init_ckpt, samples, 1,
                                      teacher_ckpt=teacher_ckpt)

    ref_losses = [t[0] for t in ref_traj]
    ref_scales = [t[2] for t in ref_traj]
    assert abs(losses[0] - ref_losses[0]) < 5e-5, \
        f"step-1 (KD) loss {losses[0]} vs reference {ref_losses[0]}"
    np.testing.assert_allclose(losses, ref_losses, atol=2e-3, rtol=0,
                               err_msg="KD loss trajectory diverged")
    np.testing.assert_allclose(scales, ref_scales, atol=2e-3, rtol=0)
    diffs = _final_param_diff(ref_final_sd, final, PARITY_KWARGS)
    worst = max(diffs.items(), key=lambda kv: kv[1])
    assert worst[1] < 5e-4, \
        f"final params diverged under KD: {worst[0]} |Δ|={worst[1]:.2e}"


def test_modelscope_teacher_name_mapping():
    """Our trainer accepts the reference's published teacher ids: the two
    CN-CLIP-family names resolve to their architectures, TEAM/RLEG raise
    the documented out-of-family error."""
    from nans_clip_tpu.training.main import (MODELSCOPE_TEACHERS,
                                             OUT_OF_FAMILY_TEACHERS,
                                             resolve_teacher_config)
    cfg = resolve_teacher_config("damo/multi-modal_clip-vit-huge-patch14_zh")
    assert cfg.vision.width == 1280 and cfg.text.hidden_size == 1024
    cfg = resolve_teacher_config("damo/multi-modal_clip-vit-large-patch14_zh")
    assert cfg.vision.width == 1024 and cfg.text.hidden_size == 768
    # plain struct names pass through
    assert resolve_teacher_config(
        "ViT-B-16@RoBERTa-wwm-ext-base-chinese").vision.width == 768
    for name in OUT_OF_FAMILY_TEACHERS:
        with pytest.raises(NotImplementedError):
            resolve_teacher_config(name)
    assert len(MODELSCOPE_TEACHERS) + len(OUT_OF_FAMILY_TEACHERS) == 4


@pytest.mark.parametrize("accum_freq", [1, 2])
def test_trajectory_matches_reference(parity_env, accum_freq):
    root, split, tree, init_ckpt, samples = parity_env
    name = f"ref_parity_a{accum_freq}"
    ref_traj, ref_final_sd = _run_reference(
        tree, split, init_ckpt, os.path.join(root, "logs"), name,
        batch_size=GLOBAL_BATCH // accum_freq, accum_freq=accum_freq)
    losses, scales, final = _run_ours(init_ckpt, samples, accum_freq)

    from nans_clip_tpu.training.trainer import cosine_with_warmup
    schedule = cosine_with_warmup(LR, WARMUP, TOTAL_STEPS)

    ref_losses = [t[0] for t in ref_traj]
    ref_lrs = [t[1] for t in ref_traj]
    ref_scales = [t[2] for t in ref_traj]

    # step 0 must agree tightly (pure forward parity: same params, same
    # batch, fp32 both sides); later steps accumulate benign fp32
    # op-order drift through Adam
    assert abs(losses[0] - ref_losses[0]) < 5e-5, \
        f"step-1 loss {losses[0]} vs reference {ref_losses[0]}"
    np.testing.assert_allclose(losses, ref_losses, atol=2e-3, rtol=0,
                               err_msg="per-step loss trajectory diverged")
    # LR: ours evaluated at the same step index vs the reference's log
    # (logged at 6 decimals)
    our_lrs = [float(schedule(s)) for s in range(TOTAL_STEPS)]
    np.testing.assert_allclose(our_lrs, ref_lrs, atol=1.5e-6, rtol=0,
                               err_msg="LR schedule diverged")
    # logit_scale logged at 3 decimals
    np.testing.assert_allclose(scales, ref_scales, atol=2e-3, rtol=0,
                               err_msg="logit_scale trajectory diverged")

    diffs = _final_param_diff(ref_final_sd, final, PARITY_KWARGS)
    worst = max(diffs.items(), key=lambda kv: kv[1])
    assert worst[1] < 5e-4, \
        f"final params diverged: {worst[0]} |Δ|={worst[1]:.2e}"
