"""CLI flag-surface parity + FLIP masking unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.models.vit import random_masking
from nans_clip_tpu.training.params import get_default_params, parse_args


def test_reference_flag_surface_accepted():
    """Every reference launcher flag must parse (run_scripts compatibility)."""
    args = parse_args([
        "--train-data", "/d/train", "--val-data", "/d/valid",
        "--num-workers", "4", "--logs", "/tmp/l", "--name", "x",
        "--log-interval", "1", "--report-training-batch-acc",
        "--batch-size", "8", "--valid-batch-size", "8",
        "--max-epochs", "1", "--valid-step-interval", "10",
        "--valid-epoch-interval", "1", "--context-length", "52",
        "--lr", "5e-5", "--beta1", "0.9", "--beta2", "0.98", "--eps", "1e-6",
        "--wd", "0.001", "--warmup", "10", "--use-bn-sync", "--use-augment",
        "--skip-scheduler", "--save-epoch-frequency", "1",
        "--save-step-frequency", "100", "--reset-optimizer",
        "--reset-data-offset", "--precision", "amp",
        "--vision-model", "ViT-B-16", "--mask-ratio", "0.5",
        "--freeze-vision", "--text-model", "RoBERTa-wwm-ext-base-chinese",
        "--grad-checkpointing", "--use-flash-attention",
        "--accum-freq", "2", "--gather-with-grad", "--skip-aggregate",
        "--debug", "--seed", "1", "--distillation",
        "--teacher-model-name", "ViT-H-14@RoBERTa-wwm-ext-large-chinese",
        "--kd_loss_weight", "0.3",
    ])
    assert args.mask_ratio == 0.5
    assert args.accum_freq == 2
    assert args.aggregate is False  # --skip-aggregate flips it (params.py:228)
    assert args.kd_loss_weight == 0.3


def test_default_params_per_arch():
    """CLIP-paper defaults (reference params.py:4-13)."""
    assert get_default_params("RN50")["lr"] == 5.0e-4
    assert get_default_params("RN50")["beta2"] == 0.999
    assert get_default_params("ViT-B-16")["beta2"] == 0.98
    assert get_default_params("ViT-L-14")["lr"] == 4.0e-4
    args = parse_args(["--vision-model", "ViT-L-14"])
    assert args.lr == 4.0e-4 and args.eps == 1.0e-6


def test_flip_random_masking():
    """Reference clip/model.py:252-266 semantics: CLS kept, (L-1)*(1-r)
    random patch tokens kept."""
    n, l, d = 4, 17, 8
    x = jnp.arange(n * l * d, dtype=jnp.float32).reshape(n, l, d)
    out = random_masking(x, mask_ratio=0.5, rng=jax.random.PRNGKey(0))
    len_keep = int((l - 1) * 0.5)
    assert out.shape == (n, 1 + len_keep, d)
    # CLS token preserved exactly
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    # kept tokens are original rows (subset, no mixing)
    xs = np.asarray(x).reshape(n, l, d)
    for b in range(n):
        rows = {tuple(r) for r in xs[b]}
        for t in np.asarray(out[b]):
            assert tuple(t) in rows
    # different rng -> different subset
    out2 = random_masking(x, 0.5, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(out), np.asarray(out2))
    # mask_ratio=0 path is identity via vit_features branch (not called here)
