"""Run the reference's UNMODIFIED root-level ``train_lora.py`` on CPU.

Usage: python tests/_shims/run_ref_lora.py <copied_tree/train_lora.py> [args...]

Like run_ref.py (lmdb/torchvision/timm shims + CUDA no-ops) with two
additions that pin the run for trajectory comparison WITHOUT touching the
script:

* ``torch.manual_seed(0)`` before the script runs — the script seeds
  nothing, so its LoRA kaiming init (clip/lora.py:43) and any sampler
  draws would otherwise differ per process;
* ``torch.utils.data.DataLoader`` is wrapped to force ``shuffle=False``
  (the script hardcodes ``shuffle=True``, train_lora.py:161): the parity
  test needs a reproducible data ORDER on both sides; ordering is data
  plumbing, not the trainer semantics under test (loss, LoRA merge,
  AdamW, schedule, accumulation protocol).

The copied tree's directory is put FIRST on sys.path so ``import
cn_clip`` resolves to the copy carrying the tiny model configs; the
original ``/root/reference`` is deliberately NOT added.
"""

import os
import runpy
import sys

_SHIMS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_SHIMS))

if __name__ == "__main__":
    script = os.path.abspath(sys.argv[1])
    for p in (os.path.dirname(script), _SHIMS, _REPO):
        if p not in sys.path:
            sys.path.insert(0, p)

    import torch

    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.is_available = lambda: False
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)

    import torch.utils.data as tud

    _DataLoader = tud.DataLoader

    def _sequential_loader(*args, **kwargs):
        kwargs["shuffle"] = False
        return _DataLoader(*args, **kwargs)

    tud.DataLoader = _sequential_loader

    sys.argv = [script] + sys.argv[2:]
    runpy.run_path(script, run_name="__main__")
