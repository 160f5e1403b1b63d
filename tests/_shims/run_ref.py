"""Run an UNMODIFIED reference script on CPU torch in this container.

Usage: python tests/_shims/run_ref.py <script.py> [script args...]

Provides what the reference assumes but this container lacks:
* ``lmdb`` / ``torchvision`` modules -> the shims in this directory;
* a CUDA device -> ``.cuda()`` / ``set_device`` patched to CPU no-ops
  (the scripts hardcode cuda, e.g. eval/extract_features.py:113,137).

Used by tests/test_pipeline_parity.py to drive the reference's own
3-stage retrieval pipeline as the end-to-end oracle.
"""

import os
import runpy
import sys

_SHIMS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_SHIMS))
_REFERENCE = os.environ.get("NANS_REFERENCE", "/root/reference")

for p in (_SHIMS, _REFERENCE, _REPO):
    if p not in sys.path:
        sys.path.insert(0, p)

import torch  # noqa: E402

torch.cuda.set_device = lambda *a, **k: None
torch.cuda.is_available = lambda: False
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


def _cpu_device(v):
    return (isinstance(v, int)
            or (isinstance(v, (str, torch.device)) and "cuda" in str(v)))


_tensor_to = torch.Tensor.to


def _to_cpu(self, *a, **k):
    # the zero-shot script moves tensors with .to(args.gpu) where gpu=0
    # (zeroshot_evaluation.py:112,135-136) — remap device args to CPU
    if a and _cpu_device(a[0]):
        a = ("cpu",) + a[1:]
    if _cpu_device(k.get("device")):
        k["device"] = "cpu"
    return _tensor_to(self, *a, **k)


torch.Tensor.to = _to_cpu

if __name__ == "__main__":
    script = sys.argv[1]
    sys.argv = [script] + sys.argv[2:]
    runpy.run_path(script, run_name="__main__")
