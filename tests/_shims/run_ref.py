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

if __name__ == "__main__":
    script = sys.argv[1]
    sys.argv = [script] + sys.argv[2:]
    runpy.run_path(script, run_name="__main__")
