"""Run the reference's UNMODIFIED trainer (cn_clip/training/main.py) on CPU.

Extends run_ref.py's environment shims with what single-process CPU DDP
training needs but this container lacks:

* a ``gloo`` process group — main.py:55 hardcodes ``backend="nccl"``;
* ``DistributedDataParallel`` without CUDA ``device_ids`` (CPU modules
  require ``device_ids=None``, main.py:135 passes the local rank);
* single-process rendezvous env vars (``LOCAL_RANK``/``RANK``/...);
* the ``.cuda()`` / ``set_device`` no-ops from run_ref.py.

The trainer script itself runs byte-for-byte unmodified — the caller may
run it from a copied tree whose only additions are extra model-config JSON
files (tests/test_train_parity.py asserts the copied code is identical).

Usage: python tests/_shims/run_ref_train.py <cn_clip>/training/main.py [args...]
The package root containing the script is put FIRST on sys.path so a
test-local copy of the reference tree wins the ``import cn_clip``.
"""

import os
import runpy
import sys

_SHIMS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_SHIMS))

script = os.path.abspath(sys.argv[1])
# <root>/cn_clip/training/main.py -> <root>
pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(script)))
for p in (_SHIMS, pkg_root, _REPO):
    if p not in sys.path:
        sys.path.insert(0, p)

os.environ.setdefault("LOCAL_RANK", "0")
os.environ.setdefault("RANK", "0")
os.environ.setdefault("WORLD_SIZE", "1")
os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
os.environ.setdefault("MASTER_PORT", "29411")

import torch  # noqa: E402
import torch.distributed as dist  # noqa: E402

torch.cuda.set_device = lambda *a, **k: None
torch.cuda.is_available = lambda: False
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

_init = dist.init_process_group


def _init_gloo(backend=None, *a, **k):
    return _init(backend="gloo", *a, **k)


dist.init_process_group = _init_gloo

_DDP = torch.nn.parallel.DistributedDataParallel


class _CpuDDP(_DDP):
    """Real DDP subclass (isinstance checks in train.py keep working),
    CUDA device pinning dropped."""

    def __init__(self, module, device_ids=None, output_device=None, **kw):
        super().__init__(module, **kw)


torch.nn.parallel.DistributedDataParallel = _CpuDDP

if __name__ == "__main__":
    sys.argv = [script] + sys.argv[2:]
    runpy.run_path(script, run_name="__main__")
