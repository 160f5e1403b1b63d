"""Shimmed ``modelscope.models.Model``.

``from_pretrained(name)`` builds a reference ``cn_clip.clip.model.CLIP``
from a local config + checkpoint designated by env vars (the parity test
controls both sides' teacher weights):

* ``NANS_SHIM_TEACHER_CONFIG`` — json of merged CLIP kwargs;
* ``NANS_SHIM_TEACHER_CKPT``  — torch checkpoint with ``state_dict``
  (``module.`` prefixes tolerated, like the reference's own loader).

The returned wrapper mimics what the reference expects of the CN-CLIP
ModelScope teachers: a ``clip_model`` attribute whose ``encode_image``
becomes ``get_feature`` (training/main.py:275-285), ``state_dict()``
through nn.Module, eval mode (ModelScope models load eval)."""

import json
import os

import torch


class _TeacherWrapper(torch.nn.Module):
    def __init__(self, clip_model):
        super().__init__()
        self.clip_model = clip_model


class Model:
    @staticmethod
    def from_pretrained(name, *a, **k):
        from cn_clip.clip.model import CLIP

        cfg_path = os.environ["NANS_SHIM_TEACHER_CONFIG"]
        ckpt_path = os.environ["NANS_SHIM_TEACHER_CKPT"]
        with open(cfg_path) as f:
            kwargs = json.load(f)
        if isinstance(kwargs.get("vision_layers"), str):
            kwargs["vision_layers"] = eval(kwargs["vision_layers"])  # noqa: S307
        model = CLIP(**kwargs).float()
        obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = obj["state_dict"] if "state_dict" in obj else obj
        sd = {(key[len("module."):] if key.startswith("module.") else key): v
              for key, v in sd.items() if "bert.pooler" not in key}
        model.load_state_dict(sd)
        model.eval()
        return _TeacherWrapper(model)
