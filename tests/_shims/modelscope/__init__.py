"""``modelscope`` shim (tests only): lets the reference trainer's
distillation path (cn_clip/training/main.py:247-289) run unmodified in
this zero-egress container. ``Model.from_pretrained`` builds a LOCAL
reference-CLIP teacher instead of downloading a ModelScope snapshot; the
wrapper exposes the ``clip_model`` attribute the reference's
teacher_model_dict mapping reads for the two CN-CLIP-family teachers."""

from . import models  # noqa: F401
