"""Minimal ``torchvision`` shim (tests only): just enough surface for the
reference's eval/data.py and clip/utils.py to run in this container (no
torchvision wheel is installed). Transforms reproduce torchvision's PIL
semantics exactly for the ops the reference uses."""

from . import datasets, transforms  # noqa: F401
