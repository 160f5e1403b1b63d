"""Minimal ``timm`` shim (tests only): the reference imports
timm.data.create_transform at module scope (training/data.py:21) but only
calls it on the use_augment train path, which the parity tests never run."""
from . import data  # noqa: F401
