"""Zero-shot prompt templates + ImageNet-CN classnames.

The 1000 Chinese ImageNet classnames, 80 OpenAI-style Chinese templates,
and the per-dataset ELEVATER template sets are data assets extracted from
the reference's template tables (eval/imagenet_zeroshot_templates.py:13,
eval/cvinw_zeroshot_templates.py:6ff) into JSON
(assets/zeroshot/*.json); templates use ``{}`` as the classname slot.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, List

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "assets", "zeroshot")


@lru_cache()
def imagenet_classnames() -> List[str]:
    with open(os.path.join(_DIR, "imagenet.json"), encoding="utf-8") as f:
        return json.load(f)["imagenet_classnames"]


@lru_cache()
def imagenet_templates() -> List[str]:
    with open(os.path.join(_DIR, "imagenet.json"), encoding="utf-8") as f:
        return json.load(f)["imagenet_templates"]


@lru_cache()
def cvinw_templates() -> Dict[str, List[str]]:
    with open(os.path.join(_DIR, "cvinw_templates.json"), encoding="utf-8") as f:
        return json.load(f)


def templates_for_dataset(dataset: str) -> List[str]:
    """Per-dataset template table (reference zeroshot_evaluation.py:235-247)."""
    cv = cvinw_templates()
    table = {
        "imagenet": imagenet_templates(),
        "imagenet-1k": imagenet_templates(),
        "oxford-flower-102": cv["flower"],
        "food-101": cv["food"],
        "fgvc-aircraft-2013b-variants102": cv["aircraft"],
        "eurosat_clip": cv["eurosat"],
        "resisc45_clip": cv["eurosat"],
        "country211": cv["country211"],
        "openai": cv["openai"],
    }
    key = dataset.lower()
    if key in table:
        return table[key]
    return cv["openai"]


def apply_template(template: str, classname: str) -> str:
    return template.format(classname)
