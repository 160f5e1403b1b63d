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
    """Per-dataset template table — EXACTLY the reference's
    (zeroshot_evaluation.py:235-247): exact-match keys, every other dataset
    (including "imagenet" — the published ImageNet-CN 48.3 top-1 was
    produced this way) falls back to the 183-prompt cvinw ``openai`` set,
    NOT the 80-prompt ``imagenet_templates`` table (which the reference
    ships but never routes)."""
    cv = cvinw_templates()
    table = {
        "fgvc-aircraft-2013b-variants102": cv["aircraft"],
        "food-101": cv["food"],
        "oxford-flower-102": cv["flower"],
        "eurosat_clip": cv["eurosat"],
        "resisc45_clip": cv["eurosat"],
        "country211": cv["country211"],
        "openai": cv["openai"],
    }
    return table.get(dataset, cv["openai"])


def apply_template(template: str, classname: str) -> str:
    return template.format(classname)
