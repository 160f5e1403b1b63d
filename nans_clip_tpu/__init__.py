"""nans_clip_tpu — a TPU-native (JAX/XLA/Pallas) Chinese-CLIP framework.

Brand-new implementation of the capabilities of the NanS-CLIP reference
(an OFA-Sys Chinese-CLIP fork): dual-tower CLIP (ViT/ModifiedResNet vision +
Chinese BERT text), WordPiece tokenizer, contrastive training with
global-batch feature gathering over a device mesh, FLIP masking, LoRA,
distillation, retrieval/zero-shot evaluation, and AOT-compiled serving.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: TPU compiles of the big towers take
# minutes (especially via remote-compile tunnels); caching makes every
# process after the first start instantly. Opt out with NANS_NO_JAX_CACHE=1.
if not _os.environ.get("NANS_NO_JAX_CACHE"):
    import jax as _jax

    try:
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                           _os.path.expanduser("~/.cache/nans_jax_cache")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

from nans_clip_tpu.api import (CLIPModel, available_models, create_model,
                               image_transform, load, load_from_name)
from nans_clip_tpu.configs import CLIPConfig, config_for_name, load_config
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.tokenizer import get_tokenizer, tokenize
from nans_clip_tpu.utils.hf_interop import (load_hf_checkpoint,
                                            save_hf_checkpoint)

__all__ = [
    "CLIPModel", "available_models", "create_model", "image_transform",
    "load", "load_from_name", "CLIPConfig", "config_for_name", "load_config",
    "ModelOptions", "get_tokenizer", "tokenize", "load_hf_checkpoint",
    "save_hf_checkpoint", "__version__",
]
