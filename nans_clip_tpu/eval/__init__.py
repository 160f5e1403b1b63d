from nans_clip_tpu.eval.evaluation import compute_score, recall_at_ks
from nans_clip_tpu.eval.model_io import load_eval_model
from nans_clip_tpu.eval.templates import (imagenet_classnames,
                                          imagenet_templates,
                                          templates_for_dataset)

__all__ = ["compute_score", "recall_at_ks", "load_eval_model",
           "imagenet_classnames", "imagenet_templates", "templates_for_dataset"]
