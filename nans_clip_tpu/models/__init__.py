from nans_clip_tpu.models.bert import bert_features, init_bert
from nans_clip_tpu.models.clip import (PAD_ID, encode_image, encode_text,
                                       forward, get_similarity, init_clip,
                                       normalize)
from nans_clip_tpu.models.common import ModelOptions
from nans_clip_tpu.models.resnet import init_resnet, resnet_features
from nans_clip_tpu.models.vit import init_vit, random_masking, vit_features

__all__ = [
    "PAD_ID", "ModelOptions",
    "bert_features", "init_bert",
    "encode_image", "encode_text", "forward", "get_similarity", "init_clip", "normalize",
    "init_resnet", "resnet_features",
    "init_vit", "random_masking", "vit_features",
]
