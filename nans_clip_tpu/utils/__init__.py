from nans_clip_tpu.utils.torch_interop import (load_torch_state_dict,
                                               params_from_state_dict,
                                               resize_pos_embed,
                                               save_torch_checkpoint,
                                               state_dict_from_params)
from nans_clip_tpu.utils.transform import (device_preprocess, image_transform,
                                           preprocess_batch)

__all__ = [
    "load_torch_state_dict", "params_from_state_dict", "resize_pos_embed",
    "save_torch_checkpoint", "state_dict_from_params",
    "device_preprocess", "image_transform", "preprocess_batch",
]
