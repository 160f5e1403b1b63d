from nans_clip_tpu.parallel.loss import clip_loss, kd_cosine_loss
from nans_clip_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                         batch_spec, create_mesh,
                                         param_shardings, replicated,
                                         shard_batch, shard_params)

__all__ = [
    "clip_loss", "kd_cosine_loss",
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "batch_spec", "create_mesh",
    "param_shardings", "replicated", "shard_batch", "shard_params",
]
