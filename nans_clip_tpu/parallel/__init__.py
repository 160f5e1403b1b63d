from nans_clip_tpu.parallel.loss import clip_loss, kd_cosine_loss
from nans_clip_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, PIPE_AXIS,
                                         batch_sharding, batch_spec,
                                         create_mesh, param_shardings,
                                         replicated, shard_batch,
                                         shard_params)
from nans_clip_tpu.parallel.pp import pp_transformer

__all__ = [
    "clip_loss", "kd_cosine_loss",
    "DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS", "batch_sharding", "batch_spec",
    "create_mesh", "param_shardings", "replicated", "shard_batch",
    "shard_params", "pp_transformer",
]
