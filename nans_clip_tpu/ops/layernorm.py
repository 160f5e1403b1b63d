"""LayerNorm with fp32 statistics regardless of compute dtype.

The reference keeps LayerNorm in fp32 inside an fp16 model
(clip/model.py:171-177) and forces fp32 on overflow-prone reductions in its
TensorRT engines (deploy/tensorrt_utils.py:65-97). On TPU the same numerics
guard is: accumulate mean/variance in fp32 and cast back to the compute
dtype. XLA fuses this into neighbouring ops, so the default path is plain
jnp; a fused Pallas kernel is provided for the serving path where we want
one VMEM-resident op (see ``pallas_layer_norm``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def pallas_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                      eps: float = 1e-5, block_rows: int = 256,
                      interpret: bool = False) -> jax.Array:
    """Fused LayerNorm over the last axis. Forward-only (inference path)."""
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    padded = ((n + block_rows - 1) // block_rows) * block_rows
    if padded != n:
        x2 = jnp.pad(x2, ((0, padded - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(padded // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, bias)
    return out[:n].reshape(orig_shape)
