"""Pipeline parallelism over the mesh's ``pipe`` axis (GPipe schedule).

The reference has no pipeline parallelism (SURVEY §2.8 — DDP only); like
TP and FSDP this is a bonus axis, built the TPU-native way: the towers'
parameter-stacked ``[L, ...]`` block pytrees shard their leading dim over
``pipe`` (each stage stores exactly its own L/pp layers —
``parallel/mesh.py:param_spec``), and ONE ``jax.shard_map`` runs the
classic synchronous-pipeline loop inside jit:

* the per-data-shard batch is split into M microbatches;
* for ``t`` in ``0 .. M+pp-2`` (a ``lax.scan``): stage 0 injects
  microbatch ``t``, every stage runs its local layers on its in-flight
  microbatch, the last stage banks microbatch ``t-(pp-1)``, and the
  activation rotates one hop along the ``pipe`` ring via ``ppermute``
  (ICI neighbour traffic only — the mesh lays ``pipe`` innermost);
* the banked outputs are broadcast back with a masked ``psum`` so the
  result is replicated over ``pipe``, exactly like any other tower
  forward — the contrastive loss and the backward pass need no special
  casing. Everything is differentiable (``ppermute`` transposes to the
  inverse rotation), so ``jax.grad`` of the training loss just works and
  the weight gradients land on the stage that owns the weights.

Bubble fraction is the GPipe ``(pp-1)/(M+pp-1)``; pick M ≥ 2·pp to keep
it under a third. This schedule (loop + collective-permute, weights
resident per stage) is the standard JAX/TPU pipelining recipe — scan over
microbatch slots with `ppermute` handoffs — rather than a port of a GPU
framework's pipeline engine.

Composes with the ``data`` axis (batch already sharded outside) but not
with ``tp`` in this version (the towers assert tp==1 when pp>1).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from nans_clip_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS

# layers_fn(state, local_params, stage, mb_idx, aux_mb) -> state
LayersFn = Callable[[jax.Array, Any, jax.Array, jax.Array, Any], jax.Array]


def pick_microbatches(batch: int, pp: int) -> int:
    """Largest M <= 4*pp that divides ``batch`` (falls back to 1), but
    never below 2 samples per microbatch (tiny microbatches under-fill
    kernel rows and amortize nothing). At M = 4*pp the GPipe bubble
    (pp-1)/(M+pp-1) is <= ~1/5 at pp=2, ~1/4 at pp=4; callers with batch
    to spare can raise ``microbatches`` explicitly."""
    cap = min(4 * pp, max(1, batch // 2), batch)
    for m in range(cap, 0, -1):
        if batch % m == 0:
            return m
    return 1


def bubble_fraction(batch: int, pp: int, microbatches: int = 0) -> float:
    """The GPipe idle fraction (pp-1)/(M+pp-1) at the M that will run."""
    m = microbatches or pick_microbatches(batch, pp)
    return (pp - 1) / (m + pp - 1)


def pp_kernel_batch(global_batch: int, pp: int, microbatches: int = 0) -> int:
    """The batch the per-layer kernels actually see inside the pipeline:
    global batch / data shards / microbatches. Batch-dependent routing
    gates (fused_mlp_routable, route_layer tile picks) must be evaluated
    at THIS size, not the global one — the A/B measurements they encode
    were taken at the executed kernel shape."""
    # no try/except: if this API moves in a jax upgrade we want a LOUD
    # failure, not gates silently evaluated at the global batch (a
    # mis-route the A/B-measured tile picks exist to prevent)
    from jax.sharding import get_abstract_mesh
    data = dict(get_abstract_mesh().shape).get(DATA_AXIS, 1)
    local = max(1, global_batch // max(1, data))
    m = microbatches or pick_microbatches(local, pp)
    return max(1, local // m)


def pp_transformer(x: jax.Array, stacked_params: Any, layers_fn: LayersFn,
                   pp: int, microbatches: int = 0,
                   aux: Optional[jax.Array] = None) -> jax.Array:
    """Run a stack of transformer layers as a ``pp``-stage pipeline.

    x: ``[B, S, W]`` (sharded over 'data' outside; replicated over 'pipe').
    stacked_params: pytree with leading layer dim L, L % pp == 0, stored
        sharded ``P('pipe', ...)`` on dim 0.
    layers_fn: runs ONE STAGE's local layers; receives the local params
        slice (leading dim L/pp), the stage index (traced scalar), the
        microbatch index (for per-microbatch PRNG folding), and the
        microbatch's slice of ``aux`` (e.g. the BERT key bias) or None.
    microbatches: M (0 = auto ``pick_microbatches``); per-data-shard batch
        must divide by M.
    """
    l_total = jax.tree.leaves(stacked_params)[0].shape[0]
    assert l_total % pp == 0, f"layers {l_total} % pp {pp} != 0"
    has_aux = aux is not None

    def body(x_l, params_l, aux_l):
        stage = jax.lax.axis_index(PIPE_AXIS)
        b = x_l.shape[0]
        m = microbatches or pick_microbatches(b, pp)
        assert b % m == 0, f"local batch {b} % microbatches {m} != 0"
        mb = b // m
        xs = x_l.reshape(m, mb, *x_l.shape[1:])
        aux_s = (aux_l.reshape(m, mb, *aux_l.shape[1:]) if has_aux else None)
        state = jnp.zeros_like(xs[0])
        outputs = jnp.zeros_like(xs)
        perm = [(i, (i + 1) % pp) for i in range(pp)]

        def step(carry, t):
            state, outputs = carry
            # the microbatch THIS stage works on at clock t (clamped in
            # the bubble steps, whose results are never banked)
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            inject = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(t, m - 1), 0, keepdims=False)
            state = jnp.where(stage == 0, inject, state)
            aux_mb = (jax.lax.dynamic_index_in_dim(
                aux_s, mb_idx, 0, keepdims=False) if has_aux else None)
            state = layers_fn(state, params_l, stage, mb_idx, aux_mb)
            # last stage banks microbatch t-(pp-1) once it exists
            oi = t - (pp - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, state.astype(outputs.dtype), jnp.maximum(oi, 0), 0)
            outputs = jnp.where(jnp.logical_and(oi >= 0, stage == pp - 1),
                                upd, outputs)
            state = jax.lax.ppermute(state, PIPE_AXIS, perm)
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(step, (state, outputs),
                                       jnp.arange(m + pp - 1))
        # replicate the last stage's banked outputs to the whole pipe ring
        out = jax.lax.psum(
            jnp.where(stage == pp - 1, outputs, jnp.zeros_like(outputs)),
            PIPE_AXIS)
        return out.reshape(b, *x_l.shape[1:])

    from jax.sharding import PartitionSpec as P
    param_specs = jax.tree.map(lambda _: P(PIPE_AXIS), stacked_params)
    in_specs = (P(DATA_AXIS, None, None), param_specs,
                P(DATA_AXIS, None) if has_aux else P())
    aux_arg = aux if has_aux else jnp.zeros((), jnp.float32)
    return jax.shard_map(
        body, in_specs=in_specs, out_specs=P(DATA_AXIS, None, None),
        check_vma=False,  # pallas_call outputs carry no vma; equivalence
                          # vs the unsharded oracle is tested (tests/test_pp.py)
    )(x, stacked_params, aux_arg)
