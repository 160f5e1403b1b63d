"""Wide (chunk-streamed) MLP kernels compile and match on REAL TPU
(NANS_TEST_TPU=1).

Regression guard for the scoped-vmem compile failure: the batch-tiled
regrid's true footprint is ~2x the mlp_batch_tile estimate (Mosaic
double-buffers the streamed weight chunks and the in/out blocks), which
exceeded the 16MB default scoped-vmem limit at the ViT-L cell
(16.71M > 16.00M) once the tunnel's compiler tightened — the call now
pins vmem_limit_bytes=64MB. The interpret-mode tests prove the math;
this proves the Mosaic compile at the production ViT-L image shape.
"""

import os

import pytest

if os.environ.get("NANS_TEST_TPU") != "1":
    pytest.skip("TPU-only: set NANS_TEST_TPU=1", allow_module_level=True)

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs a TPU backend")


def test_batched_regrid_mlp_compiles_at_vit_l_cell():
    import nans_clip_tpu.ops.fused_block as fb

    B, S, W, I = 4, 257, 1024, 4096  # ViT-L/14 @ 224 image shape
    rs = np.random.RandomState(0)
    r = lambda *sh: jnp.asarray(0.02 * rs.randn(*sh), jnp.bfloat16)
    x = jnp.asarray(rs.randn(B, S, W), jnp.bfloat16)
    args = (1.0 + r(W), r(W), r(W, I), r(I), r(I, W), r(W))

    chunk = fb.mlp_chunk_size(W, I, 2)
    tile = fb.mlp_batch_tile(B, S, W, I, chunk, 2)
    assert tile > 1, "shape no longer exercises the batched regrid"

    with jax.default_matmul_precision("default"):
        out = jax.jit(lambda x, *a: fb._fused_mlp_batched_call(
            x, *a, "quick_gelu", 1e-5, False, False, chunk, tile))(x, *args)
        ref = fb._reference_mlp(x, *args, "quick_gelu", 1e-5, False)
    rel = (np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
           / max(1e-6, np.abs(np.asarray(ref, np.float32)).max()))
    assert rel < 2e-2, rel
