"""Same-process batch-1 tower A/B: bf16 vs int8-inline vs int8
dequant-ahead (qdma). Inner fori_loop amortizes the tunnel RTT.

Recorded r4 results (gates.py "(tower qdma probe)" provenance):
ViT-B image shape (12L/768/S197): bf16 0.983 / inline 0.769 / qdma
0.929 ms (qdma 0.83x of inline); text-large shape (24L/1024/S52):
bf16 1.402 / inline 0.934 / qdma 1.361 ms (0.69x). Outputs
bit-identical — qdma is a MEASURED NEGATIVE, kept as the
fused_tower(quant_dma=True) opt-in. Edit L/W/I/S/H below to re-drive
other shapes."""
import json
import sys
import time



import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.ops.tower_kernel import fused_tower
from nans_clip_tpu.utils.quantize import quantize_weight

L, W, I, S, H = 12, 768, 3072, 197, 12
INNER = 50
rs = np.random.RandomState(0)
f = lambda *sh: jnp.asarray(0.05 * rs.randn(*sh), jnp.bfloat16)
p = dict(ln1_s=f(L, W), ln1_b=f(L, W), wqkv=f(L, W, 3 * W), bqkv=f(L, 3 * W),
         wo=f(L, W, W), bo=f(L, W), ln2_s=f(L, W), ln2_b=f(L, W),
         w1=f(L, W, I), b1=f(L, I), w2=f(L, I, W), b2=f(L, W))
qw = {k: quantize_weight(p[k]) for k in ("wqkv", "wo", "w1", "w2")}
x0 = jnp.asarray(rs.randn(1, S, W), jnp.bfloat16)


def make(arm):
    def tower(x, prm, q):
        wq = q["wqkv"] if arm != "bf16" else prm["wqkv"]
        wo = q["wo"] if arm != "bf16" else prm["wo"]
        w1 = q["w1"] if arm != "bf16" else prm["w1"]
        w2 = q["w2"] if arm != "bf16" else prm["w2"]
        return fused_tower(x, None, prm["ln1_s"], prm["ln1_b"], wq,
                           prm["bqkv"], wo, prm["bo"], prm["ln2_s"],
                           prm["ln2_b"], w1, prm["b1"], w2, prm["b2"], H,
                           1e-5, "quick_gelu", False,
                           quant_dma=(arm == "qdma"))

    @jax.jit
    def run(x, prm, q):
        return jax.lax.fori_loop(0, INNER, lambda i, x: tower(x, prm, q), x)

    return run


results = {}
outs = {}
for arm in ("bf16", "inline", "qdma"):
    run = make(arm)
    out = run(x0, p, qw)
    _ = float(jnp.sum(out.astype(jnp.float32)))   # sync
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        out = run(x0, p, qw)
        s = float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / (reps * INNER) * 1e3
    results[arm] = round(ms, 4)
    outs[arm] = np.asarray(out.astype(jnp.float32))
    print(json.dumps({"arm": arm, "ms_per_tower": results[arm],
                      "checksum": s}), flush=True)

print(json.dumps({
    "inline_vs_bf16": round(results["bf16"] / results["inline"], 3),
    "qdma_vs_bf16": round(results["bf16"] / results["qdma"], 3),
    "qdma_vs_inline": round(results["inline"] / results["qdma"], 3),
    "qdma_inline_maxdiff": float(np.abs(outs["qdma"] - outs["inline"]).max()),
}), flush=True)
print("QDMA_DRIVE_DONE")
