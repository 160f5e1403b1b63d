"""Routed-cell sweep — REAL TPU only (NANS_TEST_TPU=1).

Re-validates the routing matrix behind `ops/gates.py`: for every cell the
production paths actually ROUTE (derived live from the `fits_*`/`route_*`
predicates over the model zoo's six block shapes, so the sweep tracks the
matrix automatically), it

  1. compiles + runs the routed kernel on the chip,
  2. checks it against the plain-XLA twin (`_reference_block`/`_reference_mlp`),
  3. same-process-times kernel vs fallback AT THE BATCH THE GATE ROUTES
     (image blocks b=32, text blocks b=256 — the training/throughput
     regimes; serving batches b<=8 route the whole-tower kernel instead,
     which has its own cell here) and asserts the kernel is not SLOWER
     than its bound (1.15x default; looser where the routing basis is a
     full-STEP win the isolated block under-credits — PARITY.md records
     that isolated sub-block A/Bs do not settle routing). Cross-run noise
     is +-4%, so the bound is a regression tripwire, not a re-derivation
     of the A/B.

Why: these gates encode ONE chip + ONE compiler. A mid-round-2 Mosaic
update silently broke the ViT-L regrid MLP cell at the then-default VMEM
budget; this sweep is the generalization of that one-off guard
(tests/test_tpu_wide_mlp.py) to every routed cell, per gates.py's
re-validation workflow. Expected runtime: ~10 min with a warm compile
cache; up to ~1 h after a compiler change (every cell recompiles — which
is exactly when you want to run it).

Reference analog: the per-(model, batch) TensorRT engine-build discipline
(reference deploy/onnx_to_tensorrt.py:80-94) — there, shape tuning is
re-derived per engine file; here, it is re-validated per routed cell.
"""

import os

import pytest

if os.environ.get("NANS_TEST_TPU") != "1":
    pytest.skip("TPU-only: set NANS_TEST_TPU=1", allow_module_level=True)

import time

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs a TPU backend")

# The model zoo's six transformer block shapes (name, S, W, heads, inter,
# post_ln). Text towers are post-LN BERT blocks with a padding mask.
SHAPES = [
    ("vit_b_img", 197, 768, 12, 3072, False),
    ("vit_l_img", 257, 1024, 16, 4096, False),
    ("vit_l336_img", 577, 1024, 16, 4096, False),
    ("vit_h_img", 257, 1280, 16, 5120, False),
    ("text_base", 52, 768, 12, 3072, True),
    ("text_large", 52, 1024, 16, 4096, True),
]
IDS = [s[0] for s in SHAPES]

INNER, ITERS = 8, 3


def _batch(s, train):
    """The batch regime the per-block gates route. Text towers batch
    large either way. Image: deterministic serving at b<=~44 routes the
    whole-tower kernel (fits_tower), so per-block FWD cells are only the
    b>=64 inference regime; training (which never routes the tower
    kernel) runs b>=32."""
    if s <= 64:
        return 256
    return 32 if train else 64


def _args(s, w, heads, seed=0, train=False):
    rs = np.random.RandomState(seed)
    r = lambda *sh: jnp.asarray(0.02 * rs.randn(*sh), jnp.bfloat16)
    x = jnp.asarray(rs.randn(_batch(s, train), s, w), jnp.bfloat16)
    return x, (1.0 + r(w), r(w), r(w, 3 * w), r(3 * w), r(w, w), r(w))


def _mlp_args(s, w, inter, seed=0, train=False):
    rs = np.random.RandomState(seed)
    r = lambda *sh: jnp.asarray(0.02 * rs.randn(*sh), jnp.bfloat16)
    x = jnp.asarray(rs.randn(_batch(s, train), s, w), jnp.bfloat16)
    return x, (1.0 + r(w), r(w), r(w, inter), r(inter), r(inter, w), r(w))


def _key_bias(b, s):
    """[B, S] additive mask — the _reference_block/fused-bert convention."""
    mask = np.ones((b, s), np.float32)
    mask[:, s - 8:] = 0.0
    return jnp.asarray((1.0 - mask) * -10000.0)


def _time(fn, *args, inner=INNER):
    """Median seconds per inner call; loop-carried dep defeats hoisting.

    ``inner``: each dispatch pays the tunnel's fixed ~27.5 ms RTT, so the
    per-call number carries an RTT/inner additive term. inner=8 is fine
    for the >=32-sample throughput cells; sub-ms batch-1 cells asserting a
    WIN (not just a regression bound) need inner high enough that the
    dilution doesn't wash the ratio toward 1."""
    def run(x, *rest):
        def body(i, acc):
            return acc + jnp.sum(
                fn(x + (acc * 1e-12).astype(x.dtype), *rest)
                .astype(jnp.float32))
        return jax.lax.fori_loop(0, inner, body, jnp.zeros((), jnp.float32))
    f = jax.jit(run)
    float(f(*args))  # compile + warm
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0) / inner)
    return sorted(ts)[len(ts) // 2]


def _check(out, ref, tol=2e-2):
    o = np.asarray(out, np.float32)
    r = np.asarray(ref, np.float32)
    rel = np.abs(o - r).max() / max(1e-6, np.abs(r).max())
    assert rel < tol, f"kernel diverges from XLA twin: rel={rel}"


def _ab(name, fused_t, xla_t, bound=1.15):
    ratio = fused_t / xla_t
    print(f"[gate-sweep] {name}: fused {fused_t*1e3:.3f} ms, "
          f"xla {xla_t*1e3:.3f} ms, ratio {ratio:.3f}")
    assert ratio < bound, (
        f"{name}: routed kernel now {ratio:.2f}x its fallback — a compiler "
        f"change likely invalidated the gate; re-run the A/B and update "
        f"ops/gates.py (see its provenance table)")


@pytest.mark.parametrize("name,s,w,h,inter,post_ln", SHAPES, ids=IDS)
def test_attention_fwd_cell(name, s, w, h, inter, post_ln):
    import nans_clip_tpu.ops.fused_block as fb
    if not fb.fits_fused(s, w):
        pytest.skip("shape not routed one-shot (wide kernel path)")
    x, args = _args(s, w, h)
    with jax.default_matmul_precision("default"):
        if post_ln:
            kb = _key_bias(x.shape[0], s)
            fused = lambda x: fb.fused_bert_attention_block(
                x, *args, kb, h, 1e-12)
            ref = lambda x: fb._reference_block(
                x, *args, heads=h, eps=1e-12, key_bias=kb, post_ln=True)
        else:
            fused = lambda x: fb.fused_attention_block(x, *args, h, 1e-5)
            ref = lambda x: fb._reference_block(x, *args, heads=h, eps=1e-5)
        _check(jax.jit(fused)(x), jax.jit(ref)(x))
        _ab(f"attn_fwd/{name}", _time(fused, x), _time(ref, x))


def test_attention_fwd_wide_cell():
    """ViT-H long-seq would route the head-chunked wide kernel; at the zoo
    shapes H is one-shot (fits_fused), so exercise the wide kernel at the
    shape that WOULD route it (W=1280, S=577: H@336-class)."""
    import nans_clip_tpu.ops.fused_block as fb
    s, w, h = 577, 1280, 16
    assert not fb.fits_fused(s, w) and fb.fits_fused_wide(s, w)
    x, args = _args(s, w, h)
    with jax.default_matmul_precision("default"):
        fused = lambda x: fb.fused_attention_block_wide(x, *args, h, 1e-5)
        ref = lambda x: fb._reference_block(x, *args, heads=h, eps=1e-5)
        _check(jax.jit(fused)(x), jax.jit(ref)(x))
        _ab("attn_fwd_wide/h336", _time(fused, x), _time(ref, x))


@pytest.mark.parametrize("name,s,w,h,inter,post_ln", SHAPES, ids=IDS)
def test_mlp_fwd_cell(name, s, w, h, inter, post_ln):
    import nans_clip_tpu.ops.fused_block as fb
    if not (fb.fits_fused_mlp(s, w) or fb.fits_fused_mlp_oneshot(s, w)):
        pytest.skip("deterministic forwards route the XLA MLP here "
                    "(measured: regrid loses at inference)")
    x, args = _mlp_args(s, w, inter)
    with jax.default_matmul_precision("default"):
        fused = lambda x: fb.fused_mlp_block(
            x, *args, "quick_gelu", 1e-5, post_ln)
        ref = lambda x: fb._reference_mlp(
            x, *args, act="quick_gelu", eps=1e-5, post_ln=post_ln)
        _check(jax.jit(fused)(x), jax.jit(ref)(x))
        _ab(f"mlp_fwd/{name}", _time(fused, x), _time(ref, x))


@pytest.mark.parametrize("name,s,w,h,inter,post_ln", SHAPES, ids=IDS)
def test_attention_train_cell(name, s, w, h, inter, post_ln):
    """fwd+bwd through the routed attention custom_vjp (the vjp itself
    picks one-shot bwd / head-chunked bwd per the gates)."""
    import nans_clip_tpu.ops.fused_block as fb
    from nans_clip_tpu.ops import fused_block_bwd as fbb
    if post_ln and not fbb.fits_bert_attention_bwd(s, w, h):
        pytest.skip("bert bwd cell not routed")
    x, args = _args(s, w, h, train=True)
    kb = _key_bias(x.shape[0], s) if post_ln else None
    with jax.default_matmul_precision("default"):
        if post_ln:
            fused = lambda x: jnp.sum(fb.fused_bert_attention_block(
                x, *args, kb, h, 1e-12).astype(jnp.float32))
            ref = lambda x: jnp.sum(fb._reference_block(
                x, *args, heads=h, eps=1e-12, key_bias=kb,
                post_ln=True).astype(jnp.float32))
        elif fb.fits_fused(s, w):
            fused = lambda x: jnp.sum(fb.fused_attention_block(
                x, *args, h, 1e-5).astype(jnp.float32))
            ref = lambda x: jnp.sum(fb._reference_block(
                x, *args, heads=h, eps=1e-5).astype(jnp.float32))
        else:
            pytest.skip("not routed")
        gf = jax.jit(jax.grad(fused))
        gr = jax.jit(jax.grad(ref))
        _check(gf(x), gr(x), tol=5e-2)
        _ab(f"attn_train/{name}", _time(lambda x: gf(x), x),
            _time(lambda x: gr(x), x),
            bound=1.6 if (s, w) == (197, 768) else 1.15)
        # ViT-B S=197 attn bwd: routed for the STEP-level win (kernel keeps
        # probs out of HBM; isolated-block A/Bs under-credit it) — looser
        # bound, the step-level guard is the train-throughput bench.


@pytest.mark.parametrize("name,s,w,h,inter,post_ln",
                         [sh for sh in SHAPES if sh[2] >= 1024],
                         ids=[s[0] for s in SHAPES if s[2] >= 1024])
def test_mlp_train_regrid_cell(name, s, w, h, inter, post_ln):
    """Training MLP at wide towers routes the batch-tiled regrid kernel
    fwd + the fused/chunked bwd per gates; A/B vs the XLA vjp."""
    import nans_clip_tpu.ops.fused_block as fb
    if (not fb.fits_fused_mlp_tiled(s, w) or fb.fits_fused_mlp(s, w)
            or fb.fits_fused_mlp_oneshot(s, w)):
        pytest.skip("not a regrid cell (one-shot MLP routed here)")
    x, args = _mlp_args(s, w, inter, train=True)
    with jax.default_matmul_precision("default"):
        fused = lambda x: jnp.sum(fb.fused_mlp_block(
            x, *args, "quick_gelu", 1e-5, post_ln).astype(jnp.float32))
        ref = lambda x: jnp.sum(fb._reference_mlp(
            x, *args, act="quick_gelu", eps=1e-5,
            post_ln=post_ln).astype(jnp.float32))
        gf = jax.jit(jax.grad(fused))
        gr = jax.jit(jax.grad(ref))
        _check(gf(x), gr(x), tol=5e-2)
        # the regrid's win is HBM (input-only vjp residuals), not isolated
        # block time — bound accordingly
        _ab(f"mlp_train/{name}", _time(lambda x: gf(x), x),
            _time(lambda x: gr(x), x), bound=1.5)


def test_layer_kernel_routed_cell():
    """Whole-layer kernel at its routed shape (text S=52, tile>=4)."""
    import nans_clip_tpu.ops.fused_block as fb
    from nans_clip_tpu.ops import layer_kernel as lk
    s, w, h, inter = 52, 768, 12, 3072
    b = 64
    assert lk.route_layer(b, s, w, inter, 2)
    rs = np.random.RandomState(0)
    r = lambda *sh: jnp.asarray(0.02 * rs.randn(*sh), jnp.bfloat16)
    x = jnp.asarray(rs.randn(b, s, w), jnp.bfloat16)
    aargs = (1.0 + r(w), r(w), r(w, 3 * w), r(3 * w), r(w, w), r(w))
    margs = (1.0 + r(w), r(w), r(w, inter), r(inter), r(inter, w), r(w))
    kb = _key_bias(b, s)
    with jax.default_matmul_precision("default"):
        fused = lambda x: lk.fused_layer_block(
            x, *aargs, *margs, h, 1e-12, "gelu", True, kb)
        def ref(x):
            y = fb._reference_block(x, *aargs, heads=h, eps=1e-12,
                                    key_bias=kb, post_ln=True)
            return fb._reference_mlp(y, *margs, act="gelu", eps=1e-12,
                                     post_ln=True)
        _check(jax.jit(fused)(x), jax.jit(ref)(x))
        _ab("layer/text_base", _time(fused, x), _time(ref, x))


def test_tower_kernel_routed_cell():
    """Whole-tower serving kernel at its routed batch-1-class shape."""
    from nans_clip_tpu.ops import tower_kernel as tk
    import nans_clip_tpu.ops.fused_block as fb
    L, s, w, h, inter = 12, 52, 768, 12, 3072
    b = 8
    assert tk.fits_tower(b, s, w, inter, 2)
    rs = np.random.RandomState(0)
    r = lambda *sh: jnp.asarray(0.02 * rs.randn(*sh), jnp.bfloat16)
    x = jnp.asarray(rs.randn(b, s, w), jnp.bfloat16)
    stk = lambda *sh: jnp.asarray(0.02 * rs.randn(L, *sh), jnp.bfloat16)
    ln1s, ln1b = 1.0 + stk(w), stk(w)
    wqkv, bqkv, wo, bo = stk(w, 3 * w), stk(3 * w), stk(w, w), stk(w)
    ln2s, ln2b = 1.0 + stk(w), stk(w)
    w1, b1, w2, b2 = stk(w, inter), stk(inter), stk(inter, w), stk(w)
    kb2 = _key_bias(b, s)                 # [B, S] for the reference
    kb = kb2.reshape(b, 1, s)             # [B, 1, S] for fused_tower
    with jax.default_matmul_precision("default"):
        fused = lambda x: tk.fused_tower(
            x, kb, ln1s, ln1b, wqkv, bqkv, wo, bo, ln2s, ln2b, w1, b1,
            w2, b2, h, 1e-12, "gelu", True)
        def ref(x):
            for i in range(L):
                x = fb._reference_block(
                    x, ln1s[i], ln1b[i], wqkv[i], bqkv[i], wo[i], bo[i],
                    heads=h, eps=1e-12, key_bias=kb2, post_ln=True)
                x = fb._reference_mlp(x, ln2s[i], ln2b[i], w1[i], b1[i],
                                      w2[i], b2[i], act="gelu", eps=1e-12,
                                      post_ln=True)
            return x
        _check(jax.jit(fused)(x), jax.jit(ref)(x), tol=5e-2)
        _ab("tower/text_base", _time(fused, x), _time(ref, x))


@pytest.mark.parametrize("name,L,w,h,inter,b,bound", [
    # b=8: less DMA-bound (416 rows), measured ~1.04 — regression bound only
    ("text_base_b8", 12, 768, 12, 3072, 8, 1.15),
    # the flagship batch-1 win (1.45x, gates.py provenance): int8 must
    # still BEAT the bf16 tower with drift headroom
    ("text_large_b1", 24, 1024, 16, 4096, 1, 0.85),
])
def test_tower_kernel_int8_cell(name, L, w, h, inter, b, bound):
    """The int8 weight-streaming tower cells: compile + numerics vs the
    bf16 tower on the dequantized weights, and the A/B tripwire."""
    from nans_clip_tpu.ops import tower_kernel as tk
    from nans_clip_tpu.utils.quantize import (dequantize_weight,
                                              quantize_weight)
    s = 52
    assert tk.fits_tower(b, s, w, inter, 2, quant=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, s, w), jnp.bfloat16)
    stk = lambda *sh: jnp.asarray(0.02 * rs.randn(L, *sh), jnp.bfloat16)
    ln1s, ln1b = 1.0 + stk(w), stk(w)
    wqkv, bqkv, wo, bo = stk(w, 3 * w), stk(3 * w), stk(w, w), stk(w)
    ln2s, ln2b = 1.0 + stk(w), stk(w)
    w1, b1, w2, b2 = stk(w, inter), stk(inter), stk(inter, w), stk(w)
    q = {k: quantize_weight(v) for k, v in
         dict(wqkv=wqkv, wo=wo, w1=w1, w2=w2).items()}
    d = {k: dequantize_weight(v, jnp.bfloat16) for k, v in q.items()}
    kb = _key_bias(b, s).reshape(b, 1, s)
    # weights as TRACED args (the tunnel's remote-compile request limit
    # rejects big constant pytrees — same rule as the H cell below)
    with jax.default_matmul_precision("default"):
        def int8_fn(x, *ws):
            (ln1s, ln1b, bqkv, bo, ln2s, ln2b, b1, b2,
             qqkv, sqkv, qo, so, q1, s1, q2, s2) = ws
            return tk.fused_tower(
                x, kb, ln1s, ln1b, {"int8": qqkv, "scale": sqkv}, bqkv,
                {"int8": qo, "scale": so}, bo, ln2s, ln2b,
                {"int8": q1, "scale": s1}, b1,
                {"int8": q2, "scale": s2}, b2, h, 1e-12, "gelu", True)

        def bf16_fn(x, *ws):
            (ln1s, ln1b, bqkv, bo, ln2s, ln2b, b1, b2,
             dqkv, do, d1, d2) = ws
            return tk.fused_tower(x, kb, ln1s, ln1b, dqkv, bqkv, do, bo,
                                  ln2s, ln2b, d1, b1, d2, b2, h, 1e-12,
                                  "gelu", True)

        common = (ln1s, ln1b, bqkv, bo, ln2s, ln2b, b1, b2)
        qargs = common + (q["wqkv"]["int8"], q["wqkv"]["scale"],
                          q["wo"]["int8"], q["wo"]["scale"],
                          q["w1"]["int8"], q["w1"]["scale"],
                          q["w2"]["int8"], q["w2"]["scale"])
        dargs = common + (d["wqkv"], d["wo"], d["w1"], d["w2"])
        _check(jax.jit(int8_fn)(x, *qargs), jax.jit(bf16_fn)(x, *dargs),
               tol=5e-2)
        _ab(f"tower_int8/{name}", _time(int8_fn, x, *qargs, inner=64),
            _time(bf16_fn, x, *dargs, inner=64), bound=bound)


def test_tower_kernel_h_cell():
    """The W=1280 (ViT-H image) tower cell — routed in r3 after a
    measured batch-1 win (3.287 vs 3.922 ms per-block, 1.19x; see
    PARITY.md W=1280 tower note). VMEM is the risk here: 78.6MB of
    double-buffered weights + ~13MB tile-1 activations against the 110MB
    pin — exactly the kind of cell a compiler update can silently
    reject, so it gets its own sweep guard. L=8 (not H's 32): the VMEM
    footprint is layer-count-independent (weights stream per grid step)
    and the shorter grid keeps the XLA twin's compile time sane."""
    from nans_clip_tpu.ops import tower_kernel as tk
    import nans_clip_tpu.ops.fused_block as fb
    L, s, w, h, inter = 8, 257, 1280, 16, 5120
    b = 1
    assert tk.fits_tower(b, s, w, inter, 2)
    assert tk.tower_batch_tile(b, s, w, inter, 2) == 1
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, s, w), jnp.bfloat16)
    stk = lambda *sh: jnp.asarray(0.02 * rs.randn(L, *sh), jnp.bfloat16)
    ln1s, ln1b = 1.0 + stk(w), stk(w)
    wqkv, bqkv, wo, bo = stk(w, 3 * w), stk(3 * w), stk(w, w), stk(w)
    ln2s, ln2b = 1.0 + stk(w), stk(w)
    w1, b1, w2, b2 = stk(w, inter), stk(inter), stk(inter, w), stk(w)
    # Weights as TRACED arguments, not closures: 8 layers of W=1280
    # weights embedded as XLA constants exceed the remote-compile
    # request-size limit on the tunnel (HTTP 413) — same rule as
    # production code (CLAUDE.md: never close a large pytree into jit).
    ws = (ln1s, ln1b, wqkv, bqkv, wo, bo, ln2s, ln2b, w1, b1, w2, b2)
    with jax.default_matmul_precision("default"):
        fused = lambda x, *ws: tk.fused_tower(
            x, None, *ws, h, 1e-5, "quick_gelu", False)
        def ref(x, ln1s, ln1b, wqkv, bqkv, wo, bo, ln2s, ln2b, w1, b1,
                w2, b2):
            for i in range(L):
                x = fb._reference_block(
                    x, ln1s[i], ln1b[i], wqkv[i], bqkv[i], wo[i], bo[i],
                    heads=h, eps=1e-5, key_bias=None, post_ln=False)
                x = fb._reference_mlp(x, ln2s[i], ln2b[i], w1[i], b1[i],
                                      w2[i], b2[i], act="quick_gelu",
                                      eps=1e-5, post_ln=False)
            return x
        _check(jax.jit(fused)(x, *ws), jax.jit(ref)(x, *ws), tol=5e-2)
        _ab("tower/vit_h_img_b1", _time(fused, x, *ws), _time(ref, x, *ws))
