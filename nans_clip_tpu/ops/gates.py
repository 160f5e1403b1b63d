"""Routing-gate constants, centralized with provenance (one table).

Every A/B-derived constant behind the Pallas kernel routing — VMEM
compiler budgets, tile-estimator budgets and caps, and `fits_*` shape
bounds — is defined HERE and imported by the kernel modules. Each has a
`PROVENANCE` record naming the chip, the round it was measured in, and
the measured A/B (or VMEM math) that justifies the value, because these
numbers encode ONE chip + ONE compiler: a Mosaic/XLA update already broke
one routed cell mid-round-2 (the ViT-L regrid MLP cell stopped compiling
at the then-16MB default; see `MLP_REGRID_BUDGET`). When porting to a new
TPU generation or after a compiler bump, re-run the routed-cell sweep
(`tests/test_tpu_gate_sweep.py`, NANS_TEST_TPU=1) — it compiles every
routed cell of the routing matrix and re-validates each against its
fallback — then update the records here.

`python -m nans_clip_tpu.ops.gates` prints the table;
`check()` asserts every record matches the live module value (run by the
CPU suite, so the table cannot drift from the code).

The reference has no analog — its per-shape tuning lives in TensorRT
engine files built per (model, batch) by deploy/onnx_to_tensorrt.py:80-94;
this table is the explicit, re-derivable version of that discipline.
"""

from __future__ import annotations

import dataclasses

MiB = 1024 * 1024

# The chip + compiler every value below was measured on. (Tunneled single
# chip; same-process A/Bs only — cross-process runs drift +-4%.)
CHIP = "TPU v5e-1 (16GB HBM), jax 0.9.x / Mosaic via tunnel"

# ---------------------------------------------------------------------------
# VMEM compiler budgets (pltpu.CompilerParams(vmem_limit_bytes=...))
# ---------------------------------------------------------------------------

#: Mosaic's default scoped-vmem budget (informational — never passed).
VMEM_DEFAULT = 16 * MiB

#: The raised module budget every wide/long-seq pallas_call pins. 64MB
#: (half of v5e's 128MB VMEM) leaves the sibling calls of one fusion
#: region room; real footprints are ~2x the tile estimates because Mosaic
#: double-buffers weight chunks and io blocks.
VMEM_RAISED = 64 * MiB

#: The whole-tower serving kernel's pin: L layers of double-buffered
#: weights + a VMEM-resident activation tile need most of the chip.
VMEM_TOWER = 110 * MiB

# ---------------------------------------------------------------------------
# One-shot fused attention (fused_block.fused_attention_block)
# ---------------------------------------------------------------------------

#: Classic one-shot bound: weights + one sample's fp32 qkv/probs fit the
#: default scoped budget at W<=1024, S<=640 (ViT-B/L, BERT classes).
MAX_FUSED_WIDTH = 1024
MAX_FUSED_SEQ = 640

#: H-class (W=1280) one-shot cells fit once the call pins VMEM_RAISED,
#: but only at short-ish sequences.
ONESHOT_ATTN_WIDE_WIDTH = 1280
ONESHOT_ATTN_WIDE_SEQ = 320

#: s > this pins VMEM_RAISED on the one-shot attention call even at
#: W<=1024: the ViT-L-336 S=577 cell needs 18.4MB.
ATTN_VMEM_PIN_SEQ = 320

#: One-shot attention tile estimator: per-cell budget + tile cap.
ATTN_CELL_BUDGET = 13 * MiB
ATTN_CELL_TILE_CAP = 8

# ---------------------------------------------------------------------------
# Head-chunked wide attention (fused_block.fused_attention_block_wide)
# ---------------------------------------------------------------------------

#: Upper width bound for the head-chunked wide kernel.
MAX_WIDE_WIDTH = 2048

#: Batch-tiled regrid of the wide kernel: per-cell budget. (The regrid is
#: a tested opt-in, NOT routed: tile=2 measured slower than tile=1 at
#: ViT-H, 277 vs 323 img/s.)
WIDE_TILE_BUDGET = 12 * MiB

# ---------------------------------------------------------------------------
# Fused MLP (fused_block.fused_mlp_block)
# ---------------------------------------------------------------------------

#: One-shot MLP classic bound: both fc weights VMEM-resident at W<=768.
MAX_FUSED_MLP_WIDTH = 768

#: Wide short-seq one-shot MLP (RoBERTa-large W=1024 S=52) fits under
#: VMEM_RAISED — what keeps large-text dropout training on the kernel.
MLP_ONESHOT_WIDE_SEQ = 64
MLP_ONESHOT_WIDE_WIDTH = 1024

#: One-shot MLP tile estimator budgets (classic / wide) + cap.
MLP_CELL_BUDGET = 14 * MiB
MLP_CELL_BUDGET_WIDE = 40 * MiB
MLP_CELL_TILE_CAP = 8

#: Chunk-streamed MLP variants: width bound, per-chunk weight-tile bound.
MAX_TILED_MLP_WIDTH = 2048
MLP_CHUNK_WEIGHT_BYTES = 2 * MiB

#: Batch-tiled regrid estimator budget + HARD tile cap.
MLP_REGRID_BUDGET = 26 * MiB
MLP_REGRID_TILE_CAP = 2

# ---------------------------------------------------------------------------
# Fused backward kernels (fused_block_bwd)
# ---------------------------------------------------------------------------

#: Pre-LN (ViT) attention bwd one-shot cell bound (under VMEM_RAISED).
ATTN_BWD_BUDGET = 48 * MiB
ATTN_BWD_TILE_CAP = 8
#: Batch tiling the bwd cell only pays at short sequences.
ATTN_BWD_TILE_MAX_SEQ = 64

#: Post-LN (BERT) masked attention bwd cell bound.
BERT_ATTN_BWD_BUDGET = 12 * MiB

#: MLP bwd cell bound — doubles as the MEASURED routing cutoff (the
#: ViT-B S=197 cell compiles under VMEM_RAISED but loses to the XLA vjp).
MLP_BWD_BUDGET = 13 * MiB
MLP_BWD_WIDE_SEQ = 64
MLP_BWD_WIDE_WIDTH = 1024

#: Full-gradient MLP bwd (in-kernel weight-grad accumulation): both
#: weights bf16 + both fp32 accumulators + one sample's live set.
MLP_FULLGRAD_BUDGET = 56 * MiB

#: Full-gradient pre-LN attention bwd: weights bf16 + fp32 accumulators
#: (16·W² bytes) + the one-shot cell's live set.
ATTN_FULLGRAD_BUDGET = 48 * MiB

#: Head-chunked attention bwd (long-seq training): chunk-pick budget.
HEAD_CHUNK_BUDGET = 24 * MiB

# ---------------------------------------------------------------------------
# Whole-layer kernel (layer_kernel)
# ---------------------------------------------------------------------------

#: Wide tier of the full-gradient MLP bwd: resident fp32 dw1+dw2
#: accumulators at W=1024/I=4096 are 33.6MB (+16.8MB bf16 weights), so
#: the cell needs its own raised pin. Budget admits ViT-L224's image MLP
#: (S=257: ~82MB) and excludes ViT-H (W=1280: ~118MB) and L-336 (S=577:
#: ~120MB) — those keep the XLA-recompute vjp.
MLP_FULLGRAD_WIDE_BUDGET = 100 * MiB
VMEM_MLP_FULLGRAD_WIDE = 110 * MiB
#: Wide tier of the full-gradient ATTENTION bwd (W=1280, S<=320 —
#: longer seqs keep their tuned head-chunked path): ~63MB cell under the
#: same 110MB pin.
ATTN_FULLGRAD_WIDE_BUDGET = 90 * MiB
ATTN_FULLGRAD_WIDE_MAX_SEQ = 320

#: Whole-LAYER training backward (layer_bwd.py, r4): both sub-blocks'
#: weights + fp32 accumulators + the combined live set in one cell
#: (~65MB at ViT-B S=197) under the VMEM_TOWER pin. The r2 arithmetic
#: dismissal ("23+42MB > 64MB pin") only ruled out the 64MB pin.
LAYER_FULLGRAD_BUDGET = 96 * MiB
#: Routing default for the combined layer bwd — set by the r4
#: same-process full-step drive (see the Gate record below).
LAYER_BWD_ROUTE = False

LAYER_CELL_BUDGET = 48 * MiB
LAYER_TILE_CAP = 8
#: Route the whole-layer kernel only when the tile reaches this (row-fill
#: is what pays; S=197 tile=1 measured 0.963x — not routed).
LAYER_ROUTE_MIN_TILE = 4
LAYER_MAX_SEQ = 320

# ---------------------------------------------------------------------------
# Whole-tower kernel (tower_kernel)
# ---------------------------------------------------------------------------

TOWER_BUDGET = 100 * MiB
TOWER_TILE_CAP = 32
#: W=1280 (ViT-H image) fits at tile=1: 78.6MB double-buffered weights +
#: ~13MB activations under the 110MB pin — TPU-validated r3 (1.19x over
#: per-block at batch 1). Wider towers (none in the zoo) would not fit.
TOWER_MAX_WIDTH = 1280
#: Route only while weight re-streaming stays bounded (<= this many batch
#: tiles) — at bs256 re-streams cancel the win (3100 vs 3121 pairs/s).
TOWER_MAX_RESTREAMS = 4

# ---------------------------------------------------------------------------
# Plain full-row attention kernel (attention.py, attn_impl="pallas")
# ---------------------------------------------------------------------------

MAX_PALLAS_SEQ = 1024


@dataclasses.dataclass(frozen=True)
class Gate:
    name: str          # module attribute in THIS file
    used_in: str       # file:function the value feeds
    round: str         # when measured/derived
    kind: str          # "measured A/B" | "VMEM math" | "compile bound"
    evidence: str      # the number(s) behind it


PROVENANCE = (
    Gate("VMEM_DEFAULT", "informational", "r1", "compile bound",
         "Mosaic default scoped budget; cells beyond it must pin a limit"),
    Gate("VMEM_RAISED", "fused_block/_bwd/layer_kernel pallas_calls", "r1-r2",
         "compile bound",
         "64MB: W=1280 one-shot (24.6MB), regrid MLP real footprint ~2x "
         "estimate (ViT-L cell rejected at 16MB default after a mid-r2 "
         "compiler update — the incident this table exists for)"),
    Gate("VMEM_TOWER", "tower_kernel.fused_tower", "r2", "compile bound",
         "W=1024 tower double-buffers 50MB weights + activation tile; "
         "16MB default rejects it, 110MB compiles (TPU-validated; also "
         "admits the W=1280 tile=1 cell at 78.6MB+acts, r3)"),
    Gate("MAX_FUSED_WIDTH", "fused_block.fits_fused", "r1", "VMEM math",
         "weights 4*W^2*2 = 8MB at W=1024 + per-sample set under default"),
    Gate("MAX_FUSED_SEQ", "fused_block.fits_fused", "r1", "VMEM math",
         "S=640 fp32 probs/head ~1.6MB; beyond it route chunked/XLA"),
    Gate("ONESHOT_ATTN_WIDE_WIDTH", "fused_block.fits_fused", "r2",
         "measured A/B",
         "W=1280 one-shot beats head-chunked AND XLA fwd+bwd (ViT-H train "
         "79.8 pairs/s); needs VMEM_RAISED"),
    Gate("ONESHOT_ATTN_WIDE_SEQ", "fused_block.fits_fused", "r2",
         "VMEM math", "W=1280 S=320 cell ~24.6MB < VMEM_RAISED/2"),
    Gate("ATTN_VMEM_PIN_SEQ", "fused_block._fused_call", "r2",
         "compile bound",
         "S=577 W=1024 cell needs 18.4MB — failed standalone at default"),
    Gate("ATTN_CELL_BUDGET", "fused_block.attn_cell_tile", "r1-r2",
         "measured A/B",
         "13MB admits tile=8 at BERT S=52 (+23% text tower) but keeps "
         "tile=1 at ViT S=197 (tile=2 measured 4100 vs 4156 img/s)"),
    Gate("ATTN_CELL_TILE_CAP", "fused_block.attn_cell_tile", "r1",
         "measured A/B", "tile 8 at S=52 fills 416/128-row MXU blocks; "
         "larger tiles showed no further win"),
    Gate("MAX_WIDE_WIDTH", "fused_block.fits_fused_wide", "r1",
         "VMEM math", "head-chunk streaming bound; nothing wider exists "
         "in the model zoo"),
    Gate("WIDE_TILE_BUDGET", "fused_block.wide_batch_tile", "r2",
         "measured A/B",
         "regrid tile=2 at ViT-H LOST (277 vs 323 img/s) — kernel is a "
         "tested opt-in, budget kept for the API"),
    Gate("MAX_FUSED_MLP_WIDTH", "fused_block.fits_fused_mlp", "r1",
         "VMEM math", "fc weights 2*W*4W*2 = 9.4MB at W=768 fit default"),
    Gate("MLP_ONESHOT_WIDE_SEQ", "fused_block.fits_fused_mlp_oneshot",
         "r2", "measured A/B",
         "RoBERTa-large S=52 W=1024 one-shot keeps dropout in-kernel; "
         "ViT-H trains 79.8 pairs/s with it"),
    Gate("MLP_ONESHOT_WIDE_WIDTH", "fused_block.fits_fused_mlp_oneshot",
         "r2", "VMEM math", "fc weights 16.8MB under VMEM_RAISED"),
    Gate("MLP_CELL_BUDGET", "fused_block.mlp_cell_tile", "r1",
         "measured A/B", "14MB under the 16MB default; tile=8 at S=52"),
    Gate("MLP_CELL_BUDGET_WIDE", "fused_block.mlp_cell_tile", "r2",
         "VMEM math", "wide cells run under VMEM_RAISED; 40MB leaves "
         "double-buffer headroom"),
    Gate("MLP_CELL_TILE_CAP", "fused_block.mlp_cell_tile", "r1",
         "measured A/B", "same row-fill ceiling as attention"),
    Gate("MAX_TILED_MLP_WIDTH", "fused_block.fits_fused_mlp_tiled", "r1",
         "VMEM math", "chunk streaming bound"),
    Gate("MLP_CHUNK_WEIGHT_BYTES", "fused_block.mlp_chunk_size", "r1",
         "measured A/B", "2MB weight tiles keep the chunk loop MXU-bound; "
         "larger tiles reduced overlap"),
    Gate("MLP_REGRID_BUDGET", "fused_block.mlp_batch_tile", "r2",
         "measured A/B",
         "26MB targets ~52-56MB real under the 64MB pin (Mosaic "
         "double-buffers); raised from 13MB so S=577 gets tile=2 — what "
         "made ViT-L-336 bs32 fit HBM and train at 74.5 pairs/s"),
    Gate("MLP_REGRID_TILE_CAP", "fused_block.mlp_batch_tile", "r2",
         "measured A/B",
         "tile=2 beats tile=4 at ViT-H (3.530 vs 3.622 ms) and L-336 "
         "(3.843 vs 4.218); cap re-verified by an H train re-drive (79.3)"),
    Gate("ATTN_BWD_BUDGET", "fused_block_bwd.fits_attention_bwd", "r2",
         "VMEM math",
         "48MB under the 64MB pin; admits ViT-L S=257 one-shot bwd, "
         "excludes S=577 (74MB) which routes the head-chunked bwd"),
    Gate("ATTN_BWD_TILE_CAP", "fused_block_bwd.attn_bwd_cell_tile", "r2",
         "measured A/B", "bwd tile=2 at S=197 measured 639.9 vs 664 "
         "pairs/s — short-seq only, cap 8"),
    Gate("ATTN_BWD_TILE_MAX_SEQ", "fused_block_bwd.attn_bwd_cell_tile",
         "r2", "measured A/B", "same A/B: tiling pays only at S<=64"),
    Gate("BERT_ATTN_BWD_BUDGET", "fused_block_bwd.fits_bert_attention_bwd",
         "r2", "VMEM math", "per-head prob+mask stacks + weights resident"),
    Gate("MLP_BWD_BUDGET", "fused_block_bwd.fits_fused_mlp_bwd", "r2",
         "measured A/B",
         "13MB doubles as the routing cutoff: ViT-B S=197 cell compiles "
         "under the pin but LOSES to the XLA vjp (644.5 vs 661 pairs/s)"),
    Gate("MLP_BWD_WIDE_SEQ", "fused_block_bwd.fits_fused_mlp_bwd", "r2",
         "measured A/B", "RoBERTa-large S=52 ~22MB cell fits the pin and "
         "keeps dropout's PRNG regeneration in-kernel"),
    Gate("MLP_BWD_WIDE_WIDTH", "fused_block_bwd.fits_fused_mlp_bwd", "r2",
         "VMEM math", "same cell's width bound"),
    Gate("MLP_FULLGRAD_BUDGET", "fused_block_bwd.fits_mlp_bwd_fullgrad",
         "r3", "VMEM math",
         "weights (io dtype) 2WI + fp32 accums 8WI + live set under the "
         "64MB pin: admits W=768/I=3072 (~42MB at S=197) and bf16 "
         "S=52/W=1024 (55MB), excludes S=257/W=1024 (~74MB) and ANY fp32 "
         "W=1024 (67MB — Mosaic rejected it by 28KB on chip; the gate is "
         "esize-aware since that incident)"),
    Gate("MLP_FULLGRAD_WIDE_BUDGET",
         "fused_block_bwd.fits_mlp_bwd_fullgrad_wide", "r3",
         "measured A/B (NEGATIVE — not routed)",
         "wide tier (resident accums > the 64MB pin) admits bf16 L224 "
         "image MLP (S=257/W=1024 ~82MB; W=1280/S=577/fp32 don't fit "
         "any pin). Compiles + gradient-exact but LOSES the full L224 "
         "train step 177.2 vs 185.3 pairs/s: tile=1 leaves the wgrad "
         "contractions S rows per grid step vs XLA's one [B*S]-row "
         "batched einsum. Tested opt-in; dispatch never routes it"),
    Gate("VMEM_MLP_FULLGRAD_WIDE",
         "fused_block_bwd.fused_mlp_block_bwd_fullgrad", "r3",
         "compile bound",
         "the (opt-in) wide fullgrad cell's pin — L224 cell compiled and "
         "ran under it on chip"),
    Gate("ATTN_FULLGRAD_WIDE_BUDGET",
         "fused_block_bwd.fits_attn_bwd_fullgrad_wide", "r3",
         "measured A/B (NEUTRAL — not routed)",
         "W=1280 S=257 pre-LN cell ~63MB bf16 under the 110MB pin; "
         "compiles + gradient-exact, but the same-process H bs64 "
         "full-step A/B is EXACTLY neutral (734.3 vs 734.4 ms): the "
         "saved [B,S,5W] emission traffic is repaid by tile=1 short-row "
         "in-kernel wgrads. Tested opt-in; the one-shot emitting kernel "
         "+ XLA einsums stay routed at W=1280"),
    Gate("ATTN_FULLGRAD_WIDE_MAX_SEQ",
         "fused_block_bwd.fits_attn_bwd_fullgrad_wide", "r3",
         "measured A/B (r2)",
         "S=577 keeps the head-chunked bwd (hpc=4, 9.709 ms beat "
         "flash-block 11.0 / XLA 15.6 in full-step drives) — the wide "
         "fullgrad tier must not silently displace it"),
    Gate("ATTN_FULLGRAD_BUDGET", "fused_block_bwd.fits_attn_bwd_fullgrad",
         "r3", "VMEM math",
         "weights 8W^2 bytes + fp32 accums 16W^2 + one-shot live set: "
         "admits W=768 (~23MB) and W=1024 S=257 (~43MB); excludes "
         "W=1280 (~61MB — too close to the 64MB pin once Mosaic "
         "double-buffers io)"),
    Gate("HEAD_CHUNK_BUDGET", "fused_block_bwd.attn_bwd_head_chunk", "r2",
         "measured A/B",
         "raised 10->24MB so S=577 picks hpc=4: block fwd+grad 9.709 ms "
         "vs 10.111 (hpc=2), 10.392 (hpc=8), 11.024 (flash-block), "
         "15.6 (XLA-recompute) -> L-336 bs32 trains at 74.5 pairs/s"),
    Gate("LAYER_CELL_BUDGET", "layer_kernel.layer_cell_tile", "r2",
         "VMEM math", "both weight sets (<=25MB at W=1024) + both "
         "sub-blocks' live sets under the 64MB pin"),
    Gate("LAYER_TILE_CAP", "layer_kernel.layer_cell_tile", "r2",
         "measured A/B", "text S=52 tile=8 wins 1.040x"),
    Gate("LAYER_ROUTE_MIN_TILE", "layer_kernel.route_layer", "r2",
         "measured A/B",
         "tile>=4 gate: S=52 tile=8 WINS 1.040x (13447 vs 12932 "
         "samples/s); S=197 tile=1 LOSES 0.963x (4032 vs 4188 img/s)"),
    Gate("LAYER_MAX_SEQ", "layer_kernel.fits_layer", "r2", "VMEM math",
         "one-shot shapes only; long seqs route the sub-block kernels"),
    Gate("LAYER_FULLGRAD_BUDGET", "layer_bwd.fits_layer_bwd_fullgrad",
         "r4", "VMEM math",
         "combined attn+MLP bwd cell ~65MB at ViT-B S=197 under the "
         "110MB VMEM_TOWER pin (the r2 arithmetic only ruled out 64MB)"),
    Gate("LAYER_BWD_ROUTE", "layer_bwd.route_layer_bwd", "r4",
         "measured A/B",
         "MEASURED NEGATIVE: same-process ViT-B bs512 steps-per-call-4 "
         "full-step drive 701.2 (combined) vs 761.7/761.2 pairs/s "
         "(two-kernel arms) = 0.92x, losses bit-identical — the combined "
         "cell's ~65MB residency starves Mosaic's cross-grid weight "
         "double-buffering of more than the saved dx round trip buys; "
         "kernel stays a tested opt-in (NANS_LAYER_BWD=1)"),
    Gate("TOWER_BUDGET", "tower_kernel.tower_batch_tile", "r2",
         "VMEM math", "100MB under the 110MB pin"),
    Gate("(tower qdma probe)", "tower_kernel.fused_tower(quant_dma)", "r4",
         "measured A/B",
         "MEASURED NEGATIVE: dequant-ahead manual-DMA int8 tower at "
         "ViT-B image batch-1 0.929 ms vs 0.769 inline (0.83x) and at "
         "the text-large shape 1.361 vs 0.934 (0.69x), outputs "
         "bit-identical — manual DMA forfeits Mosaic's automatic "
         "prefetch, worst exactly where DMA dominates; W=1280 cell "
         "impossible (3x int8 + 2x deq ~138MB > VMEM). Tested opt-in "
         "only; int8 routing stays per-tower text"),
    Gate("TOWER_TILE_CAP", "tower_kernel.tower_batch_tile", "r2",
         "measured A/B", "serving-batch kernel; tiles beyond 32 never "
         "routed (TOWER_MAX_RESTREAMS gates first)"),
    Gate("TOWER_MAX_WIDTH", "tower_kernel.tower_batch_tile", "r3",
         "measured A/B",
         "W=1280 tile=1 (78.6MB weights + ~13MB acts < 110MB pin) "
         "compiles and WINS: ViT-H image batch-1 3.287 vs 3.922 ms "
         "per-block (1.19x, rel 8e-3). See PARITY.md W=1280 tower note"),
    Gate("TOWER_MAX_RESTREAMS", "tower_kernel.fits_tower", "r2",
         "measured A/B",
         "batch-1 text 1.52x / image 1.36x over per-block; bs256 "
         "neutral (3100 vs 3121 pairs/s) -> route only b <= 4 tiles. "
         "Gate edge re-checked r3 at the heaviest cell (W=1280 tile=1, "
         "4x 1.26GB weight restreams): batch-4 exactly neutral (10.494 "
         "vs 10.495 ms) while batch-1 wins 1.19x — the cap holds"),
    Gate("MAX_PALLAS_SEQ", "attention.mha (attn_impl='pallas')", "r1",
         "VMEM math", "plain full-row kernel's seq bound (long-seq path)"),
    Gate("(int8 tower streaming)", "tower_kernel._tower_kernel_q", "r3",
         "measured A/B",
         "weight-only int8 streaming (utils/quantize.py), opt-in per "
         "tower, same-process batch-1 A/Bs vs the bf16 tower: text "
         "W=768/L12 1.21x (0.676 -> 0.560 ms), text W=1024/L24 1.45x "
         "(1.543 -> 1.065), image ViT-B S=197 1.03x (0.699 -> 0.682), "
         "image ViT-H S=257/W=1280 LOSES 0.89x (2.900 -> 3.266) — long "
         "rows make the cell compute-bound and the in-VMEM dequant "
         "lands on the critical path. No routing constant: "
         "quantize_for_serving(towers=...) is the user-facing switch; "
         "tile math reuses TOWER_* (int8 double-buffer + one dequantized "
         "copy == the bf16 double-buffer at esize=2)"),
    Gate("(text b1 embed/proj fold)", "tower_kernel (not built)", "r5",
         "measured A/B",
         "MEASURED NEGATIVE by decomposition (benchmarks/bench_text_b1.py"
         ", two-point inner-loop fit 64/256 — immune to the RTT variance "
         "that breaks single-subtraction): full encode_text batch-1 "
         "DEVICE time 0.266 ms (RoBERTa-base) / 0.819 (large); the "
         "out-of-kernel glue (embedding gather+LN pre, CLS+projection "
         "post) measures <= 0.02 ms ~ 0.1% of it — there is nothing for "
         "the mega-kernel to recover by folding them in, and the fold "
         "would cost 52 scalar-indexed vocab-row DMAs or a one-hot "
         "[S,V]x[V,W] matmul streaming the full 32 MB table. The "
         "published 0.518 ms text b1 row is ~0.25 ms harness RTT "
         "(raw inner-64 re-measured 0.622 ms in the same process): "
         "device-corrected text b1 is 5.8x T4-TRT (base) / 4.75x "
         "(large), vs the conservative raw 3.0x/3.6x"),
    Gate("(img b1 patch-embed fold)", "tower_kernel (not built)", "r5",
         "measured A/B",
         "BOUNDED NEGATIVE (same two-point method, --img-glue): ViT-B "
         "image b1 device 0.268 ms of which pre-tower glue (patch-embed "
         "matmul + cls/pos + ln_pre) is 0.017 ms and post (ln_post+proj) "
         "~0 — 6.5% total. A tower-kernel fold still executes the "
         "patch-embed matmul; what it can actually remove is the "
         "[1,197,W] inter-kernel HBM round trip (~0.3 MB ~ 0.4 us at "
         "819 GB/s) plus one async-dispatch boundary — an upper bound "
         "well under 0.01 ms (<4%), not worth the Mosaic relayout of "
         "the [R,R,3]->[S,ppx3] transpose in-kernel"),
)


def check() -> None:
    """Assert every PROVENANCE record names a real constant, and that the
    kernel modules actually use the table's values (import identity)."""
    g = globals()
    names = [r.name for r in PROVENANCE]
    assert len(names) == len(set(names)), "duplicate provenance record"
    for r in PROVENANCE:
        # "(...)" records document measured routing DECISIONS that have
        # no tunable constant (e.g. the int8 tower-streaming verdicts)
        assert r.name.startswith("(") or r.name in g, \
            f"provenance names unknown constant {r.name}"
    # every module-level int constant has a record (except MiB helper)
    consts = {k for k, v in g.items()
              if k.isupper() and isinstance(v, int) and k != "MiB"}
    missing = consts - set(names)
    assert not missing, f"constants without provenance: {sorted(missing)}"

    from nans_clip_tpu.ops import (attention, fused_block, fused_block_bwd,
                                   layer_kernel, tower_kernel)
    for mod in (fused_block, fused_block_bwd, layer_kernel, tower_kernel,
                attention):
        for k in consts:
            if hasattr(mod, k):
                assert getattr(mod, k) == g[k], (
                    f"{mod.__name__}.{k} diverged from gates.{k}")


def table() -> str:
    w = max(len(r.name) for r in PROVENANCE)
    lines = [f"routing gates — {CHIP}", ""]
    for r in PROVENANCE:
        v = globals().get(r.name)
        if v is None:          # informational "(...)" decision record
            vs = "—"
        else:
            vs = f"{v // MiB}MB" if v >= MiB and v % MiB == 0 else str(v)
        lines.append(f"{r.name:<{w}} = {vs:>6}  [{r.round}, {r.kind}] "
                     f"{r.used_in}")
        lines.append(f"{'':<{w}}   {'':>6}  {r.evidence}")
    return "\n".join(lines)


if __name__ == "__main__":
    check()
    print(table())
