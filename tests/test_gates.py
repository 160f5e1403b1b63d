"""The routing-gate provenance table (ops/gates.py) cannot drift from the
kernel modules: every constant has a provenance record, every record names
a live constant, and module-local copies (if any reappear) must match."""

from nans_clip_tpu.ops import gates


def test_provenance_table_consistent():
    gates.check()


def test_table_renders():
    t = gates.table()
    assert "VMEM_RAISED" in t and "measured A/B" in t


def test_routing_matrix_unchanged():
    """The derived routed-cell matrix over the model zoo shapes — if this
    changes, it must be deliberate (and the on-chip sweep re-run)."""
    from nans_clip_tpu.ops import fused_block as fb
    from nans_clip_tpu.ops import fused_block_bwd as fbb

    zoo = {"vit_b": (197, 768, 12), "vit_l": (257, 1024, 16),
           "vit_l336": (577, 1024, 16), "vit_h": (257, 1280, 16),
           "text_base": (52, 768, 12), "text_large": (52, 1024, 16)}
    matrix = {
        name: dict(
            attn_oneshot=fb.fits_fused(s, w),
            attn_wide=fb.fits_fused_wide(s, w),
            mlp_oneshot=(fb.fits_fused_mlp(s, w)
                         or fb.fits_fused_mlp_oneshot(s, w)),
            mlp_tiled=fb.fits_fused_mlp_tiled(s, w),
            attn_bwd_oneshot=fbb.fits_attention_bwd(s, w, h),
            attn_bwd_chunked=fbb.attn_bwd_head_chunk(s, w, h) is not None,
            bert_bwd=fbb.fits_bert_attention_bwd(s, w, h),
            mlp_bwd=fbb.fits_fused_mlp_bwd(s, w),
            attn_fullgrad=fbb.fits_attn_bwd_fullgrad(s, w, h),
            mlp_fullgrad=fbb.fits_mlp_bwd_fullgrad(s, w, 4 * w),
        ) for name, (s, w, h) in zoo.items()}

    expected = {
        "vit_b": dict(attn_oneshot=True, attn_wide=False, mlp_oneshot=True,
                      mlp_tiled=False, attn_bwd_oneshot=True,
                      attn_bwd_chunked=True, bert_bwd=True, mlp_bwd=False,
                      attn_fullgrad=True, mlp_fullgrad=True),
        "vit_l": dict(attn_oneshot=True, attn_wide=False, mlp_oneshot=False,
                      mlp_tiled=True, attn_bwd_oneshot=True,
                      attn_bwd_chunked=True, bert_bwd=False, mlp_bwd=False,
                      attn_fullgrad=True, mlp_fullgrad=False),
        "vit_l336": dict(attn_oneshot=True, attn_wide=False,
                         mlp_oneshot=False, mlp_tiled=True,
                         attn_bwd_oneshot=False, attn_bwd_chunked=True,
                         bert_bwd=False, mlp_bwd=False,
                         attn_fullgrad=False, mlp_fullgrad=False),
        "vit_h": dict(attn_oneshot=True, attn_wide=True, mlp_oneshot=False,
                      mlp_tiled=True, attn_bwd_oneshot=True,
                      attn_bwd_chunked=True, bert_bwd=False, mlp_bwd=False,
                      attn_fullgrad=False, mlp_fullgrad=False),
        "text_base": dict(attn_oneshot=True, attn_wide=False,
                          mlp_oneshot=True, mlp_tiled=False,
                          attn_bwd_oneshot=True, attn_bwd_chunked=True,
                          bert_bwd=True, mlp_bwd=True,
                          attn_fullgrad=True, mlp_fullgrad=True),
        "text_large": dict(attn_oneshot=True, attn_wide=False,
                           mlp_oneshot=True, mlp_tiled=True,
                           attn_bwd_oneshot=True, attn_bwd_chunked=True,
                           bert_bwd=True, mlp_bwd=True,
                           attn_fullgrad=True, mlp_fullgrad=True),
    }
    assert matrix == expected, matrix


def test_sub_lane_widths_route_xla():
    """Widths that aren't a multiple of the 128-lane vreg must fail every
    fused fwd gate (Mosaic rejects the [T,S,W]->[T*S,W] shape cast — found
    driving a width-64 config on chip, r3). The bwd gates are only reached
    through a fused fwd, so gating fwd suffices."""
    from nans_clip_tpu.ops import fused_block as fb

    for s, w in [(5, 64), (197, 96), (52, 640 + 64), (257, 1000)]:
        assert not fb.fits_fused(s, w), (s, w)
        assert not fb.fits_fused_wide(s, w), (s, w)
        assert not fb.fits_fused_mlp(s, w), (s, w)
        assert not fb.fits_fused_mlp_oneshot(s, w), (s, w)
        assert not fb.fits_fused_mlp_tiled(s, w), (s, w)
