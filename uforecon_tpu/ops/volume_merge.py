"""Encode-time fusion of the three per-view stage volumes into ONE volume.

The render loop's dominant cost is correlation-volume trilinear gathers:
3 stages x NV views = 9 corner-packed rows per sample point (7.96 s of the
17.24 s/image round-2 profile; reference semantics
/root/reference/code1/model.py:350-390 query_depth_from_volume). The
per-row cost is issue-rate-bound and measured width-independent well past
a 128-lane tile (script/bench_wide_gather.py, round 5: 72-lane rows 17.45
ns/row vs 200-lane 19.27 and 256-lane 18.03 from multi-GB sources) — so
concatenating each view's three stage feature volumes channel-wise on a
common grid turns 9 rows/point into 3 rows/point at ~1.1x the per-row
cost.

All three stage volumes are sampled with the SAME normalized (x, y pixel
NDC, z by scene near/far) coordinates (align_corners=True), so the merge
is purely geometric: resample each stage onto a common (D_m, H, W) grid
with align-corners trilinear interpolation and concatenate. The per-point
fusion math is preserved exactly in form:

    exact:  G = sum_v concat_s(f_sv) * (sum_s w_sv) / sum_v sum_s w_sv
    merged: G = sum_v trilin(concat_s rs(f_sv)) * trilin(sum_s rs(w_sv))
                / sum_v trilin(sum_s rs(w_sv))

where rs() is the common-grid resample. When a stage's grid already
equals the common grid, rs() is the identity (bit-exact, tested); for
coarser stages trilin(rs(f)) is the common-grid re-discretization of the
same interpolant — a METRIC-parity approximation (the north-star budget
is chamfer within 2%, not bit parity; VERDICT r4 #1), gated by
learn_sanity mesh metrics and the fused-vs-exact tolerance tests.

The common grid defaults to the finest stage's: full image (H, W) in xy
(stage 3 carries the full-res signal) and Config.merge_depth z-bins
(default = stage 3's ndepth; coarse stages lose z-resolution — the
measured trade for 3x fewer gather rows).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from .grid_sample import pack_volume_corners


def resize_axis_linear_ac(vol: jnp.ndarray, axis: int,
                          n_out: int) -> jnp.ndarray:
    """Linear resample of one axis with align_corners=True semantics.

    Output position j maps to input position j * (n_in-1)/(n_out-1) (the
    grid_sample align_corners convention both the exact samplers and the
    NDC projection use). Implemented as two full-slice takes + an
    elementwise lerp: exact f32 (no TPU matmul bf16 rounding), and an
    exact identity when n_out == n_in (the fractional part is zero).
    """
    n_in = vol.shape[axis]
    if n_in == n_out:
        return vol
    if n_in == 1:
        reps = [1] * vol.ndim
        reps[axis] = n_out
        return jnp.tile(vol, reps)
    pos = jnp.linspace(0.0, float(n_in - 1), n_out)
    i0 = jnp.clip(jnp.floor(pos), 0, n_in - 2).astype(jnp.int32)
    f = (pos - i0.astype(pos.dtype)).astype(vol.dtype)
    shape = [1] * vol.ndim
    shape[axis] = n_out
    f = f.reshape(shape)
    a = jnp.take(vol, i0, axis=axis)
    b = jnp.take(vol, i0 + 1, axis=axis)
    return a * (1.0 - f) + b * f


def resize_trilinear_ac(vol: jnp.ndarray,
                        out_dhw: Tuple[int, int, int]) -> jnp.ndarray:
    """(NV, D, H, W, C) -> (NV, D', H', W', C) align-corners trilinear."""
    d, h, w = out_dhw
    # depth first (always a reduction or identity here), then the two
    # upsampled image axes — keeps the largest intermediate smallest
    vol = resize_axis_linear_ac(vol, 1, d)
    vol = resize_axis_linear_ac(vol, 2, h)
    vol = resize_axis_linear_ac(vol, 3, w)
    return vol


def merge_stage_volumes(
    fws: Dict[str, jnp.ndarray],
    d_out: int,
    hw_out: Tuple[int, int],
    dtype: jnp.dtype = jnp.bfloat16,
    corner_pad: Optional[int] = None,
) -> jnp.ndarray:
    """Fuse per-stage feat||weight volumes into one corner-packed volume.

    Args:
      fws: stage name -> (NV, D_s, h_s, w_s, F+1) with features [..., :F]
        and the fusion weight [..., F:]; stages in reference concat order
        (stage1, stage2, stage3 — model.py:383 concatenates in stage
        order).
      d_out, hw_out: common grid (z-bins, (H, W)).
      dtype: storage dtype of the packed volume (bf16 default, as the
        exact path stores).
      corner_pad: optional per-corner channel pad (e.g. 32 makes the
        packed row exactly 256 lanes; measured 18.03 vs 19.27 ns/row at
        200 lanes — script/bench_wide_gather.py — for +28% HBM).

    Returns:
      (NV, d_out, H, W, 8 * C') packed volume with C' = corner_pad or
      (n_stages * F + 1): concatenated stage features then the summed
      weight as the LAST true channel.
    """
    feats = []
    wsum = None
    for stage in sorted(fws.keys()):
        fw = fws[stage]
        r = resize_trilinear_ac(fw, (d_out,) + tuple(hw_out))
        feats.append(r[..., :-1])
        w = r[..., -1:]
        wsum = w if wsum is None else wsum + w
    merged = jnp.concatenate(feats + [wsum], axis=-1)
    # cast BEFORE corner-packing: packing in f32 materializes an 8x
    # (D, H, W, 8C') f32 transient (4.9 GB at D=12 production res — the
    # OOM that capped merge_depth at 8 in the first round-5 sweep); the
    # pack itself is shifts/pads, identical in bf16
    return pack_volume_corners(merged.astype(dtype), corner_pad=corner_pad)


def query_merged_volume(packed: jnp.ndarray, xyz: jnp.ndarray,
                        n_feat: int) -> jnp.ndarray:
    """Sample + cross-view fuse from a merged volume: ONE gather row per
    (point, view) instead of one per (point, view, stage).

    Args:
      packed: (NV, D, H, W, 8*C') merged corner-packed volume.
      xyz: (NV, RN, SN, 3) normalized sample coordinates (the same ones
        the exact path feeds every stage).
      n_feat: true feature channel count (n_stages * F).

    Returns:
      (RN, SN, n_feat) fused features — same output contract (and the
      same final ratio math, incl. the 1e-8 guard) as the exact path in
      query_correlation_volume.
    """
    from .grid_sample import grid_sample_3d_packed

    c_true = n_feat + 1
    c_out = None if packed.shape[-1] == 8 * c_true else c_true
    fw = grid_sample_3d_packed(packed, xyz, align_corners=True,
                               padding_mode="zeros", c_out=c_out)
    feats = fw[..., :n_feat]
    w = fw[..., n_feat:n_feat + 1]
    g = jnp.sum(feats * w, axis=0)
    w_all = jnp.sum(w, axis=0)
    return g / (w_all + 1e-8)
