"""Fused per-point view head, point-major — Pallas TPU kernel (v2).

Same math as ``ops/fused_point_head.py`` (reference ray_transformer.py:
175-321: pre-similarity MLP, view-token linear attention, LoFTR layer,
radiance masked-softmax blend) but with the POINT axis on sublanes and
features on lanes — the layout XLA gathers already produce. The v1 kernel
wanted feature-major (C, P) slabs, which cost ~2s/image of host-side
transposes; v2 consumes the (NV, P, C) gather outputs directly and emits
the (P, C) token that the fused along-ray kernel (ops/fused_ray_head.py)
takes as-is, so no relayout pass remains anywhere between the gathers and
the SRDF.

The per-view 80-channel feature vector [img||vol||sim16||pe] is never
materialized: every consumer is decomposed into split-weight matmuls
against the raw inputs (q_v = img_v@Wq[0:32] + vol@Wq[32:56] + ..., the
LoFTR concat-MLP and the radiance head likewise), with the view-shared
contributions (vol, sim16) computed once. The weight splits happen on the
host at trace time; the kernel sees ready slices. Per-head attention
reductions over the lane axis use two static 0/1 matmuls (head-sum and
head-broadcast) instead of lane segment ops.

Backward reuses the v1 reference implementation via ``jax.vjp`` (inputs
are transposed to feature-major inside the backward only — training runs
tiny chunks).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_point_head import (PointHeadInputs, PointHeadParams, _EPS,
                               _pe_sin, _ph_bwd, point_head_reference)
from .fused_ray_head import _ln_lanes, _phi, _use_interpret
from .kernel_precision import kernel_dot

_BLK = 512


class PointHeadInputs2(NamedTuple):
    """Per-chunk point tensors, point-major (natural gather-output layout)."""

    img_feat: jnp.ndarray   # (NV, P, C_img)
    vol_feat: jnp.ndarray   # (P, C_vol)
    sim_feat: jnp.ndarray   # (P, 8) raw cosine groups (pre pre_sim_mlp)
    depth_dist: jnp.ndarray  # (NV, P) sampled-MVS-depth minus point cam-z
    dir_rel: jnp.ndarray    # (NV, P, 3)
    rgb: jnp.ndarray        # (NV, P, 3)
    mask: jnp.ndarray       # (NV, P)


def _kernel(nv, c, n_heads,
            img_ref, vol_ref, sim_ref, dd_ref, dir_ref, rgb_ref, mask_ref,
            tok_x, tok_qkv,
            wq_i, wq_v, wq_s, wq_p,
            wk_i, wk_v, wk_s, wk_p,
            wv_i, wv_v, wv_s, wv_p,
            wm, n1s, n1b,
            w1a_i, w1a_v, w1a_s, w1a_p, w1a_tok, w1b, w2, n2s, n2b,
            sw0, sb0, sw1, sb1, sw2, sb2,
            r0_i, r0_v, r0_s, r0_p, r0_m2, r0_d, rb0,
            rw1, rb1, rw2, rb2,
            token_out, rad_out):
    blk = vol_ref.shape[0]
    L = nv + 1
    dk = c // n_heads
    f32 = jnp.float32

    def mm(x, w_ref):
        # default true-f32 passes; UFO_KERNEL_PRECISION=high selects manual
        # bf16x3 (see fused_point_head.py / kernel_precision.py)
        return kernel_dot(x, w_ref[:], (((1,), (0,)), ((), ())))

    # pre-similarity MLP (shared across views)
    s = jnp.maximum(mm(sim_ref[:], sw0) + sb0[:][None, :], 0.0)
    s = jnp.maximum(mm(s, sw1) + sb1[:][None, :], 0.0)
    sim16 = mm(s, sw2) + sb2[:][None, :]                   # (P, 16)

    vol = vol_ref[:]                                       # (P, C_vol)

    # static head-sum / head-broadcast matrices
    hs = (jax.lax.broadcasted_iota(jnp.int32, (c, n_heads), 0) // dk
          == jax.lax.broadcasted_iota(jnp.int32, (c, n_heads), 1)
          ).astype(f32)                                    # (C, H)
    hb = (jax.lax.broadcasted_iota(jnp.int32, (n_heads, c), 0)
          == jax.lax.broadcasted_iota(jnp.int32, (n_heads, c), 1) // dk
          ).astype(f32)                                    # (H, C)

    # q/k/v per token: view-shared contributions once
    q_sh = mm(vol, wq_v) + mm(sim16, wq_s)
    k_sh = mm(vol, wk_v) + mm(sim16, wk_s)
    v_sh = mm(vol, wv_v) + mm(sim16, wv_s)

    # NeRF depth PE computed in place, point-major (BLK, 8)
    pe_k = jax.lax.broadcasted_iota(jnp.int32, (blk, 8), 1)
    pe = [_pe_sin(dd_ref[v][:, None], pe_k) for v in range(nv)]

    qf = [None] * L
    kf = [None] * L
    vv = [None] * L
    qf[0] = _phi(jnp.broadcast_to(tok_qkv[0][None, :], (blk, c)))
    kf[0] = _phi(jnp.broadcast_to(tok_qkv[1][None, :], (blk, c)))
    vv[0] = jnp.broadcast_to(tok_qkv[2][None, :], (blk, c))
    for v in range(nv):
        img_v = img_ref[v]
        pe_v = pe[v]
        qf[1 + v] = _phi(q_sh + mm(img_v, wq_i) + mm(pe_v, wq_p))
        kf[1 + v] = _phi(k_sh + mm(img_v, wk_i) + mm(pe_v, wk_p))
        vv[1 + v] = v_sh + mm(img_v, wv_i) + mm(pe_v, wv_p)

    # linear attention over the L-token view axis, per point
    att = [None] * L
    for l in range(L):
        acc = jnp.zeros((blk, c), f32)
        den = jnp.zeros((blk, n_heads), f32)
        for sidx in range(L):
            sc = mm(qf[l] * kf[sidx], hs)                  # (P, H)
            den = den + sc
            acc = acc + mm(sc, hb) * vv[sidx]
        att[l] = acc / (mm(den, hb) + _EPS)

    # LoFTR tail per token; x_l is consumed only through split weights
    m2 = [None] * L
    mlp_sh = mm(vol, w1a_v) + mm(sim16, w1a_s)
    for l in range(L):
        msg = _ln_lanes(mm(att[l], wm), n1s[:], n1b[:])
        if l == 0:
            xl_w1 = jnp.broadcast_to(w1a_tok[:], (blk, w1b.shape[1]))
        else:
            xl_w1 = mlp_sh + mm(img_ref[l - 1], w1a_i) + mm(pe[l - 1], w1a_p)
        y = jnp.maximum(xl_w1 + mm(msg, w1b), 0.0)         # (P, 2C)
        m2[l] = _ln_lanes(mm(y, w2), n2s[:], n2b[:])

    token_out[:] = jnp.broadcast_to(tok_x[:][None, :], (blk, c)) + m2[0]

    # radiance: out_v = x_v + m2_v enters only through r0 splits
    rad_sh = mm(vol, r0_v) + mm(sim16, r0_s)
    logits = []
    for v in range(nv):
        z = (rad_sh + mm(img_ref[v], r0_i) + mm(pe[v], r0_p)
             + mm(m2[1 + v], r0_m2) + mm(dir_ref[v], r0_d) + rb0[:][None, :])
        z = jnp.maximum(z, 0.0)
        z = jnp.maximum(mm(z, rw1) + rb1[:][None, :], 0.0)
        z = mm(z, rw2) + rb2[:][None, :]                   # (P, 1)
        logits.append(jnp.where(mask_ref[v][:, None] == 0, -1e9, z))
    mx = logits[0]
    for v in range(1, nv):
        mx = jnp.maximum(mx, logits[v])
    es = [jnp.exp(lg - mx) for lg in logits]
    denom = es[0]
    for v in range(1, nv):
        denom = denom + es[v]
    rad = jnp.zeros((blk, 3), f32)
    for v in range(nv):
        rad = rad + rgb_ref[v] * (es[v] / denom)
    rad_out[:] = rad


def point_head2_fused(inp: PointHeadInputs2, p: PointHeadParams,
                      n_heads: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused forward: returns (token (P, C), radiance (P, 3))."""
    nv, n, ci = inp.img_feat.shape
    cv = inp.vol_feat.shape[-1]
    cs = p.sim_w[2].shape[-1]
    c = p.view_token.shape[-1]
    f32 = jnp.float32

    pad = (-n) % _BLK
    if pad:
        def pad_pts(x, axis):
            cfg = [(0, 0)] * x.ndim
            cfg[axis] = (0, pad)
            return jnp.pad(x, cfg)

        padded = PointHeadInputs2(
            img_feat=pad_pts(inp.img_feat, 1),
            vol_feat=pad_pts(inp.vol_feat, 0),
            sim_feat=pad_pts(inp.sim_feat, 0),
            depth_dist=pad_pts(inp.depth_dist, 1),
            dir_rel=pad_pts(inp.dir_rel, 1),
            rgb=pad_pts(inp.rgb, 1),
            mask=pad_pts(inp.mask, 1),
        )
    else:
        padded = inp
    np_ = n + pad
    grid = (np_ // _BLK,)

    tok = p.view_token.reshape(-1).astype(f32)
    wq = p.wq.astype(f32)
    wk = p.wk.astype(f32)
    wv = p.wv.astype(f32)
    w1 = p.w1.astype(f32)
    # feature-group row offsets inside the 80-channel token vector
    o0, o1, o2, o3 = 0, ci, ci + cv, ci + cv + cs

    def rows(w, a, b):
        return w[a:b]

    # HIGHEST: these host-side token projections must keep the same
    # true-f32 invariant as the in-kernel dots (TPU default rounds to bf16)
    hp = jax.lax.Precision.HIGHEST
    tok_qkv = jnp.stack([jnp.dot(tok, w, precision=hp) for w in (wq, wk, wv)])
    w1a = w1[:c]
    w1a_tok = jnp.dot(tok, w1a, precision=hp)              # (2C,)
    r0 = p.rad_w[0].astype(f32)                            # (C+3, 16)

    weights = [
        tok, tok_qkv,
        rows(wq, o0, o1), rows(wq, o1, o2), rows(wq, o2, o3), rows(wq, o3, c),
        rows(wk, o0, o1), rows(wk, o1, o2), rows(wk, o2, o3), rows(wk, o3, c),
        rows(wv, o0, o1), rows(wv, o1, o2), rows(wv, o2, o3), rows(wv, o3, c),
        p.wmerge.astype(f32),
        p.norm1_scale.astype(f32), p.norm1_bias.astype(f32),
        rows(w1a, o0, o1), rows(w1a, o1, o2), rows(w1a, o2, o3),
        rows(w1a, o3, c), w1a_tok, w1[c:], p.w2.astype(f32),
        p.norm2_scale.astype(f32), p.norm2_bias.astype(f32),
        p.sim_w[0].astype(f32), p.sim_b[0].astype(f32),
        p.sim_w[1].astype(f32), p.sim_b[1].astype(f32),
        p.sim_w[2].astype(f32), p.sim_b[2].astype(f32),
        rows(r0, o0, o1), rows(r0, o1, o2), rows(r0, o2, o3), rows(r0, o3, c),
        r0[:c], rows(r0, c, c + 3), p.rad_b[0].astype(f32),
        p.rad_w[1].astype(f32), p.rad_b[1].astype(f32),
        p.rad_w[2].astype(f32), p.rad_b[2].astype(f32),
    ]

    def vspec(*tail):
        # (NV, P, ...) inputs blocked along the point axis
        nd = len(tail)
        return pl.BlockSpec((nv, _BLK) + tail,
                            lambda i: (0, i) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def pspec(*tail):
        # (P, ...) tensors blocked along the point axis
        nd = len(tail)
        return pl.BlockSpec((_BLK,) + tail,
                            lambda i: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    token, rad = pl.pallas_call(
        functools.partial(_kernel, nv, c, n_heads),
        out_shape=[
            jax.ShapeDtypeStruct((np_, c), f32),
            jax.ShapeDtypeStruct((np_, 3), f32),
        ],
        grid=grid,
        in_specs=[
            vspec(ci), pspec(cv), pspec(inp.sim_feat.shape[-1]),
            vspec(), vspec(3), vspec(3), vspec(),
        ] + [wspec(w.shape) for w in weights],
        out_specs=[pspec(c), pspec(3)],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*padded, *weights)
    return token[:n], rad[:n]


def _to_v1_inputs(inp: PointHeadInputs2) -> PointHeadInputs:
    t2 = lambda a: a.transpose(0, 2, 1)   # (NV, P, C) -> (NV, C, P)
    return PointHeadInputs(
        img_feat=t2(inp.img_feat), vol_feat=inp.vol_feat.T,
        sim_feat=inp.sim_feat.T, depth_dist=inp.depth_dist,
        dir_rel=t2(inp.dir_rel), rgb=t2(inp.rgb), mask=inp.mask,
    )


def point_head2_reference(inp: PointHeadInputs2, p: PointHeadParams,
                          n_heads: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-JAX forward for parity tests / backward: v1 reference behind
    point-major transposes. Returns (token (P, C), radiance (P, 3))."""
    token, rad = point_head_reference(_to_v1_inputs(inp), p, n_heads)
    return token.T, rad.T


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def point_head2(inp: PointHeadInputs2, p: PointHeadParams, n_heads: int = 8):
    """Point-major per-point view head. Fused Pallas forward; exact
    reference backward."""
    return point_head2_fused(inp, p, n_heads)


def _ph2_fwd(inp, p, n_heads):
    return point_head2_fused(inp, p, n_heads), (inp, p)


def _ph2_bwd(n_heads, res, g):
    # Delegate to the v1 backward (reference-VJP scanned over point
    # segments — a single whole-chunk vjp OOMs v5e HBM at train shapes
    # alongside the encoder graph); transposes at the boundary only.
    inp, p = res
    di1, dp = _ph_bwd(n_heads, (_to_v1_inputs(inp), p), (g[0].T, g[1].T))
    t2 = lambda a: a.transpose(0, 2, 1)
    di = PointHeadInputs2(
        img_feat=t2(di1.img_feat), vol_feat=di1.vol_feat.T,
        sim_feat=di1.sim_feat.T, depth_dist=di1.depth_dist,
        dir_rel=t2(di1.dir_rel), rgb=t2(di1.rgb), mask=di1.mask,
    )
    return di, dp


point_head2.defvjp(_ph2_fwd, _ph2_bwd)
