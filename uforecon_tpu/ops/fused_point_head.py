"""Fused per-point view head — Pallas TPU kernel.

The render loop's per-point stage (reference ray_transformer.py:175-321:
pre-similarity MLP, view-token assembly, one LoFTR linear-attention layer,
radiance-weight MLP + masked softmax blend) is ~10^5 points x tiny matmuls.
Run as separate XLA ops it pays for every intermediate twice in HBM: the
(P, NV, C) assembly transposes, the (B, L*H*D) <-> (L*H*D, B) attention
layout flips, and the concat/residual tensors total several GB per chunk.

This kernel keeps the POINT axis on the 128-lane dimension end to end:
inputs arrive feature-major ((C, P) slabs — the host-side transposes are
dense-lane passes, measurably cheaper than lane-padded point-major loads
plus in-VMEM relayouts), every intermediate is (rows, BLK) in VMEM, all
projections are (C_out, C_in) @ (C_in, BLK) MXU matmuls, and only token +
radiance leave the kernel.

Math is identical to the pure-JAX reference (``point_head_reference``,
asserted in tests): phi(x)=elu(x)+1 linear attention with eps 1e-6
(attention/linear_attention.py:20-47), LoFTR post-concat encoder layer
(attention/transformer.py:7-58), flax LayerNorm semantics (eps 1e-6),
radiance masked softmax (ray_transformer.py:310-321).

The backward pass re-derives gradients from the reference implementation
via ``jax.vjp`` (the kernel is inference-hot; training time is encoder-
dominated), so autodiff through the fused path stays exact.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_precision import kernel_dot

_EPS = 1e-6      # linear attention denominator (linear_attention.py:46)
_LN_EPS = 1e-6   # flax LayerNorm default epsilon
# 512-point blocks: 4x fewer grid programs and wider MXU matmuls than 128
# (+6% image throughput); 1024 measured equal, so keep the smaller VMEM
_BLK = 512


class PointHeadParams(NamedTuple):
    """Weights of the per-point stage, all f32.

    Dense kernels keep the flax (in, out) orientation; the wrapper
    transposes once at trace time (tiny arrays, folded into the executable).
    """

    view_token: jnp.ndarray      # (C,)
    wq: jnp.ndarray              # (C, C)
    wk: jnp.ndarray
    wv: jnp.ndarray
    wmerge: jnp.ndarray
    norm1_scale: jnp.ndarray     # (C,)
    norm1_bias: jnp.ndarray
    w1: jnp.ndarray              # (2C, 2C)
    w2: jnp.ndarray              # (2C, C)
    norm2_scale: jnp.ndarray
    norm2_bias: jnp.ndarray
    sim_w: Tuple[jnp.ndarray, ...]   # ((8,32),(32,32),(32,16)) kernels
    sim_b: Tuple[jnp.ndarray, ...]   # ((32,),(32,),(16,))
    rad_w: Tuple[jnp.ndarray, ...]   # ((C+3,16),(16,8),(8,1))
    rad_b: Tuple[jnp.ndarray, ...]


class PointHeadInputs(NamedTuple):
    """Per-chunk point tensors, feature-major (feature rows, P lanes)."""

    img_feat: jnp.ndarray   # (NV, C_img, P)
    vol_feat: jnp.ndarray   # (C_vol, P)
    sim_feat: jnp.ndarray   # (8, P) raw cosine groups (pre pre_sim_mlp)
    depth_dist: jnp.ndarray  # (NV, P) sampled-MVS-depth minus point cam-z
    dir_rel: jnp.ndarray    # (NV, 3, P)
    rgb: jnp.ndarray        # (NV, 3, P)
    mask: jnp.ndarray       # (NV, P)


# The 8d depth positional encoding (NeRF PE of depth_dist, num_freqs=4 —
# ray_transformer.py:229-247 / ops/posenc.py nerf_posenc) is computed
# INSIDE the kernels: transposing 1 depth_dist row per view to
# feature-major costs 8x less than transposing the 8 encoded rows, and
# the sin/cos are VPU-free next to the matmuls.
_PE_FREQS = (np.pi * 2.0 ** np.repeat(np.arange(4), 2)).astype(np.float32)
_PE_PHASES = np.zeros(8, np.float32)
_PE_PHASES[1::2] = np.pi * 0.5


def _pe_sin(dd, k):
    """NeRF PE sin(f_k * dd + ph_k) from iota-built constants (Pallas
    kernels may not capture array constants). exp2 of the small integer
    iota reproduces the 2^(k//2) frequency ladder exactly."""
    f32 = jnp.float32
    f = jnp.exp2((k // 2).astype(f32)) * np.float32(np.pi)
    ph = (k % 2).astype(f32) * np.float32(np.pi * 0.5)
    return jnp.sin(dd * f + ph)


def _pe_rows(dd):
    """(BLK,) depth distances -> (8, BLK) NeRF PE, nerf_posenc parity."""
    k = jax.lax.broadcasted_iota(jnp.int32, (8, dd.shape[0]), 0)
    return _pe_sin(dd[None, :], k)


def _phi(x):
    # elu(x) + 1 without expm1 (not lowered by Pallas TPU)
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _layernorm_rows(x, scale, bias):
    """LayerNorm over the ROW (feature) axis of (C, BLK); flax semantics."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=0, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return (x - mean) * inv * scale[:, None] + bias[:, None]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(nv, c, n_heads,
            img_ref, vol_ref, sim_ref, dd_ref, dir_ref, rgb_ref, mask_ref,
            tok_w, wq, wk, wv, wm, n1s, n1b, w1, w2, n2s, n2b,
            sw0, sb0, sw1, sb1, sw2, sb2,
            rw0, rb0, rw1, rb1, rw2, rb2,
            token_out, rad_out):
    blk = img_ref.shape[-1]
    L = nv + 1
    dk = c // n_heads
    f32 = jnp.float32

    def mm(w_ref, x):
        # (C_out, C_in) @ (C_in, BLK). Default true-f32 passes, matching the
        # reference-VJP backward (default precision rounds to bf16 and
        # de-syncs forward from backward — see fused_ray_head.py);
        # UFO_KERNEL_PRECISION=high selects manual bf16x3 (kernel_precision).
        return kernel_dot(w_ref[:], x, (((1,), (0,)), ((), ())))

    # pre-similarity MLP (per point, broadcast to views afterwards)
    s = jnp.maximum(mm(sw0, sim_ref[:]) + sb0[:][:, None], 0.0)
    s = jnp.maximum(mm(sw1, s) + sb1[:][:, None], 0.0)
    sim16 = mm(sw2, s) + sb2[:][:, None]                  # (16, BLK)

    vol = vol_ref[:]                                      # (C_vol, BLK)
    xs = [jnp.broadcast_to(tok_w[:][:, None], (c, blk))]  # view token
    for v in range(nv):
        xs.append(jnp.concatenate(
            [img_ref[v], vol, sim16, _pe_rows(dd_ref[v])], axis=0))  # (C, BLK)

    qf = [None] * L
    kf = [None] * L
    vv = [None] * L
    for l in range(L):
        qf[l] = _phi(mm(wq, xs[l]).reshape(n_heads, dk, blk))
        kf[l] = _phi(mm(wk, xs[l]).reshape(n_heads, dk, blk))
        vv[l] = mm(wv, xs[l]).reshape(n_heads, dk, blk)

    outs = []
    for l in range(L):
        acc = jnp.zeros((n_heads, dk, blk), f32)
        den = jnp.zeros((n_heads, 1, blk), f32)
        for sidx in range(L):
            sc = jnp.sum(qf[l] * kf[sidx], axis=1, keepdims=True)
            den = den + sc
            acc = acc + sc * vv[sidx]
        att = (acc / (den + _EPS)).reshape(c, blk)
        msg = _layernorm_rows(mm(wm, att), n1s[:], n1b[:])
        y = jnp.concatenate([xs[l], msg], axis=0)          # (2C, BLK)
        y = jnp.maximum(mm(w1, y), 0.0)
        y = mm(w2, y)
        y = _layernorm_rows(y, n2s[:], n2b[:])
        outs.append(xs[l] + y)

    token_out[:] = outs[0]                                 # (C, BLK)

    # radiance: per-view weight MLP + masked softmax blend
    logits = []
    for v in range(nv):
        z = jnp.concatenate([outs[1 + v], dir_ref[v]], axis=0)  # (C+3, BLK)
        z = jnp.maximum(mm(rw0, z) + rb0[:][:, None], 0.0)
        z = jnp.maximum(mm(rw1, z) + rb1[:][:, None], 0.0)
        z = mm(rw2, z) + rb2[:][:, None]                        # (1, BLK)
        logits.append(jnp.where(mask_ref[v].reshape(1, blk) == 0, -1e9, z))
    lg = jnp.concatenate(logits, axis=0)                        # (NV, BLK)
    w = jax.nn.softmax(lg, axis=0)
    rad = jnp.zeros((3, blk), f32)
    for v in range(nv):
        rad = rad + rgb_ref[v] * w[v][None]
    rad_out[:] = rad                                            # (3, BLK)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def point_head_fused(inp: PointHeadInputs, p: PointHeadParams,
                     n_heads: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused forward: returns (token (C, P), radiance (3, P))."""
    nv, c_img, n = inp.img_feat.shape
    c = p.view_token.shape[-1]
    pad = (-n) % _BLK
    if pad:
        padded = PointHeadInputs(*[
            jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) for x in inp
        ])
    else:
        padded = inp
    np_ = n + pad
    grid = (np_ // _BLK,)

    def spec(*lead):
        nd = len(lead)
        return pl.BlockSpec(
            lead + (_BLK,),
            lambda i, nd=nd: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    weights = [
        p.view_token.reshape(-1).astype(f32),
        p.wq.T.astype(f32), p.wk.T.astype(f32), p.wv.T.astype(f32),
        p.wmerge.T.astype(f32),
        p.norm1_scale.astype(f32), p.norm1_bias.astype(f32),
        p.w1.T.astype(f32), p.w2.T.astype(f32),
        p.norm2_scale.astype(f32), p.norm2_bias.astype(f32),
        p.sim_w[0].T.astype(f32), p.sim_b[0].astype(f32),
        p.sim_w[1].T.astype(f32), p.sim_b[1].astype(f32),
        p.sim_w[2].T.astype(f32), p.sim_b[2].astype(f32),
        p.rad_w[0].T.astype(f32), p.rad_b[0].astype(f32),
        p.rad_w[1].T.astype(f32), p.rad_b[1].astype(f32),
        p.rad_w[2].T.astype(f32), p.rad_b[2].astype(f32),
    ]
    token, rad = pl.pallas_call(
        functools.partial(_kernel, nv, c, n_heads),
        out_shape=[
            jax.ShapeDtypeStruct((c, np_), f32),
            jax.ShapeDtypeStruct((3, np_), f32),
        ],
        grid=grid,
        in_specs=[
            spec(nv, padded.img_feat.shape[1]),
            spec(padded.vol_feat.shape[0]),
            spec(padded.sim_feat.shape[0]),
            spec(nv),
            spec(nv, 3),
            spec(nv, 3),
            spec(nv),
        ] + [wspec(w.shape) for w in weights],
        out_specs=[spec(c), spec(3)],
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*padded, *weights)
    return token[:, :n], rad[:, :n]


def point_head_reference(inp: PointHeadInputs, p: PointHeadParams,
                         n_heads: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-JAX forward, bit-matching the flax module path; used for the
    backward pass and for parity tests. Feature-major in/out like the
    kernel. True-f32 matmuls to match the HIGHEST-precision fused forward
    (see fused_ray_head.py)."""
    with jax.default_matmul_precision("float32"):
        return _point_head_reference_impl(inp, p, n_heads)


def _point_head_reference_impl(inp, p, n_heads):
    nv, c_img, n = inp.img_feat.shape
    c = p.view_token.shape[-1]

    def dense(x, w, b=None):  # x (.., C_in, P); w (C_in, C_out)
        y = jnp.einsum("...cp,cd->...dp", x, w)
        return y if b is None else y + b[:, None]

    s = jnp.maximum(dense(inp.sim_feat, p.sim_w[0], p.sim_b[0]), 0.0)
    s = jnp.maximum(dense(s, p.sim_w[1], p.sim_b[1]), 0.0)
    sim16 = dense(s, p.sim_w[2], p.sim_b[2])             # (16, P)

    # NeRF depth PE from the raw depth distances (nerf_posenc parity)
    pe = jnp.sin(inp.depth_dist[:, None, :] * _PE_FREQS[None, :, None]
                 + _PE_PHASES[None, :, None])            # (NV, 8, P)

    xs = [jnp.broadcast_to(p.view_token.reshape(-1)[:, None], (c, n))]
    for v in range(nv):
        xs.append(jnp.concatenate(
            [inp.img_feat[v], inp.vol_feat, sim16, pe[v]], axis=0))
    x = jnp.stack(xs)                                    # (L, C, P)

    dk = c // n_heads
    q = dense(x, p.wq).reshape(nv + 1, n_heads, dk, n)
    k = dense(x, p.wk).reshape(nv + 1, n_heads, dk, n)
    v_ = dense(x, p.wv).reshape(nv + 1, n_heads, dk, n)
    qf, kf = _phi(q), _phi(k)
    sc = jnp.einsum("lhdp,shdp->lshp", qf, kf)
    den = jnp.sum(sc, axis=1) + _EPS                     # (L, H, P)
    att = jnp.einsum("lshp,shdp->lhdp", sc, v_) / den[:, :, None]
    att = att.reshape(nv + 1, c, n)

    msg = dense(att, p.wmerge)
    mean = jnp.mean(msg, axis=1, keepdims=True)
    var = jnp.var(msg, axis=1, keepdims=True)
    msg = ((msg - mean) * jax.lax.rsqrt(var + _LN_EPS)
           * p.norm1_scale[None, :, None] + p.norm1_bias[None, :, None])
    y = jnp.concatenate([x, msg], axis=1)                # (L, 2C, P)
    y = jnp.maximum(dense(y, p.w1), 0.0)
    y = dense(y, p.w2)
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.var(y, axis=1, keepdims=True)
    y = ((y - mean) * jax.lax.rsqrt(var + _LN_EPS)
         * p.norm2_scale[None, :, None] + p.norm2_bias[None, :, None])
    out = x + y                                          # (L, C, P)

    token = out[0]
    z = jnp.concatenate([out[1:], inp.dir_rel], axis=1)   # (NV, C+3, P)
    z = jnp.maximum(dense(z, p.rad_w[0], p.rad_b[0]), 0.0)
    z = jnp.maximum(dense(z, p.rad_w[1], p.rad_b[1]), 0.0)
    z = dense(z, p.rad_w[2], p.rad_b[2])[:, 0]            # (NV, P)
    z = jnp.where(inp.mask == 0, -1e9, z)
    w = jax.nn.softmax(z, axis=0)
    rad = jnp.einsum("vcp,vp->cp", inp.rgb, w)
    return token, rad


# custom vjp: fused forward, reference backward ------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def point_head(inp: PointHeadInputs, p: PointHeadParams, n_heads: int = 8):
    """Per-point view head. Fused Pallas forward; exact reference backward."""
    return point_head_fused(inp, p, n_heads)


def _ph_fwd(inp, p, n_heads):
    return point_head_fused(inp, p, n_heads), (inp, p)


_BWD_CHUNK = 16384


def _ph_bwd(n_heads, res, g):
    """Reference-VJP backward, scanned over point segments.

    A single vjp over the whole chunk materializes (L, H, D, P) temps
    (~120MB each at train shapes) and OOMs v5e HBM alongside the encoder
    graph; every component of the head is per-point, so the backward
    splits P into segments, accumulates parameter grads, and concatenates
    input grads.
    """
    inp, p = res
    n = inp.vol_feat.shape[-1]
    f = lambda i, pp: point_head_reference(i, pp, n_heads)
    if n <= _BWD_CHUNK:
        _, vjp = jax.vjp(f, inp, p)
        return vjp(g)

    pad = (-n) % _BWD_CHUNK
    k = (n + pad) // _BWD_CHUNK

    def to_segs(x):  # (..., P) -> (k, ..., CHUNK)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        x = x.reshape(x.shape[:-1] + (k, _BWD_CHUNK))
        return jnp.moveaxis(x, -2, 0)

    inp_segs = PointHeadInputs(*[to_segs(x) for x in inp])
    g_segs = tuple(to_segs(x) for x in g)
    dp0 = jax.tree_util.tree_map(jnp.zeros_like, p)

    def body(dp_acc, seg):
        inp_s, g_s = seg
        _, vjp = jax.vjp(f, inp_s, p)
        di_s, dp_s = vjp(g_s)
        dp_acc = jax.tree_util.tree_map(jnp.add, dp_acc, dp_s)
        return dp_acc, di_s

    dp, di_segs = jax.lax.scan(body, dp0, (inp_segs, g_segs))

    def from_segs(x):  # (k, ..., CHUNK) -> (..., P)
        x = jnp.moveaxis(x, 0, -2)
        x = x.reshape(x.shape[:-2] + (k * _BWD_CHUNK,))
        return x[..., :n]

    di = PointHeadInputs(*[from_segs(x) for x in di_segs])
    return di, dp


point_head.defvjp(_ph_fwd, _ph_bwd)
