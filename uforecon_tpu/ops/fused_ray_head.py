"""Fused along-ray SRDF head — Pallas TPU kernel.

The render loop's along-ray stage (reference ray_transformer.py:135-150 +
attention/transformer.py:7-58: one LoFTR linear-attention layer over the
sample axis followed by the 3-layer density MLP) runs on (RN, SN, 96)
sequences. As separate XLA ops it spends more time on layout flips of the
(B, L, H, D) attention tensors than on math.

This kernel is POINT-MAJOR: a block holds R_BLK rays x SN samples on
sublanes with the 96 features on lanes — exactly the layout the renderer
already produces, so there are no host-side transposes at all. All
projections are flat (R_BLK*SN, C) @ (C, C') MXU matmuls; the per-ray
linear attention is two 2D dots per ray with a static block-diagonal head
mask (full (96, 96) outer products cost one MXU pass each; masking after
is cheaper than 8 tiny per-head dots).

Math is identical to the flax path (``ray_head_reference``, asserted in
tests): phi(x)=elu(x)+1 linear attention with eps 1e-6, LoFTR post-concat
encoder layer, flax LayerNorm (eps 1e-6), Dense-bias density MLP.

Backward re-derives gradients from the reference implementation via
``jax.vjp`` (the kernel is inference-hot), so autodiff stays exact.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_precision import kernel_dot

_EPS = 1e-6      # linear attention denominator (linear_attention.py:46)
_LN_EPS = 1e-6   # flax LayerNorm default epsilon
_BLK_PTS = 1024  # points per program (R_BLK = _BLK_PTS // SN rays)


class RayHeadParams(NamedTuple):
    """Weights of the along-ray stage, flax (in, out) orientation, f32."""

    wq: jnp.ndarray              # (C, C) no bias
    wk: jnp.ndarray
    wv: jnp.ndarray
    wmerge: jnp.ndarray
    norm1_scale: jnp.ndarray     # (C,)
    norm1_bias: jnp.ndarray
    w1: jnp.ndarray              # (2C, 2C)
    w2: jnp.ndarray              # (2C, C)
    norm2_scale: jnp.ndarray
    norm2_bias: jnp.ndarray
    dens_w: Tuple[jnp.ndarray, ...]  # ((C,32),(32,16),(16,1))
    dens_b: Tuple[jnp.ndarray, ...]  # ((32,),(16,),(1,))


def _phi(x):
    # elu(x) + 1 without expm1 (not lowered by Pallas TPU)
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _ln_lanes(x, scale, bias):
    """LayerNorm over the LANE (feature) axis of (P, C); flax semantics."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=1, keepdims=True) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return (x - mean) * inv * scale[None, :] + bias[None, :]


def _kernel(r_blk, sn, c, n_heads,
            y_ref,
            wq, wk, wv, wm, n1s, n1b, w1a, w1b, w2, n2s, n2b,
            dw0, db0, dw1, db1, dw2, db2,
            srdf_out):
    f32 = jnp.float32
    p = r_blk * sn
    dk = c // n_heads

    # Default true-f32 MXU passes (kernel_dot): default precision rounds dot
    # inputs to bf16; the SRDF feeds exp(10s)-scaled NeuS sigmoids, where
    # ~0.3% forward error vs the HIGHEST-precision reference VJP backward
    # was measured to destabilize render training. UFO_KERNEL_PRECISION=high
    # selects a manual bf16x3 (~1e-6 error; see kernel_precision.py).
    def mm(x, w_ref):
        # (P, C_in) @ (C_in, C_out)
        return kernel_dot(x, w_ref[:], (((1,), (0,)), ((), ())))

    flat = y_ref[:].reshape(p, c)
    q = mm(flat, wq)
    k = mm(flat, wk)
    v = mm(flat, wv)
    qf = _phi(q)
    kf = _phi(k)

    # static block-diagonal head mask (96x96): same-head feature pairs
    hi = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // dk
    hj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // dk
    hmask = (hi == hj).astype(f32)

    msgs = []
    for r in range(r_blk):
        s0 = r * sn
        qf_r = jax.lax.slice(qf, (s0, 0), (s0 + sn, c))
        kf_r = jax.lax.slice(kf, (s0, 0), (s0 + sn, c))
        v_r = jax.lax.slice(v, (s0, 0), (s0 + sn, c))
        # KV = sum_s kf_s (x) v_s per head: full outer product + head mask
        kv = kernel_dot(
            kf_r, v_r, (((0,), (0,)), ((), ())))            # (C, C)
        ksum = jnp.sum(kf_r, axis=0)                        # (C,)
        num = kernel_dot(
            qf_r, kv * hmask, (((1,), (0,)), ((), ())))     # (SN, C)
        den = kernel_dot(
            qf_r, ksum[:, None] * hmask, (((1,), (0,)), ((), ())))  # (SN, C)
        msgs.append(num / (den + _EPS))
    att = jnp.concatenate(msgs, axis=0)                     # (P, C)

    msg = _ln_lanes(mm(att, wm), n1s[:], n1b[:])
    # mlp1 over concat([y, msg]) via split weights (no lane concat)
    h = jnp.maximum(mm(flat, w1a) + mm(msg, w1b), 0.0)      # (P, 2C)
    m2 = _ln_lanes(mm(h, w2), n2s[:], n2b[:])
    out = flat + m2                                         # (P, C)

    d = jnp.maximum(mm(out, dw0) + db0[:][None, :], 0.0)
    d = jnp.maximum(mm(d, dw1) + db1[:][None, :], 0.0)
    srdf = mm(d, dw2) + db2[:][None, :]                     # (P, 1)
    srdf_out[:] = srdf.reshape(r_blk, sn)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def ray_head_fused(y: jnp.ndarray, p: RayHeadParams,
                   n_heads: int = 8) -> jnp.ndarray:
    """Fused forward: y (RN, SN, C) z-sorted sequences -> srdf (RN, SN)."""
    rn, sn, c = y.shape
    r_blk = max(1, _BLK_PTS // sn)
    pad = (-rn) % r_blk
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0), (0, 0)))
    rn_p = rn + pad
    grid = (rn_p // r_blk,)

    f32 = jnp.float32
    weights = [
        p.wq.astype(f32), p.wk.astype(f32), p.wv.astype(f32),
        p.wmerge.astype(f32),
        p.norm1_scale.astype(f32), p.norm1_bias.astype(f32),
        p.w1[:c].astype(f32), p.w1[c:].astype(f32), p.w2.astype(f32),
        p.norm2_scale.astype(f32), p.norm2_bias.astype(f32),
        p.dens_w[0].astype(f32), p.dens_b[0].astype(f32),
        p.dens_w[1].astype(f32), p.dens_b[1].astype(f32),
        p.dens_w[2].astype(f32), p.dens_b[2].astype(f32),
    ]

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    srdf = pl.pallas_call(
        functools.partial(_kernel, r_blk, sn, c, n_heads),
        out_shape=jax.ShapeDtypeStruct((rn_p, sn), f32),
        grid=grid,
        in_specs=[pl.BlockSpec((r_blk, sn, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [wspec(w.shape) for w in weights],
        out_specs=pl.BlockSpec((r_blk, sn), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(y, *weights)
    return srdf[:rn]


def ray_head_reference(y: jnp.ndarray, p: RayHeadParams,
                       n_heads: int = 8) -> jnp.ndarray:
    """Pure-JAX forward, bit-matching the flax along-ray path; used for the
    backward pass and parity tests. True-f32 matmuls: the VJP of this
    function is the training backward, which must match the HIGHEST-
    precision fused forward (TPU default would round inputs to bf16)."""
    with jax.default_matmul_precision("float32"):
        return _ray_head_reference_impl(y, p, n_heads)


def _ray_head_reference_impl(y, p, n_heads):
    rn, sn, c = y.shape
    dk = c // n_heads

    q = y @ p.wq
    k = y @ p.wk
    v = y @ p.wv
    qf = jax.nn.elu(q) + 1.0
    kf = jax.nn.elu(k) + 1.0
    qf = qf.reshape(rn, sn, n_heads, dk)
    kf = kf.reshape(rn, sn, n_heads, dk)
    vh = v.reshape(rn, sn, n_heads, dk)
    kv = jnp.einsum("bshd,bshm->bhmd", kf, vh)
    den = jnp.einsum("blhd,bhd->blh", qf, kf.sum(axis=1)) + _EPS
    att = jnp.einsum("blhd,bhmd->blhm", qf, kv) / den[..., None]
    att = att.reshape(rn, sn, c)

    msg = att @ p.wmerge
    mean = jnp.mean(msg, axis=-1, keepdims=True)
    var = jnp.var(msg, axis=-1, keepdims=True)
    msg = ((msg - mean) * jax.lax.rsqrt(var + _LN_EPS)
           * p.norm1_scale + p.norm1_bias)
    h = jnp.maximum(jnp.concatenate([y, msg], axis=-1) @ p.w1, 0.0)
    m2 = h @ p.w2
    mean = jnp.mean(m2, axis=-1, keepdims=True)
    var = jnp.var(m2, axis=-1, keepdims=True)
    m2 = ((m2 - mean) * jax.lax.rsqrt(var + _LN_EPS)
          * p.norm2_scale + p.norm2_bias)
    out = y + m2

    d = jnp.maximum(out @ p.dens_w[0] + p.dens_b[0], 0.0)
    d = jnp.maximum(d @ p.dens_w[1] + p.dens_b[1], 0.0)
    return (d @ p.dens_w[2] + p.dens_b[2])[..., 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ray_head(y: jnp.ndarray, p: RayHeadParams, n_heads: int = 8):
    """Along-ray SRDF head. Fused Pallas forward; exact reference backward."""
    return ray_head_fused(y, p, n_heads)


def _rh_fwd(y, p, n_heads):
    return ray_head_fused(y, p, n_heads), (y, p)


def _rh_bwd(n_heads, res, g):
    y, p = res
    _, vjp = jax.vjp(lambda yy, pp: ray_head_reference(yy, pp, n_heads), y, p)
    return vjp(g)


ray_head.defvjp(_rh_fwd, _rh_bwd)


# ---------------------------------------------------------------------------
# Round-5 probe (VERDICT r4 #3): NeuS compositing fused into the kernel
# epilogue. The along-ray stage's XLA successors (midpoint intervals,
# sigmoids, cumprod transmittance, rgb/depth/opacity reductions —
# ops/rendering.py neus_render, reference renderer.py:7-48) are pure
# elementwise/scan glue over the kernel's own output; computing them in the
# epilogue removes that glue and the (RN, SN) srdf round-trip through HBM.
# Lane-axis shifts and the exclusive cumsum become exact-valued small
# matmuls: interval_mid is a LINEAR map of z (host-built (SN, SN) matrix of
# 0/±0.5/±1 entries, exactly bf16-representable), and the transmittance
# cumprod runs in log space via a strict-lower-triangular ones matrix —
# both through kernel_dot_01's exact value-side split. The log-space
# cumprod reassociates the reference's sequential product (~1e-6 rel);
# parity-gated like every fused kernel, reference backward via jax.vjp.
# ---------------------------------------------------------------------------


def _interval_mid_matrix(sn: int):
    """(SN, SN) A with interval_mid = z @ A (neus_render's midpoint
    intervals as a linear map; entries 0 / +-0.5 / +-1, exact bf16)."""
    import numpy as np

    # interval[j] = z[j+1] - z[j], j in [0, sn-2]
    # padded[0] = interval[0]; padded[k] = interval[k-1] (1<=k<=sn-1);
    # padded[sn] = interval[sn-2]
    # mid[s] = (padded[s] + padded[s+1]) / 2
    A = np.zeros((sn, sn), np.float32)

    def add_interval(j, s, w):
        A[j + 1, s] += w
        A[j, s] -= w

    for s in range(sn):
        j0 = 0 if s == 0 else s - 1                  # padded[s]
        j1 = min(s, sn - 2)                          # padded[s+1]
        add_interval(j0, s, 0.5)
        add_interval(j1, s, 0.5)
    return A


def _cumsum_excl_matrix(sn: int):
    """(SN, SN) strict-lower M with (x @ M)[s] = sum_{t<s} x[t]."""
    import numpy as np

    return np.triu(np.ones((sn, sn), np.float32), k=1)


def _neus_epilogue(srdf, z, rad0, rad1, rad2, inv_s, A, M):
    """In-kernel NeuS compositing on (R_BLK, SN) lane-major arrays."""
    from .kernel_precision import kernel_dot_01

    dims = (((1,), (0,)), ((), ()))
    mid = kernel_dot_01(z, A, dims)                    # midpoint intervals
    # iter_cos at cos_anneal_ratio=1 is -1.5 (reference quirk,
    # renderer.py:28-29); next/prev = srdf -+ 0.75 * interval
    prev_cdf = jax.nn.sigmoid((srdf + 0.75 * mid) * inv_s)
    next_cdf = jax.nn.sigmoid((srdf - 0.75 * mid) * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5),
                     0.0, 1.0)
    logt = jnp.log(1.0 - alpha + 1e-7)
    trans = jnp.exp(kernel_dot_01(logt, M, dims))      # exclusive cumprod
    weight = alpha * trans
    # keepdims + lane concat (Mosaic-friendly: no 1-D intermediates)
    rgb = jnp.concatenate(
        [jnp.sum(weight * r, axis=1, keepdims=True)
         for r in (rad0, rad1, rad2)], axis=1)               # (R, 3)
    depth = jnp.sum(weight * z, axis=1, keepdims=True)       # (R, 1)
    opacity = jnp.sum(weight, axis=1, keepdims=True)         # (R, 1)
    return weight, rgb, depth, opacity


def _kernel_neus(r_blk, sn, c, n_heads,
                 y_ref, z_ref, r0_ref, r1_ref, r2_ref, invs_ref,
                 A_ref, M_ref,
                 wq, wk, wv, wm, n1s, n1b, w1a, w1b, w2, n2s, n2b,
                 dw0, db0, dw1, db1, dw2, db2,
                 srdf_out, weight_out, rdo_out):
    _kernel(r_blk, sn, c, n_heads, y_ref,
            wq, wk, wv, wm, n1s, n1b, w1a, w1b, w2, n2s, n2b,
            dw0, db0, dw1, db1, dw2, db2, srdf_out)
    srdf = srdf_out[:]
    inv_s = invs_ref[0, 0]
    weight, rgb, depth, opacity = _neus_epilogue(
        srdf, z_ref[:], r0_ref[:], r1_ref[:], r2_ref[:], inv_s,
        A_ref[:], M_ref[:])
    weight_out[:] = weight
    rdo_out[:] = jnp.concatenate(
        [rgb, depth, opacity, jnp.zeros((r_blk, 3), jnp.float32)], axis=1)


def ray_head_neus_fused(y, z, rad, inv_s, p: RayHeadParams,
                        n_heads: int = 8):
    """Fused forward: along-ray head + NeuS compositing in one kernel.

    Returns (srdf, weight, rgb, depth, opacity)."""
    import numpy as np

    rn, sn, c = y.shape
    r_blk = max(1, _BLK_PTS // sn)
    pad = (-rn) % r_blk
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0), (0, 0)))
        z = jnp.pad(z, ((0, pad), (0, 0)), constant_values=1.0)
        rad = jnp.pad(rad, ((0, pad), (0, 0), (0, 0)))
    rn_p = rn + pad
    grid = (rn_p // r_blk,)

    f32 = jnp.float32
    weights = [
        p.wq.astype(f32), p.wk.astype(f32), p.wv.astype(f32),
        p.wmerge.astype(f32),
        p.norm1_scale.astype(f32), p.norm1_bias.astype(f32),
        p.w1[:c].astype(f32), p.w1[c:].astype(f32), p.w2.astype(f32),
        p.norm2_scale.astype(f32), p.norm2_bias.astype(f32),
        p.dens_w[0].astype(f32), p.dens_b[0].astype(f32),
        p.dens_w[1].astype(f32), p.dens_b[1].astype(f32),
        p.dens_w[2].astype(f32), p.dens_b[2].astype(f32),
    ]

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    z = z.astype(f32)
    r0, r1, r2 = (rad[..., k].astype(f32) for k in range(3))
    invs = jnp.clip(inv_s, 1e-6, 1e6).astype(f32).reshape(1, 1)
    A = jnp.asarray(_interval_mid_matrix(sn))
    M = jnp.asarray(_cumsum_excl_matrix(sn))

    row = lambda i: (i, 0)
    srdf, weight, rdo = pl.pallas_call(
        functools.partial(_kernel_neus, r_blk, sn, c, n_heads),
        out_shape=(jax.ShapeDtypeStruct((rn_p, sn), f32),
                   jax.ShapeDtypeStruct((rn_p, sn), f32),
                   jax.ShapeDtypeStruct((rn_p, 8), f32)),
        grid=grid,
        in_specs=[pl.BlockSpec((r_blk, sn, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((r_blk, sn), row, memory_space=pltpu.VMEM)] * 4
        + [wspec((1, 1)), wspec((sn, sn)), wspec((sn, sn))]
        + [wspec(w.shape) for w in weights],
        out_specs=(pl.BlockSpec((r_blk, sn), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((r_blk, sn), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((r_blk, 8), row, memory_space=pltpu.VMEM)),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(y, z, r0, r1, r2, invs, A, M, *weights)
    return (srdf[:rn], weight[:rn], rdo[:rn, 0:3], rdo[:rn, 3],
            rdo[:rn, 4])


def ray_head_neus_reference(y, z, rad, inv_s, p: RayHeadParams,
                            n_heads: int = 8):
    """Pure-JAX forward (reference backward + parity oracle): the existing
    along-ray reference chained with ops/rendering.neus_render."""
    from .rendering import neus_render

    srdf = ray_head_reference(y, p, n_heads)
    out = neus_render(z, rad, srdf, inv_s)
    return (srdf, out["weight"], out["rgb"], out["depth"], out["opacity"])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def ray_head_neus(y, z, rad, inv_s, p: RayHeadParams, n_heads: int = 8):
    """Along-ray SRDF head + NeuS compositing. Fused Pallas forward;
    exact reference backward (same custom-VJP pattern as ray_head)."""
    return ray_head_neus_fused(y, z, rad, inv_s, p, n_heads)


def _rhn_fwd(y, z, rad, inv_s, p, n_heads):
    return ray_head_neus_fused(y, z, rad, inv_s, p, n_heads), \
        (y, z, rad, inv_s, p)


def _rhn_bwd(n_heads, res, g):
    y, z, rad, inv_s, p = res
    _, vjp = jax.vjp(
        lambda yy, zz, rr, ss, pp: ray_head_neus_reference(
            yy, zz, rr, ss, pp, n_heads), y, z, rad, inv_s, p)
    return vjp(g)


ray_head_neus.defvjp(_rhn_fwd, _rhn_bwd)
