"""Fused tiny-sequence linear attention — Pallas TPU kernel.

The ray/view transformers (reference attention/linear_attention.py:14-47,
ray_transformer.py:135-139) run linear attention where the batch axis is
RN x SN sample points (10^5-10^6) and the sequence is tiny (NV+1 = 4-6 view
tokens, head dim 10). XLA materializes either the per-point (H, D, M) KV
state or the (L, S) score matrix, and both pad to (8/16, 128) TPU tiles —
a 13-32x memory blow-up that OOM'd full-resolution rendering.

This kernel keeps the POINT axis on the 128-lane dimension end to end:
inputs arrive pre-transposed as (L*H*D, B), every intermediate is
(..., BLK) with BLK points on lanes, and nothing pads. All compute is VPU
elementwise + tiny static reductions; per-block VMEM is a few MB.

phi(x) = elu(x) + 1 ("Transformers are RNNs", Katharopoulos et al. 2020),
identical math to the reference:
    out[l,h,m] = sum_s phi(q)[l,h,:].phi(k)[s,h,:] * v[s,h,m]
                 / (sum_s phi(q)[l,h,:].phi(k)[s,h,:] + eps)
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6
_BLK = 128


def _phi(x):
    # elu(x) + 1 without expm1 (not lowered by Pallas TPU):
    # x > 0 -> x + 1;  x <= 0 -> exp(x)
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _dphi(x):
    # d/dx (elu(x) + 1) = 1 for x > 0 else exp(x)
    return jnp.where(x > 0, 1.0, jnp.exp(x))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(L, S, H, D, M, q_ref, k_ref, v_ref, o_ref):
    # blocks: q (L*H*D, BLK), k (S*H*D, BLK), v (S*H*M, BLK), o (L*H*M, BLK)
    blk = q_ref.shape[-1]
    qf = _phi(q_ref[:].reshape(L, H, D, blk))
    kf = _phi(k_ref[:].reshape(S, H, D, blk))
    vv = v_ref[:].reshape(S, H, M, blk)

    out = jnp.zeros((L, H, M, blk), jnp.float32)
    denom = jnp.zeros((L, H, 1, blk), jnp.float32)
    for s in range(S):
        # scores_s: (L, H, blk) = sum_d qf[l,h,d] * kf[s,h,d]
        sc = jnp.sum(qf * kf[s][None], axis=2)          # (L, H, blk)
        denom = denom + sc[:, :, None, :]
        out = out + sc[:, :, None, :] * vv[s][None]     # (L, H, M, blk)
    o_ref[:] = (out / (denom + _EPS)).reshape(L * H * M, blk)


def _bwd_kernel(L, S, H, D, M, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref):
    blk = q_ref.shape[-1]
    q = q_ref[:].reshape(L, H, D, blk)
    k = k_ref[:].reshape(S, H, D, blk)
    vv = v_ref[:].reshape(S, H, M, blk)
    g = g_ref[:].reshape(L, H, M, blk)
    qf = _phi(q)
    kf = _phi(k)

    # recompute scores / denom / out (cheap; avoids saving them)
    out = jnp.zeros((L, H, M, blk), jnp.float32)
    denom = jnp.zeros((L, H, 1, blk), jnp.float32)
    scs = []
    for s in range(S):
        sc = jnp.sum(qf * kf[s][None], axis=2)          # (L, H, blk)
        scs.append(sc)
        denom = denom + sc[:, :, None, :]
        out = out + sc[:, :, None, :] * vv[s][None]
    denom = denom + _EPS
    out = out / denom

    # per-s results collected in python lists (static S) and stacked —
    # scatter (.at[].set) is not lowered by Pallas TPU
    dqf = jnp.zeros((L, H, D, blk), jnp.float32)
    dkf_parts = []
    dv_parts = []
    for s in range(S):
        sc_over_z = scs[s][:, :, None, :] / denom        # (L, H, 1, blk)
        dv_parts.append(jnp.sum(sc_over_z * g, axis=0))  # (H, M, blk)
        # ds[l,s,h] = sum_m g[l,h,m] * (v[s,h,m] - out[l,h,m]) / z[l,h]
        ds = jnp.sum(g * (vv[s][None] - out), axis=2) / denom[:, :, 0, :]
        dqf = dqf + ds[:, :, None, :] * kf[s][None]      # (L, H, D, blk)
        dkf_parts.append(jnp.sum(ds[:, :, None, :] * qf, axis=0))
    dkf = jnp.stack(dkf_parts)                           # (S, H, D, blk)
    dv = jnp.stack(dv_parts)                             # (S, H, M, blk)

    dq_ref[:] = (dqf * _dphi(q)).reshape(L * H * D, blk)
    dk_ref[:] = (dkf * _dphi(k)).reshape(S * H * D, blk)
    dv_ref[:] = dv.reshape(S * H * M, blk)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_b(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    b = x.shape[-1]
    pad = (-b) % _BLK
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, b


def _fwd_tb(qt, kt, vt, dims):
    """Transposed-batch forward: qt (L*H*D, B) etc. -> (L*H*M, B)."""
    L, S, H, D, M = dims
    qt, b = _pad_b(qt)
    kt, _ = _pad_b(kt)
    vt, _ = _pad_b(vt)
    bp = qt.shape[-1]
    grid = (bp // _BLK,)
    spec = lambda rows: pl.BlockSpec((rows, _BLK), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, L, S, H, D, M),
        out_shape=jax.ShapeDtypeStruct((L * H * M, bp), jnp.float32),
        grid=grid,
        in_specs=[spec(L * H * D), spec(S * H * D), spec(S * H * M)],
        out_specs=spec(L * H * M),
        interpret=_use_interpret(),
    )(qt, kt, vt)
    return out[:, :b]


def _bwd_tb(dims, res, gt):
    L, S, H, D, M = dims
    qt, kt, vt = res
    qt, b = _pad_b(qt)
    kt, _ = _pad_b(kt)
    vt, _ = _pad_b(vt)
    gt, _ = _pad_b(gt)
    bp = qt.shape[-1]
    grid = (bp // _BLK,)
    spec = lambda rows: pl.BlockSpec((rows, _BLK), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, L, S, H, D, M),
        out_shape=[
            jax.ShapeDtypeStruct((L * H * D, bp), jnp.float32),
            jax.ShapeDtypeStruct((S * H * D, bp), jnp.float32),
            jax.ShapeDtypeStruct((S * H * M, bp), jnp.float32),
        ],
        grid=grid,
        in_specs=[spec(L * H * D), spec(S * H * D), spec(S * H * M),
                  spec(L * H * M)],
        out_specs=[spec(L * H * D), spec(S * H * D), spec(S * H * M)],
        interpret=_use_interpret(),
        # the recompute-heavy backward overflows the default 16MB scoped
        # vmem at train_n_view=5 (L=6: 17.35M); raise the ceiling
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qt, kt, vt, gt)
    return dq[:, :b], dk[:, :b], dv[:, :b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attn_tb(qt, kt, vt, dims):
    return _fwd_tb(qt, kt, vt, dims)


def _attn_tb_fwd(qt, kt, vt, dims):
    return _fwd_tb(qt, kt, vt, dims), (qt, kt, vt)


_attn_tb.defvjp(_attn_tb_fwd, _bwd_tb)


def tiny_linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                          ) -> jnp.ndarray:
    """Linear attention for tiny sequences over a huge batch.

    Args:
      q: (B, L, H, D); k: (B, S, H, D); v: (B, S, H, M). float32.

    Returns:
      (B, L, H, M).
    """
    b, l, h, d = q.shape
    s = k.shape[1]
    m = v.shape[-1]
    dims = (l, s, h, d, m)
    orig_dtype = q.dtype
    qt = q.reshape(b, l * h * d).T.astype(jnp.float32)
    kt = k.reshape(b, s * h * d).T.astype(jnp.float32)
    vt = v.reshape(b, s * h * m).T.astype(jnp.float32)
    ot = _attn_tb(qt, kt, vt, dims)            # (L*H*M, B)
    return ot.T.reshape(b, l, h, m).astype(orig_dtype)
