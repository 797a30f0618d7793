"""Fused cross-view correlation-volume fusion — Pallas TPU kernel.

query_correlation_volume (reference model.py:350-390) ends in a weighted
cross-view fusion of the per-stage trilinear samples:

    weight_sum = sum_s fw_s[..., -1:]          # per view
    G = sum_v feats_v * weight_sum_v / (sum_v weight_sum_v + 1e-8)

As XLA ops (per-stage concat, broadcast multiplies, two view reductions, a
divide) it materializes several (NV, P, 24)-sized intermediates in HBM —
part of the ~2.2 s/image "loop fusion" glue in the round-2 render profile
(BASELINE.md). This kernel consumes the per-stage sample tensors in their
NATIVE point-major layout (NV, P, F+1) — no host transposes, no host
concat — and emits (P, S*F) in one VMEM pass.

Math is identical to the pure-JAX path (``volume_fusion_reference``,
asserted in tests). Backward re-derives gradients from the reference via
``jax.vjp``, so autodiff through the fused path stays exact.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 1024
_EPS = 1e-8  # fusion denominator (model.py:388)


def _kernel(nv, s, f, *refs):
    ins, out_ref = refs[:-1], refs[-1]
    blk = ins[0].shape[1]
    f32 = jnp.float32

    # per-view summed stage weights, and their view total
    wsum = []
    den = jnp.zeros((blk, 1), f32)
    for v in range(nv):
        w_v = jnp.zeros((blk, 1), f32)
        for k in range(s):
            w_v = w_v + jax.lax.slice(ins[k][v], (0, f), (blk, f + 1))
        wsum.append(w_v)
        den = den + w_v
    den = den + _EPS

    for k in range(s):
        acc = jnp.zeros((blk, f), f32)
        for v in range(nv):
            feats_v = jax.lax.slice(ins[k][v], (0, 0), (blk, f))
            acc = acc + feats_v * wsum[v]
        out_ref[:, k * f:(k + 1) * f] = acc / den


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def volume_fusion_fused(fws: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Fused forward.

    Args:
      fws: per-stage sampled feat||weight tensors, each (NV, P, F+1) —
        exactly the grid_sample_3d_packed output layout.

    Returns:
      (P, S*F) cross-view fused features (stage-major channel order, the
      reference's concat order).
    """
    s = len(fws)
    nv, n, f1 = fws[0].shape
    f = f1 - 1
    pad = (-n) % _BLK
    if pad:
        fws = [jnp.pad(x, ((0, 0), (0, pad), (0, 0))) for x in fws]
    n_p = n + pad
    grid = (n_p // _BLK,)

    out = pl.pallas_call(
        functools.partial(_kernel, nv, s, f),
        out_shape=jax.ShapeDtypeStruct((n_p, s * f), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((nv, _BLK, f1), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM) for _ in range(s)],
        out_specs=pl.BlockSpec((_BLK, s * f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*[x.astype(jnp.float32) for x in fws])
    return out[:n]


def volume_fusion_reference(fws: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Pure-JAX forward, bit-matching the query_correlation_volume tail;
    used for the backward pass and parity tests."""
    feats = jnp.concatenate([fw[..., :-1] for fw in fws], axis=-1)
    weight_sum = sum(fw[..., -1:] for fw in fws)
    g = jnp.sum(feats * weight_sum, axis=0)
    w_all = jnp.sum(weight_sum, axis=0)
    return g / (w_all + _EPS)


@jax.custom_vjp
def volume_fusion(*fws: jnp.ndarray) -> jnp.ndarray:
    """Cross-view volume fusion. Fused Pallas forward; reference backward."""
    return volume_fusion_fused(fws)


def _vf_fwd(*fws):
    return volume_fusion_fused(fws), fws


def _vf_bwd(fws, g):
    _, vjp = jax.vjp(lambda *xs: volume_fusion_reference(xs), *fws)
    return vjp(g)


volume_fusion.defvjp(_vf_fwd, _vf_bwd)
