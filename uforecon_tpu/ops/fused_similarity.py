"""Fused grouped pairwise cosine similarity — Pallas TPU kernel.

The explicit-similarity stage (reference model.py:218-305 query_cond_info)
ends in per-pair grouped cosines over the sampled cross-matching features.
As XLA ops (per-pair lane slices, three elementwise products, per-group
reductions, a stack and a mean) it materializes several (P, C)-sized
intermediates per pair in HBM — measured as part of the ~2.2 s/image of
"loop fusion" glue in the round-2 render profile (BASELINE.md).

This kernel consumes the gather output in its NATIVE point-major layout
(NV, P, (NV-1)·C) — no host transposes at all (the round-2 layout A/B
showed transposes are the tax that kills most fusion wins) — and emits
(P, n_groups) in one pass:

  * pair views are static lane slices of each view's packed row,
  * per-group sums are one exact 0/1 matmul (C, n_groups) on the MXU,
  * the pair mean happens in VMEM; only the (P, G) result leaves.

Math is identical to the pure-JAX path (``grouped_cosine_reference``,
asserted in tests): torch-CosineSimilarity eps semantics
(max(|gi|·|gj|, 1e-8) — reference model.py:270-282), mean over pairs.

Backward re-derives gradients from the reference implementation via
``jax.vjp`` (inference-hot; the matcher is frozen in reference training),
so autodiff through the fused path stays exact.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_precision import kernel_dot_01

_BLK = 1024
_EPS = 1e-8  # torch nn.CosineSimilarity eps (model.py:276)


def view_pairs(n_views: int) -> List[Tuple[int, int]]:
    """Ordered view pairs, reference index_lists order (model.py:252-258)."""
    return [(a, b) for a in range(n_views - 1) for b in range(a + 1, n_views)]


def pair_slots(n_views: int) -> List[Tuple[int, int]]:
    """Lane-slot index of each pair's map inside the two packed view rows.

    View v's packed row concatenates its maps in pair order (the
    ``maps[v].append`` order of query_similarity), so pair p sits at slot
    ``#{pairs before p that involve v}`` in view v's row.
    """
    counts = [0] * n_views
    slots = []
    for i, j in view_pairs(n_views):
        slots.append((counts[i], counts[j]))
        counts[i] += 1
        counts[j] += 1
    return slots


def _kernel(nv, c, n_groups, sampled_ref, gsum_ref, out_ref):
    blk = sampled_ref.shape[1]
    f32 = jnp.float32
    pairs = view_pairs(nv)
    slots = pair_slots(nv)

    def group_sum(x):
        # (BLK, C) @ (C, G) 0/1 matrix: exact per-group reduction on the
        # MXU via the 3-way value split (kernel_dot_01) — precision-mode-
        # independent, 3 bf16 passes, exact up to f32 accumulation order
        return kernel_dot_01(x, gsum_ref[:], (((1,), (0,)), ((), ())))

    acc = jnp.zeros((blk, n_groups), f32)
    for p, (i, j) in enumerate(pairs):
        ki, kj = slots[p]
        gi = jax.lax.slice(sampled_ref[i], (0, ki * c), (blk, ki * c + c))
        gj = jax.lax.slice(sampled_ref[j], (0, kj * c), (blk, kj * c + c))
        num = group_sum(gi * gj)
        ni = jnp.sqrt(group_sum(gi * gi))
        nj = jnp.sqrt(group_sum(gj * gj))
        acc = acc + num / jnp.maximum(ni * nj, _EPS)
    out_ref[:] = acc / np.float32(len(pairs))


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def grouped_cosine_fused(sampled: jnp.ndarray, n_groups: int) -> jnp.ndarray:
    """Fused forward.

    Args:
      sampled: (NV, P, (NV-1)·C) packed pair-feature rows, point-major —
        exactly the grid_sample_2d_packed output layout.
      n_groups: cosine channel groups (cos_n_group, reference 8).

    Returns:
      (P, n_groups) mean per-group pairwise cosine.
    """
    nv, n, cc = sampled.shape
    c = cc // (nv - 1)
    assert c % n_groups == 0, (c, n_groups)
    pad = (-n) % _BLK
    if pad:
        sampled = jnp.pad(sampled, ((0, 0), (0, pad), (0, 0)))
    n_p = n + pad
    grid = (n_p // _BLK,)

    # exact 0/1 group-sum matrix (C, G)
    g = c // n_groups
    gsum = (np.arange(c)[:, None] // g ==
            np.arange(n_groups)[None, :]).astype(np.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, nv, c, n_groups),
        out_shape=jax.ShapeDtypeStruct((n_p, n_groups), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nv, _BLK, cc), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, n_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK, n_groups), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(sampled.astype(jnp.float32), jnp.asarray(gsum))
    return out[:n]


def grouped_cosine_reference(sampled: jnp.ndarray,
                             n_groups: int) -> jnp.ndarray:
    """Pure-JAX forward, bit-matching the flax query_similarity loop; used
    for the backward pass and parity tests."""
    nv, n, cc = sampled.shape
    c = cc // (nv - 1)
    g = c // n_groups
    slots = pair_slots(nv)
    cos_all = []
    for p, (i, j) in enumerate(view_pairs(nv)):
        ki, kj = slots[p]
        gi = sampled[i, :, ki * c:(ki + 1) * c].reshape(n, n_groups, g)
        gj = sampled[j, :, kj * c:(kj + 1) * c].reshape(n, n_groups, g)
        dot = jnp.sum(gi * gj, axis=-1)
        ni = jnp.sqrt(jnp.sum(gi * gi, axis=-1))
        nj = jnp.sqrt(jnp.sum(gj * gj, axis=-1))
        cos_all.append(dot / jnp.maximum(ni * nj, _EPS))
    return jnp.mean(jnp.stack(cos_all), axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grouped_cosine(sampled: jnp.ndarray, n_groups: int = 8) -> jnp.ndarray:
    """Grouped pairwise cosine. Fused Pallas forward; reference backward."""
    return grouped_cosine_fused(sampled, n_groups)


def _gc_fwd(sampled, n_groups):
    return grouped_cosine_fused(sampled, n_groups), sampled


def _gc_bwd(n_groups, sampled, g):
    _, vjp = jax.vjp(lambda s: grouped_cosine_reference(s, n_groups), sampled)
    return vjp(g)


grouped_cosine.defvjp(_gc_fwd, _gc_bwd)
