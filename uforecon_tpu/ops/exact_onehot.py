"""Exact one-hot contractions in single-pass bf16 matmuls.

TPU MXU matmuls natively multiply bf16: default precision rounds f32
inputs to bf16 (lossy), and ``Precision.HIGHEST`` recovers true f32 by
splitting BOTH operands into bf16 components (6 MXU passes). When one
operand is a 0/1 one-hot/permutation matrix it is already EXACTLY
bf16-representable, so only the value side needs splitting: three
single-pass default-precision matmuls against the value's three bf16
components reproduce the f32 result bit-for-bit at half the MXU cost.

Why the 3-way split is exact (Fast2Sum): hi = RN_bf16(v) makes v - hi
exactly representable in f32 with <=16 significant bits; mid = RN_bf16 of
that leaves a residual with <=8 significant bits, which bf16's 8-bit
significand holds exactly. Products against exact 0/1 are exact, each
output lane selects a SINGLE value per component, and hi+mid+lo
reassembles the original f32 with no rounding. (Asserted bit-identical
vs a HIGHEST einsum and vs row gathers in tests/test_render_ops.py.)

The backward matters as much as the forward: a plain einsum's VJP runs at
the same DEFAULT precision and would round the incoming COTANGENT to bf16
— the forward/backward de-sync class that destroyed render training in
round 2 (docs/DESIGN.md §3). The transpose of a one-hot contraction is
itself a one-hot contraction, so the custom VJP applies the identical
exact split to the cotangent. The one-hot operand receives a zero
cotangent (it always comes from non-differentiable integer comparisons
here).

Used for the importance-CDF bracket fetches (ops/sampling.py) and the
coarse+fine z-merge permutation (models/uforecon.py) — the reference's
equivalents are scattered torch gathers (sampler.py:86-99,
model.py:466-470).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_bf16(x):
    """Truncate an f32 array to its top 16 bits (an exactly-bf16-
    representable f32) via integer masking.

    NOT equivalent to ``x.astype(bf16).astype(f32)`` under jit on TPU:
    XLA's excess-precision simplification DELETES that convert round-trip
    (measured round 5 — the folded split degenerated to a single
    default-precision bf16 dot, a silent ~2e-3 error that produced
    wild importance-sampling extrapolations and ruined eval depth maps;
    /tmp-diag trail recorded in BASELINE.md round 5). A bitcast-mask-
    bitcast is integer arithmetic the simplifier must preserve. Truncation
    (round-toward-zero) rather than round-to-nearest keeps the residual
    the same sign as x; exactness of the 3-way decomposition only needs
    each component exactly representable, which top-16-bit masking
    guarantees by construction."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _split3(values):
    """f32 -> three exactly-bf16-representable f32 components.

    hi = top-16-bit truncation of v; rem = v - hi is exact (hi and v share
    sign and exponent, Sterbenz) and carries v's mantissa bits 9-24; mid =
    truncation of rem leaves a residual with <= 8 significant bits, which
    bf16's 8-bit significand holds exactly. hi + mid + lo == v exactly,
    each addend survives a DEFAULT-precision bf16 operand rounding
    unchanged. (Asserted bit-identical vs HIGHEST/gathers in
    tests/test_render_ops.py on CPU and — the case that actually caught
    the convert-folding bug — on chip via script/chip_parity.py.)"""
    hi = _mask_bf16(values)
    rem = values - hi
    mid = _mask_bf16(rem)
    return hi, mid, rem - mid


def _exact_bmm(onehot, values):
    """(B, I, J) 0/1 @ (B, J, C) f32 -> (B, I, C), f32-bit-exact in three
    single-pass (DEFAULT-precision, explicit so an ambient
    jax.default_matmul_precision context cannot widen it) MXU matmuls."""
    d = jax.lax.Precision.DEFAULT
    out = None
    for comp in _split3(values):
        term = jnp.einsum("bij,bjc->bic", onehot, comp, precision=d)
        out = term if out is None else out + term
    return out


@jax.custom_vjp
def exact_onehot_matmul(onehot: jnp.ndarray,
                        values: jnp.ndarray) -> jnp.ndarray:
    """f32-exact batched one-hot contraction, exact in forward AND backward.

    Args:
      onehot: (B, I, J) with only exactly-bf16-representable entries (0/1
        selection or permutation matrices); treated as non-differentiable
        (zero cotangent).
      values: (B, J, C) f32.

    Returns:
      (B, I, C), bit-identical to a ``Precision.HIGHEST`` einsum.
    """
    return _exact_bmm(onehot, values)


def _eom_fwd(onehot, values):
    return _exact_bmm(onehot, values), onehot


def _eom_bwd(onehot, g):
    # values_bar[b,j,c] = sum_i onehot[b,i,j] g[b,i,c] — one-hot transposed
    # is still one-hot, so the same exact split applies to the cotangent
    return jnp.zeros_like(onehot), _exact_bmm(onehot.transpose(0, 2, 1), g)


exact_onehot_matmul.defvjp(_eom_fwd, _eom_bwd)


def exact_onehot_einsum(spec: str, onehot: jnp.ndarray,
                        values: jnp.ndarray) -> jnp.ndarray:
    """Spec-named convenience wrapper over ``exact_onehot_matmul`` for the
    batched (B, I, J) x (B, J, C) -> (B, I, C) contraction shape."""
    assert spec in ("rij,rjc->ric", "rps,rsc->rpc"), spec
    return exact_onehot_matmul(onehot, values)


def _identity_bmm(values):
    """(..., A, B) -> (..., B, A) as identity contractions, always against
    an identity of the SMALLER of the two swapped dims (an eye over the
    larger one — e.g. P = rn*sn ~ 65k on the output-side transposes — would
    be a quadratic-size operand and an O(P^2*C) contraction). When the
    minor dim is smaller the contraction is the attention Q @ K^T layout
    (both operands contract their minor dim, MXU-native, no materialized
    relayout); when the major dim is smaller we contract it instead —
    still a pure 0/1 selection, so still exact. Non-f32 inputs skip the
    f32 component split (two of the three split matmuls would be
    identically zero for bf16 inputs, and the result must keep the input
    dtype): a single native-dtype selection against exact 0/1 is already
    exact at DEFAULT precision.
    """
    d = jax.lax.Precision.DEFAULT
    a, b = values.shape[-2], values.shape[-1]
    if b <= a:
        # out[..., c, p] = sum_j I[c, j] v[..., p, j]
        eye = jnp.eye(b, dtype=values.dtype)
        spec = "cj,...pj->...cp"
    else:
        # out[..., c, p] = sum_j I[j, p] v[..., j, c]
        eye = jnp.eye(a, dtype=values.dtype)
        spec = "jp,...jc->...cp"
    if values.dtype != jnp.float32:
        return jnp.einsum(spec, eye, values, precision=d)
    out = None
    for comp in _split3(values):
        term = jnp.einsum(spec, eye, comp, precision=d)
        out = term if out is None else out + term
    return out


@jax.custom_vjp
def exact_transpose(values: jnp.ndarray) -> jnp.ndarray:
    """Swap the two minor dims of ``values`` on the MXU, f32-bit-exactly.

    (..., P, C) -> (..., C, P). A drop-in for ``jnp.swapaxes(values, -1,
    -2)`` aimed at the render path's kernel-input formatting: XLA lowers
    those big-P small-C transposes to relayout copies measured far below
    HBM bandwidth (the 1.78 s/image "data formatting" bucket, BASELINE.md
    round-2 profile), while an identity contraction streams the same bytes
    through the MXU in the Q @ K^T layout. Three single-pass bf16
    component matmuls (see module docstring) keep the result bit-identical
    to the real transpose; the backward is the mirror-image identity
    contraction, so gradients stay bit-exact too.

    Routed by UFO_TRANSPOSE ('mxu' | 'xla') in the fused point head
    dispatch (models/ray_transformer.py) — measured on chip before any
    default flip; see BASELINE.md round 4.
    """
    return _identity_bmm(values)


def _et_fwd(values):
    return _identity_bmm(values), None


def _et_bwd(_, g):
    return (_identity_bmm(g),)


exact_transpose.defvjp(_et_fwd, _et_bwd)
