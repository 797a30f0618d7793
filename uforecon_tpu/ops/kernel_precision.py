"""Forward matmul precision for the fused render kernels.

The fused kernels' dot_generals default to true-f32 MXU passes
(``Precision.HIGHEST``): TPU's default precision rounds dot inputs to
bf16, and a ~0.3% forward-vs-backward inconsistency through the
exp(10s)-scaled NeuS sigmoids was measured to destabilize render
training (the custom-VJP backward is the pure-JAX reference running
true f32).

``high`` (the default) is a hand-rolled bf16x3 split (~1e-6 relative
forward error): HIGHEST costs 6 bf16 MXU passes per f32xf32 dot, bf16x3
costs 3. The split must be written by hand here because Mosaic cannot
lower ``lax.Precision.HIGH`` inside a ``pallas_call`` (measured on-chip:
``NotImplementedError: Unsupported dot precision: HIGH``), while plain
bf16 dots with f32 accumulation are the MXU's native mode.

``high`` is the default because the on-chip gate (script/chip_parity.py,
round-3 run) measured fwd parity 1.3e-5 rgb max and coarse-loss grad
tree rel-L2 7.2e-6 — three orders below the measured ~3e-3
training-failure threshold — while the throughput A/B measured
26.6k vs 24.8k rays/s (high vs highest, glue kernels off).
``UFO_KERNEL_PRECISION=highest`` restores exact-f32 forward dots for
tight golden-parity runs.

The knob covers ONLY the fused forward kernels — the reference-VJP
backward always runs true f32, and a 1e-6 fwd/bwd inconsistency is
harmless (the measured failure threshold was ~3e-3).

The mode comes from ``Config.kernel_precision`` (round-5 fold of the
UFO_KERNEL_PRECISION env var): model construction calls :func:`set_mode`
once, and kernels consume the mode at trace time via :func:`get_mode`.
Flipping the mode after a kernel has already traced would silently no-op
(jit cache keys don't see it), so a late conflicting :func:`set_mode`
raises instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_MODES = ("highest", "high", "fast")

#: 'fast' is single-pass native bf16 (f32 accumulation) — INFERENCE
#: ONLY: its ~0.3% forward error vs the true-f32 reference-VJP backward
#: was measured to destabilize render training (pipeline/trainer.py
#: refuses to build a train step under it). For serving/extraction it
#: trades that forward error for throughput; measured numbers in
#: BASELINE.md round 4.
_DEFAULT_MODE = "high"
_mode: str = _DEFAULT_MODE
_consumed: bool = False


def set_mode(mode: str) -> None:
    """Select the fused kernels' forward-dot strategy (from
    Config.kernel_precision). Raises on unknown modes, and raises loudly —
    instead of silently no-opping through stale jit caches — if a kernel
    already traced under a different mode in this process."""
    global _mode
    mode = mode.lower()
    if mode not in _MODES:
        raise ValueError(
            f"kernel_precision={mode!r}: expected one of {sorted(_MODES)}")
    if _consumed and mode != _mode:
        raise RuntimeError(
            f"kernel_precision mode already traced as {_mode!r}; flipping to "
            f"{mode!r} would silently no-op through cached jit traces. Use "
            "one mode per process.")
    _mode = mode


def current_mode() -> str:
    """Introspection read (does not pin the mode)."""
    return _mode


def consumed() -> bool:
    """Has any kernel traced under the current mode yet? (Used by the
    Config 'auto' resolution: auto never overrides a traced mode.)"""
    return _consumed


def get_mode() -> str:
    """Trace-time read used by kernel bodies; pins the mode for the process
    so a later conflicting set_mode fails loudly."""
    global _consumed
    _consumed = True
    return _mode


def forward_precision() -> jax.lax.Precision:
    """The XLA precision the current mode corresponds to (for non-Pallas
    call sites that take a Precision)."""
    m = get_mode()
    return (jax.lax.Precision.HIGHEST if m == "highest"
            else jax.lax.Precision.HIGH if m == "high"
            else jax.lax.Precision.DEFAULT)


def kernel_dot(x, y, dimension_numbers):
    """f32-accumulating dot for Pallas kernel bodies, honoring the mode.

    highest — ``Precision.HIGHEST`` (exact f32, 6 bf16 MXU passes).
    high    — manual bf16x3: x = xh + xl, y = yh + yl with bf16 halves;
              xh@yh + xh@yl + xl@yh drops only the O(2^-16) xl@yl term.
              Three native bf16 MXU passes; lowers under Mosaic where
              ``Precision.HIGH`` does not.

    Only ``dimension_numbers`` with empty batch dims are used by callers;
    the split itself is shape-agnostic.
    """
    f32 = jnp.float32
    mode = get_mode()
    if mode == "highest":
        return jax.lax.dot_general(
            x, y, dimension_numbers,
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
    bf16 = jnp.bfloat16
    if mode == "fast":
        return jax.lax.dot_general(
            x.astype(bf16), y.astype(bf16), dimension_numbers,
            preferred_element_type=f32)
    # NOTE: these convert-form splits live INSIDE pallas_call bodies, where
    # Mosaic preserves the f32->bf16 converts (measured: chip_parity grad
    # rel-L2 7.2e-6 at 'high'). Plain-XLA code must NOT copy this pattern:
    # XLA:TPU deletes f32->bf16->f32 round-trips (round-5 finding) — use
    # ops/exact_onehot._mask_bf16 there. chip_parity.py gates both.
    x = x.astype(f32)
    y = y.astype(f32)
    xh = x.astype(bf16)
    xl = (x - xh.astype(f32)).astype(bf16)
    yh = y.astype(bf16)
    yl = (y - yh.astype(f32)).astype(bf16)

    def d(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers, preferred_element_type=f32)

    return d(xh, yh) + d(xh, yl) + d(xl, yh)


def kernel_dot_01(x, y01, dimension_numbers):
    """f32-accurate dot against an exactly-bf16-representable operand.

    For 0/1 group-sum / one-hot matrices only the VALUE side needs
    splitting: a 3-way Fast2Sum bf16 decomposition (see
    ops/exact_onehot.py for the exactness argument) against the exact
    0/1 operand reproduces the f32 contraction up to f32 accumulation
    order in three single-pass bf16 MXU dots — half HIGHEST's passes,
    independent of the kernel_precision mode, and Mosaic-lowerable inside
    pallas_call in every mode (bf16x2 of the value side is NOT enough
    here: the contracted products carry full f32 mantissas and cancel,
    which a 2-way split turns into ~1e-2 relative error on near-zero
    cosines).
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    x = x.astype(f32)
    hi = x.astype(bf16)
    rem = x - hi.astype(f32)
    mid = rem.astype(bf16)
    lo = (rem - mid.astype(f32)).astype(bf16)
    yb = y01.astype(bf16)

    def d(a):
        return jax.lax.dot_general(
            a, yb, dimension_numbers, preferred_element_type=f32)

    return d(hi) + d(mid) + d(lo)
