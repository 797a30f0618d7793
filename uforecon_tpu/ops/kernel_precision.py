"""Forward matmul precision for the fused render kernels.

The fused kernels' dot_generals default to ``Precision.HIGHEST`` (true-f32
MXU passes): TPU's default precision rounds dot inputs to bf16, and a
~0.3% forward-vs-backward inconsistency through the exp(10s)-scaled NeuS
sigmoids was measured to destabilize render training (the custom-VJP
backward is the pure-JAX reference running true f32).

``UFO_KERNEL_PRECISION=high`` selects ``Precision.HIGH`` (3-pass bf16x3,
~1e-6 relative forward error) for an on-chip accuracy/throughput A/B:
HIGHEST costs ~12% end-to-end render throughput vs the unfixed default,
and bf16x3 halves the extra MXU passes. The knob covers ONLY the fused
forward kernels — the reference-VJP backward always runs true f32, and a
1e-6 fwd/bwd inconsistency is harmless (the measured failure threshold
was ~3e-3).

Read once at import time: jit traces cache the chosen constant, so flip
the env var between processes, not mid-run.
"""
from __future__ import annotations

import os

import jax

_NAMES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}

_raw = os.environ.get("UFO_KERNEL_PRECISION", "highest").lower()
if _raw not in _NAMES:
    raise ValueError(
        f"UFO_KERNEL_PRECISION={_raw!r}: expected one of {sorted(_NAMES)}")

#: The precision constant every fused forward kernel matmul uses.
FORWARD_PRECISION: jax.lax.Precision = _NAMES[_raw]
