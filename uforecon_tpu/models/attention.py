"""Linear-attention transformer blocks (flax.linen).

Covers both attention stacks of the reference:
  * the FMT encoder layer used by the cross-view matching transformer
    (reference: code1/encoder_utils/fmt/FMT.py:17-112)
  * the LoFTR encoder layer used by the ray/view transformers
    (reference: code1/attention/transformer.py:7-102,
     code1/attention/linear_attention.py:14-47)

Linear attention (elu(x)+1 feature map, "Transformers are RNNs") keeps the
32k-token matching sequences O(N d^2): on TPU each step is two einsum
contractions that map straight onto the MXU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-6


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Linear attention over (B, L, H, D) tensors.

    V' = phi(Q) (phi(K)^T V) / (phi(Q) sum(phi(K)))  with phi(x)=elu(x)+1.
    Matches both reference implementations (FMT.py:23-38 and
    linear_attention.py:20-47 — the /v_length trick cancels exactly).

    Two mathematically identical association orders:
      * kv-order O(B·S·D·M): contract K^T V first. Right for long sequences
        (FMT's 32k matching tokens) where B is small.
      * qk-order O(B·L·S·D): contract phi(Q) phi(K)^T first. Right for the
        per-point view/ray transformers where B is RN·SN points and S is 4
        tokens — the kv-order's per-point (H, D, M) state pads to (16, 128)
        TPU tiles and cost 34GB at render chunk size. The qk-order einsums
        keep the huge B axis on the 128-lane dim (no padding).
    """
    s_len = k.shape[1]
    if (s_len <= 8 and q.shape[1] <= 8 and q.shape[-1] <= 16
            and jax.default_backend() == "tpu"):
        # fused Pallas kernel: points stay on the lane axis, no padding
        from ..ops.pallas_attention import tiny_linear_attention

        return tiny_linear_attention(q, k, v)
    qf = jax.nn.elu(q) + 1.0
    kf = jax.nn.elu(k) + 1.0
    hp = jax.lax.Precision.HIGHEST
    if s_len <= 64:
        scores = jnp.einsum("blhd,bshd->hlsb", qf, kf, precision=hp)
        denom = jnp.sum(scores, axis=2) + _EPS              # (H, L, B)
        out = jnp.einsum("hlsb,bshm->hmlb", scores, v, precision=hp)
        out = out / denom[:, None]                          # (H, M, L, B)
        return out.transpose(3, 2, 0, 1)                    # (B, L, H, M)
    kv = jnp.einsum("bshd,bshm->bhmd", kf, v, precision=hp)
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", qf, kf.sum(axis=1), precision=hp) + _EPS)
    return jnp.einsum("blhd,bhmd,blh->blhm", qf, kv, z, precision=hp)


def full_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Exact softmax attention over (B, L, H, D) (reference
    linear_attention.py:50-81); used only for tiny sequences."""
    hp = jax.lax.Precision.HIGHEST
    qk = jnp.einsum("blhd,bshd->blsh", q, k, precision=hp)
    a = jax.nn.softmax(qk / (q.shape[-1] ** 0.5), axis=2)
    return jnp.einsum("blsh,bshd->blhd", a, v, precision=hp)


class FMTEncoderLayer(nn.Module):
    """Pre-residual encoder layer of the matching transformer
    (reference FMT.py:79-112)."""

    d_model: int
    n_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        s = source.shape[1]
        h = self.n_heads
        dk = self.d_model // h

        q = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(source)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(source)
        msg = linear_attention(
            q.reshape(b, l, h, dk), k.reshape(b, s, h, dk), v.reshape(b, s, h, dk)
        ).reshape(b, l, self.d_model)
        msg = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(msg)

        x = x + msg
        y = x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = nn.relu(nn.Dense(2 * self.d_model, dtype=self.dtype, name="ff1")(y))
        y = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(y)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + y)


class LoFTREncoderLayer(nn.Module):
    """Post-concat encoder layer of the ray/view transformers
    (reference attention/transformer.py:7-58)."""

    d_model: int
    n_heads: int
    attention: str = "linear"  # 'linear' | 'full'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        s = source.shape[1]
        h = self.n_heads
        dk = self.d_model // h

        # HIGHEST matmuls: the reference computes f32 (torch 1.13 matmul
        # tf32 off); TPU default precision would round inputs to bf16, and
        # the fused Pallas kernels mirror these layers at HIGHEST — keeping
        # both paths at true f32 keeps forward (kernel) and backward
        # (this module via the reference VJP) consistent.
        hp = jax.lax.Precision.HIGHEST
        dense = lambda d, name: nn.Dense(d, use_bias=False, dtype=self.dtype,
                                         precision=hp, name=name)
        q = dense(self.d_model, "q_proj")(x)
        k = dense(self.d_model, "k_proj")(source)
        v = dense(self.d_model, "v_proj")(source)
        attn = linear_attention if self.attention == "linear" else full_attention
        msg = attn(
            q.reshape(b, l, h, dk), k.reshape(b, s, h, dk), v.reshape(b, s, h, dk)
        ).reshape(b, l, self.d_model)
        msg = dense(self.d_model, "merge")(msg)
        msg = nn.LayerNorm(dtype=jnp.float32, name="norm1")(msg)

        msg = jnp.concatenate([x, msg], axis=-1)
        msg = dense(2 * self.d_model, "mlp1")(msg)
        msg = nn.relu(msg)
        msg = dense(self.d_model, "mlp2")(msg)
        msg = nn.LayerNorm(dtype=jnp.float32, name="norm2")(msg)
        return x + msg


class LocalFeatureTransformer(nn.Module):
    """Stack of LoFTR layers driven by a self/cross schedule
    (reference attention/transformer.py:61-102)."""

    d_model: int
    n_heads: int
    layer_names: Sequence[str] = ("self",)
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat0: jnp.ndarray, feat1: jnp.ndarray | None = None) -> jnp.ndarray:
        for i, name in enumerate(self.layer_names):
            layer = LoFTREncoderLayer(
                self.d_model, self.n_heads, self.attention, self.dtype,
                name=f"layer_{i}",
            )
            if name == "self":
                feat0 = layer(feat0, feat0)
            elif name == "cross":
                feat0 = layer(feat0, feat1)
            else:
                raise KeyError(name)
        return feat0
