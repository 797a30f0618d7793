"""FMT: cross-view Feature Matching Transformer with FPN pathway.

TPU-native rewrite of the reference FMT / FMT_with_pathway
(reference: code1/encoder_utils/fmt/FMT.py:115-315). One stack of linear
attention layers is shared across the three operating modes:

  * ref mode  — pure self-attention over the reference view, collecting the
    intermediate output after every 'self' layer (FMT.py:143-155);
  * src mode  — alternating self-attention and cross-attention to the saved
    reference outputs (FMT.py:157-172);
  * cross mode — symmetric pairwise matching: both orders of a view pair are
    batched together, self layers update the pack while cross layers attend
    to the *raw* position-encoded swapped pack (FMT.py:174-197).

Known reference quirk: the torch code returns ``pair_feat1`` twice from
cross mode, so downstream ``get_match_feat`` hands view j the augmented
features of view i (TransMVSNet.py:341-375). We return the genuine
(feat0', feat1') halves here; the quirk is reproduced where it matters —
in the similarity query (ray_transformer.query_similarity pair_quirk,
default on for reference parity).

All modes run batched over views/pairs — no python loop over views.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.posenc import sine_image_pe
from .attention import FMTEncoderLayer
from .layers import upsample_bilinear


def _flatten(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return x.reshape(n, h * w, c)


def _unflatten(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    n, l, c = x.shape
    return x.reshape(n, h, w, c)


class FMT(nn.Module):
    """The shared attention stack (FMT.py:115-200)."""

    d_model: int = 32
    n_heads: int = 8
    layer_names: Sequence[str] = ("self", "cross") * 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            FMTEncoderLayer(self.d_model, self.n_heads, self.dtype, name=f"layer_{i}")
            for i in range(len(self.layer_names))
        ]

    def _pos_encode(self, feat: jnp.ndarray) -> jnp.ndarray:
        h, w = feat.shape[1:3]
        pe = sine_image_pe(self.d_model, h, w)
        return feat + jnp.asarray(pe, feat.dtype)

    def ref_forward(self, feat: jnp.ndarray) -> List[jnp.ndarray]:
        """Self-attention stack; returns output after each 'self' layer."""
        h, w = feat.shape[1:3]
        x = _flatten(self._pos_encode(feat))
        outs = []
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                x = layer(x, x)
                outs.append(_unflatten(x, h, w))
        return outs

    def src_forward(self, ref_list: List[jnp.ndarray], feat: jnp.ndarray) -> jnp.ndarray:
        """Self layers on src; cross layers attend to saved ref outputs.

        ``ref_list[i // 2]`` selects which saved reference output layer ``i``
        attends to (FMT.py:165-172). ref features are broadcast over the src
        batch when several source views are packed together.
        """
        h, w = feat.shape[1:3]
        x = _flatten(self._pos_encode(feat))
        n_src = x.shape[0]
        for i, (layer, name) in enumerate(zip(self.layers, self.layer_names)):
            if name == "self":
                x = layer(x, x)
            else:
                ref = _flatten(ref_list[i // 2])
                if ref.shape[0] != n_src:
                    reps = n_src // ref.shape[0]
                    ref = jnp.repeat(ref, reps, axis=0)
                x = layer(x, ref)
        return _unflatten(x, h, w)

    def cross_forward(self, feat0: jnp.ndarray, feat1: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Symmetric pairwise matching (FMT.py:174-197).

        Both orders are packed along batch; cross layers attend to the raw
        position-encoded swap (never updated — matches the reference).
        """
        h, w = feat0.shape[1:3]
        n = feat0.shape[0]
        f0 = _flatten(self._pos_encode(feat0))
        f1 = _flatten(self._pos_encode(feat1))
        pack = jnp.concatenate([f0, f1], axis=0)
        swap = jnp.concatenate([f1, f0], axis=0)
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                pack = layer(pack, pack)
            else:
                pack = layer(pack, swap)
        out = _unflatten(pack, h, w)
        return out[:n], out[n:]


class FMTWithPathway(nn.Module):
    """FMT on stage1 + FPN pathway into stage2/stage3 (FMT.py:204-255)."""

    base_channels: int = 8
    d_model: int = 32
    n_heads: int = 8
    layer_names: Sequence[str] = ("self", "cross") * 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fmt = FMT(self.d_model, self.n_heads, self.layer_names, self.dtype)
        b = self.base_channels
        self.dim_reduction_1 = nn.Conv(b * 2, (1, 1), use_bias=False, dtype=self.dtype)
        self.dim_reduction_2 = nn.Conv(b * 1, (1, 1), use_bias=False, dtype=self.dtype)
        self.smooth_1 = nn.Conv(b * 2, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)
        self.smooth_2 = nn.Conv(b * 1, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)

    def _pathway(self, stage1, stage2, stage3):
        """stage2 = smooth(up(dimred(stage1)) + stage2); same for stage3."""
        s2 = self.smooth_1(
            upsample_bilinear(self.dim_reduction_1(stage1), stage2.shape[1:3]) + stage2
        )
        s3 = self.smooth_2(
            upsample_bilinear(self.dim_reduction_2(s2), stage3.shape[1:3]) + stage3
        )
        return s2, s3

    def __call__(self, features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Apply FMT to stage1 of all views and propagate down the pyramid.

        Args:
          features: dict with 'stage1' (V, H/4, W/4, C1), 'stage2', 'stage3';
            view 0 is the reference.
        Returns:
          dict of transformed stages, same shapes.
        """
        s1, s2, s3 = features["stage1"], features["stage2"], features["stage3"]
        ref_list = self.fmt.ref_forward(s1[0:1])
        src_s1 = self.fmt.src_forward(ref_list, s1[1:])
        new_s1 = jnp.concatenate([ref_list[-1], src_s1], axis=0)
        new_s2, new_s3 = self._pathway(new_s1, s2, s3)
        return {"stage1": new_s1, "stage2": new_s2, "stage3": new_s3}

    def extract_cross_features(
        self, stage1: jnp.ndarray, n_views: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pairwise matching features over all view pairs (FMT.py:258-315).

        Args:
          stage1: (V, H, W, C) stage-1 features, one per view.
          n_views: V (static).

        Returns:
          (aug0, aug1): each (P, H, W, C) with P = V choose 2 ordered pairs
          (i, j), i < j: aug0[p] is the view-i feature matched against view j.
        """
        pairs = [(a, b) for a in range(n_views - 1) for b in range(a + 1, n_views)]
        i_idx = jnp.array([p[0] for p in pairs])
        j_idx = jnp.array([p[1] for p in pairs])
        feat0 = stage1[i_idx]
        feat1 = stage1[j_idx]
        return self.fmt.cross_forward(feat0, feat1)


def group_match_features(
    aug0: jnp.ndarray, aug1: jnp.ndarray, n_views: int
) -> jnp.ndarray:
    """Regroup pairwise features per view (reference TransMVSNet.py:341-375).

    View k's matching feature is the channel-concat of its augmented feature
    from every pair containing k, in pair order. Returns (V, H, W, (V-1)*C).
    """
    pairs = [(a, b) for a in range(n_views - 1) for b in range(a + 1, n_views)]
    per_view: List[List[jnp.ndarray]] = [[] for _ in range(n_views)]
    for p, (i, j) in enumerate(pairs):
        per_view[i].append(aug0[p])
        per_view[j].append(aug1[p])
    return jnp.stack(
        [jnp.concatenate(v, axis=-1) for v in per_view], axis=0
    )
