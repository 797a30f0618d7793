"""Cascade MVS depth estimation (TransMVSNet-style) in JAX.

TPU-native rewrite of the reference cascade
(reference: code1/encoder_utils/fmt/TransMVSNet.py:23-242, fmt/module.py:
homo_warping_trans 329-367, CostRegNet 469-500, get_depth_range_samples
678-707). Per stage s: build depth hypotheses around the previous stage's
winner-take-all depth, homography-warp every source view's features over the
hypotheses, correlate with the reference view, weight per-view by
PixelwiseNet, regularize with a 3D U-Net, softmax -> WTA depth.

Differences from the torch code, by design:
  * everything is channels-last and batched over views with vmap — the
    per-source-view python loop (TransMVSNet.py:76-99) becomes a vectorized
    axis, letting XLA fuse warp+correlation;
  * the N view-rotation passes of build_pairs (model.py:139-160) stay a
    leading batch axis.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_2d
from .layers import Conv3dBnRelu, Deconv3dBnRelu


# --------------------------------------------------------------------------
# Geometry: homography warping over depth hypotheses
# --------------------------------------------------------------------------


def combine_projection(proj: jnp.ndarray) -> jnp.ndarray:
    """(2, 4, 4) [extrinsic, intrinsic] stack -> single 4x4 K@E projection.

    Reference: TransMVSNet.py:77-80.
    """
    out = proj[0]
    kr = jnp.einsum(
        "ij,jk->ik", proj[1, :3, :3], proj[0, :3, :4],
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.at[:3, :4].set(kr)


def homo_warp_grid(
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Normalized sampling grid for warping one source view onto the
    reference hypothesis planes (the geometry half of homo_warping_trans,
    module.py:329-367): pixel grid back-projected at each hypothesis depth,
    projected into the source view; points behind the camera pushed to -99
    (off-image). Returns (D, H, W, 2) normalized (x, y).

    Geometry is ALWAYS computed in float32 regardless of the feature
    compute dtype (``dtype`` is ignored, kept for API compat): bf16 pixel
    coordinates at W=640 carry ~2 px of rounding error, which would warp
    features from the wrong place entirely. Gather cost is dtype-
    independent, so a f32 grid over bf16 features loses nothing."""
    del dtype
    d, h, w = depth_values.shape
    depth_values = depth_values.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    src_proj = src_proj.astype(jnp.float32)
    ref_proj = ref_proj.astype(jnp.float32)
    proj = jnp.einsum("ij,jk->ik", src_proj, jnp.linalg.inv(ref_proj), precision=hp)
    rot, trans = proj[:3, :3], proj[:3, 3]

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    xyz = jnp.stack([xs, ys, ones], axis=-1)  # (H, W, 3)
    rot_xyz = jnp.einsum("ij,hwj->hwi", rot, xyz, precision=hp)  # (H, W, 3)
    proj_xyz = rot_xyz[None] * depth_values[..., None] + trans  # (D, H, W, 3)

    z = proj_xyz[..., 2]
    invalid = z < 1e-6
    xy = proj_xyz[..., :2] / jnp.where(invalid, 1.0, z)[..., None]
    gx = xy[..., 0] / ((w - 1) / 2.0) - 1.0
    gy = xy[..., 1] / ((h - 1) / 2.0) - 1.0
    gx = jnp.where(invalid, -99.0, gx)
    gy = jnp.where(invalid, -99.0, gy)
    return jnp.stack([gx, gy], axis=-1)


def homo_warp(
    src_feat: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    """Warp ONE source view's features onto the reference hypothesis planes
    (homo_warping_trans, module.py:329-367). Returns (D, H, W, C).

    Model code uses homo_warp_batch / _correlate_chunked; this single-view
    form is kept for tests and external callers."""
    d, h, w = depth_values.shape
    grid = homo_warp_grid(src_proj, ref_proj, depth_values, src_feat.dtype)
    out = grid_sample_2d(src_feat[None], grid.reshape(1, d * h * w, 2),
                         align_corners=True, padding_mode="zeros")
    return out.reshape(d, h, w, src_feat.shape[-1])


def homo_warp_batch(
    src_feats: jnp.ndarray,    # (V, H, W, C)
    src_projs: jnp.ndarray,    # (V, 4, 4)
    ref_proj: jnp.ndarray,     # (4, 4)
    depth_values: jnp.ndarray, # (D, H, W)
) -> jnp.ndarray:
    """All source views in one gather: (V, D, H, W, C). Batching through a
    single grid_sample avoids vmap's size-1 batch dim landing on the TPU
    sublane axis (which padded every gather buffer 8x)."""
    v = src_feats.shape[0]
    d, h, w = depth_values.shape
    grids = jax.vmap(
        lambda p: homo_warp_grid(p, ref_proj, depth_values, src_feats.dtype)
    )(src_projs)  # (V, D, H, W, 2)
    out = grid_sample_2d(src_feats, grids.reshape(v, d * h * w, 2),
                         align_corners=True, padding_mode="zeros")
    return out.reshape(v, d, h, w, src_feats.shape[-1])


def _correlate_chunked(
    src_feats: jnp.ndarray,     # (V, H, W, C)
    src_projs: jnp.ndarray,     # (V, 4, 4)
    ref_proj: jnp.ndarray,
    ref_feat: jnp.ndarray,      # (H, W, C)
    depth_values: jnp.ndarray,  # (D, H, W)
    target_rows: int = 1 << 20,
    warp_pad: str = "stage3",   # Config.warp_pad: off | stage3 | stage23
    warp_dot: bool = False,     # Config.warp_dot
) -> jnp.ndarray:
    """Warp + correlate over depth-hypothesis chunks: (V, D, H, W, 1).

    XLA canonicalizes the warp gather into rows of C values with C on the
    128-lane axis, padding each corner buffer by 128/C; chunking the
    hypothesis axis with lax.map bounds that transient to ~0.5GB instead of
    OOMing at the full depth count. (The reference bounds the same memory by
    looping source views, TransMVSNet.py:93-96 — the depth axis chunks
    finer.)

    Stage 3 (C=8, f32) lane-pads each packed corner block 8->32 so rows are
    a full 128-lane tile: 32-lane f32 rows from the full-res source gather
    at ~39 ns/row on v5e (the dominant train-step bucket, 2.05 s/step)
    while 128-lane rows from the 4x-larger source go 2.35x faster
    (script/bench_warp_gather.py; same pattern as pack_volume_corners'
    corner_pad). Bit-exact: padding is zeros, ``c_out`` slices it back off.
    Config.warp_pad='off' disables for A/B."""
    from ..ops.grid_sample import (grid_sample_2d_dot_packed,
                                   grid_sample_2d_packed, pack_image_corners)

    v, h, w, c = src_feats.shape
    d = depth_values.shape[0]
    # pack 2x2 bilinear corners once (chunk-invariant): each warp sample is
    # then ONE 4C-row gather in the TPU-fast gather form
    pad = (32 if (c == 8 and src_feats.dtype == jnp.float32
                  and warp_pad in ("stage3", "stage23", "stage3ns"))
           else None)
    # 'stage3ns': skip the c_out slice after the padded gather and take the
    # correlation mean over the full 32 padded lanes against a zero-padded
    # (chunk-invariant, hoisted) ref instead — probes whether the slice's
    # relayout is part of the 0.91 s/step formatting bucket
    noslice = pad is not None and warp_pad == "stage3ns"
    if (pad is None and c == 16 and src_feats.dtype == jnp.float32
            and warp_pad == "stage23"):
        pad = 32  # stage-2 probe: 64-lane rows -> 128 (measured-off default)
    packed = pack_image_corners(src_feats, corner_pad=pad)
    # warp_dot folds the ref-feature dot + bilinear weights into one
    # full-lane product over the raw gather rows (grid_sample_2d_dot_packed).
    # Measured-off default: 6.456 vs 6.013 s/step f32 on v5e (BASELINE.md
    # round 4) — the broadcast-concat refw costs more than the c_out slices
    # it removes.
    use_dot = warp_dot

    def correlate(dv):
        dc = dv.shape[0]
        grids = jax.vmap(
            lambda p: homo_warp_grid(p, ref_proj, dv, src_feats.dtype)
        )(src_projs)
        if use_dot:
            corr = grid_sample_2d_dot_packed(
                packed, grids.reshape(v, dc * h * w, 2),
                ref_feat.reshape(h * w, c),
                align_corners=True, padding_mode="zeros",
            )
            return corr.reshape(v, dc, h, w, 1) / c
        if noslice:
            warped = grid_sample_2d_packed(
                packed, grids.reshape(v, dc * h * w, 2),
                align_corners=True, padding_mode="zeros", c_out=None,
            ).reshape(v, dc, h, w, pad)
            ref_pad = jnp.pad(ref_feat, ((0, 0), (0, 0), (0, pad - c)))
            return jnp.sum(warped * ref_pad[None, None], axis=-1,
                           keepdims=True) / c
        warped = grid_sample_2d_packed(
            packed, grids.reshape(v, dc * h * w, 2),
            align_corners=True, padding_mode="zeros", c_out=c if pad else None,
        ).reshape(v, dc, h, w, c)
        return jnp.mean(warped * ref_feat[None, None], axis=-1, keepdims=True)

    dc = max(1, min(d, target_rows // max(v * h * w, 1)))
    while d % dc:
        dc -= 1
    if dc == d:
        return correlate(depth_values)
    dv_chunks = depth_values.reshape(d // dc, dc, h, w)
    sim = jax.lax.map(correlate, dv_chunks)       # (n, V, dc, H, W, 1)
    return jnp.moveaxis(sim, 0, 1).reshape(v, d, h, w, 1)


def depth_hypotheses_full(depth_min: jnp.ndarray, depth_max: jnp.ndarray,
                          ndepth: int) -> jnp.ndarray:
    """Uniform (D,) hypotheses between scene depth bounds (stage 1).

    Reference: get_depth_range_samples 2-dim branch (module.py:692-699).
    """
    i = jnp.arange(ndepth, dtype=jnp.float32)
    interval = (depth_max - depth_min) / (ndepth - 1)
    return depth_min + i * interval


def depth_hypotheses_around(cur_depth: jnp.ndarray, ndepth: int,
                            interval: jnp.ndarray) -> jnp.ndarray:
    """(D, H, W) hypotheses centered on the previous stage's depth map.

    Reference: get_cur_depth_range_samples (module.py:678-687).
    """
    lo = cur_depth - ndepth / 2.0 * interval  # (H, W)
    hi = cur_depth + ndepth / 2.0 * interval
    step = (hi - lo) / (ndepth - 1)
    i = jnp.arange(ndepth, dtype=cur_depth.dtype).reshape(-1, 1, 1)
    return lo[None] + i * step[None]


def resize_hypotheses(vol: jnp.ndarray, out_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear resize of a (D, H, W) hypothesis volume to stage resolution
    (align_corners=False — reference TransMVSNet.py:220 F.interpolate)."""
    return jax.image.resize(vol, out_shape, method="linear")


def upsample_depth(depth: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear depth upsampling (align_corners=False, TransMVSNet.py:196-198)."""
    return jax.image.resize(depth, out_hw, method="linear")


def depth_wta(prob_volume: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Winner-take-all depth (module.py:561-565): argmax over hypotheses."""
    idx = jnp.argmax(prob_volume, axis=0)  # (H, W)
    return jnp.take_along_axis(depth_values, idx[None], axis=0)[0]


# --------------------------------------------------------------------------
# Networks
# --------------------------------------------------------------------------


class PixelwiseNet(nn.Module):
    """Per-view weight head: 1x1x1 3D convs + sigmoid + max over depth
    (reference TransMVSNet.py:23-41)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sim: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # sim: (N, D, H, W, 1) -> weight (N, H, W, 1); N batches the source
        # views (the reference loops views through a shared net, here one call)
        x = Conv3dBnRelu(16, kernel=1, dtype=self.dtype)(sim, train)
        x = Conv3dBnRelu(8, kernel=1, dtype=self.dtype)(x, train)
        x = nn.Conv(1, (1, 1, 1), dtype=self.dtype)(x)
        x = nn.sigmoid(x)
        return jnp.max(x, axis=1)


class CostRegNet(nn.Module):
    """3D U-Net cost regularization (reference module.py:469-500)."""

    base_channels: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (N, D, H, W, Cin) -> (N, D, H, W, 1)
        b = self.base_channels
        c0 = Conv3dBnRelu(b, dtype=self.dtype)(x, train)
        c2 = Conv3dBnRelu(b * 2, stride=2, dtype=self.dtype)(c0, train)
        c2 = Conv3dBnRelu(b * 2, dtype=self.dtype)(c2, train)
        c4 = Conv3dBnRelu(b * 4, stride=2, dtype=self.dtype)(c2, train)
        c4 = Conv3dBnRelu(b * 4, dtype=self.dtype)(c4, train)
        x = Conv3dBnRelu(b * 8, stride=2, dtype=self.dtype)(c4, train)
        x = Conv3dBnRelu(b * 8, dtype=self.dtype)(x, train)
        x = c4 + Deconv3dBnRelu(b * 4, dtype=self.dtype)(x, train)
        x = c2 + Deconv3dBnRelu(b * 2, dtype=self.dtype)(x, train)
        x = c0 + Deconv3dBnRelu(b, dtype=self.dtype)(x, train)
        return nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype)(x)


class CascadeMatcher(nn.Module):
    """FeatureNet + FMT + 3-stage cascade over all view rotations.

    The reference (model.py:139-160 build_pairs + TransMVSNet.forward) runs
    the WHOLE encoder once per rotation of the view order, so every view acts
    as MVS reference once. Here the backbone runs once per view (it is
    rotation-independent) and only the FMT pathway + cascade repeat per
    rotation — an N_view-fold saving over the reference.

    Stage scales are 1/4, 1/2, 1/1 with ndepths (48, 32, 8) by default
    (reference TransMVSNet.py:125-151).
    """

    ndepths: Sequence[int] = (48, 32, 8)
    depth_intervals_ratio: Sequence[float] = (4.0, 2.0, 1.0)
    cr_base_chs: Sequence[int] = (8, 8, 8)
    base_channels: int = 8
    fmt_layer_names: Sequence[str] = ("self", "cross") * 4
    grad_method: str = "detach"
    share_cr: bool = False
    dtype: jnp.dtype = jnp.float32
    # measured perf knobs threaded from Config (see config.py warp_pad /
    # warp_dot docs; round-5 env-knob fold)
    warp_pad: str = "stage3"
    warp_dot: bool = False

    def setup(self):
        from .featurenet import FeatureNet
        from .fmt import FMTWithPathway

        self.feature = FeatureNet(self.base_channels, dtype=self.dtype)
        self.fmt_with_pathway = FMTWithPathway(
            base_channels=self.base_channels,
            d_model=self.base_channels * 4,
            layer_names=self.fmt_layer_names,
            dtype=self.dtype,
        )
        self.pixel_wise_net = PixelwiseNet(dtype=self.dtype)
        if self.share_cr:
            # one regularizer shared by all stages, base_channels fixed at 8
            # (reference TransMVSNet.py:156-157, applied at :222)
            shared = CostRegNet(8, dtype=self.dtype, name="cost_reg_shared")
            self.cost_reg = [shared] * len(self.ndepths)
        else:
            self.cost_reg = [
                CostRegNet(self.cr_base_chs[i], dtype=self.dtype, name=f"cost_reg_{i}")
                for i in range(len(self.ndepths))
            ]

    # -- single cascade stage (reference DepthNet.forward TransMVSNet.py:49-121)
    def _run_stage(self, stage_idx, features, proj_matrices, depth_values,
                   view_weights, train):
        ref_feat = features[0]
        src_feats = features[1:]
        projs = jax.vmap(combine_projection)(proj_matrices)  # (V, 4, 4)
        ref_proj = projs[0]
        src_projs = projs[1:]

        # correlation: channel mean of warped * ref (TransMVSNet.py:81-82),
        # computed over depth chunks to bound gather padding (see
        # _correlate_chunked)
        sim = _correlate_chunked(src_feats, src_projs, ref_proj, ref_feat,
                                 depth_values, warp_pad=self.warp_pad,
                                 warp_dot=self.warp_dot)  # (V-1, D, H, W, 1)

        if view_weights is None:  # stage 1 only (TransMVSNet.py:216-222)
            view_weights = self.pixel_wise_net(sim, train)  # (V-1, H, W, 1)

        w = view_weights[:, None]  # (V-1, 1, H, W, 1)
        agg = jnp.sum(sim * w, axis=0) / (jnp.sum(w, axis=0) + 1e-5)

        cost_reg = self.cost_reg[stage_idx](agg[None], train)[0, ..., 0]  # (D,H,W)
        prob_volume = jax.nn.softmax(cost_reg, axis=0)
        depth = depth_wta(prob_volume, depth_values)
        return {
            "depth": depth,
            "prob_volume": prob_volume,
            "cost_volume": cost_reg,
            "photometric_confidence": jnp.max(prob_volume, axis=0),
            "depth_values": depth_values,
        }, view_weights

    def _cascade(self, feats_fmt, proj_matrices, depth_values, img_hw, train):
        """Run the 3-stage cascade for one view rotation.

        feats_fmt: dict stage -> (V, h_s, w_s, C_s); proj_matrices: dict
        stage -> (V, 2, 4, 4); depth_values: (D0,) scene hypotheses in mm.
        """
        h, w = img_hw
        depth_min = depth_values[0]
        depth_max = depth_values[-1]
        depth_interval = (depth_max - depth_min) / depth_values.shape[0]

        outputs = {}
        depth = None
        view_weights = None
        scales = [4, 2, 1]
        for s, nd in enumerate(self.ndepths):
            hs, ws = h // scales[s], w // scales[s]
            if depth is None:
                # stage 1: uniform ndepth hypotheses from scene min..max —
                # the reference's 2-dim get_depth_range_samples branch
                # already emits ndepth values (module.py:692-699), so the
                # follow-up trilinear resize (TransMVSNet.py:220) is an
                # identity on the depth axis
                hyp_d = depth_hypotheses_full(depth_min, depth_max, nd)
                hyp = jnp.broadcast_to(hyp_d[:, None, None], (nd, hs, ws))
            else:
                cur = depth
                if self.grad_method == "detach":
                    cur = jax.lax.stop_gradient(cur)
                # reference order: upsample prev depth to full res, build
                # hypotheses, trilinear-resize to stage res. Hypotheses are
                # linear in the depth map, so resizing the map first is exact.
                cur_full = upsample_depth(cur, (h, w))
                cur_stage = upsample_depth(cur_full, (hs, ws))
                interval = self.depth_intervals_ratio[s] * depth_interval
                hyp = depth_hypotheses_around(cur_stage, nd, interval)

            if s > 0:
                view_weights = jax.image.resize(
                    view_weights,
                    (view_weights.shape[0], hs, ws, 1),
                    method="nearest",
                )
            out_s, view_weights = self._run_stage(
                s, feats_fmt[f"stage{s+1}"], proj_matrices[f"stage{s+1}"],
                hyp, view_weights, train,
            )
            outputs[f"stage{s+1}"] = out_s
            depth = out_s["depth"]
        return outputs

    def __call__(
        self,
        imgs: jnp.ndarray,                     # (V, H, W, 3) source views
        proj_matrices: Dict[str, jnp.ndarray], # stage -> (V, 2, 4, 4)
        depth_values: jnp.ndarray,             # (D0,) hypotheses in mm
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        v, h, w, _ = imgs.shape
        feats = self.feature(imgs, train)  # dict stage -> (V, h_s, w_s, C_s)

        # Every view leads once (build_pairs, model.py:139-160). The
        # rotations are SCANNED, not unrolled: only one rotation's FMT +
        # cascade U-Net temps are live at a time, which is what keeps
        # full-resolution encode inside v5e HBM.
        rot_idx = jnp.array([[(r + i) % v for i in range(v)] for r in range(v)])
        feats_rot = {k: f[rot_idx] for k, f in feats.items()}       # (R, V, ...)
        projs_rot = {k: p[rot_idx] for k, p in proj_matrices.items()}

        if train:
            # BN running stats mutate under train; nn.scan would need them
            # broadcast, so keep the unrolled loop (training runs at reduced
            # resolution where the memory argument does not bind).
            stacked = None
            for r in range(v):
                flat = self._rotation(
                    {k: f[r] for k, f in feats_rot.items()},
                    {k: p[r] for k, p in projs_rot.items()},
                    depth_values, (h, w), True,
                )
                if stacked is None:
                    stacked = {k: [x] for k, x in flat.items()}
                else:
                    for k, x in flat.items():
                        stacked[k].append(x)
            rots = {k: jnp.stack(xs) for k, xs in stacked.items()}
        else:
            def body(mdl, carry, xs):
                fr, pr = xs
                return carry, mdl._rotation(fr, pr, depth_values, (h, w), False)

            scan = nn.scan(
                body,
                variable_broadcast=["params", "batch_stats"],
                split_rngs={"params": False},
                in_axes=0, out_axes=0,
            )
            _, rots = scan(self, None, (feats_rot, projs_rot))

        # Pairwise matching features run over the FMT-TRANSFORMED stage1 of
        # rotation 0 — the reference's "features_backbone" list is mutated
        # in place by FMT_with_pathway inside TransMVSNet.forward
        # (FMT.py:243-252 assigns into the same dicts), so get_match_feat
        # (model.py:505 -> TransMVSNet.py:341) and the ray transformer's
        # image features both see post-FMT features, not the raw backbone.
        fmt_stage1_rot0 = rots["fmt_stage1"][0]           # (V, h1, w1, C1)
        aug0, aug1 = self.fmt_with_pathway.extract_cross_features(
            fmt_stage1_rot0, v)

        rot0_aux = {
            f"stage{s+1}": {
                "prob_volume": rots[f"prob_volume{s+1}"][0],
                "depth_values": rots[f"depth_values{s+1}"][0],
                "depth": rots[f"depth{s+1}"][0],
                "photometric_confidence": rots[f"conf{s+1}"][0],
            }
            for s in range(len(self.ndepths))
        }
        cost_volumes = {
            f"stage{s+1}": rots[f"cost_volume{s+1}"]     # (R, D, h_s, w_s)
            for s in range(len(self.ndepths))
        }
        mvs_depth = rots[f"depth{len(self.ndepths)}"]    # (V, H, W)
        return {
            # rotation-0 FMT-transformed stage1: what the reference feeds the
            # ray transformer / similarity / featuregrid paths (see above)
            "feat_stage1": fmt_stage1_rot0,
            "backbone_stage1": feats["stage1"],           # (V, h1, w1, C1)
            "cost_volumes": cost_volumes,
            "mvs_depth": mvs_depth,
            "aug0": aug0,                                 # (P, h1, w1, C1)
            "aug1": aug1,
            "rot0": rot0_aux,                             # pretraining aux
        }

    def _rotation(self, feats_rot, projs_rot, depth_values, img_hw, train):
        """One view-rotation pass: FMT pathway + 3-stage cascade, flattened
        to a dict of stackable per-stage tensors."""
        feats_fmt = self.fmt_with_pathway(feats_rot)
        outs = self._cascade(feats_fmt, projs_rot, depth_values, img_hw, train)
        flat = {"fmt_stage1": feats_fmt["stage1"]}
        for s in range(len(self.ndepths)):
            st = outs[f"stage{s+1}"]
            flat[f"cost_volume{s+1}"] = st["cost_volume"]
            flat[f"prob_volume{s+1}"] = st["prob_volume"]
            flat[f"depth{s+1}"] = st["depth"]
            flat[f"depth_values{s+1}"] = st["depth_values"]
            flat[f"conf{s+1}"] = st["photometric_confidence"]
        return flat
