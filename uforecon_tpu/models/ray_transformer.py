"""RayTransformer: per-point view aggregation + along-ray SRDF head.

TPU-native rewrite of the reference RayTransformer
(reference: code1/ray_transformer.py:86-331). Per sample point it fuses:
  * grid-sampled source image features (32d, backbone stage1),
  * correlation-volume features (24d, query_depth_from_volume),
  * explicit pairwise similarity (8 cosine groups -> 16d via pre_sim_mlp),
  * MVS-depth positional encoding (8d NeRF PE of sampled-depth minus cam-z),
then runs a learnable view token through a linear-attention view transformer,
a ray transformer along the sample axis with order positional encoding, an
SRDF MLP, and a masked-softmax radiance blend over views.

Shapes are batch-free (the reference runs B=1 everywhere); vmap to batch.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import (grid_sample_2d, grid_sample_2d_packed,
                               grid_sample_3d, grid_sample_3d_packed,
                               in_bounds_mask, pack_image_corners)
from ..ops.posenc import nerf_posenc, order_posenc
from .attention import LocalFeatureTransformer
from .layers import MLP


def query_correlation_volume(
    points: jnp.ndarray,                 # (RN, SN, 3) world points
    source_poses: jnp.ndarray,           # (NV, 4, 4) NDC projections
    volumes: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
    near_far: Tuple[jnp.ndarray, jnp.ndarray],
    fused: str = "auto",
    brick: Optional[Dict] = None,        # stage -> per-seg (BD, BH, BW) dims
    brick_origins: Optional[Dict] = None,  # stage -> (T, S, NV, 3)
    brick_flags: Optional[Dict[str, jnp.ndarray]] = None,
    brick_n_seg: int = 8,
    brick_kernel: str = "gather",        # gather | mxu (see brick_gather)
    merged_n_feat: int = 24,             # true feature chans of a merged
                                         # volume (n_stages * 8)
) -> jnp.ndarray:
    """Weighted fusion of per-view multi-stage correlation-frustum features.

    Reference: model.py:350-390 query_depth_from_volume. Each view's three
    cost volumes live in that view's NDC frustum (x, y pixel NDC; z depth
    normalized to [-1,1] by the scene near/far). Features from all stages are
    concatenated (8ch x 3 = 24) and fused across views by the summed stage
    weights: G = sum_n f_n w_n / sum_n w_n.

    ``fused`` routes the cross-view weighted fusion to a Pallas kernel
    that consumes the per-stage samples point-major in one pass
    (ops/fused_volume_fusion.py): 'auto' = on TPU, 'never' = the XLA
    chain below, 'always' = force (tests run the interpreter).

    ``brick``/``brick_origins`` (static per-seg dims + this chunk's
    (T, S, NV, 3) hull-minimum origins from ops/brick_plan.py) switch
    per-stage sampling to tile-local brick gathers for STRATIFIED sample
    grids (ops/brick_gather.brick_sample_coarse_packed) — bit-identical
    values; the scattered HBM gathers they replace were measured 2.2-2.5x
    slower on coherent ray tiles (script/bench_tile_gather.py). The caller
    must only pass them for stratified (coarse) points whose sample axis
    splits into n_seg static along-ray blocks. ``brick_flags[stage]`` (a
    traced per-chunk bool) selects brick vs flat at run time via lax.cond:
    the host planner certifies coverage per tile and routes the rare huge-
    footprint tiles (near another view's epipole) through the flat branch.

    Args:
      volumes: stage -> corner-packed feat||weight volume
               (NV, D_s, h_s, w_s, 8*(8+1)); see pack_volume_corners.

    Returns:
      (RN, SN, 24) fused features.
    """
    from ..ops.camera import project_points_ndc

    near, far = near_far
    _, xyz, _ = project_points_ndc(source_poses, points, near_far=(near, far))
    # xyz: (NV, RN, SN, 3) with z in [-1, 1]

    if "merged" in volumes:
        # round-5 merged-volume path (Config.volume_merge='auto'): every
        # view's 3 stage volumes were fused at encode time
        # (ops/volume_merge.py) — ONE gather row per (point, view)
        # instead of one per (point, view, stage). Same coordinates, same
        # cross-view ratio math.
        from ..ops.volume_merge import query_merged_volume

        return query_merged_volume(volumes["merged"], xyz, merged_n_feat)

    fws = []
    for stage, packed in volumes.items():
        # packed (NV, D, h, w, 8*C'): corner-packed feat||weight rows,
        # C' = 9 (or 16 lane-padded, see pack_volume_corners corner_pad)
        c_out = 9 if packed.shape[-1] == 128 else None

        def flat_fn(p=packed, c=c_out):
            return grid_sample_3d_packed(p, xyz, align_corners=True,
                                         padding_mode="zeros", c_out=c)

        bd = brick.get(stage) if brick is not None else None
        if bd is not None and isinstance(bd[0], int):
            bd = (tuple(bd),) * brick_n_seg     # single triple -> per-seg
        use_brick = (bd is not None and brick_origins is not None
                     and points.ndim == 3
                     and points.shape[1] % brick_n_seg == 0
                     and any(tuple(d) != (1, 1, 1) for d in bd))
        if use_brick:
            from ..ops.brick_gather import (brick_sample_coarse_mxu,
                                            brick_sample_coarse_packed)

            # 'mxu' replaces the per-row brick gathers with dense 2-hot
            # weight contractions (gather-free; ~1e-7/1e-6 float-association
            # difference, parity-gated); 'gather' stays bit-equal to flat
            sampler = (brick_sample_coarse_mxu if brick_kernel == "mxu"
                       else brick_sample_coarse_packed)

            def brick_fn(p=packed, st=stage, dd=bd, c=c_out, fn=sampler):
                return fn(
                    p, xyz, dd, brick_origins[st], n_seg=brick_n_seg,
                    align_corners=True, padding_mode="zeros", c_out=c)

            if brick_flags is None:
                fws.append(brick_fn())
            else:
                fws.append(jax.lax.cond(brick_flags[stage],
                                        brick_fn, flat_fn))
        else:
            fws.append(flat_fn())

    if fused == "always" or (fused == "auto"
                             and jax.default_backend() == "tpu"):
        from ..ops.fused_volume_fusion import volume_fusion

        nv = fws[0].shape[0]
        f = fws[0].shape[-1] - 1
        lead = fws[0].shape[1:-1]
        flat = [fw.reshape(nv, -1, f + 1) for fw in fws]
        return volume_fusion(*flat).reshape(*lead, len(fws) * f)

    feats = jnp.concatenate([fw[..., :-1] for fw in fws], axis=-1)
    weight_sum = 0.0
    for fw in fws:
        weight_sum = weight_sum + fw[..., -1:]    # (NV, RN, SN, 1)

    g = jnp.sum(feats * weight_sum, axis=0)
    w_all = jnp.sum(weight_sum, axis=0)
    return g / (w_all + 1e-8)


def query_similarity(
    points: jnp.ndarray,        # (RN, SN, 3) or (P3,) flat grid for fields
    source_poses: jnp.ndarray,  # (NV, 4, 4)
    aug0: jnp.ndarray,          # (P, h, w, C) pairwise match features, view i
    aug1: jnp.ndarray,          # (P, h, w, C) pairwise match features, view j
    n_views: int,
    n_groups: int = 8,
    pair_quirk: bool = True,
    fused: str = "auto",
    source_dtype=None,   # e.g. jnp.bfloat16: cast the packed gather source
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Explicit pairwise feature similarity (reference model.py:218-305).

    For every view pair (i, j): sample view-i's matched feature at the
    projection into view i and view-j's at the projection into view j
    (align_corners=True, border padding — gmflow_utils.py:83), split channels
    into ``n_groups`` groups, cosine similarity per group, mean over pairs.

    ``pair_quirk`` (default, reference-shipped semantics): the reference's
    FMT cross mode returns ``pair_feat1`` TWICE (FMT.py:197), so
    get_match_feat hands view j the pair's view-i augmented map and the
    cosine compares the SAME map sampled at the two projections
    (TransMVSNet.py:362-366 + model.py:270-282) — with trained FMT weights
    whose cross output is spatially near-constant this makes feat_info
    degenerate to ~1.0. Golden-tested against the torch code
    (tests/test_golden_full.py). Set False for the genuine (feat0', feat1')
    halves the paper describes.

    TPU layout: every pair-feature map of a given view is sampled at that
    view's SAME projection, so the (NV-1) maps per view are concatenated
    channel-wise and sampled with ONE corner-packed gather per view-point
    instead of one per (pair, side) — gather cost on TPU is per row, so this
    halves the hot-path similarity gathers. Values are bit-identical.

    ``fused`` routes the grouped-cosine stage to a Pallas kernel that
    consumes the gather output point-major in one pass
    (ops/fused_similarity.py): 'auto' = on TPU, 'never' = the XLA loop
    below, 'always' = force (tests run the interpreter). Identical math.

    Returns:
      feat_info: (..., n_groups) mean per-group cosine similarity.
      xy:        (NV, ..., 2) projections (reusable by the ray transformer).
      valid:     (NV, ...) positive-depth mask.
    """
    from ..ops.camera import project_points_ndc

    assert n_views >= 2, (
        f"explicit similarity needs >= 2 source views, got {n_views}")
    xy, _, valid = project_points_ndc(source_poses, points)

    merged, slots, pairs = build_pair_maps(aug0, aug1, n_views, pair_quirk)
    # one packed row of 4 corners x (NV-1)C values per view-point
    packed = pack_image_corners(merged)
    if source_dtype is not None:
        packed = packed.astype(source_dtype)
    sampled = grid_sample_2d_packed(packed, xy,
                                    align_corners=True,
                                    padding_mode="border")  # (NV, ..., (NV-1)C)
    if source_dtype is not None:
        sampled = sampled.astype(merged.dtype)
    feat = _pair_cosines(sampled, slots, pairs, n_views, aug0.shape[-1],
                         n_groups, fused)
    return feat, xy, valid


def build_pair_maps(aug0, aug1, n_views, pair_quirk=True):
    """Per-view channel-concat of every pair map the view participates in
    (the one-row-per-view-point layout query_similarity samples).

    Returns (merged (NV, h, w, (NV-1)C), slots, pairs)."""
    pairs = [(a, b) for a in range(n_views - 1) for b in range(a + 1, n_views)]
    slots = [[] for _ in range(n_views)]
    maps = [[] for _ in range(n_views)]
    for p, (i, j) in enumerate(pairs):
        slots[i].append((0, p))
        maps[i].append(aug0[p])
        slots[j].append((1, p))
        maps[j].append(aug0[p] if pair_quirk else aug1[p])
    merged = jnp.stack([jnp.concatenate(m, axis=-1) for m in maps])
    return merged, slots, pairs


def _pair_cosines(sampled, slots, pairs, n_views, c, n_groups, fused):
    """Grouped pairwise cosines over sampled pair-map rows (the tail of
    query_similarity, factored out so the shared-image-row path can reuse
    it on its slice of a combined gather row)."""
    lead = sampled.shape[1:-1]
    if fused == "always" or (fused == "auto"
                             and jax.default_backend() == "tpu"):
        from ..ops.fused_similarity import grouped_cosine

        flat = sampled.reshape(n_views, -1, sampled.shape[-1])
        return grouped_cosine(flat, n_groups).reshape(*lead, n_groups)

    def view_slot(v, key):
        k = slots[v].index(key)
        return sampled[v, ..., k * c:(k + 1) * c]

    cos_all = []
    for p, (i, j) in enumerate(pairs):
        gi = view_slot(i, (0, p)).reshape(*lead, n_groups, c // n_groups)
        gj = view_slot(j, (1, p)).reshape(*lead, n_groups, c // n_groups)
        dot = jnp.sum(gi * gj, axis=-1)
        ni = jnp.sqrt(jnp.sum(gi * gi, axis=-1))
        nj = jnp.sqrt(jnp.sum(gj * gj, axis=-1))
        # torch CosineSimilarity clamps the denominator at eps=1e-8
        cos_all.append(dot / jnp.maximum(ni * nj, 1e-8))
    return jnp.mean(jnp.stack(cos_all), axis=0)


def query_similarity_with_image_row(
    points: jnp.ndarray,
    source_poses: jnp.ndarray,
    aug0: jnp.ndarray,
    aug1: jnp.ndarray,
    source_feats: jnp.ndarray,   # (NV, h, w, Ci) — same resolution as aug maps
    n_views: int,
    n_groups: int = 8,
    pair_quirk: bool = True,
    fused: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """query_similarity + the per-point image-feature fetch in ONE gather
    row per view-point (Config.image_row_merge; round-5).

    The pair maps and the FPN image features live at the same (h1, w1)
    resolution and are sampled at the same projections, and gather cost is
    per ROW (width-independent to ~256 lanes, script/bench_wide_gather.py)
    — so concatenating them makes the image-feature fetch ride the
    similarity row for ~the cost of one. The image features are then
    sampled with the pair maps' convention (align_corners=True, border)
    instead of the reference's align=False/zeros — a sub-half-pixel
    sampling shift at 1/4 resolution plus edge clamping, which is the
    documented metric-parity approximation of this knob (the validity
    mask still zeroes out-of-frustum views downstream).

    Returns (sim_feat, img_feat, xy, valid).
    """
    from ..ops.camera import project_points_ndc

    assert n_views >= 2
    xy, _, valid = project_points_ndc(source_poses, points)
    merged, slots, pairs = build_pair_maps(aug0, aug1, n_views, pair_quirk)
    c_sim = merged.shape[-1]
    combo = jnp.concatenate(
        [merged, source_feats.astype(merged.dtype)], axis=-1)
    sampled = grid_sample_2d_packed(pack_image_corners(combo), xy,
                                    align_corners=True,
                                    padding_mode="border")
    sim_part = sampled[..., :c_sim]
    img_feat = sampled[..., c_sim:]
    feat = _pair_cosines(sim_part, slots, pairs, n_views, aug0.shape[-1],
                         n_groups, fused)
    return feat, img_feat, xy, valid


class RayTransformer(nn.Module):
    """View + ray linear-attention SRDF head (ray_transformer.py:86-322).

    Split into two stages so the renderer can cache per-point work:

      * ``per_point`` — feature gathers, view-token transformer, radiance
        blend. Strictly independent across sample points, so the fine pass
        only runs it on the NEW importance samples and reuses the coarse
        pass's outputs (the reference re-evaluates all merged samples,
        model.py:466-473 — identical math, 33% less work).
      * ``along_ray`` — order positional encoding + ray transformer + SRDF
        MLP over a z-sorted sample sequence.

    ``__call__`` chains both (the reference's single forward).
    """

    img_feat_dim: int = 32
    fea_volume_dim: int = 24
    sim_feat_dim: int = 8      # cosine groups in
    sim_feat_fix: int = 16     # pre_sim_mlp out
    depth_dim: int = 8         # NeRF PE of mvs-depth distance
    use_dir_srdf: bool = False
    pe_d_hid: int = 8
    n_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    # per-point stage backend: 'auto' = fused Pallas kernel on TPU for the
    # measured perf knobs threaded from Config (round-5 env-knob fold):
    # fused kernel layout + formatting route; see config.py docs
    point_head: str = "v1"          # v1 | v2
    transpose_route: str = "xla"    # xla | mxu
    # resolved by UFORecon.setup: 'bfloat16' halves the bytes of the
    # cache-bandwidth-bound image gathers on the eval path (see config)
    image_gather_dtype: str = "float32"
    # full-feature f32 config, pure flax otherwise; 'always'/'never' force
    # (tests run 'always' through the interpreter)
    fused: str = "auto"

    @property
    def d_view(self) -> int:
        d = self.img_feat_dim + self.fea_volume_dim + self.sim_feat_fix + self.depth_dim
        if self.use_dir_srdf:
            # 24, not the reference's 27: include_input=True makes d_model a
            # PRIME 107 that no head count divides — the reference's own
            # use_dir_srdf crashes in its 8-head view split AND in the
            # radiance-weight Linear sized without dirdim
            # (ray_transformer.py:113,159 — see PARITY.md). We repair to the
            # minimal working design: dir PE without the raw-direction
            # passthrough (4 freqs x 2 x 3 = 24; d_view 104 = 8 x 13).
            d += 24
        return d

    def setup(self):
        # attribute names define the param paths — keep them identical to the
        # previous nn.compact names for checkpoint compatibility
        self.pre_sim_mlp = MLP((32, 32, self.sim_feat_fix), dtype=self.dtype)
        self.density_view_transformer = LocalFeatureTransformer(
            d_model=self.d_view, n_heads=self.n_heads, layer_names=("self",),
            dtype=self.dtype,
        )
        self.density_ray_transformer = LocalFeatureTransformer(
            d_model=self.d_view + self.pe_d_hid, n_heads=self.n_heads,
            layer_names=("self",), dtype=self.dtype,
        )
        self.density_mlp = MLP((32, 16, 1), dtype=self.dtype)
        self.linear_radianceweight_1_softmax = MLP((16, 8, 1), dtype=self.dtype)
        # learnable view token (ray_transformer.py:325-331)
        self.view_token = self.param(
            "view_token", nn.initializers.normal(1.0), (1, self.d_view)
        )

    def per_point(
        self,
        points: jnp.ndarray,              # (RN, SN, 3)
        source_imgs: jnp.ndarray,         # (NV, H, W, 3)
        source_feats: jnp.ndarray,        # (NV, h1, w1, C)
        ref_cam_pos: jnp.ndarray,         # (3,) reference camera center
        src_cam_pos: jnp.ndarray,         # (NV, 3) source camera centers
        src_w2cs: jnp.ndarray,            # (NV, 4, 4)
        points_xy: jnp.ndarray,           # (NV, RN, SN, 2) NDC projections
        valid_depth: jnp.ndarray,         # (NV, RN, SN)
        fea_volume_feat: Optional[jnp.ndarray] = None,  # (RN, SN, Dv)
        sim_feat: Optional[jnp.ndarray] = None,         # (RN, SN, 8)
        mvs_depths: Optional[jnp.ndarray] = None,       # (NV, H, W)
        img_feat: Optional[jnp.ndarray] = None,         # (NV, RN, SN, C):
                                         # pre-sampled by the shared
                                         # image-row gather (round-5
                                         # image_row_merge); None = sample
                                         # source_feats here
    ) -> Dict[str, jnp.ndarray]:
        """Per-point stage. Returns ``token`` (RN, SN, C) — the view-token
        output consumed by ``along_ray`` — and ``radiance`` (RN, SN, 3)."""
        rn, sn, _ = points.shape
        nv = source_imgs.shape[0]
        hp = jax.lax.Precision.HIGHEST

        # relative viewing directions (ray_transformer.py:185-191)
        v1 = points[None] - ref_cam_pos.reshape(1, 1, 1, 3)
        v2 = points[None] - src_cam_pos.reshape(nv, 1, 1, 3)
        v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
        v2 = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
        dir_relative = v1 - v2  # (NV, RN, SN, 3)

        # sample features / rgb at projections (align=False, zeros; the
        # in-bounds mask is the validity signal — ray_transformer.py:222-254)
        # corner-packed gathers (packing is chunk-invariant: XLA hoists it
        # out of the render chunk loop); rgb||depth-guide share one row
        gdt = (jnp.bfloat16 if self.image_gather_dtype == "bfloat16"
               else None)

        def src(x):
            # bf16 gather SOURCES halve the bytes of these cache-bandwidth-
            # bound gathers; rows promote back to f32 in the bilinear
            # combine (weights are f32)
            p = pack_image_corners(x)
            return p.astype(gdt) if gdt is not None else p

        if img_feat is None:
            img_feat = grid_sample_2d_packed(
                src(source_feats), points_xy)               # (NV, RN, SN, C)
            if gdt is not None:
                # cast back only when the bf16-source knob engaged: a
                # same-dtype astype is NOT free — the extra convert shifts
                # XLA fusion boundaries enough to move reductions ~1e-4
                # (caught by test_sharded_train_grads_match_single_device)
                img_feat = img_feat.astype(source_feats.dtype)
        rgb_src = source_imgs
        if mvs_depths is not None:
            # rgb and the depth guide live at the same full resolution and
            # sample at the same grid: one fused gather row
            rgb_src = jnp.concatenate(
                [source_imgs, mvs_depths[..., None]], axis=-1)
        rgbd = grid_sample_2d_packed(
            src(rgb_src), points_xy)                        # (NV, RN, SN, 3[+1])
        if gdt is not None:
            rgbd = rgbd.astype(rgb_src.dtype)
        img_rgb = rgbd[..., :3]
        mask = in_bounds_mask(points_xy) * valid_depth      # (NV, RN, SN)

        depth_dist = None
        if mvs_depths is not None:
            # depth distance for the PE (ray_transformer.py:229-247)
            d_sampled = rgbd[..., 3]
            cam = jnp.einsum("vij,rsj->vrsi", src_w2cs[:, :3, :3], points,
                             precision=hp) + src_w2cs[:, None, None, :3, 3]
            depth_dist = d_sampled - cam[..., 2]  # (NV, RN, SN)

        if self._fused_ok(fea_volume_feat, sim_feat, depth_dist):
            # the fused kernels encode depth_dist themselves (1 transposed
            # row per view instead of the 8 encoded rows)
            return self._per_point_fused(
                img_feat, fea_volume_feat, sim_feat, depth_dist,
                dir_relative, img_rgb, mask, rn, sn, nv)

        pe_nv = None
        if depth_dist is not None:
            pe_nv = nerf_posenc(depth_dist[..., None], num_freqs=4)  # (NV,RN,SN,8)

        # assemble view-token features: (RN*SN, NV, C)
        x = img_feat.transpose(1, 2, 0, 3).reshape(rn * sn, nv, -1)
        if fea_volume_feat is not None:
            vol = fea_volume_feat.reshape(rn * sn, 1, -1)
            x = jnp.concatenate([x, jnp.broadcast_to(vol, (rn * sn, nv, vol.shape[-1]))], axis=-1)
        if sim_feat is not None:
            s = self.pre_sim_mlp(sim_feat)
            s = s.reshape(rn * sn, 1, -1)
            x = jnp.concatenate([x, jnp.broadcast_to(s, (rn * sn, nv, s.shape[-1]))], axis=-1)
        if pe_nv is not None:
            pe = pe_nv.transpose(1, 2, 0, 3).reshape(rn * sn, nv, -1)
            x = jnp.concatenate([x, pe], axis=-1)
        if self.use_dir_srdf:
            # include_input=False — see d_view: the reference's 27-d variant
            # is unrunnable (prime d_model); 24-d is the repaired design
            dpe = nerf_posenc(dir_relative, num_freqs=4, include_input=False)
            dpe = dpe.transpose(1, 2, 0, 3).reshape(rn * sn, nv, -1)
            x = jnp.concatenate([x, dpe], axis=-1)

        token = jnp.broadcast_to(
            self.view_token[None], (rn * sn, 1, self.d_view)
        )
        x = jnp.concatenate([token.astype(x.dtype), x], axis=1)
        x = self.density_view_transformer(x)

        token_out = x[:, 0]          # (RN*SN, C)
        view_feature = x[:, 1:]      # (RN*SN, NV, C)

        # radiance: masked softmax blend over views (ray_transformer.py:310-321)
        vf = view_feature.reshape(rn, sn, nv, -1)
        dr = dir_relative.transpose(1, 2, 0, 3)  # (RN, SN, NV, 3)
        xw = jnp.concatenate([vf, dr], axis=-1)
        xw = self.linear_radianceweight_1_softmax(xw)
        m = mask.transpose(1, 2, 0)[..., None]  # (RN, SN, NV, 1)
        xw = jnp.where(m == 0, -1e9, xw)
        w = jax.nn.softmax(xw, axis=-2)
        radiance = jnp.sum(img_rgb.transpose(1, 2, 0, 3) * w, axis=2)  # (RN, SN, 3)

        return {"token": token_out.reshape(rn, sn, -1), "radiance": radiance}

    def _fused_ok(self, fea_volume_feat, sim_feat, depth_dist) -> bool:
        """Route to the fused Pallas point head? Static decision per trace."""
        if self.fused == "never" or self.is_initializing():
            return False
        full = (fea_volume_feat is not None and sim_feat is not None
                and depth_dist is not None and not self.use_dir_srdf
                and self.dtype == jnp.float32)
        if self.fused == "always":
            if not full:
                raise ValueError(
                    "fused_point_head='always' but the fused kernel's "
                    "prerequisites are not met (needs correlation volume + "
                    "explicit similarity + depth PE features, "
                    "use_dir_srdf=False, float32 compute); use 'auto' to "
                    "allow the flax fallback")
            return full
        return full and jax.default_backend() == "tpu"

    def _per_point_fused(self, img_feat, fea_volume_feat, sim_feat,
                         depth_dist, dir_relative, img_rgb, mask, rn, sn, nv):
        """Dispatch the per-point stage to a fused Pallas kernel; identical
        math to the flax path.  Two layouts exist: v1 (feature-major (C, P)
        slabs, host-side transposes) and v2 (point-major (NV, P, C), the raw
        gather-output layout).  v1 measures faster end-to-end on v5e
        (29.5k vs 26.0k rays/s): the dense-lane transposes cost less than
        the lane-padded small-C loads v2 does in-kernel.  Config.point_head
        ='v2' selects the point-major kernel for re-measurement."""
        from ..ops.fused_point_head import PointHeadParams

        n = rn * sn
        use_v2 = self.point_head == "v2"
        # kernel-input/-output formatting route: 'xla' = plain transposes,
        # 'mxu' = exact identity contractions (ops/exact_onehot.py
        # exact_transpose, bit-identical) — A/B knob for the measured
        # 1.78 s/image data-formatting bucket (BASELINE.md round 4)
        use_mxu_t = self.transpose_route == "mxu"

        if use_v2:
            from ..ops.fused_point_head2 import PointHeadInputs2, point_head2

            def rs(a):  # (NV, RN, SN, C) -> (NV, P, C)
                return a.reshape(nv, n, a.shape[-1])

            inp = PointHeadInputs2(
                img_feat=rs(img_feat),
                vol_feat=fea_volume_feat.reshape(n, -1),
                sim_feat=sim_feat.reshape(n, -1),
                depth_dist=depth_dist.reshape(nv, n),
                dir_rel=rs(dir_relative),
                rgb=rs(img_rgb),
                mask=mask.reshape(nv, n),
            )
            head = point_head2
        else:
            from ..ops.fused_point_head import PointHeadInputs, point_head

            if use_mxu_t:
                from ..ops.exact_onehot import exact_transpose as _swap
            else:
                def _swap(a):
                    return jnp.swapaxes(a, -1, -2)

            def tr(a):  # (NV, RN, SN, C) -> (NV, C, P)
                return _swap(a.reshape(nv, n, a.shape[-1]))

            inp = PointHeadInputs(
                img_feat=tr(img_feat),
                vol_feat=_swap(fea_volume_feat.reshape(n, -1)),
                sim_feat=_swap(sim_feat.reshape(n, -1)),
                depth_dist=depth_dist.reshape(nv, n),
                dir_rel=tr(dir_relative),
                rgb=tr(img_rgb),
                mask=mask.reshape(nv, n),
            )
            head = point_head
        lv = self.density_view_transformer.variables["params"]["layer_0"]
        sp = self.pre_sim_mlp.variables["params"]
        rp = self.linear_radianceweight_1_softmax.variables["params"]
        params = PointHeadParams(
            view_token=self.view_token.reshape(-1),
            wq=lv["q_proj"]["kernel"], wk=lv["k_proj"]["kernel"],
            wv=lv["v_proj"]["kernel"], wmerge=lv["merge"]["kernel"],
            norm1_scale=lv["norm1"]["scale"], norm1_bias=lv["norm1"]["bias"],
            w1=lv["mlp1"]["kernel"], w2=lv["mlp2"]["kernel"],
            norm2_scale=lv["norm2"]["scale"], norm2_bias=lv["norm2"]["bias"],
            sim_w=(sp["Dense_0"]["kernel"], sp["Dense_1"]["kernel"],
                   sp["Dense_2"]["kernel"]),
            sim_b=(sp["Dense_0"]["bias"], sp["Dense_1"]["bias"],
                   sp["Dense_2"]["bias"]),
            rad_w=(rp["Dense_0"]["kernel"], rp["Dense_1"]["kernel"],
                   rp["Dense_2"]["kernel"]),
            rad_b=(rp["Dense_0"]["bias"], rp["Dense_1"]["bias"],
                   rp["Dense_2"]["bias"]),
        )
        token, rad = head(inp, params, self.n_heads)
        if not use_v2:
            if use_mxu_t:
                from ..ops.exact_onehot import exact_transpose
                token, rad = exact_transpose(token), exact_transpose(rad)
            else:
                token, rad = token.T, rad.T
        return {
            "token": token.reshape(rn, sn, -1),
            "radiance": rad.reshape(rn, sn, 3),
        }

    def along_ray(self, token: jnp.ndarray) -> jnp.ndarray:
        """Ray transformer over a z-sorted sample sequence -> SRDF.

        Order positional encoding indexes position in the SORTED sequence
        (reference ray_transformer.py:165-173 runs after the coarse+fine z
        merge), so it must be applied post-merge — hence a separate stage.

        Args:
          token: (RN, SN, C) per-point view-token features in z order.

        Returns:
          (RN, SN) SRDF values.
        """
        rn, sn, _ = token.shape
        pe_order = jnp.asarray(order_posenc(self.pe_d_hid, sn), token.dtype)
        y = jnp.concatenate(
            [token, jnp.broadcast_to(pe_order[None], (rn, sn, self.pe_d_hid))],
            axis=-1,
        )
        if self._fused_ray_ok():
            return self._along_ray_fused(y)
        y = self.density_ray_transformer(y)
        return self.density_mlp(y)[..., 0]

    def along_ray_neus(self, token, z_val, radiance, inv_s):
        """along_ray + NeuS compositing through the fused epilogue kernel
        (round-5 probe, ops/fused_ray_head.ray_head_neus). Caller must have
        checked _fused_ray_ok(). Returns the neus_render output dict."""
        from ..ops.fused_ray_head import RayHeadParams, ray_head_neus

        rn, sn, _ = token.shape
        pe_order = jnp.asarray(order_posenc(self.pe_d_hid, sn), token.dtype)
        y = jnp.concatenate(
            [token, jnp.broadcast_to(pe_order[None], (rn, sn, self.pe_d_hid))],
            axis=-1,
        )
        lv = self.density_ray_transformer.variables["params"]["layer_0"]
        dp = self.density_mlp.variables["params"]
        params = RayHeadParams(
            wq=lv["q_proj"]["kernel"], wk=lv["k_proj"]["kernel"],
            wv=lv["v_proj"]["kernel"], wmerge=lv["merge"]["kernel"],
            norm1_scale=lv["norm1"]["scale"], norm1_bias=lv["norm1"]["bias"],
            w1=lv["mlp1"]["kernel"], w2=lv["mlp2"]["kernel"],
            norm2_scale=lv["norm2"]["scale"], norm2_bias=lv["norm2"]["bias"],
            dens_w=(dp["Dense_0"]["kernel"], dp["Dense_1"]["kernel"],
                    dp["Dense_2"]["kernel"]),
            dens_b=(dp["Dense_0"]["bias"], dp["Dense_1"]["bias"],
                    dp["Dense_2"]["bias"]),
        )
        srdf, weight, rgb, depth, opacity = ray_head_neus(
            y.astype(jnp.float32), z_val.astype(jnp.float32),
            radiance.astype(jnp.float32), inv_s, params, self.n_heads)
        return {"rgb": rgb, "depth": depth, "opacity": opacity,
                "weight": weight, "variance": 1.0 / inv_s, "srdf": srdf}

    def _fused_ray_ok(self) -> bool:
        """Route along_ray to the fused Pallas kernel? Static per trace."""
        if self.fused == "never" or self.is_initializing():
            return False
        if self.dtype != jnp.float32:
            return False
        return self.fused == "always" or jax.default_backend() == "tpu"

    def _along_ray_fused(self, y: jnp.ndarray) -> jnp.ndarray:
        """Dispatch along_ray to ops/fused_ray_head.py; identical math."""
        from ..ops.fused_ray_head import RayHeadParams, ray_head

        lv = self.density_ray_transformer.variables["params"]["layer_0"]
        dp = self.density_mlp.variables["params"]
        params = RayHeadParams(
            wq=lv["q_proj"]["kernel"], wk=lv["k_proj"]["kernel"],
            wv=lv["v_proj"]["kernel"], wmerge=lv["merge"]["kernel"],
            norm1_scale=lv["norm1"]["scale"], norm1_bias=lv["norm1"]["bias"],
            w1=lv["mlp1"]["kernel"], w2=lv["mlp2"]["kernel"],
            norm2_scale=lv["norm2"]["scale"], norm2_bias=lv["norm2"]["bias"],
            dens_w=(dp["Dense_0"]["kernel"], dp["Dense_1"]["kernel"],
                    dp["Dense_2"]["kernel"]),
            dens_b=(dp["Dense_0"]["bias"], dp["Dense_1"]["bias"],
                    dp["Dense_2"]["bias"]),
        )
        return ray_head(y.astype(jnp.float32), params, self.n_heads)

    def __call__(self, *args, **kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full forward (reference RayTransformer.forward): per-point stage
        then ray stage. Returns (radiance, srdf)."""
        pp = self.per_point(*args, **kwargs)
        srdf = self.along_ray(pp["token"])
        return pp["radiance"], srdf
