"""Full-model golden parity vs the reference PyTorch code (VERDICT r1 #3).

Weight-transplant tests: build the reference torch modules with random
weights, transplant them into our flax modules via the exact name map
(uforecon_tpu/data/torch_ckpt.py), run both on identical inputs, compare.
The reference tree is read-only at /root/reference; heavy-native deps are
stubbed in helpers.install_reference_stubs (torchvision deform_conv2d gets
a REAL pure-torch implementation, cross-validated below).
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import install_reference_stubs, torch_deform_conv2d

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_env():
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    install_reference_stubs()
    import importlib

    mods = {}
    for name in ["code1.encoder_utils.fmt.module",
                 "code1.encoder_utils.fmt.FMT",
                 "code1.encoder_utils.fmt.TransMVSNet"]:
        mods[name.rsplit(".", 1)[-1]] = importlib.import_module(name)
    return mods


def _randomize(module, rng, scale=0.3):
    """Random weights everywhere (incl. zero-init offset convs and BN
    running stats) so parity is meaningful, small enough to stay stable."""
    import torch

    with torch.no_grad():
        for name, p in module.named_parameters():
            p.copy_(torch.from_numpy(np.asarray(
                rng.standard_normal(tuple(p.shape)) * scale,
                np.float32).reshape(tuple(p.shape))))
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.from_numpy(
                    rng.standard_normal(tuple(b.shape)).astype(np.float32) * 0.1))
            elif name.endswith("running_var"):
                b.copy_(torch.from_numpy(
                    (rng.random(tuple(b.shape)).astype(np.float32) * 0.5 + 0.75)))


def _nchw(x):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_torch_deform_conv_oracle_matches_numpy_reference(rng):
    """Cross-validate the pure-torch deform_conv2d oracle against our
    independent numpy loop reference (ops/deform_conv.py), converting
    between torchvision's interleaved-offset layout and ours."""
    import torch

    from uforecon_tpu.ops.deform_conv import deform_conv2d_reference

    n, h, w, c, cout, k = 2, 7, 8, 3, 4, 3
    kk = k * k
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    offsets = (rng.standard_normal((n, h, w, kk, 2)) * 1.5).astype(np.float32)
    mask = rng.random((n, h, w, kk)).astype(np.float32)
    weight = rng.standard_normal((k, k, c, cout)).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)

    want = deform_conv2d_reference(x, offsets, mask, weight, bias)

    # torchvision layout: offsets (N, 2KK, H, W) interleaved (dy, dx)
    t_off = torch.from_numpy(
        offsets.reshape(n, h, w, 2 * kk).transpose(0, 3, 1, 2))
    t_mask = torch.from_numpy(mask.transpose(0, 3, 1, 2))
    t_w = torch.from_numpy(weight.transpose(3, 2, 0, 1))
    got = torch_deform_conv2d(
        _nchw(x), t_off, t_w, torch.from_numpy(bias),
        stride=(1, 1), padding=(1, 1), dilation=(1, 1), mask=t_mask)
    np.testing.assert_allclose(_to_nhwc(got), want, rtol=2e-4, atol=2e-4)


def test_featurenet_matches_reference(ref_env, rng):
    """FeatureNet (FPN + DCN heads) vs fmt/module.py:388-466 with
    transplanted weights, eval mode."""
    import torch

    from uforecon_tpu.data.torch_ckpt import convert_named, featurenet_name_map
    from uforecon_tpu.models.featurenet import FeatureNet

    ref = ref_env["module"].FeatureNet(base_channels=8).eval()
    _randomize(ref, rng, scale=0.2)
    # keep offsets small so both bilinear samplers see the same corners
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "conv_offset_mask" in name:
                p.mul_(0.1)

    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    ours = FeatureNet(base_channels=8)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    p, bs, report = convert_named(sd, featurenet_name_map(),
                                  variables["params"],
                                  variables["batch_stats"])
    assert not report["unmatched_torch"]

    got = ours.apply({"params": p, "batch_stats": bs}, jnp.asarray(x), False)
    with torch.no_grad():
        want = ref(_nchw(x))
    for stage in ("stage1", "stage2", "stage3"):
        np.testing.assert_allclose(
            np.asarray(got[stage]), _to_nhwc(want[stage]),
            rtol=2e-3, atol=2e-3, err_msg=stage)


def _make_fmt_pair(ref_env, rng, layer_names=("self", "cross") * 4):
    """Reference FMT_with_pathway + our FMTWithPathway with shared weights."""
    from uforecon_tpu.data.torch_ckpt import convert_named, fmt_pathway_name_map
    from uforecon_tpu.models.fmt import FMTWithPathway

    ref = ref_env["FMT"].FMT_with_pathway(
        base_channels=8,
        FMT_config={"d_model": 32, "nhead": 8,
                    "layer_names": list(layer_names)}).eval()
    _randomize(ref, rng, scale=0.2)

    ours = FMTWithPathway(base_channels=8, d_model=32,
                          layer_names=tuple(layer_names))
    v, h, w = 3, 8, 8
    feats = {
        "stage1": jnp.asarray(rng.standard_normal((v, h, w, 32)), jnp.float32),
        "stage2": jnp.asarray(rng.standard_normal((v, 2 * h, 2 * w, 16)), jnp.float32),
        "stage3": jnp.asarray(rng.standard_normal((v, 4 * h, 4 * w, 8)), jnp.float32),
    }
    variables = ours.init(jax.random.PRNGKey(0), feats)
    sd = {k: t.numpy() for k, t in ref.state_dict().items()}
    p, _, report = convert_named(
        sd, fmt_pathway_name_map(n_layers=len(layer_names)),
        variables["params"])
    assert not report["unmatched_torch"]
    return ref, ours, {"params": p}, feats


def test_fmt_pathway_matches_reference(ref_env, rng):
    """FMT_with_pathway.forward (FMT.py:237-255): ref self-attn stack, src
    self+cross, FPN pathway — all views, all stages."""
    import torch

    ref, ours, variables, feats = _make_fmt_pair(ref_env, rng)

    ref_feats = [
        {s: _nchw(np.asarray(feats[s][i:i + 1])) for s in feats}
        for i in range(feats["stage1"].shape[0])
    ]
    with torch.no_grad():
        want = ref(ref_feats)

    got = ours.apply(variables, feats)
    for s in ("stage1", "stage2", "stage3"):
        w_s = np.concatenate([_to_nhwc(vw[s]) for vw in want], axis=0)
        np.testing.assert_allclose(np.asarray(got[s]), w_s,
                                   rtol=3e-3, atol=3e-3, err_msg=s)


def test_fmt_cross_features_match_reference(ref_env, rng):
    """extract_cross_features (FMT.py:282-315): our (aug0, aug1) must equal
    the halves of the reference's processed pair pack (the reference returns
    pair_feat1 twice — a documented quirk; its halves ARE feat0'/feat1')."""
    import torch

    ref, ours, variables, feats = _make_fmt_pair(ref_env, rng)
    v = feats["stage1"].shape[0]

    got0, got1 = ours.apply(variables, feats["stage1"], v,
                            method=ours.extract_cross_features)

    pairs = [(a, b) for a in range(v - 1) for b in range(a + 1, v)]
    f0 = _nchw(np.asarray(feats["stage1"])[[p[0] for p in pairs]])
    f1 = _nchw(np.asarray(feats["stage1"])[[p[1] for p in pairs]])
    with torch.no_grad():
        w0, w1 = ref.FMT(f0, f1, feat="cross")
    n = len(pairs)
    np.testing.assert_allclose(np.asarray(got0), _to_nhwc(w0[:n]),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(got1), _to_nhwc(w1[n:]),
                               rtol=3e-3, atol=3e-3)


@pytest.mark.slow
def test_cascade_matches_reference_transmvsnet(ref_env, rng):
    """Full cascade vs reference TransMVSNet.forward (TransMVSNet.py:167-242)
    with transplanted weights: per-stage prob volumes, WTA depths,
    confidences, and regularized cost volumes, for two view rotations."""
    import torch

    from uforecon_tpu.data.torch_ckpt import convert_named, transmvsnet_name_map
    from uforecon_tpu.models.cascade import CascadeMatcher

    ref = ref_env["TransMVSNet"].TransMVSNet(
        ndepths=[8, 8, 8], depth_interals_ratio=[4, 2, 1]).eval()
    _randomize(ref, rng, scale=0.15)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "conv_offset_mask" in name:
                p.mul_(0.1)

    v, h, w = 3, 32, 32
    imgs = rng.random((v, h, w, 3)).astype(np.float32)
    base = np.zeros((v, 2, 4, 4), np.float32)
    for i in range(v):
        ang = 0.15 * i
        E = np.eye(4, dtype=np.float32)
        E[0, 0] = E[2, 2] = np.cos(ang)
        E[0, 2] = np.sin(ang)
        E[2, 0] = -np.sin(ang)
        E[0, 3] = 0.3 * i
        E[2, 3] = 4.0
        K = np.eye(4, dtype=np.float32)
        K[:3, :3] = np.array([[20, 0, 4], [0, 20, 4], [0, 0, 1]])
        base[i, 0], base[i, 1] = E, K
    projs = {}
    for s, scale in [(1, 1.0), (2, 2.0), (3, 4.0)]:
        p = base.copy()
        p[:, 1, :2] *= scale
        projs[f"stage{s}"] = p
    depth_values = np.linspace(2.0, 6.0, 16).astype(np.float32)

    ours = CascadeMatcher(ndepths=(8, 8, 8))
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(imgs),
                          {k: jnp.asarray(x) for k, x in projs.items()},
                          jnp.asarray(depth_values))
    sd = {k: t.numpy() for k, t in ref.state_dict().items()}
    p_t, bs, report = convert_named(sd, transmvsnet_name_map(),
                                    variables["params"],
                                    variables["batch_stats"])
    assert not report["unmatched_torch"]

    got = ours.apply({"params": p_t, "batch_stats": bs}, jnp.asarray(imgs),
                     {k: jnp.asarray(x) for k, x in projs.items()},
                     jnp.asarray(depth_values))

    def run_ref(order):
        t_imgs = torch.from_numpy(
            imgs[order].transpose(0, 3, 1, 2))[None]      # (1, V, 3, H, W)
        t_projs = {k: torch.from_numpy(x[list(order)])[None]
                   for k, x in projs.items()}
        t_depth = torch.from_numpy(depth_values)[None]
        with torch.no_grad():
            _, out = ref(t_imgs, t_projs, t_depth)
        return out

    # rotation 0 (identity order): compare full per-stage outputs
    want = run_ref([0, 1, 2])
    for s in (1, 2, 3):
        ws = want[f"stage{s}"]
        np.testing.assert_allclose(
            np.asarray(got["rot0"][f"stage{s}"]["prob_volume"]),
            ws["prob_volume"][0].numpy(), rtol=5e-3, atol=5e-3,
            err_msg=f"prob_volume stage{s}")
        np.testing.assert_allclose(
            np.asarray(got["rot0"][f"stage{s}"]["depth"]),
            ws["depth"][0].numpy(), rtol=5e-3, atol=2e-2,
            err_msg=f"depth stage{s}")
        np.testing.assert_allclose(
            np.asarray(got["cost_volumes"][f"stage{s}"][0]),
            ws["cost_volume"][0, 0].numpy(), rtol=5e-3, atol=5e-3,
            err_msg=f"cost_volume stage{s}")

    # rotation 1 (view 1 leads): our scanned rotation == reference re-run
    want_r1 = run_ref([1, 2, 0])
    np.testing.assert_allclose(
        np.asarray(got["mvs_depth"][1]),
        want_r1["stage3"]["depth"][0].numpy(), rtol=5e-3, atol=2e-2,
        err_msg="rot1 stage3 depth")


def test_ray_transformer_matches_reference(ref_env, rng):
    """RayTransformer forward vs reference ray_transformer.py:175-322 with
    transplanted weights: radiance + SRDF on random geometry, correlation
    volume path with explicit similarity and depth PE."""
    import argparse
    import importlib

    import torch

    from uforecon_tpu.data.torch_ckpt import (convert_named,
                                              ray_transformer_name_map)
    from uforecon_tpu.models.ray_transformer import RayTransformer
    from uforecon_tpu.ops.camera import project_points_ndc

    rt_mod = importlib.import_module("code1.ray_transformer")

    args = argparse.Namespace(
        volume_reso=96, volume_type="correlation", mvs_depth_guide=1,
        depth_pos_encoding=True, explicit_similarity=True, use_dir_srdf=False)
    ref = rt_mod.RayTransformer(args).eval()
    _randomize(ref, rng, scale=0.2)

    nv, h, w, rn, sn, c = 3, 16, 16, 4, 6, 32
    points = (rng.standard_normal((rn, sn, 3)) * 0.4).astype(np.float32)
    imgs = rng.random((nv, h, w, 3)).astype(np.float32)
    feats = rng.standard_normal((nv, h, w, c)).astype(np.float32)
    vol_feat = rng.standard_normal((rn, sn, 24)).astype(np.float32)
    sim_feat = rng.standard_normal((rn, sn, 8)).astype(np.float32)
    mvs_depths = (rng.random((nv, h, w)) * 4 + 2).astype(np.float32)

    poses, w2cs, cam_pos = [], [], []
    for i in range(nv):
        ang = 0.2 * i
        E = np.eye(4, dtype=np.float32)
        E[0, 0] = E[2, 2] = np.cos(ang)
        E[0, 2] = np.sin(ang)
        E[2, 0] = -np.sin(ang)
        E[2, 3] = 3.0
        K = np.eye(4, dtype=np.float32)
        K[:3, :3] = np.array([[0.8, 0, 0], [0, 0.8, 0], [0, 0, 1]])
        poses.append(K @ E)
        w2cs.append(E)
        cam_pos.append(np.linalg.inv(E)[:3, 3])
    poses = np.stack(poses)
    w2cs = np.stack(w2cs)
    cam_pos = np.stack(cam_pos).astype(np.float32)

    ours = RayTransformer(img_feat_dim=c, fea_volume_dim=24, fused="never")
    xy, _, valid = project_points_ndc(jnp.asarray(poses), jnp.asarray(points))
    call_args = (jnp.asarray(points), jnp.asarray(imgs), jnp.asarray(feats),
                 jnp.asarray(cam_pos[0]), jnp.asarray(cam_pos),
                 jnp.asarray(w2cs), xy, valid, jnp.asarray(vol_feat),
                 jnp.asarray(sim_feat), jnp.asarray(mvs_depths))
    variables = ours.init(jax.random.PRNGKey(0), *call_args)
    sd = {k: t.numpy() for k, t in ref.state_dict().items()}
    p, _, report = convert_named(sd, ray_transformer_name_map(),
                                 variables["params"])
    assert not report["unmatched_torch"]
    radiance, srdf = ours.apply({"params": p}, *call_args)

    batch = {
        "source_imgs": _nchw(imgs)[None],
        "ref_pose_inv": torch.from_numpy(np.linalg.inv(poses[0]))[None],
        "source_poses_inv": torch.from_numpy(
            np.stack([np.linalg.inv(x) for x in poses]))[None],
        "source_poses": torch.from_numpy(poses)[None],
        "w2cs": torch.from_numpy(w2cs)[None],
        "depth_info": torch.from_numpy(mvs_depths)[None],
        "start_idx": 0,
    }
    with torch.no_grad():
        want_rad, want_srdf, _ = ref(
            torch.from_numpy(points)[None], batch,
            _nchw(feats)[None],
            fea_volume=torch.from_numpy(vol_feat)[None],
            cond_info={"feat_info": torch.from_numpy(sim_feat)[None]})

    np.testing.assert_allclose(
        np.asarray(radiance).reshape(-1, 3), want_rad.numpy(),
        rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(srdf).reshape(rn, sn),
        want_srdf.numpy().reshape(rn, sn), rtol=3e-3, atol=3e-4)


# ---------------------------------------------------------------------------
# CAPSTONE family: full render_chunk vs reference UFORecon.infer
# (model.py:393-482) on a synthetic scene with shared weights — the
# chamfer-within-2% proxy, parametrized over the reference's live configs
# (VERDICT r2 item 6): correlation default, f32-volume tightened, the
# featuregrid volume path, 5 source views, use_dir_srdf, and coarse-only.
# ---------------------------------------------------------------------------

CAPSTONE_SPECS = {
    # our packed volumes are stored bf16 (encode head) -> ~1e-2 tolerance
    "default": {},
    # f32 volume storage isolates the bf16 packing as the ONLY loose-
    # tolerance cause: everything else matches to ~1e-3
    "f32vol_tight": dict(volume_dtype="float32",
                         tol_rgb=(5e-3, 2e-3), tol_depth=(2e-3, 5e-3),
                         tol_srdf=(5e-3, 5e-3)),
    "featuregrid": dict(volume_type="featuregrid", volume_reso=16,
                        mvs_depth_guide=0, depth_pos_encoding=False),
    "views5": dict(n_views=5),
    # the round-5 merged-volume EVAL path vs the live torch reference —
    # quantifies the documented re-discretization at loosened tolerance
    # (the capstone proper pins the exact path with volume_merge='never';
    # extract_geometry=True would otherwise engage the shipped default)
    "merged_loose": dict(volume_merge="auto", volume_dtype="float32",
                         tol_rgb=(0.08, 0.04), tol_depth=(0.04, 0.08),
                         tol_srdf=(0.10, 0.10)),
    "dir_srdf": dict(use_dir_srdf=True),
    "coarse_only": dict(coarse_only=True),
}


@pytest.mark.slow
@pytest.mark.parametrize("spec_name", sorted(CAPSTONE_SPECS))
def test_render_chunk_matches_reference_infer(ref_env, rng, spec_name):
    _run_capstone(rng, **CAPSTONE_SPECS[spec_name])


def _run_capstone(rng, *, n_views=3, volume_type="correlation",
                  volume_reso=96, mvs_depth_guide=1, depth_pos_encoding=True,
                  use_dir_srdf=False, coarse_only=False,
                  volume_dtype="bfloat16", volume_merge="never",
                  tol_rgb=(0.05, 0.02), tol_depth=(0.02, 0.05),
                  tol_srdf=(0.05, 0.05)):
    import argparse
    import importlib
    from unittest import mock

    import torch

    from helpers import make_synthetic_sample
    from uforecon_tpu.config import Config
    from uforecon_tpu.data.convert import scene_inputs_from_sample
    from uforecon_tpu.data.torch_ckpt import convert_named, uforecon_name_map
    from uforecon_tpu.models.uforecon import UFORecon

    model_mod = importlib.import_module("code1.model")

    NC, NF = 8, 6  # distinct coarse/fine counts disambiguate rand shapes
    args = argparse.Namespace(
        ndepths="8,8,8", depth_inter_r="4,2,1", cr_base_chs="8,8,8",
        share_cr=False, grad_method="detach", patch_size=1, sW=1, sH=1,
        train_ray_num=64, extract_geometry=True, test_sample_coarse=NC,
        test_sample_fine=NF, coarse_sample=NC, fine_sample=NF,
        volume_type=volume_type, volume_reso=volume_reso,
        mvs_depth_guide=mvs_depth_guide,
        depth_pos_encoding=depth_pos_encoding, explicit_similarity=True,
        use_dir_srdf=use_dir_srdf, test_coarse_only=coarse_only,
        uforecon_lr=1e-4, test_n_view=n_views)
    ref = model_mod.UFORecon(args).eval()
    if volume_type == "featuregrid":
        # Reference quirk (PARITY.md): model.py:59 builds RayTransformer with
        # its default fea_volume_dim=24, but the featuregrid volume has 16
        # channels (cnn3d.py:73) — the shipped featuregrid config crashes on
        # a d_model mismatch. Repair with the correct dim on both sides.
        rt_mod = importlib.import_module("code1.ray_transformer")
        ref.ray_transformer = rt_mod.RayTransformer(args=args,
                                                    fea_volume_dim=16)
        ref = ref.eval()
    if use_dir_srdf:
        # Reference quirk (PARITY.md): use_dir_srdf is doubly unrunnable —
        # include_input=True makes d_model a prime 107 (no 8-head split
        # exists, ray_transformer.py:113,135) and the radiance-weight Linear
        # is sized WITHOUT dirdim while its input includes it
        # (ray_transformer.py:159 vs :311). Repair identically to ours:
        # dir PE without raw-input passthrough (24d) + a radiance head that
        # accepts the dir-extended view features.
        import torch.nn as tnn

        rt_mod = importlib.import_module("code1.ray_transformer")
        orig_pe = rt_mod.PositionalEncoding_NeRF

        class PatchedPE(orig_pe):
            def __init__(self, num_freqs=6, d_in=3,
                         freq_factor=np.pi, include_input=False):
                super().__init__(num_freqs, d_in, freq_factor,
                                 include_input=False)

        with mock.patch.object(rt_mod, "PositionalEncoding_NeRF", PatchedPE):
            new_rt = rt_mod.RayTransformer(args=args)
        d_rad = 32 + 24 + 16 + 8 + 24 + 3  # d_view(+dir24) + dir_relative
        new_rt.linear_radianceweight_1_softmax = tnn.Sequential(
            tnn.Linear(d_rad, 16), tnn.ReLU(inplace=True),
            tnn.Linear(16, 8), tnn.ReLU(inplace=True), tnn.Linear(8, 1))
        ref.ray_transformer = new_rt
        ref = ref.eval()
        # Third crash site: forward REBINDS dir_relative to its PE'd form
        # (ray_transformer.py:278-281), so the radiance rearrange at :310
        # gets a 3-dim tensor. Intended semantics (per the Linear's declared
        # input, img+3+...): radiance consumes the RAW relative direction.
        # Restore it by stashing the first rearrange's output and serving it
        # at the second call.
        if not getattr(rt_mod.rearrange, "_dir_repair", False):
            orig_rearrange = rt_mod.rearrange
            _dir_pattern = "B NV RN SN Dim3 -> B RN SN NV Dim3"
            _stash = {}

            def patched_rearrange(x, pattern, **kw):
                if pattern == _dir_pattern:
                    if x.dim() == 5:
                        _stash["dir"] = orig_rearrange(x, pattern, **kw)
                        return _stash["dir"]
                    return _stash["dir"]  # rebound PE'd tensor: want raw
                return orig_rearrange(x, pattern, **kw)

            patched_rearrange._dir_repair = True
            # passthrough-identical for every well-formed call (the 3-dim
            # case only arises in the broken dir mode), so the patch can
            # stay installed for the rest of the session
            rt_mod.rearrange = patched_rearrange
    _randomize(ref, rng, scale=0.15)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "conv_offset_mask" in name:
                p.mul_(0.1)
            # conv3dBNReLU convs carry a bias that eval-mode BN makes
            # redundant; our Conv3dBnRelu is bias-free — zero it for parity
            if "volume_regularization" in name and name.endswith("conv.bias"):
                p.zero_()
        ref.deviation_network.variance.fill_(0.3)

    cfg = Config(ndepths=(8, 8, 8), test_sample_coarse=NC,
                 test_sample_fine=NF, extract_geometry=True,
                 volume_type=volume_type, volume_reso=volume_reso,
                 mvs_depth_guide=mvs_depth_guide,
                 depth_pos_encoding=depth_pos_encoding,
                 use_dir_srdf=use_dir_srdf, test_coarse_only=coarse_only,
                 test_n_view=n_views, volume_dtype=volume_dtype,
                 fused_point_head="never", volume_merge=volume_merge,
                 image_gather_dtype="float32")  # capstone pins exact sources
    sample = make_synthetic_sample(n_views=n_views, h=32, w=32, ndepth=16,
                                   start_idx=0)
    scene, extras = scene_inputs_from_sample(sample)
    ours = UFORecon(cfg)
    rn = 16
    ray_d = jnp.asarray(extras["ray_d"][:rn])
    key = jax.random.PRNGKey(0)
    variables = ours.init(key, scene, ray_d, key)

    sd = {k: t.numpy() for k, t in ref.state_dict().items()}
    p, bs, report = convert_named(sd, uforecon_name_map(volume_type=volume_type),
                                  variables["params"],
                                  variables["batch_stats"])
    assert not report["unmatched_torch"], report["unmatched_torch"]

    # ---- deterministic sampling on both sides ----
    def fixed_torch_rand(*shape, **kw):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])        # torch.rand(Size) form
        if shape and shape[0] == NC:       # coarse jitter (SN, RN) -> none
            return torch.full(shape, 0.5)
        if shape and shape[0] == NF:       # importance draws (PN, RN)
            u = (torch.arange(NF, dtype=torch.float32) + 0.5) / NF
            return u[:, None].expand(*shape).clone()
        return torch.rand_orig(*shape, **kw)

    def fixed_jax_uniform(key_, shape, dtype=jnp.float32, **kw):
        if shape[-1] == NC:
            return jnp.full(shape, 0.5, dtype)
        if shape[-1] == NF:
            u = (jnp.arange(NF, dtype=dtype) + 0.5) / NF
            return jnp.broadcast_to(u, shape)
        raise AssertionError(f"unexpected uniform shape {shape}")

    # ---- ours: encode + render_chunk with per-ray z-depth bounds ----
    with mock.patch.object(jax.random, "uniform", fixed_jax_uniform):
        enc = ours.apply({"params": p, "batch_stats": bs}, scene,
                         method=ours.encode)
        cam_rd = extras["cam_ray_d"][:rn]
        near = np.full(rn, float(scene.near), np.float32) / cam_rd[:, 2]
        far = np.full(rn, float(scene.far), np.float32) / cam_rd[:, 2]
        out = ours.apply(
            {"params": p, "batch_stats": bs}, scene, enc, ray_d, key,
            near_per_ray=jnp.asarray(near), far_per_ray=jnp.asarray(far),
            coarse_only=coarse_only, method=ours.render_chunk)

    # ---- reference: encoder block (model.py:779-815) + infer ----
    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    batch = {
        "source_imgs": _nchw(sample["source_imgs"])[None],
        "ref_img": _nchw(sample["ref_img"][None]),
        "ray_o": t(sample["ray_o"])[None],
        "ray_d": t(sample["ray_d"].T)[None],
        "cam_ray_d": t(sample["cam_ray_d"].T)[None],
        "near_fars": t(sample["near_fars"])[None],
        "proj_matrices": {k: t(v)[None] for k, v in
                          sample["proj_matrices"].items()},
        "depth_values_org_scale": t(sample["depth_values_org_scale"])[None],
        "w2cs": t(sample["w2cs"])[None],
        "intrinsics": t(sample["intrinsics"])[None],
        "source_poses": t(sample["source_poses"])[None],
        "source_poses_inv": t(sample["source_poses_inv"])[None],
        "ref_pose_inv": t(sample["ref_pose_inv"])[None],
        "scale_factor": t(np.array([sample["scale_factor"]])),
        "scale_mat": t(sample["scale_mat"])[None],
        "depths_h": t(sample["depths_h"])[None],
        "start_idx": 0,
    }
    torch.rand_orig = torch.rand
    with torch.no_grad(), mock.patch.object(torch, "rand", fixed_torch_rand):
        imgs_pair, projs_pair, dv_pair = ref.build_pairs(
            batch["source_imgs"], batch["proj_matrices"],
            batch["depth_values_org_scale"])
        feat_backbone, vol_info = ref.transmvsnet(imgs_pair, projs_pair,
                                                  dv_pair)
        for i in range(len(feat_backbone)):
            feat_backbone[i]["stage1"] = feat_backbone[i]["stage1"][0:1]
        match = ref.transmvsnet.get_match_feat(feat_backbone,
                                               cur_n_src_views=n_views)
        src_feat = torch.stack([f["stage1"] for f in feat_backbone], dim=1)
        if volume_type == "featuregrid":
            fv = ref.build_feature_volume(batch, src_feat)
        else:
            fv = {}
            for s in ("stage1", "stage2", "stage3"):
                f_, w_ = ref.build_mvs_volume(batch, vol_info[s]["cost_volume"])
                fv[s] = {"feature_volume": f_, "weight_volume": w_}
        if mvs_depth_guide > 0:
            batch["depth_info"] = (vol_info["stage3"]["depth"]
                                   * batch["scale_factor"]).unsqueeze(0)
        ray_idx = torch.arange(rn)[None]
        srdf_r, _, depth_r, rgb_r = ref.infer(
            batch=batch, ray_idx=ray_idx, source_imgs_feat=src_feat,
            feature_volume=fv, match_feature=match, extract_geometry=True,
            is_train=False)

    got = out["coarse"] if coarse_only else out["fine"]
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               rgb_r[0].numpy(),
                               rtol=tol_rgb[0], atol=tol_rgb[1])
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               depth_r[0].numpy(),
                               rtol=tol_depth[0], atol=tol_depth[1])
    np.testing.assert_allclose(np.asarray(got["srdf"]),
                               srdf_r[0].numpy().reshape(rn, -1),
                               rtol=tol_srdf[0], atol=tol_srdf[1])


@pytest.mark.slow
def test_training_step_losses_and_grads_match_reference(ref_env, rng):
    """Training-step golden: loss values + gradient tree vs the reference
    ``training_step`` math (code1/model.py:492-575) with transplanted
    weights and deterministic sampling.

    The matcher (TransMVSNet) is frozen on both sides exactly as the
    reference's configure_optimizers (model.py:82-83 requires_grad=False /
    our uforecon.py stop_gradient), so gradients exist for everything the
    reference actually trains: ray transformer, the MVS volume head
    (CostRegNetWeight), and the NeuS variance scalar. Both sides run
    eval-mode BN (all BN lives in the frozen matcher + the volume head;
    the train-mode BN-batch delta is quantified separately in BASELINE.md).
    Losses replicate model.py:552-566: mse rgb coarse+fine plus depth l1
    masked to valid gt inside [near, far].
    """
    import argparse
    import importlib
    from unittest import mock

    import torch
    import torch.nn.functional as F

    from helpers import make_synthetic_sample
    from uforecon_tpu.config import Config
    from uforecon_tpu.data.convert import scene_inputs_from_sample
    from uforecon_tpu.data.torch_ckpt import (_convert_tensor, convert_named,
                                              uforecon_name_map)
    from uforecon_tpu.models.uforecon import UFORecon
    from uforecon_tpu.pipeline.trainer import render_losses

    model_mod = importlib.import_module("code1.model")

    NC, NF = 8, 6
    n_views = 3
    rn = 16
    args = argparse.Namespace(
        ndepths="8,8,8", depth_inter_r="4,2,1", cr_base_chs="8,8,8",
        share_cr=False, grad_method="detach", patch_size=1, sW=1, sH=1,
        train_ray_num=rn, extract_geometry=False, test_sample_coarse=NC,
        test_sample_fine=NF, coarse_sample=NC, fine_sample=NF,
        volume_type="correlation", volume_reso=96, mvs_depth_guide=1,
        depth_pos_encoding=True, explicit_similarity=True,
        use_dir_srdf=False, test_coarse_only=False, uforecon_lr=1e-4,
        test_n_view=n_views, weight_rgb=1.0, weight_depth=1.0)
    ref = model_mod.UFORecon(args).eval()
    _randomize(ref, rng, scale=0.15)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "conv_offset_mask" in name:
                p.mul_(0.1)
        ref.deviation_network.variance.fill_(0.3)
    # freeze the matcher exactly like configure_optimizers (model.py:82-83)
    for name, p in ref.named_parameters():
        p.requires_grad_("transmvsnet" not in name)

    cfg = Config(ndepths=(8, 8, 8), coarse_sample=NC, fine_sample=NF,
                 test_sample_coarse=NC, test_sample_fine=NF,
                 extract_geometry=False, volume_type="correlation",
                 volume_reso=96, mvs_depth_guide=1, depth_pos_encoding=True,
                 test_n_view=n_views, volume_dtype="float32",
                 fused_point_head="never")
    sample = make_synthetic_sample(n_views=n_views, h=32, w=32, ndepth=16,
                                   start_idx=0)
    scene, extras = scene_inputs_from_sample(sample)
    ours = UFORecon(cfg)
    ray_d = jnp.asarray(extras["ray_d"][:rn])
    key = jax.random.PRNGKey(0)
    variables = ours.init(key, scene, ray_d, key)
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    p, bs, report = convert_named(sd, uforecon_name_map(),
                                  variables["params"],
                                  variables["batch_stats"])
    assert not report["unmatched_torch"], report["unmatched_torch"]

    # ground truth shared by both sides: reference-view rgb + gt depth at
    # the first rn rays (training_step gathers these inside infer,
    # model.py:399-405)
    rgb_gt_np = sample["ref_img"].reshape(-1, 3)[:rn]
    depth_gt_np = sample["depths_h"][0].reshape(-1)[:rn]

    # ---- deterministic sampling hooks (same scheme as the capstone) ----
    def fixed_torch_rand(*shape, **kw):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])
        if shape and shape[0] == NC:       # coarse jitter (SN, RN) -> none
            return torch.full(shape, 0.5)
        if shape and shape[0] == NF:       # importance draws (PN, RN)
            u = (torch.arange(NF, dtype=torch.float32) + 0.5) / NF
            return u[:, None].expand(*shape).clone()
        return torch.rand_orig(*shape, **kw)

    def fixed_jax_uniform(key_, shape, dtype=jnp.float32, **kw):
        if shape[-1] == NC:
            return jnp.full(shape, 0.5, dtype)
        if shape[-1] == NF:
            u = (jnp.arange(NF, dtype=dtype) + 0.5) / NF
            return jnp.broadcast_to(u, shape)
        raise AssertionError(f"unexpected uniform shape {shape}")

    # ---- ours: loss + grad through encode + render_chunk ----
    rgb_gt_j = jnp.asarray(rgb_gt_np)
    depth_gt_j = jnp.asarray(depth_gt_np)

    def loss_fn(params):
        vs = {"params": params, "batch_stats": bs}
        enc = ours.apply(vs, scene, method=ours.encode)
        out = ours.apply(vs, scene, enc, ray_d, key,
                         method=ours.render_chunk)
        return render_losses(cfg, out, rgb_gt_j, depth_gt_j,
                             scene.near, scene.far)

    with mock.patch.object(jax.random, "uniform", fixed_jax_uniform):
        (loss_j, logs_j), grads_j = jax.value_and_grad(
            loss_fn, has_aux=True)(p)

    # ---- reference: training_step body with fixed ray_idx ----
    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    batch = {
        "source_imgs": _nchw(sample["source_imgs"])[None],
        "ref_img": _nchw(sample["ref_img"][None]),
        "ray_o": t(sample["ray_o"])[None],
        "ray_d": t(sample["ray_d"].T)[None],
        "cam_ray_d": t(sample["cam_ray_d"].T)[None],
        "near_fars": t(sample["near_fars"])[None],
        "proj_matrices": {k: t(v)[None] for k, v in
                          sample["proj_matrices"].items()},
        "depth_values_org_scale": t(sample["depth_values_org_scale"])[None],
        "w2cs": t(sample["w2cs"])[None],
        "intrinsics": t(sample["intrinsics"])[None],
        "source_poses": t(sample["source_poses"])[None],
        "source_poses_inv": t(sample["source_poses_inv"])[None],
        "ref_pose_inv": t(sample["ref_pose_inv"])[None],
        "scale_factor": t(np.array([sample["scale_factor"]])),
        "scale_mat": t(sample["scale_mat"])[None],
        "depths_h": t(sample["depths_h"])[None],
        "start_idx": 0,
    }
    torch.rand_orig = torch.rand
    with mock.patch.object(torch, "rand", fixed_torch_rand):
        imgs_pair, projs_pair, dv_pair = ref.build_pairs(
            batch["source_imgs"], batch["proj_matrices"],
            batch["depth_values_org_scale"])
        feat_backbone, vol_info = ref.transmvsnet(imgs_pair, projs_pair,
                                                  dv_pair)
        for i in range(len(feat_backbone)):
            feat_backbone[i]["stage1"] = feat_backbone[i]["stage1"][0:1]
        match = ref.transmvsnet.get_match_feat(feat_backbone,
                                               cur_n_src_views=n_views)
        src_feat = torch.stack([f["stage1"] for f in feat_backbone], dim=1)
        fv = {}
        for s in ("stage1", "stage2", "stage3"):
            f_, w_ = ref.build_mvs_volume(batch, vol_info[s]["cost_volume"])
            fv[s] = {"feature_volume": f_, "weight_volume": w_}
        batch["depth_info"] = (vol_info["stage3"]["depth"]
                               * batch["scale_factor"]).unsqueeze(0)
        ray_idx = torch.arange(rn)[None]
        (rgb_gt_r, rgb_r, depth_r, depth_gt_r, _srdf, _op, _w, _pp,
         rgb2_r, depth2_r, *_rest) = ref.infer(
            batch=batch, ray_idx=ray_idx, source_imgs_feat=src_feat,
            feature_volume=fv, match_feature=match)

        # losses exactly as model.py:552-566
        loss_rgb = F.mse_loss(rgb_r, rgb_gt_r)
        loss_rgb2 = F.mse_loss(rgb2_r, rgb_gt_r)
        nf = batch["near_fars"]
        mask = ((depth_gt_r != 0) & (depth_gt_r >= nf[:, 0, 0:1])
                & (depth_gt_r <= nf[:, 0, 1:2]))
        loss_d = F.l1_loss(depth_r[mask], depth_gt_r[mask])
        loss_d2 = F.l1_loss(depth2_r[mask], depth_gt_r[mask])
        loss_t = (args.weight_rgb * (loss_rgb + loss_rgb2)
                  + args.weight_depth * (loss_d + loss_d2))
        loss_t.backward()

    # the gathered gt must agree, else the loss comparison is vacuous
    np.testing.assert_allclose(rgb_gt_r[0].detach().numpy(), rgb_gt_np,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(depth_gt_r[0].detach().numpy(), depth_gt_np,
                               rtol=1e-6, atol=1e-6)

    # ---- loss parity ----
    for ours_key, ref_val in [
        ("train/rgb_coarse", loss_rgb), ("train/rgb_fine", loss_rgb2),
        ("train/depth_ray_coarse", loss_d), ("train/depth_ray_fine", loss_d2),
        ("train/loss_all", loss_t),
    ]:
        np.testing.assert_allclose(
            float(logs_j[ours_key]), float(ref_val.detach()),
            rtol=2e-3, atol=2e-5, err_msg=ours_key)

    # ---- gradient parity over every trainable reference tensor ----
    name_map = uforecon_name_map()

    def get_leaf(tree, path):
        node = tree
        for q in path:
            node = node[q]
        return node

    num = den = 0.0
    matched = 0
    worst = (0.0, "")
    for name, pr in ref.named_parameters():
        if not pr.requires_grad or pr.grad is None:
            continue
        tgt = name_map.get(name)
        if tgt is None or tgt[0] != "params":
            # dead modules (pre_conv, model.py:70) never get grads; anything
            # else unmapped would have failed the transplant assert above
            continue
        leaf = np.asarray(get_leaf(grads_j, tgt[1]))
        conv = _convert_tensor(name, pr.grad.detach().numpy(), leaf.shape)
        assert conv is not None, name
        d = float(np.linalg.norm(conv - leaf) ** 2)
        n2 = float(np.linalg.norm(conv) ** 2)
        num += d
        den += n2
        matched += 1
        rel = np.sqrt(d / (n2 + 1e-30)) if n2 > 1e-20 else 0.0
        if rel > worst[0]:
            worst = (rel, name)
    assert matched >= 20, f"only {matched} grad leaves compared"
    tree_rel = np.sqrt(num / (den + 1e-30))
    assert tree_rel < 2e-3, (
        f"grad tree rel-L2 {tree_rel:.2e}, worst leaf {worst[1]} "
        f"rel {worst[0]:.2e}")
