"""Shape/semantics tests for the encoder stack (FeatureNet, FMT, cascade)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.models.attention import linear_attention
from uforecon_tpu.models.cascade import (
    CascadeMatcher,
    combine_projection,
    depth_hypotheses_around,
    depth_wta,
    homo_warp,
)
from uforecon_tpu.models.featurenet import FeatureNet
from uforecon_tpu.models.fmt import FMTWithPathway, group_match_features


def test_linear_attention_matches_torch_reference(rng):
    import torch

    b, l, s, h, d = 2, 5, 7, 4, 8
    q = rng.standard_normal((b, l, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)

    ours = np.asarray(linear_attention(q, k, v))

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    Q = torch.nn.functional.elu(tq) + 1
    K = torch.nn.functional.elu(tk) + 1
    KV = torch.einsum("nshd,nshm->nhmd", K, tv)
    Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
    ref = torch.einsum("nlhd,nhmd,nlh->nlhm", Q, KV, Z).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_featurenet_shapes(rng):
    net = FeatureNet(base_channels=8)
    # smallest shape exercising all three strides (1 batch: init+apply on
    # 1 CPU core was the 3rd-slowest fast test at (2, 64, 64))
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(variables, x)
    assert out["stage1"].shape == (1, 8, 8, 32)
    assert out["stage2"].shape == (1, 16, 16, 16)
    assert out["stage3"].shape == (1, 32, 32, 8)


def test_homo_warp_identity(rng):
    """Warping a view onto itself must reproduce the feature map (in-bounds)."""
    h, w, c = 16, 20, 4
    feat = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
    K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32)
    proj = np.eye(4, dtype=np.float32)
    proj[:3, :3] = K
    proj = jnp.asarray(proj)
    depth = jnp.full((5, h, w), 3.0, jnp.float32)
    out = homo_warp(feat, proj, proj, depth)
    assert out.shape == (5, h, w, c)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(feat), atol=1e-4)


def test_homo_warp_grid_stays_f32_under_bf16(rng):
    """Warp GEOMETRY must be f32 even when features run bf16: at W=640 a
    bf16 pixel coordinate carries ~2 px of rounding error (the mixed
    encoder_dtype policy would otherwise warp from the wrong place)."""
    from uforecon_tpu.models.cascade import homo_warp_grid

    h, w = 64, 640
    K = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]], np.float32)
    src = np.eye(4, dtype=np.float32)
    src[:3, :3] = K
    src[0, 3] = 3.7  # translated source view -> non-integer positions
    ref = np.eye(4, dtype=np.float32)
    ref[:3, :3] = K
    depth = jnp.full((2, h, w), 3.0, jnp.float32)
    g32 = homo_warp_grid(jnp.asarray(src), jnp.asarray(ref), depth,
                         jnp.float32)
    gbf = homo_warp_grid(jnp.asarray(src).astype(jnp.bfloat16),
                         jnp.asarray(ref).astype(jnp.bfloat16), depth,
                         jnp.bfloat16)
    assert g32.dtype == jnp.float32 and gbf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(gbf), np.asarray(g32), atol=1e-5)


@pytest.mark.slow
def test_encoder_dtype_mixed_policy(rng):
    """encoder_dtype=bfloat16 + compute_dtype=float32: same param tree as
    full-f32, render output finite and close (frozen matcher runs bf16,
    render head stays f32).

    slow: two full encoder+render compiles (~2 min on the 1-core CPU host)."""
    from helpers import make_synthetic_scene

    from uforecon_tpu.config import Config
    from uforecon_tpu.models.uforecon import UFORecon

    kw = dict(coarse_sample=8, fine_sample=8, ndepths=(8, 8, 8),
              fmt_layer_names=("self", "cross"), numdepth=32,
              mvs_depth_guide=1, depth_pos_encoding=True,
              explicit_similarity=True, volume_brick="never")
    scene, extras = make_synthetic_scene(n_views=3, h=64, w=64, ndepth=32)
    ray_d = jnp.asarray(extras["ray_d"][:8])
    key = jax.random.PRNGKey(0)

    outs = {}
    trees = {}
    for name, enc_dt in (("f32", ""), ("mixed", "bfloat16")):
        cfg = Config(**kw, encoder_dtype=enc_dt)
        model = UFORecon(cfg)
        variables = jax.jit(model.init)(key, scene, ray_d[:4], key)
        trees[name] = jax.tree_util.tree_structure(variables)
        outs[name] = model.apply(variables, scene, ray_d[:4], key)
    assert trees["f32"] == trees["mixed"]
    for k in ("rgb", "depth"):
        a = np.asarray(outs["f32"]["fine"][k])
        b = np.asarray(outs["mixed"]["fine"][k])
        assert np.all(np.isfinite(b)), k
        # bf16 matcher perturbs features; outputs stay in the same regime
        np.testing.assert_allclose(b, a, rtol=0.2, atol=0.2, err_msg=k)


def test_combine_projection():
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = [1, 2, 3]
    K = np.eye(4, dtype=np.float32)
    K[:3, :3] = np.array([[100, 0, 32], [0, 100, 32], [0, 0, 1]])
    proj = jnp.asarray(np.stack([E, K]))
    out = np.asarray(combine_projection(proj))
    expect = E.copy()
    expect[:3, :4] = K[:3, :3] @ E[:3, :4]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_depth_hypotheses_and_wta(rng):
    cur = jnp.asarray(rng.random((4, 5)).astype(np.float32) * 10 + 5)
    hyp = depth_hypotheses_around(cur, 8, jnp.float32(1.0))
    assert hyp.shape == (8, 4, 5)
    # centered: first = cur - 4, last = cur + 4 - step... check span
    np.testing.assert_allclose(np.asarray(hyp[0]), np.asarray(cur) - 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hyp[-1]), np.asarray(cur) + 4.0, atol=1e-5)

    prob = jnp.asarray(rng.random((8, 4, 5)).astype(np.float32))
    d = depth_wta(prob, hyp)
    idx = np.argmax(np.asarray(prob), axis=0)
    expect = np.take_along_axis(np.asarray(hyp), idx[None], axis=0)[0]
    np.testing.assert_allclose(np.asarray(d), expect)


def test_fmt_with_pathway_shapes(rng):
    v, h, w = 3, 16, 16
    feats = {
        "stage1": jnp.asarray(rng.standard_normal((v, h, w, 32)), jnp.float32),
        "stage2": jnp.asarray(rng.standard_normal((v, h * 2, w * 2, 16)), jnp.float32),
        "stage3": jnp.asarray(rng.standard_normal((v, h * 4, w * 4, 8)), jnp.float32),
    }
    fmt = FMTWithPathway(layer_names=("self", "cross") * 2)
    variables = fmt.init(jax.random.PRNGKey(0), feats)
    out = fmt.apply(variables, feats)
    assert out["stage1"].shape == feats["stage1"].shape
    assert out["stage2"].shape == feats["stage2"].shape
    assert out["stage3"].shape == feats["stage3"].shape

    aug0, aug1 = fmt.apply(
        variables, feats["stage1"], v, method=fmt.extract_cross_features
    )
    assert aug0.shape == (3, h, w, 32)  # 3 choose 2 pairs
    assert aug1.shape == (3, h, w, 32)

    grouped = group_match_features(aug0, aug1, v)
    assert grouped.shape == (v, h, w, 64)


@pytest.mark.slow
def test_cascade_matcher_end_to_end(rng):
    v, h, w = 3, 32, 32
    imgs = jnp.asarray(rng.random((v, h, w, 3)), jnp.float32)

    # simple inward-looking cameras
    projs = {}
    base = np.zeros((v, 2, 4, 4), np.float32)
    for i in range(v):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.2 * i
        E[2, 3] = 4.0
        K = np.eye(4, dtype=np.float32)
        K[:3, :3] = np.array([[20, 0, 8], [0, 20, 8], [0, 0, 1]])
        base[i, 0] = E
        base[i, 1] = K
    for s, scale in [(1, 1.0), (2, 2.0), (3, 4.0)]:
        p = base.copy()
        p[:, 1, :2] *= scale
        projs[f"stage{s}"] = jnp.asarray(p)

    depth_values = jnp.linspace(2.0, 6.0, 32)
    matcher = CascadeMatcher(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"))
    variables = matcher.init(jax.random.PRNGKey(0), imgs, projs, depth_values)
    out = matcher.apply(variables, imgs, projs, depth_values)

    assert out["backbone_stage1"].shape == (v, h // 4, w // 4, 32)
    assert out["cost_volumes"]["stage1"].shape == (v, 8, h // 4, w // 4)
    assert out["cost_volumes"]["stage3"].shape == (v, 8, h, w)
    assert out["mvs_depth"].shape == (v, h, w)
    assert out["aug0"].shape == (3, h // 4, w // 4, 32)
    assert np.all(np.isfinite(np.asarray(out["mvs_depth"])))
    # depths must lie inside the (cascade-widened) hypothesis range:
    # stage2 spans +-1.0 around stage1 WTA, stage3 +-0.5 around stage2
    d = np.asarray(out["mvs_depth"])
    assert d.min() >= 0.4 and d.max() <= 7.6


def test_share_cr_param_tree():
    """--share_cr builds ONE CostRegNet shared by all stages (reference
    TransMVSNet.py:156-157); default builds one per stage."""
    v, h, w = 2, 32, 32
    imgs = jnp.zeros((v, h, w, 3), jnp.float32)
    projs = {}
    base = np.zeros((v, 2, 4, 4), np.float32)
    for i in range(v):
        E = np.eye(4, dtype=np.float32)
        E[2, 3] = 4.0
        K = np.eye(4, dtype=np.float32)
        K[:3, :3] = np.array([[10, 0, 4], [0, 10, 4], [0, 0, 1]])
        base[i, 0], base[i, 1] = E, K
    for s, scale in [(1, 1.0), (2, 2.0), (3, 4.0)]:
        p = base.copy()
        p[:, 1, :2] *= scale
        projs[f"stage{s}"] = jnp.asarray(p)
    depth_values = jnp.linspace(2.0, 6.0, 8)

    def param_keys(share_cr):
        m = CascadeMatcher(ndepths=(8, 8, 8), fmt_layer_names=("self",),
                           share_cr=share_cr)
        variables = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), imgs, projs, depth_values)
        )
        return {k for k in variables["params"] if k.startswith("cost_reg")}

    assert param_keys(False) == {"cost_reg_0", "cost_reg_1", "cost_reg_2"}
    assert param_keys(True) == {"cost_reg_shared"}
