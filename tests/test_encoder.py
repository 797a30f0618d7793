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
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out["stage1"].shape == (2, 16, 16, 32)
    assert out["stage2"].shape == (2, 32, 32, 16)
    assert out["stage3"].shape == (2, 64, 64, 8)


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
