"""Sampler and NeuS renderer semantics tests (torch golden for the math)."""
import jax
import jax.numpy as jnp
import numpy as np

from uforecon_tpu.ops.rendering import neus_render
from uforecon_tpu.ops.sampling import sample_coarse, sample_importance


def test_sample_coarse_bounds_and_stratification(rng):
    key = jax.random.PRNGKey(0)
    rn, sn = 64, 16
    ray_o = jnp.zeros((rn, 3))
    ray_d = jnp.asarray(np.tile([0, 0, 1.0], (rn, 1)), jnp.float32)
    near = jnp.full((rn,), 2.0)
    far = jnp.full((rn,), 6.0)
    points, z = sample_coarse(key, ray_o, ray_d, sn, near, far)
    z = np.asarray(z)
    interval = 4.0 / (sn - 1)
    base = np.linspace(2.0, 6.0, sn)
    # jitter is at most half an interval around the stratified grid
    assert np.all(np.abs(z - base[None]) <= interval / 2 + 1e-6)
    np.testing.assert_allclose(np.asarray(points)[..., 2], z, atol=1e-6)
    # without near/far: centered on closest point to origin
    ray_o2 = jnp.asarray(np.tile([0, 0, -3.0], (rn, 1)), jnp.float32)
    _, z2 = sample_coarse(key, ray_o2, ray_d, sn, sample_radius=1.3)
    assert abs(np.asarray(z2).mean() - 3.0) < 0.1


def test_sample_importance_concentrates_on_peak(rng):
    key = jax.random.PRNGKey(1)
    rn, sn = 8, 32
    ray_o = jnp.zeros((rn, 3))
    ray_d = jnp.asarray(np.tile([0, 0, 1.0], (rn, 1)), jnp.float32)
    z = jnp.broadcast_to(jnp.linspace(1.0, 5.0, sn), (rn, sn))
    w = np.zeros((rn, sn), np.float32)
    w[:, 16] = 1.0  # all weight at z ~ 3.06
    pts, z_f = sample_importance(key, ray_o, ray_d, jnp.asarray(w), z, 64)
    z_f = np.asarray(z_f)
    assert z_f.shape == (rn, 64)
    assert np.all(np.diff(z_f, axis=1) >= 0)  # sorted
    peak = np.asarray(z)[0, 16]
    lo = np.asarray(z)[0, 15]
    assert np.all(z_f >= lo - 1e-4) and np.all(z_f <= peak + 1e-4)


def test_neus_render_matches_torch_reference(rng):
    import torch

    rn, sn = 5, 16
    z = np.sort(rng.random((rn, sn)).astype(np.float32) * 4 + 2, axis=1)
    radiance = rng.random((rn, sn, 3)).astype(np.float32)
    srdf = rng.standard_normal((rn, sn)).astype(np.float32) * 0.2
    variance = 0.3
    inv_s0 = np.exp(variance * 10.0)

    out = neus_render(jnp.asarray(z), jnp.asarray(radiance), jnp.asarray(srdf),
                      jnp.float32(inv_s0))

    # torch re-implementation of the reference math (renderer.py:19-48)
    tz = torch.from_numpy(z)
    interval = tz[:, 1:] - tz[:, :-1]
    interval = torch.cat([interval[:, :1], interval, interval[:, -1:]], dim=1)
    interval = (interval[:, :-1] + interval[:, 1:]) / 2
    tsrdf = torch.from_numpy(srdf)
    inv_s = torch.full((rn, sn), float(np.clip(inv_s0, 1e-6, 1e6)))
    # reference renderer.py:28-29 (note: evaluates to -1.5 at ratio=1, a
    # reference quirk vs NeuS's relu formulation; we reproduce behavior)
    true_cos, ratio = -1.0, 1.0
    iter_cos = -(-true_cos * 0.5 + 0.5 * (1.0 - ratio) - true_cos * ratio)
    est_next = tsrdf + iter_cos * interval * 0.5
    est_prev = tsrdf - iter_cos * interval * 0.5
    prev_cdf = torch.sigmoid(est_prev * inv_s)
    next_cdf = torch.sigmoid(est_next * inv_s)
    alpha = ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)).clip(0, 1)
    weight = alpha * torch.cumprod(
        torch.cat([torch.ones(rn, 1), 1 - alpha + 1e-7], dim=-1), dim=-1
    )[:, :-1]
    rgb_ref = (torch.from_numpy(radiance) * weight[..., None]).sum(dim=1)
    depth_ref = (weight * tz).sum(dim=1)

    np.testing.assert_allclose(np.asarray(out["weight"]), weight.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_gmflow_sample_and_splits(rng):
    import jax.numpy as jnp
    from uforecon_tpu.ops.gmflow import (merge_splits, normalize_img,
                                         sample_features_by_grid,
                                         split_feature)
    from uforecon_tpu.ops.grid_sample import grid_sample_2d

    feats = jnp.asarray(rng.standard_normal((2, 8, 12, 4)).astype(np.float32))
    grid = jnp.asarray((rng.random((2, 50, 2)) * 1.6 - 0.8).astype(np.float32))
    # radius 0 == plain grid sample
    a = sample_features_by_grid(feats, grid, local_radius=0)
    b = grid_sample_2d(feats, grid, align_corners=True, padding_mode="border")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # radius 1 smooths: constant features stay constant
    const = jnp.ones((2, 8, 12, 4))
    c = sample_features_by_grid(const, grid, local_radius=1)
    np.testing.assert_allclose(np.asarray(c), 1.0, atol=1e-5)
    # split/merge roundtrip
    f = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(merge_splits(split_feature(f, 2), 2)), np.asarray(f))
    rgb = jnp.ones((2, 8, 12, 3))
    i0, i1 = normalize_img(rgb, rgb)
    assert np.isfinite(np.asarray(i0)).all()


def test_exact_onehot_einsum_bitwise(rng):
    """The 3-component bf16 split must reproduce a HIGHEST-precision one-hot
    contraction bit-for-bit across magnitudes (the property that lets the
    permutation run in 3 single MXU passes instead of HIGHEST's 6)."""
    import jax
    import jax.numpy as jnp

    from uforecon_tpu.ops.exact_onehot import exact_onehot_einsum

    r, n, c = 7, 64, 5
    # mixed magnitudes: DTU-scale, tiny, negative, exact-bf16, zero
    vals = np.concatenate([
        (425.0 + 480.0 * rng.random((r, n, 1))),
        rng.standard_normal((r, n, 1)) * 1e-4,
        -rng.standard_normal((r, n, 1)),
        np.round(rng.standard_normal((r, n, 1)) * 4) / 4,
        np.zeros((r, n, 1)),
    ], axis=-1).astype(np.float32)
    perm = np.stack([rng.permutation(n) for _ in range(r)])
    onehot = (perm[..., None] == np.arange(n)[None, None, :]).astype(np.float32)

    out = exact_onehot_einsum("rij,rjc->ric", jnp.asarray(onehot),
                              jnp.asarray(vals))
    ref = jnp.einsum("rij,rjc->ric", jnp.asarray(onehot), jnp.asarray(vals),
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # and equals the plain permutation of the values
    np.testing.assert_array_equal(np.asarray(out),
                                  np.take_along_axis(vals, perm[..., None], 1))

    # the custom VJP routes the COTANGENT through the same exact split
    # (a plain einsum backward would bf16-round it on TPU)
    g = jnp.asarray((rng.standard_normal((r, n, c)) * 100).astype(np.float32))
    _, vjp = jax.vjp(lambda v: exact_onehot_einsum(
        "rij,rjc->ric", jnp.asarray(onehot), v), jnp.asarray(vals))
    _, vjp_ref = jax.vjp(lambda v: jnp.einsum(
        "rij,rjc->ric", jnp.asarray(onehot), v,
        precision=jax.lax.Precision.HIGHEST), jnp.asarray(vals))
    np.testing.assert_array_equal(np.asarray(vjp(g)[0]),
                                  np.asarray(vjp_ref(g)[0]))


def test_exact_transpose_bitwise(rng):
    """exact_transpose (MXU identity contraction, the UFO_TRANSPOSE=mxu
    formatting route) must equal jnp.swapaxes bit-for-bit — forward and
    cotangent — across magnitudes, with and without leading batch dims."""
    import jax
    import jax.numpy as jnp

    from uforecon_tpu.ops.exact_onehot import exact_transpose

    for shape in [(37, 5), (3, 41, 8)]:
        vals = np.concatenate([
            (425.0 + 480.0 * rng.random(shape[:-1] + (1,))),
            rng.standard_normal(shape[:-1] + (1,)) * 1e-4,
            -rng.standard_normal(shape[:-1] + (shape[-1] - 3,)),
            np.zeros(shape[:-1] + (1,)),
        ], axis=-1).astype(np.float32)
        out = exact_transpose(jnp.asarray(vals))
        ref = jnp.swapaxes(jnp.asarray(vals), -1, -2)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

        g = jnp.asarray(np.swapaxes(
            rng.standard_normal(vals.shape) * 100, -1, -2).astype(np.float32))
        _, vjp = jax.vjp(exact_transpose, jnp.asarray(vals))
        np.testing.assert_array_equal(
            np.asarray(vjp(g)[0]), np.swapaxes(np.asarray(g), -1, -2))


def test_exact_transpose_wide_and_dtype(rng):
    """Round-4 advisor findings: (a) an output-side (C, P) input with huge P
    must contract over the SMALL major dim (an eye(P) identity would be a
    quadratic operand — here eye(4096) would already dominate the values);
    (b) bf16 inputs must come back bf16 (dtype-transparent knob), still
    bit-equal to the real transpose."""
    import jax.numpy as jnp

    from uforecon_tpu.ops.exact_onehot import exact_transpose

    # (C, P) with P >> C — the output-side shape from the fused point head
    wide = rng.standard_normal((7, 4096)).astype(np.float32) * 37.0
    out = exact_transpose(jnp.asarray(wide))
    np.testing.assert_array_equal(np.asarray(out), wide.T)

    for dtype in (jnp.bfloat16, jnp.float32):
        vals = jnp.asarray(rng.standard_normal((33, 6)), dtype=dtype)
        out = exact_transpose(vals)
        assert out.dtype == dtype
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(vals.T))


def test_config_validates_enum_knobs():
    """Enum-valued Config knobs reject typos at construction (the round-4
    advisor's 'pad'-reaches-Config finding)."""
    import pytest as _pytest

    from uforecon_tpu.config import Config

    # valid values still construct (brick needs the exact per-stage
    # path, which volume_merge="never" selects)
    Config(volume_brick="auto", volume_merge="never")
    for field in ("volume_brick", "fused_similarity",
                  "fused_volume_fusion", "brick_kernel"):
        with _pytest.raises(ValueError):
            Config(**{field: "pad-typo"})


def test_sample_importance_one_hot_fetch_is_exact(rng):
    """The dense one-hot bracketing fetch must be BIT-identical to scattered
    take_along_axis gathers (0/1 products and single-nonzero sums are exact
    f32 at HIGHEST precision — the property the rework relies on)."""
    import jax
    import jax.numpy as jnp

    from uforecon_tpu.ops.sampling import sample_importance

    rn, sn, pn = 13, 64, 32
    ray_o = jnp.asarray(rng.standard_normal((rn, 3)).astype(np.float32))
    ray_d = jnp.asarray(rng.standard_normal((rn, 3)).astype(np.float32))
    weight = jnp.asarray(rng.random((rn, sn)).astype(np.float32)) ** 3
    # DTU-scale z values in the hundreds: the regime where bf16 rounding of
    # a default-precision contraction would show up as ~0.5 unit errors
    z_val = jnp.sort(
        425.0 + 480.0 * jnp.asarray(rng.random((rn, sn)).astype(np.float32)),
        axis=1)
    key = jax.random.PRNGKey(3)

    _, z = sample_importance(key, ray_o, ray_d, weight, z_val, pn)

    # naive reference: same math with scattered gathers
    cdf = jnp.cumsum(weight, axis=1) / (jnp.sum(weight, axis=1, keepdims=True) + 1e-6)
    u = jax.random.uniform(key, (rn, pn), z_val.dtype)
    u = jnp.clip(u, cdf[:, 0:1], cdf[:, -1:])
    idx = jnp.sum((cdf[:, None, :] < u[:, :, None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 1, sn - 1)
    ta = lambda a, i: jnp.take_along_axis(a, i, axis=1)
    z_ref = (u - ta(cdf, idx - 1)) / (ta(cdf, idx) - ta(cdf, idx - 1) + 1e-6) \
        * (ta(z_val, idx) - ta(z_val, idx - 1)) + ta(z_val, idx - 1)
    z_ref = jnp.sort(z_ref, axis=1)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z_ref))
