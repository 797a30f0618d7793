"""Bit-parity of grid sampling vs torch.F.grid_sample (CPU golden)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from uforecon_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d, in_bounds_mask


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_2d_parity(rng, align_corners, padding_mode):
    N, H, W, C = 2, 7, 9, 5
    img = rng.standard_normal((N, H, W, C)).astype(np.float32)
    # include far out-of-bounds and exact-boundary points
    grid = (rng.random((N, 11, 13, 2)).astype(np.float32) * 4.0) - 2.0
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[0, 0, 2] = [0.0, 0.0]

    ours = np.asarray(grid_sample_2d(img, grid, align_corners, padding_mode))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_out = F.grid_sample(
        t_img, torch.from_numpy(grid), mode="bilinear",
        padding_mode=padding_mode, align_corners=align_corners,
    )
    ref = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_3d_parity(rng, align_corners, padding_mode):
    N, D, H, W, C = 2, 4, 5, 6, 3
    vol = rng.standard_normal((N, D, H, W, C)).astype(np.float32)
    grid = (rng.random((N, 3, 8, 3)).astype(np.float32) * 3.0) - 1.5

    ours = np.asarray(grid_sample_3d(vol, grid, align_corners, padding_mode))

    t_vol = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)  # N C D H W
    # torch 5D grid: (N, D_out, H_out, W_out, 3); treat our (3, 8) as (1, 3, 8)
    t_grid = torch.from_numpy(grid)[:, None]
    t_out = F.grid_sample(
        t_vol, t_grid, mode="bilinear",
        padding_mode=padding_mode, align_corners=align_corners,
    )  # N C 1 3 8
    ref = t_out[:, :, 0].permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_in_bounds_mask(rng):
    grid = np.array([[[[-1.0, 0.0], [1.01, 0.0], [0.5, -2.0], [1.0, 1.0]]]], np.float32)
    m = np.asarray(in_bounds_mask(grid))
    np.testing.assert_array_equal(m[0, 0], [1.0, 0.0, 0.0, 1.0])


def test_packed_trilinear_matches_grid_sample_3d(rng):
    from uforecon_tpu.ops.grid_sample import (grid_sample_3d,
                                              grid_sample_3d_packed,
                                              pack_volume_corners)
    import jax.numpy as jnp

    vol = jnp.asarray(rng.standard_normal((2, 5, 6, 7, 9)).astype(np.float32))
    packed = pack_volume_corners(vol)
    assert packed.shape == (2, 5, 6, 7, 72)
    # include points straddling and beyond every boundary
    grid = jnp.asarray(
        (rng.random((2, 400, 3)).astype(np.float32) * 2.6 - 1.3))
    for ac in (True, False):
        want = grid_sample_3d(vol, grid, align_corners=ac,
                              padding_mode="zeros")
        got = grid_sample_3d_packed(packed, grid, align_corners=ac,
                                    padding_mode="zeros")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_packed_trilinear_border(rng):
    from uforecon_tpu.ops.grid_sample import (grid_sample_3d,
                                              grid_sample_3d_packed,
                                              pack_volume_corners)
    import jax.numpy as jnp

    vol = jnp.asarray(rng.standard_normal((1, 4, 5, 6, 3)).astype(np.float32))
    packed = pack_volume_corners(vol)
    grid = jnp.asarray((rng.random((1, 200, 3)).astype(np.float32) * 2.4 - 1.2))
    want = grid_sample_3d(vol, grid, align_corners=True, padding_mode="border")
    got = grid_sample_3d_packed(packed, grid, align_corners=True,
                                padding_mode="border")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_bilinear_matches_grid_sample_2d(rng):
    from uforecon_tpu.ops.grid_sample import (grid_sample_2d,
                                              grid_sample_2d_packed,
                                              pack_image_corners)
    import jax.numpy as jnp

    img = jnp.asarray(rng.standard_normal((3, 7, 9, 5)).astype(np.float32))
    packed = pack_image_corners(img)
    assert packed.shape == (3, 7, 9, 20)
    grid = jnp.asarray((rng.random((3, 500, 2)).astype(np.float32) * 2.6 - 1.3))
    for ac in (True, False):
        for pm in ("zeros", "border"):
            want = grid_sample_2d(img, grid, align_corners=ac, padding_mode=pm)
            got = grid_sample_2d_packed(packed, grid, align_corners=ac,
                                        padding_mode=pm)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)


def test_dot_packed_matches_sample_then_dot(rng):
    """grid_sample_2d_dot_packed (warp correlate with the ref-dot folded
    into the full-lane rows, cascade._correlate_chunked) == sample-then-dot
    up to f32 reassociation, for plain and lane-padded packs and depth-tiled
    point orders (P = dtile * R)."""
    from uforecon_tpu.ops.grid_sample import (grid_sample_2d_dot_packed,
                                              grid_sample_2d_packed,
                                              pack_image_corners)
    import jax.numpy as jnp

    img = jnp.asarray(rng.standard_normal((3, 6, 10, 8)).astype(np.float32))
    r = 50
    ref = jnp.asarray(rng.standard_normal((r, 8)).astype(np.float32))
    grid = jnp.asarray((rng.random((3, 4 * r, 2)).astype(np.float32) * 2.6
                        - 1.3))
    for pad in (None, 32):
        packed = pack_image_corners(img, corner_pad=pad)
        for ac in (True, False):
            for pm in ("zeros", "border"):
                sampled = grid_sample_2d_packed(
                    packed, grid, align_corners=ac, padding_mode=pm,
                    c_out=8 if pad else None)
                want = jnp.einsum("npc,pc->np", sampled,
                                  jnp.tile(ref, (4, 1)))
                got = grid_sample_2d_dot_packed(
                    packed, grid, ref, align_corners=ac, padding_mode=pm)
                np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                           rtol=2e-5, atol=2e-5)


def test_packed_bilinear_corner_pad_bit_equal(rng):
    """corner_pad (the stage-3 warp lane-padding, cascade._correlate_chunked)
    + c_out must be BIT-equal to the unpadded packed sampler — padding is
    zeros that c_out slices back off before any arithmetic differs."""
    from uforecon_tpu.ops.grid_sample import (grid_sample_2d_packed,
                                              pack_image_corners)
    import jax.numpy as jnp

    img = jnp.asarray(rng.standard_normal((2, 7, 9, 8)).astype(np.float32))
    grid = jnp.asarray((rng.random((2, 400, 2)).astype(np.float32) * 2.6 - 1.3))
    plain = pack_image_corners(img)
    padded = pack_image_corners(img, corner_pad=32)
    assert padded.shape == (2, 7, 9, 128)
    for ac in (True, False):
        for pm in ("zeros", "border"):
            want = grid_sample_2d_packed(plain, grid, align_corners=ac,
                                         padding_mode=pm)
            got = grid_sample_2d_packed(padded, grid, align_corners=ac,
                                        padding_mode=pm, c_out=8)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
