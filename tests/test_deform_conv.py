"""Deformable conv v2: vectorized JAX op vs slow numpy loop golden."""
import numpy as np

from uforecon_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_reference


def test_deform_conv_matches_reference(rng):
    n, h, w, c, cout, k = 2, 6, 7, 3, 4, 3
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    offsets = (rng.standard_normal((n, h, w, k * k, 2)) * 1.5).astype(np.float32)
    mask = rng.random((n, h, w, k * k)).astype(np.float32)
    weight = rng.standard_normal((k, k, c, cout)).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)

    ours = np.asarray(deform_conv2d(x, offsets, mask, weight, bias))
    ref = deform_conv2d_reference(x, offsets, mask, weight, bias)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_deform_conv_zero_offsets_is_plain_conv(rng):
    import torch
    import torch.nn.functional as F

    n, h, w, c, cout, k = 1, 8, 8, 3, 5, 3
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    offsets = np.zeros((n, h, w, k * k, 2), np.float32)
    mask = np.ones((n, h, w, k * k), np.float32)
    weight = rng.standard_normal((k, k, c, cout)).astype(np.float32)

    ours = np.asarray(deform_conv2d(x, offsets, mask, weight))
    t_x = torch.from_numpy(x).permute(0, 3, 1, 2)
    t_w = torch.from_numpy(weight).permute(3, 2, 0, 1)
    ref = F.conv2d(t_x, t_w, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
