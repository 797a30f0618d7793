"""Torch checkpoint converter: layout transforms + shape-sequence matching."""
import numpy as np
import pytest

from uforecon_tpu.data.torch_ckpt import (_convert_tensor, convert_state_dict,
                                          load_state_dict)


def test_convert_tensor_layouts(rng):
    # conv OIHW -> HWIO
    a = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    c = _convert_tensor("m.conv.weight", a, (3, 3, 4, 8))
    np.testing.assert_allclose(c, a.transpose(2, 3, 1, 0))
    # conv3d OIDHW -> DHWIO
    a3 = rng.standard_normal((8, 1, 3, 3, 3)).astype(np.float32)
    c3 = _convert_tensor("m.conv.weight", a3, (3, 3, 3, 1, 8))
    np.testing.assert_allclose(c3, a3.transpose(2, 3, 4, 1, 0))
    # linear (out, in) -> (in, out)
    l = rng.standard_normal((16, 32)).astype(np.float32)
    cl = _convert_tensor("m.fc.weight", l, (32, 16))
    np.testing.assert_allclose(cl, l.T)
    # mismatch -> None
    assert _convert_tensor("m.conv.weight", a, (5, 5, 4, 8)) is None


def test_convert_state_dict_matches_by_shape(rng):
    params = {
        "matcher": {
            "pixel_wise_net": {
                "Conv_0": {"kernel": np.zeros((1, 1, 1, 1, 16), np.float32),
                           "bias": np.zeros((16,), np.float32)},
                "Conv_1": {"kernel": np.zeros((1, 1, 1, 16, 8), np.float32),
                           "bias": np.zeros((8,), np.float32)},
            },
        },
        "ray_transformer": {
            "Dense_0": {"kernel": np.zeros((80, 16), np.float32),
                        "bias": np.zeros((16,), np.float32)},
        },
        "variance": np.zeros((), np.float32),
    }
    batch_stats = {
        "matcher": {"pixel_wise_net": {
            "BatchNorm_0": {"mean": np.zeros((16,), np.float32),
                            "var": np.ones((16,), np.float32)}}},
        "ray_transformer": {},
    }
    sd = {
        "transmvsnet.pixel_wise_net.conv0.weight":
            rng.standard_normal((16, 1, 1, 1, 1)).astype(np.float32),
        "transmvsnet.pixel_wise_net.conv0.bias":
            rng.standard_normal((16,)).astype(np.float32),
        "transmvsnet.pixel_wise_net.conv1.weight":
            rng.standard_normal((8, 16, 1, 1, 1)).astype(np.float32),
        "transmvsnet.pixel_wise_net.conv1.bias":
            rng.standard_normal((8,)).astype(np.float32),
        "transmvsnet.pixel_wise_net.bn0.weight":
            rng.standard_normal((16,)).astype(np.float32),
        "transmvsnet.pixel_wise_net.bn0.running_mean":
            rng.standard_normal((16,)).astype(np.float32),
        "transmvsnet.pixel_wise_net.bn0.running_var":
            rng.random((16,)).astype(np.float32) + 0.5,
        "transmvsnet.pixel_wise_net.bn0.num_batches_tracked":
            np.array(7),
        "ray_transformer.linear.weight":
            rng.standard_normal((16, 80)).astype(np.float32),
        "ray_transformer.linear.bias":
            rng.standard_normal((16,)).astype(np.float32),
        "deviation_network.variance": np.array([0.42], np.float32),
        "transmvsnet.unknown_module.weight":
            rng.standard_normal((3, 3)).astype(np.float32),
    }
    new_p, new_b, rep = convert_state_dict(sd, params, batch_stats)

    np.testing.assert_allclose(
        new_p["matcher"]["pixel_wise_net"]["Conv_0"]["kernel"],
        sd["transmvsnet.pixel_wise_net.conv0.weight"].transpose(2, 3, 4, 1, 0))
    np.testing.assert_allclose(
        new_p["ray_transformer"]["Dense_0"]["kernel"],
        sd["ray_transformer.linear.weight"].T)
    np.testing.assert_allclose(
        new_b["matcher"]["pixel_wise_net"]["BatchNorm_0"]["mean"],
        sd["transmvsnet.pixel_wise_net.bn0.running_mean"])
    assert float(new_p["variance"]) == pytest.approx(0.42)
    assert any("unknown_module" in k for k in rep["unmatched_torch"])
    assert len(rep["matched"]) >= 9


def test_load_state_dict_lightning_format(tmp_path):
    import torch

    sd = {"state_dict": {"a.weight": torch.ones(2, 3)},
          "epoch": 3}
    p = tmp_path / "ckpt.ckpt"
    torch.save(sd, str(p))
    out = load_state_dict(str(p))
    assert list(out) == ["a.weight"]
    assert out["a.weight"].shape == (2, 3)
