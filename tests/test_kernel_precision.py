"""UFO_KERNEL_PRECISION routes the fused kernels' forward matmul precision."""
import subprocess
import sys

import pytest

_PROBE = """
import jax
from uforecon_tpu.ops import fused_point_head, fused_point_head2, fused_ray_head
from uforecon_tpu.ops.kernel_precision import FORWARD_PRECISION
assert fused_point_head.FORWARD_PRECISION is FORWARD_PRECISION
assert fused_point_head2.FORWARD_PRECISION is FORWARD_PRECISION
assert fused_ray_head.FORWARD_PRECISION is FORWARD_PRECISION
print(FORWARD_PRECISION.name)
"""


@pytest.mark.parametrize("env_val,expected", [
    (None, "HIGHEST"),          # default: true-f32, matches the backward
    ("highest", "HIGHEST"),
    ("high", "HIGH"),           # bf16x3 A/B mode
])
def test_env_selects_forward_precision(env_val, expected, monkeypatch):
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("UFO_KERNEL_PRECISION", None)
    if env_val is not None:
        env["UFO_KERNEL_PRECISION"] = env_val
    out = subprocess.run([sys.executable, "-c", _PROBE], capture_output=True,
                         text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == expected


def test_invalid_value_rejected():
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu", UFO_KERNEL_PRECISION="fast")
    out = subprocess.run(
        [sys.executable, "-c",
         "import uforecon_tpu.ops.kernel_precision"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode != 0
    assert "UFO_KERNEL_PRECISION" in out.stderr
