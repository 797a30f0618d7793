"""End-to-end model smoke test on a tiny synthetic scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.config import Config
from uforecon_tpu.models.uforecon import UFORecon

from helpers import make_synthetic_scene


@pytest.mark.slow
def test_model_encode_and_render(rng):
    cfg = Config(
        ndepths=(8, 8, 8),
        fmt_layer_names=("self", "cross"),
        coarse_sample=8,
        fine_sample=8,
        volume_reso=96,
        volume_type="correlation",
    )
    scene, extras = make_synthetic_scene(n_views=3, h=32, w=32, ndepth=16)
    model = UFORecon(cfg)
    key = jax.random.PRNGKey(0)
    rn = 16
    ray_d = extras["ray_d"][:rn]

    variables = model.init(key, scene, ray_d, key)
    out = model.apply(variables, scene, ray_d, key)

    for phase in ("coarse", "fine"):
        o = out[phase]
        assert o["rgb"].shape == (rn, 3)
        assert o["depth"].shape == (rn,)
        assert np.all(np.isfinite(np.asarray(o["rgb"])))
        assert np.all(np.isfinite(np.asarray(o["depth"])))
        assert np.asarray(o["opacity"]).min() >= 0
        assert np.asarray(o["opacity"]).max() <= 1 + 1e-4
    assert out["fine"]["weight"].shape == (rn, 16)  # coarse+fine merged
    # rendered rgb is a convex blend of sampled image colors -> within [0,1]
    assert np.asarray(out["fine"]["rgb"]).min() >= -1e-4
    assert np.asarray(out["fine"]["rgb"]).max() <= 1 + 1e-4
