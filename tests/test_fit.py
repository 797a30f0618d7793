"""Training harness: fit loop, checkpoint retention, metrics."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uforecon_tpu.config import Config
from uforecon_tpu.pipeline.checkpoint import CheckpointManager, load_params, save_params
from uforecon_tpu.utils.metrics import psnr, ssim

from helpers import SyntheticDataset


def tiny_cfg(tmp_path, **kw):
    base = dict(
        ndepths=(8, 8, 8),
        fmt_layer_names=("self", "cross"),
        coarse_sample=4,
        fine_sample=4,
        train_ray_num=32,
        volume_type="correlation",
        logdir=str(tmp_path / "logs"),
        max_epochs=1,
    )
    base.update(kw)
    return Config(**base)


def test_checkpoint_manager_topk(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), save_top_k=2)
    tree = {"a": np.arange(3, dtype=np.float32), "b": {"c": np.float32(1.0)}}
    mgr.save(1, tree, {"val/loss_depth_fine": 3.0})
    mgr.save(2, {**tree, "b": {"c": np.float32(2.0)}}, {"val/loss_depth_fine": 1.0})
    mgr.save(3, tree, {"val/loss_depth_fine": 2.0})
    mgr.save(4, tree, {"val/loss_depth_fine": 9.0})
    # top-2 by metric = steps 2,3; latest (4) always kept; 1 dropped
    kept = {int(s) for s in mgr._index}
    assert kept == {2, 3, 4}
    assert mgr.best_step() == 2
    restored = mgr.restore(2, target=tree)
    assert float(restored["b"]["c"]) == 2.0
    # latest restore
    assert mgr.latest_step() == 4


def test_save_load_params_roundtrip(tmp_path):
    tree = {"w": np.random.default_rng(0).random((4, 4)).astype(np.float32)}
    save_params(str(tmp_path / "p"), tree)
    back = load_params(str(tmp_path / "p"), target=tree)
    np.testing.assert_allclose(back["w"], tree["w"])


def test_psnr_ssim_sanity(rng):
    x = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    y = jnp.clip(x + 0.1 * rng.standard_normal((32, 32, 3)).astype(np.float32), 0, 1)
    assert float(psnr(x, x)) > 80
    assert float(psnr(x, y)) < 40
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5
    assert 0.5 < float(ssim(x, y)) < 0.999


@pytest.mark.slow
def test_val_only(tmp_path):
    """--val_only runs a validation pass without training
    (reference main.py:222-224)."""
    from uforecon_tpu.pipeline.fit import validate_only

    cfg = tiny_cfg(tmp_path, val_only=True, debug=True)
    val = SyntheticDataset(n_samples=1, n_views=3, h=32, w=32, ndepth=16,
                           start_idx=0)
    metrics = validate_only(cfg, val_ds=val)
    assert "val/loss_depth_fine" in metrics
    assert np.isfinite(metrics["val/loss_depth_fine"])


@pytest.mark.slow
def test_fit_smoke(tmp_path):
    from uforecon_tpu.pipeline.fit import fit

    cfg = tiny_cfg(tmp_path)
    ds = SyntheticDataset(n_samples=2, n_views=3, h=32, w=32, ndepth=16)
    val = SyntheticDataset(n_samples=1, n_views=3, h=32, w=32, ndepth=16,
                           start_idx=0)
    state = fit(cfg, train_ds=ds, val_ds=val, max_steps=2, val_every=2,
                log_every=1, n_workers=0)
    assert int(state.step) == 2
    logdir = os.path.join(cfg.logdir, cfg.exp_name)
    assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))
    mgr = CheckpointManager(os.path.join(logdir, "ckpt"))
    assert mgr.latest_step() == 2


@pytest.mark.slow
def test_fit_updates_only_nonmatcher_params(tmp_path):
    """The matcher subtree stays frozen (reference model.py:82-83)."""
    from uforecon_tpu.pipeline.fit import init_model
    from uforecon_tpu.pipeline.trainer import (create_train_state,
                                               make_optimizer, make_train_step)
    from uforecon_tpu.data.convert import scene_inputs_from_sample
    from uforecon_tpu.pipeline.fit import _gather_ray_batch

    cfg = tiny_cfg(tmp_path)
    ds = SyntheticDataset(n_samples=1, n_views=3, h=32, w=32, ndepth=16)
    model, variables = init_model(cfg, ds[0])
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables)
    step_fn = make_train_step(cfg, model, tx)

    scene, extras = scene_inputs_from_sample(ds[0])
    idx = np.arange(cfg.train_ray_num)
    ray_d, rgb_gt, depth_gt = _gather_ray_batch(extras, idx)
    new_state, logs = step_fn(state, scene, jnp.asarray(ray_d),
                              jnp.asarray(rgb_gt), jnp.asarray(depth_gt),
                              jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["train/loss_all"]))

    before = state.params["matcher"]
    after = new_state.params["matcher"]
    leaves_b = jax.tree_util.tree_leaves(before)
    leaves_a = jax.tree_util.tree_leaves(after)
    for b, a in zip(leaves_b, leaves_a):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # and at least one non-matcher param changed
    others_b = jax.tree_util.tree_leaves({k: v for k, v in state.params.items()
                                          if k != "matcher"})
    others_a = jax.tree_util.tree_leaves({k: v for k, v in new_state.params.items()
                                          if k != "matcher"})
    changed = any(not np.array_equal(np.asarray(b), np.asarray(a))
                  for b, a in zip(others_b, others_a))
    assert changed


@pytest.mark.slow
def test_learn_sanity_pipeline_smoke(tmp_path):
    """script/learn_sanity.py building blocks run end to end at tiny size
    (the full on-chip run is the real check; this guards bit-rot)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "script"))
    import learn_sanity as ls

    views = ls.build_scene_views(4, h=32, w=32)
    ds = ls.SphereDataset(views, n_src=2, ndepth=16, h=32, w=32)
    sample = ds[0]
    assert sample["source_imgs"].shape == (2, 32, 32, 3)
    assert (sample["depths_h"][0] > 0).any()

    from uforecon_tpu.config import Config
    cfg = Config(ndepths=(8, 8, 8), fmt_layer_names=("self", "cross"),
                 coarse_sample=4, fine_sample=4, test_sample_coarse=4,
                 test_sample_fine=4, train_ray_num=16, train_n_view=3,
                 numdepth=16, logdir=str(tmp_path), exp_name="s", max_epochs=1)
    from uforecon_tpu.pipeline.fit import fit
    state = fit(cfg, train_ds=ds, val_ds=[ds[0]], max_steps=1, val_every=1,
                log_every=1, n_workers=0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    r = ls.make_renderer(cfg, variables)
    err = ls.render_depth_error(r, ds[0])
    assert np.isfinite(err)


def test_batch2_joint_bn_delta_quantified():
    """VERDICT r2 item 8: quantify the reference's batch>1 BN semantics.

    Reference batch_size=2 (main.py:43) collates two scenes and runs the
    frozen-but-train-mode encoder jointly through BatchNorm
    (model.py:492-502) — BN normalizes with statistics computed ACROSS both
    scenes. Our ``fit()`` instead accumulates per-scene gradients
    (pipeline/fit.py) with eval-mode (running-stat) BN, whose outputs are
    scene-independent by construction. This test measures, on the reference
    FeatureNet itself, how much joint-batch train-mode BN perturbs one
    scene's features relative to running it alone — the delta our
    accumulation semantics does NOT reproduce (documented in PARITY.md).
    """
    import pytest

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    from helpers import install_reference_stubs

    install_reference_stubs()
    import importlib

    import torch

    module = importlib.import_module("code1.encoder_utils.fmt.module")
    torch.manual_seed(0)
    net = module.FeatureNet(base_channels=8).train()

    rng = np.random.default_rng(0)
    scene_a = torch.from_numpy(
        rng.random((3, 3, 32, 32)).astype(np.float32))  # 3 views
    scene_b = torch.from_numpy(
        rng.random((3, 3, 32, 32)).astype(np.float32) * 2.0)  # brighter scene

    with torch.no_grad():
        alone = net(scene_a)["stage1"]
        joint = net(torch.cat([scene_a, scene_b]))["stage1"][:3]

    delta = (alone - joint).abs().max().item()
    scale = alone.abs().max().item()
    rel = delta / scale
    # the delta is REAL (train-mode BN couples scenes)...
    assert rel > 1e-4, (
        "joint-batch BN unexpectedly scene-independent; if torch semantics "
        "changed, drop the PARITY.md note")
    # ...and bounded: normalization shifts, not feature destruction
    assert rel < 1.0, f"joint-BN delta unexpectedly large: {rel}"
