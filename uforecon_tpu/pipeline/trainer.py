"""Training: losses, optimizer wiring, jittable train/val steps.

Replaces the reference Lightning harness (reference: main.py:195-230,
code1/model.py:72-87 configure_optimizers, 492-575 training_step,
607-758 validation_step):

  * Adam(lr=1e-4) over everything EXCEPT the matcher (TransMVSNet) subtree,
    which is frozen exactly like the reference (model.py:82-83);
  * loss = weight_rgb * (mse(rgb_c) + mse(rgb_f))
         + weight_depth * (masked l1(depth_c) + masked l1(depth_f))
    with depth masked to valid gt inside [near, far] (model.py:552-566);
  * an additional MVS pretraining step with the cascade entropy loss
    (the reference ships TransMVSNet's losses unused, fmt/module.py:568-641,
    because it loads a pretrained encoder checkpoint that is absent from the
    snapshot — we train it ourselves).

Data parallel / ray parallel: the train step is jitted over a mesh; ray and
batch axes carry NamedShardings so XLA inserts the psum gradient reductions.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.uforecon import SceneInputs, UFORecon


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    batch_stats: Any = None  # BN running stats (eval-mode in render training)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam over non-matcher params; matcher frozen (model.py:72-87)."""

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if any(
                getattr(p, "key", None) == "matcher" for p in path
            ) else "train",
            params,
        )

    return optax.multi_transform(
        {"train": optax.adam(cfg.uforecon_lr), "frozen": optax.set_to_zero()},
        label_fn,
    )


def create_train_state(cfg: Config, variables) -> TrainState:
    params = variables["params"]
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      batch_stats=variables.get("batch_stats"))


def _variables(params, batch_stats):
    v = {"params": params}
    if batch_stats is not None:
        v["batch_stats"] = batch_stats
    return v


def render_losses(cfg: Config, out: Dict, rgb_gt: jnp.ndarray,
                  depth_gt: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """RGB mse + masked depth l1 over coarse and fine passes
    (model.py:552-566)."""
    c, f = out["coarse"], out["fine"]
    loss_rgb_c = jnp.mean((c["rgb"] - rgb_gt) ** 2)
    loss_rgb_f = jnp.mean((f["rgb"] - rgb_gt) ** 2)

    mask = (depth_gt != 0) & (depth_gt >= near) & (depth_gt <= far)
    mask = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss_d_c = jnp.sum(jnp.abs(c["depth"] - depth_gt) * mask) / denom
    loss_d_f = jnp.sum(jnp.abs(f["depth"] - depth_gt) * mask) / denom

    loss = cfg.weight_rgb * (loss_rgb_c + loss_rgb_f) + cfg.weight_depth * (
        loss_d_c + loss_d_f
    )
    logs = {
        "train/rgb_coarse": loss_rgb_c,
        "train/rgb_fine": loss_rgb_f,
        "train/depth_ray_coarse": loss_d_c,
        "train/depth_ray_fine": loss_d_f,
        "train/loss_all": loss,
        "train/variance": f["variance"],
    }
    return loss, logs


def make_train_step(cfg: Config, model: UFORecon, tx: optax.GradientTransformation):
    """Jitted SGD step over one scene sample + a ray chunk.

    Inputs: scene (SceneInputs), ray_d (RN,3), rgb_gt (RN,3), depth_gt (RN,),
    rng. The ray axis may carry a 'rays' NamedSharding for multi-chip.
    """
    from ..ops.kernel_precision import current_mode
    if current_mode() == "fast":
        raise ValueError(
            "UFO_KERNEL_PRECISION=fast is inference-only: its ~0.3% fused-"
            "kernel forward error vs the true-f32 reference-VJP backward "
            "was measured to destabilize render training (BASELINE.md "
            "round-2 precision section). Use 'high' or 'highest'.")

    def loss_fn(params, batch_stats, scene, ray_d, rgb_gt, depth_gt, rng):
        variables = _variables(params, batch_stats)
        enc = model.apply(variables, scene, method=model.encode)
        out = model.apply(
            variables, scene, enc, ray_d, rng, method=model.render_chunk
        )
        return render_losses(cfg, out, rgb_gt, depth_gt, scene.near, scene.far)

    @jax.jit
    def train_step(state: TrainState, scene: SceneInputs, ray_d, rgb_gt,
                   depth_gt, rng):
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, scene, ray_d, rgb_gt, depth_gt, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1,
                          state.batch_stats), logs

    return train_step


def make_grad_step(cfg: Config, model: UFORecon):
    """Jitted loss+grad on ONE scene (no optimizer update) — the unit of
    `batch_size` gradient accumulation. The reference trains batch 1-2
    (main.py:43); Lightning's batched forward means a mean loss over scenes,
    which equals the mean of per-scene gradients accumulated here."""

    def loss_fn(params, batch_stats, scene, ray_d, rgb_gt, depth_gt, rng):
        variables = _variables(params, batch_stats)
        enc = model.apply(variables, scene, method=model.encode)
        out = model.apply(
            variables, scene, enc, ray_d, rng, method=model.render_chunk
        )
        return render_losses(cfg, out, rgb_gt, depth_gt, scene.near, scene.far)

    @jax.jit
    def grad_step(state: TrainState, scene: SceneInputs, ray_d, rgb_gt,
                  depth_gt, rng):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, scene, ray_d, rgb_gt, depth_gt, rng
        )
        return grads, logs

    return grad_step


def make_apply_step(tx: optax.GradientTransformation):
    """Jitted optimizer update from (summed grads, scene count)."""

    @jax.jit
    def apply_step(state: TrainState, grads_sum, n_scenes):
        grads = jax.tree_util.tree_map(lambda g: g / n_scenes, grads_sum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, state.batch_stats)

    return apply_step


def make_val_step(cfg: Config, model: UFORecon):
    """Jitted validation losses on a ray chunk (model.py:707-726)."""

    @jax.jit
    def val_step(params, batch_stats, scene: SceneInputs, ray_d, rgb_gt,
                 depth_gt, rng):
        variables = _variables(params, batch_stats)
        enc = model.apply(variables, scene, method=model.encode)
        out = model.apply(
            variables, scene, enc, ray_d, rng, method=model.render_chunk
        )
        _, logs = render_losses(cfg, out, rgb_gt, depth_gt, scene.near, scene.far)
        return logs, out["fine"]["rgb"], out["fine"]["depth"]

    return val_step


# --------------------------------------------------------------------------
# MVS (cascade) pretraining — the reference relies on a pretrained
# TransMVSNet checkpoint; these losses let us train it from scratch.
# --------------------------------------------------------------------------


def mvs_entropy_loss(prob_volume: jnp.ndarray, depth_gt: jnp.ndarray,
                     mask: jnp.ndarray, depth_values: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-entropy against the one-hot nearest-hypothesis bin + WTA depth
    (reference fmt/module.py:578-614)."""
    d, h, w = prob_volume.shape
    gt_idx = jnp.argmin(jnp.abs(depth_values - depth_gt[None]), axis=0)  # (H, W)
    onehot = jax.nn.one_hot(gt_idx, d, axis=0)
    ce = -jnp.sum(onehot * jnp.log(prob_volume + 1e-6), axis=0)
    valid = jnp.maximum(jnp.sum(mask), 1e-6)
    loss = jnp.sum(ce * mask) / valid
    wta = jnp.take_along_axis(
        depth_values, jnp.argmax(prob_volume, axis=0)[None], axis=0
    )[0]
    return loss, wta


def make_mvs_pretrain_step(cfg: Config, model: UFORecon,
                           tx: optax.GradientTransformation,
                           dlossw=(0.5, 1.0, 2.0)):
    """Train the cascade matcher on GT depth (TransMVSNet-style pretraining).

    Stage losses are entropy-weighted like the reference's trans_mvsnet_loss
    (module.py:617-641) with per-stage weights dlossw.
    """

    def loss_fn(params, batch_stats, scene: SceneInputs, depth_gt_mm, mask, rng):
        variables = _variables(params, batch_stats)
        enc, mutated = model.apply(
            variables, scene.source_imgs, scene.proj_matrices,
            scene.depth_values, True,
            method=lambda m, *a: m.matcher(*a),
            mutable=["batch_stats"],
        )
        total = 0.0
        logs = {}
        # supervise the identity-rotation pass (view 0 as MVS reference); the
        # data loader rotates which view leads, covering all views over steps
        for s, w in zip(range(1, 4), dlossw):
            aux = enc["rot0"][f"stage{s}"]
            prob = aux["prob_volume"]            # (D, h, w)
            dv = aux["depth_values"]             # (D, h, w)
            hs, ws = prob.shape[1:]
            d_gt = jax.image.resize(depth_gt_mm, (hs, ws), method="nearest")
            m = jax.image.resize(mask, (hs, ws), method="nearest")
            l, _ = mvs_entropy_loss(prob, d_gt, m, dv)
            total = total + 2.0 * w * l
            logs[f"mvs/entropy_stage{s}"] = l
        logs["mvs/loss"] = total
        return total, (logs, mutated.get("batch_stats"))

    @jax.jit
    def pretrain_step(state: TrainState, scene, depth_gt_mm, mask, rng):
        (loss, (logs, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, scene, depth_gt_mm, mask, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        bs = new_bs if new_bs is not None else state.batch_stats
        return TrainState(params, opt_state, state.step + 1, bs), logs

    return pretrain_step
