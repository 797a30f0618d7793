"""End-to-end training harness: epochs, validation, checkpoints, logging.

The Lightning-equivalent loop (reference main.py:195-230 pl.Trainer;
code1/model.py:492-575 training_step, 607-758 validation_step,
578-604 validation_epoch_end):

  * one "step" = one scene sample + `train_ray_num` randomly chosen rays
    (reference model.py:537 ``torch.argsort(torch.rand(...))[:1024]``);
  * validation renders each val sample in `train_ray_num` chunks, logs
    mse/l1/PSNR, averages across samples (model.py:677-726, 578-604);
  * checkpoints monitor `val/loss_depth_fine`, keep top-15 (main.py:197-203);
  * host-side prefetch thread pool replaces the 12 DataLoader workers
    (main.py:107).
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.convert import scene_inputs_from_sample
from ..models.uforecon import UFORecon
from ..utils.logging import Log, MetricWriter
from ..utils.metrics import psnr
from .checkpoint import CheckpointManager
from .trainer import (TrainState, create_train_state, make_apply_step,
                      make_grad_step, make_optimizer, make_val_step)

PKG_DATA = os.path.join(os.path.dirname(__file__), "..", "data", "dtu")


def default_split_paths() -> Dict[str, str]:
    return {
        "train": os.path.join(PKG_DATA, "lists", "train.txt"),
        "test": os.path.join(PKG_DATA, "lists", "test.txt"),
        "pair": os.path.join(PKG_DATA, "dtu_pairs.txt"),
    }


def make_train_val_datasets(cfg: Config):
    from ..data.dtu_train import MVSDataset

    paths = default_split_paths()
    if cfg.train_list:
        paths["train"] = cfg.train_list
    if cfg.val_list:
        paths["test"] = cfg.val_list
    if cfg.pair_file:
        paths["pair"] = cfg.pair_file
    train_ds = MVSDataset(
        root_dir=cfg.root_dir, split="train", split_filepath=paths["train"],
        pair_filepath=paths["pair"], n_views=cfg.train_n_view,
        view_selection_type=cfg.view_selection_type, ndepths=cfg.numdepth,
        seed=cfg.seed,
    )
    val_ds = MVSDataset(
        root_dir=cfg.root_dir, split="test", split_filepath=paths["test"],
        pair_filepath=paths["pair"], n_views=cfg.test_n_view,
        test_ref_views=list(cfg.test_ref_view),
        view_selection_type="best", ndepths=cfg.numdepth, seed=cfg.seed,
    )
    return train_ds, val_ds


def _prefetch(dataset, order, n_workers: int = 8, lookahead: int = 4) -> Iterator:
    """Background sample loading — the DataLoader-workers equivalent."""
    if n_workers <= 0:
        for i in order:
            yield dataset[i]
        return
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        order = list(order)
        futures = [pool.submit(dataset.__getitem__, i)
                   for i in order[:lookahead]]
        nxt = lookahead
        for _ in order:
            fut = futures.pop(0)
            if nxt < len(order):
                futures.append(pool.submit(dataset.__getitem__, order[nxt]))
                nxt += 1
            yield fut.result()


def _gather_ray_batch(extras: Dict, ray_idx: np.ndarray):
    """Gather per-ray gt rgb/depth for the chosen ray indices
    (reference model.py:403-414)."""
    h, w = extras["hw"]
    rgb_gt = extras["ref_img"].reshape(h * w, 3)[ray_idx]
    if extras.get("depths_h") is not None:
        depth_gt = extras["depths_h"][0].reshape(h * w)[ray_idx]
    else:
        depth_gt = np.zeros(len(ray_idx), np.float32)
    ray_d = extras["ray_d"][ray_idx]
    return (ray_d.astype(np.float32), rgb_gt.astype(np.float32),
            depth_gt.astype(np.float32))


def init_model(cfg: Config, sample, seed: int = 0):
    """Initialize (or restore) model variables from one data sample.

    init MUST be jitted: eager flax init executes thousands of small ops
    one-by-one, and on a remote/tunneled TPU each pays a round-trip —
    minutes instead of seconds.
    """
    model = UFORecon(cfg)
    scene, extras = scene_inputs_from_sample(sample)
    key = jax.random.PRNGKey(seed)
    variables = jax.jit(model.init)(
        key, scene, jnp.asarray(extras["ray_d"][:64]), key)
    return model, variables


def run_validation(cfg: Config, model, state, val_ds, val_step,
                   max_samples: Optional[int] = None) -> Dict[str, float]:
    """Chunked validation over the val set (model.py:607-726)."""
    agg: Dict[str, list] = {}
    n = len(val_ds) if max_samples is None else min(max_samples, len(val_ds))
    key = jax.random.PRNGKey(cfg.seed + 7)
    for i in range(n):
        sample = val_ds[i]
        scene, extras = scene_inputs_from_sample(sample)
        h, w = extras["hw"]
        total = h * w
        rn = cfg.train_ray_num
        # fixed chunking; pad final chunk by wrapping (stats-neutral)
        idx_all = np.arange(total)
        rgbs, depths, logs_all = [], [], []
        n_chunks = 0
        for s in range(0, total, rn):
            idx = idx_all[s:s + rn]
            if len(idx) < rn:
                idx = np.concatenate([idx, idx_all[: rn - len(idx)]])
            ray_d, rgb_gt, depth_gt = _gather_ray_batch(extras, idx)
            key, sub = jax.random.split(key)
            logs, rgb_f, depth_f = val_step(
                state.params, state.batch_stats, scene, jnp.asarray(ray_d),
                jnp.asarray(rgb_gt), jnp.asarray(depth_gt), sub)
            # keep everything on device until the image is assembled — a
            # host fetch per chunk costs ~0.6s of round-trip on remote TPUs,
            # and eager per-chunk adds each pay full dispatch overhead
            rgbs.append(rgb_f)
            depths.append(depth_f)
            logs_all.append(logs)
            n_chunks += 1
        sums = jax.jit(
            lambda ls: {k: jnp.sum(jnp.stack([l[k] for l in ls]))
                        for k in ls[0]})(logs_all)
        logs_sum = {k: float(v) for k, v in jax.device_get(sums).items()}
        rgb_img = np.concatenate([np.asarray(r) for r in rgbs])[:total].reshape(h, w, 3)
        gt_img = extras["ref_img"].reshape(h, w, 3)
        p = float(psnr(jnp.asarray(rgb_img), jnp.asarray(gt_img)))
        rec = {k.replace("train/", "val/loss_"): v / n_chunks
               for k, v in logs_sum.items()}
        rec["val/psnr_fine"] = p
        for k, v in rec.items():
            agg.setdefault(k, []).append(v)
    out = {k: float(np.mean(v)) for k, v in agg.items()}
    # reference monitor name (main.py:199)
    if "val/loss_depth_ray_fine" in out:
        out["val/loss_depth_fine"] = out["val/loss_depth_ray_fine"]
    return out


def pretrain_mvs(cfg: Config, train_ds=None, variables=None,
                 max_steps: Optional[int] = None, log_every: int = 20,
                 n_workers: int = 8) -> TrainState:
    """Train the cascade matcher on GT depth (TransMVSNet-style entropy
    loss over the rot-0 pass). The reference relies on a pretrained
    TransMVSNet checkpoint absent from the snapshot; this produces one.
    """
    import optax

    from .trainer import make_mvs_pretrain_step

    if train_ds is None:
        train_ds, _ = make_train_val_datasets(cfg)
    rng_np = np.random.default_rng(cfg.seed)
    if variables is None:
        Log.info("initializing model (mvs pretraining)...")
        model, variables = init_model(cfg, train_ds[0], cfg.seed)
    else:
        model = UFORecon(cfg)

    tx = optax.adam(cfg.uforecon_lr)
    state = create_train_state(cfg, variables)
    state = state._replace(opt_state=tx.init(state.params))
    step_fn = make_mvs_pretrain_step(cfg, model, tx)

    logdir = os.path.join(cfg.logdir, cfg.exp_name + "_mvs")
    writer = MetricWriter(logdir)
    ckpt = CheckpointManager(os.path.join(logdir, "ckpt"), monitor="mvs/loss")

    total = max_steps or cfg.max_epochs * len(train_ds)
    key = jax.random.PRNGKey(cfg.seed)
    step = 0
    while step < total:
        order = rng_np.permutation(len(train_ds))
        for sample in _prefetch(train_ds, order, n_workers=n_workers):
            scene, extras = scene_inputs_from_sample(sample)
            if extras.get("depths_mm") is not None:
                # raw mm gt of the MVS-reference view (source view 0 =
                # stacked view index 1 at train start_idx=1)
                d = extras["depths_mm"]
                depth_mm = jnp.asarray(d[1 if d.shape[0] > 1 else 0])
            elif extras.get("depths_h") is not None:
                depth_mm = jnp.asarray(
                    extras["depths_h"][1 if extras["depths_h"].shape[0] > 1 else 0]
                    / max(float(scene.scale_factor), 1e-9))
            else:
                continue
            mask = (depth_mm > 0).astype(jnp.float32)
            key, sub = jax.random.split(key)
            state, logs = step_fn(state, scene, depth_mm, mask, sub)
            step += 1
            if step % log_every == 0 or step == 1:
                vals = {k: float(v) for k, v in logs.items()}
                writer.scalars(step, vals)
                Log.info(f"mvs step {step}/{total} loss={vals['mvs/loss']:.4f}")
            if step >= total:
                break
        ckpt.save(step, state._asdict(),
                  {"mvs/loss": float(logs["mvs/loss"])})
    writer.close()
    return state


def _maybe_restore(state: TrainState, load_ckpt: str) -> TrainState:
    """Restore params/batch_stats from --load_ckpt into a TrainState."""
    if not load_ckpt:
        return state
    from .checkpoint import load_eval_variables

    v = load_eval_variables(load_ckpt)
    state = state._replace(params=v["params"],
                           batch_stats=v.get("batch_stats",
                                             state.batch_stats))
    Log.info(f"restored params from {load_ckpt}")
    return state


def validate_only(cfg: Config, val_ds=None, variables=None) -> dict:
    """Run one validation pass without training (reference main.py:222-224
    ``--val_only`` -> trainer.validate). Returns the metric dict."""
    if val_ds is None:
        _, val_ds = make_train_val_datasets(cfg)
    if variables is None:
        model, variables = init_model(cfg, val_ds[0], cfg.seed)
    else:
        model = UFORecon(cfg)
    state = _maybe_restore(create_train_state(cfg, variables), cfg.load_ckpt)
    val_step = make_val_step(cfg, model)
    metrics = run_validation(cfg, model, state, val_ds, val_step,
                             max_samples=1 if cfg.debug else None)
    Log.ok("val: " + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
    return metrics


def fit(cfg: Config, train_ds=None, val_ds=None, variables=None,
        max_steps: Optional[int] = None, val_every: Optional[int] = None,
        log_every: int = 20, n_workers: int = 8) -> TrainState:
    """Train UFORecon-TPU; returns the final TrainState.

    `max_steps`/`val_every` override the epoch structure for smoke tests;
    by default one epoch = one pass over train_ds and validation runs at
    each epoch end (check_val_every_n_epoch=1, reference main.py:210).
    """
    if train_ds is None or val_ds is None:
        tds, vds = make_train_val_datasets(cfg)
        train_ds = train_ds or tds
        val_ds = val_ds or vds

    rng_np = np.random.default_rng(cfg.seed)
    if variables is None:
        Log.info("initializing model from first sample...")
        model, variables = init_model(cfg, train_ds[0], cfg.seed)
    else:
        model = UFORecon(cfg)

    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables)
    grad_step = make_grad_step(cfg, model)
    apply_step = make_apply_step(tx)
    accum_add = jax.jit(
        lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))
    val_step = make_val_step(cfg, model)

    logdir = os.path.join(cfg.logdir, cfg.exp_name)
    writer = MetricWriter(logdir)
    ckpt = CheckpointManager(os.path.join(logdir, "ckpt"))

    state = _maybe_restore(state, cfg.load_ckpt)

    # multi-chip data/ray parallelism: params replicated, the ray axis
    # sharded over the mesh; XLA inserts the psum gradient reductions
    # (SURVEY.md §2.8 — an addition the reference never had).
    from ..parallel.sharding import make_mesh, replicate, shard_rays

    n_dev = int(np.prod(cfg.mesh_shape))
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    rn = -(-cfg.train_ray_num // max(n_dev, 1)) * max(n_dev, 1)
    if mesh is not None:
        state = replicate(mesh, state)

    def put_rays(ray_d, rgb_gt, depth_gt):
        t = map(jnp.asarray, (ray_d, rgb_gt, depth_gt))
        if mesh is None:
            return tuple(t)
        return tuple(shard_rays(mesh, a) for a in t)

    key = jax.random.PRNGKey(cfg.seed)
    step = 0
    batch = max(1, cfg.batch_size)
    steps_per_epoch = max(1, len(train_ds) // batch)
    total_steps = max_steps or cfg.max_epochs * steps_per_epoch

    epoch = 0
    grads_sum, logs_sum, n_acc = None, None, 0
    while step < total_steps:
        order = rng_np.permutation(len(train_ds))
        if max_steps:
            # n_acc scenes already accumulated toward the next optimizer
            # step carry over from the previous epoch — don't re-count them
            order = order[: (max_steps - step) * batch - n_acc]
        for sample in _prefetch(train_ds, order, n_workers=n_workers):
            scene, extras = scene_inputs_from_sample(sample)
            if mesh is not None:
                scene = replicate(mesh, scene)
            h, w = extras["hw"]
            ray_idx = rng_np.permutation(h * w)[:rn]
            ray_d, rgb_gt, depth_gt = put_rays(
                *_gather_ray_batch(extras, ray_idx))
            key, sub = jax.random.split(key)
            grads, logs = grad_step(state, scene, ray_d, rgb_gt, depth_gt, sub)
            grads_sum = grads if grads_sum is None else accum_add(grads_sum, grads)
            logs_sum = logs if logs_sum is None else accum_add(logs_sum, logs)
            n_acc += 1
            if n_acc < batch:
                continue  # keep accumulating this optimizer step's batch
            state = apply_step(state, grads_sum, float(n_acc))
            logs = {k: v / n_acc for k, v in logs_sum.items()}
            grads_sum, logs_sum, n_acc = None, None, 0
            step += 1
            if step % log_every == 0 or step == 1:
                vals = {k: float(v) for k, v in logs.items()}
                writer.scalars(step, vals)
                Log.info(f"step {step}/{total_steps} "
                         f"loss={vals.get('train/loss_all', 0):.4f}")
            if val_every and step % val_every == 0:
                metrics = run_validation(cfg, model, state, val_ds, val_step,
                                         max_samples=1 if cfg.debug else None)
                writer.scalars(step, metrics)
                ckpt.save(step, state._asdict(), metrics)
            if step >= total_steps:
                break
        epoch += 1
        if not val_every and step <= total_steps:
            metrics = run_validation(cfg, model, state, val_ds, val_step)
            writer.scalars(step, metrics)
            ckpt.save(step, state._asdict(), metrics)
            Log.ok(f"epoch {epoch}: "
                   + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
    writer.close()
    return state
