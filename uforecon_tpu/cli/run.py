"""UFORecon-TPU entry point — reference-compatible CLI.

Mirrors the reference `main.py` dispatch (reference main.py:106-230):
  * default                → train on DTU (fit loop, checkpoints, TB logs)
  * --extract_geometry     → render depth maps for the fixed 15-scan DTU
                             protocol (main.py:150) or, with --test_general,
                             for --test_scan via GeneralFit
Flag names match the reference so the shipped scripts translate 1:1.
Installed as the ``uforecon`` console script; the repo-root ``main.py``
shim keeps the reference invocation ``python main.py ...`` working.
"""
import os
import sys

# DTU eval protocol scan list (reference main.py:150)
TEST_SCANS = [24, 37, 40, 55, 63, 65, 69, 83, 97, 105, 106, 110, 114, 118, 122]


def run_extract(cfg):
    import jax

    from uforecon_tpu.parallel.sharding import make_mesh
    from uforecon_tpu.pipeline.extract import extract_geometry_for_dataset
    from uforecon_tpu.pipeline.fit import init_model
    from uforecon_tpu.utils.logging import Log

    mesh = make_mesh(min(cfg.mesh_shape[0], len(jax.devices())))

    datasets = []
    if cfg.test_general:
        from uforecon_tpu.data.general_fit import GeneralFit

        datasets.append(GeneralFit(
            root_dir=cfg.root_dir, scan_id=cfg.test_scan,
            n_views=cfg.test_n_view, dataset=cfg.dataset,
            use_mask=cfg.use_mask, test_ref_view=list(cfg.test_ref_view) or None,
            img_wh=cfg.img_wh or None,
        ))
    else:
        from uforecon_tpu.data.dtu_test import DtuFitSparse

        scans = ([cfg.test_scan] if cfg.test_scan and cfg.test_scan != "scan1"
                 else [f"scan{s}" for s in TEST_SCANS])
        for scan in scans:
            kw = {"img_wh": list(cfg.img_wh)} if cfg.img_wh else {}
            datasets.append(DtuFitSparse(
                root_dir=cfg.root_dir, scan_id=scan,
                n_views=cfg.test_n_view, set=cfg.set,
                test_view_pair=list(cfg.test_ref_view), **kw,
            ))

    variables = None
    model = None
    for ds in datasets:
        if variables is None:
            from uforecon_tpu.models.uforecon import UFORecon
            model, variables = init_model(cfg, ds[0], cfg.seed)
            if cfg.load_ckpt:
                from uforecon_tpu.pipeline.checkpoint import load_eval_variables
                variables = load_eval_variables(cfg.load_ckpt)
                Log.info(f"loaded checkpoint {cfg.load_ckpt}")
            else:
                Log.warn("no --load_ckpt given: rendering with random weights")
        stats = extract_geometry_for_dataset(cfg, variables, ds, mesh=mesh,
                                             seed=cfg.seed)
        Log.ok(f"{getattr(ds, 'scan_id', cfg.test_scan)}: "
               f"{stats['views']} views, {stats['rays_per_sec']:.0f} rays/s")
        if cfg.extract_similarity:
            import numpy as np

            from uforecon_tpu.data.convert import scene_inputs_from_sample
            from uforecon_tpu.data.io import write_ply
            from uforecon_tpu.pipeline.extract import (
                extract_similarity_field, similarity_mesh)

            scene_in, _ = scene_inputs_from_sample(ds[0])
            field = extract_similarity_field(cfg, variables, scene_in,
                                             reso=cfg.sim_reso)
            verts, faces = similarity_mesh(field, threshold=cfg.sim_threshold)
            scan = getattr(ds, "scan_id", cfg.test_scan)
            out = os.path.join(cfg.out_dir, "similarity", f"{scan}.ply")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            write_ply(out, verts, faces=faces if len(faces) else None)
            Log.ok(f"similarity field -> {out} ({len(verts)} verts)")


def run_train(cfg):
    from uforecon_tpu.pipeline.fit import fit, validate_only

    if cfg.val_only:  # reference main.py:222 trainer.validate(...)
        validate_only(cfg)
    elif cfg.debug:  # smoke mode: a few steps, single worker (main.py:107)
        fit(cfg, max_steps=3, val_every=3, log_every=1, n_workers=1)
    else:
        fit(cfg)


def main(argv=None):
    from uforecon_tpu.config import config_from_args

    cfg = config_from_args(argv)
    if cfg.extract_geometry:
        run_extract(cfg)
    else:
        run_train(cfg)


if __name__ == "__main__":
    main()
