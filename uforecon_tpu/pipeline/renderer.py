"""Full-image rendering pipeline: encode once, render all rays under one jit.

Replaces the reference's host-side chunk loop
(reference: code1/model.py:814 ``for ray_idx in torch.split(...)`` — 640
sequential 800-ray kernel launches per view) with a single compiled program:
rays are padded to a multiple of (devices x chunk), sharded over the mesh
'rays' axis with shard_map, and each device scans its chunks with lax.map.
The encoder outputs are replicated; rendering needs no collectives.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.uforecon import EncoderOutputs, SceneInputs, UFORecon
from ..parallel.sharding import make_mesh, pad_to_multiple


class SceneRenderer:
    """Stateful wrapper holding jitted encode / render programs."""

    def __init__(self, cfg: Config, variables, mesh: Optional[Mesh] = None,
                 chunk: Optional[int] = None):
        self.cfg = cfg
        self.model = UFORecon(cfg)
        self.variables = variables
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.n_dev = self.mesh.devices.size
        # pad the reference's 800-ray chunks up to a TPU-friendly multiple.
        # Default 512 since the round-5 merged-volume default shrank the
        # per-chunk working set (on-chip sweep at 800x640/64+64: 256 ->
        # 33.0k, 512 -> 36.6k, 768 -> 34.8k, 1024 -> 35.5k, 2048 -> 34.3k
        # rays/s); the exact per-stage path measured best at 1024
        # (round-1/2 sweeps) — pass chunk= explicitly to override.
        if chunk is not None:
            self.chunk = chunk
        else:
            base = 512 if cfg.volume_merge != "never" else 1024
            self.chunk = max(base, int(np.ceil(cfg.test_ray_num / 256)) * 256)
        self._encode = jax.jit(
            lambda v, s: self.model.apply(v, s, method=self.model.encode)
        )
        # per-signature cache of compiled render programs, keyed by
        # (padded ray count, coarse_only) — alternating full renders and
        # val chunks must not recompile each other away
        self._render_fns: Dict[Tuple[int, bool], object] = {}

    # ------------------------------------------------------------------
    def encode(self, scene: SceneInputs) -> EncoderOutputs:
        return self._encode(self.variables, scene)

    # ------------------------------------------------------------------
    def _build_render(self, n_rays_padded: int, coarse_only: bool,
                      volume_brick=None):
        """``volume_brick``: Optional (dims dict, stage order) — static
        brick dims baked into the program; per-chunk certification flags
        flow in as data (see render_rays)."""
        cfg = self.cfg
        model = self.model
        chunk = self.chunk
        mesh = self.mesh
        per_dev = n_rays_padded // self.n_dev
        assert per_dev % chunk == 0
        dims, stages = volume_brick if volume_brick is not None else (None, ())

        def render_local(variables, scene, enc, ray_d, near, far, flags,
                         origins, key):
            """Render this device's rays: lax.map over chunks."""
            n_local = ray_d.shape[0]
            n_chunks = n_local // chunk
            rd = ray_d.reshape(n_chunks, chunk, 3)
            nr = near.reshape(n_chunks, chunk)
            fr = far.reshape(n_chunks, chunk)
            fl = flags.reshape(n_chunks, -1)
            org = origins.reshape((n_chunks,) + origins.shape[1:])
            keys = jax.random.split(key, n_chunks)

            def one(args):
                rd_c, nr_c, fr_c, fl_c, org_c, k = args
                brick_flags = brick_origins = None
                if dims is not None:
                    brick_flags = {s: fl_c[i] for i, s in enumerate(stages)}
                    brick_origins = {s: org_c[i]
                                     for i, s in enumerate(stages)}
                out = model.apply(
                    variables, scene, enc, rd_c, k,
                    near_per_ray=nr_c, far_per_ray=fr_c,
                    coarse_only=coarse_only,
                    volume_brick=dims,
                    brick_origins=brick_origins,
                    brick_flags=brick_flags,
                    method=model.render_chunk,
                )
                f = out["fine"]
                return f["rgb"], f["depth"], f["opacity"]

            rgb, depth, opacity = jax.lax.map(one, (rd, nr, fr, fl, org, keys))
            return (
                rgb.reshape(n_local, 3),
                depth.reshape(n_local),
                opacity.reshape(n_local),
            )

        if self.n_dev == 1:
            fn = render_local
        else:
            from jax import shard_map

            fn = shard_map(
                render_local,
                mesh=mesh,
                in_specs=(P(), P(), P(), P("rays"), P("rays"), P("rays"),
                          P("rays"), P("rays"), P()),
                out_specs=(P("rays"), P("rays"), P("rays")),
                check_vma=False,
            )
        return jax.jit(fn)

    # ------------------------------------------------------------------
    def render_rays(
        self,
        scene: SceneInputs,
        enc: EncoderOutputs,
        ray_d: np.ndarray,                  # (N, 3)
        near: np.ndarray,                   # (N,)
        far: np.ndarray,                    # (N,)
        key: jax.Array,
        coarse_only: bool = False,
        volume_brick=None,                  # Optional[BrickPlan]
        fetch: bool = True,
    ) -> Dict[str, np.ndarray]:
        n = ray_d.shape[0]
        mult = self.chunk * self.n_dev
        ray_d_p, _ = pad_to_multiple(np.asarray(ray_d), mult)
        near_p, _ = pad_to_multiple(np.asarray(near), mult)
        far_p, _ = pad_to_multiple(np.asarray(far), mult)
        n_chunks = ray_d_p.shape[0] // self.chunk

        plan = volume_brick
        if plan is not None:
            stages = tuple(plan.dims.keys())
            # the plan's flags/origins are indexed from tile 0: callers must
            # pass the FULL tile-major ray set the plan was built for, not a
            # sub-band (which would silently misalign tiles)
            n_plan_tiles = plan.flags[stages[0]].shape[0]
            assert n == n_plan_tiles * plan.tile * plan.tile, (
                f"render_rays with a BrickPlan needs all {n_plan_tiles} "
                f"tiles' rays ({n_plan_tiles * plan.tile * plan.tile}) in "
                f"tile-major order, got {n}")
            static = (plan.dims, stages)
            # per-chunk certification: a chunk bricks a stage only if every
            # tile it contains is certified for that stage's dims; padded
            # tail chunks go flat
            tpc = self.chunk // (plan.tile * plan.tile)
            flags = np.zeros((n_chunks, len(stages)), bool)
            s0 = plan.origins[stages[0]]
            nv = s0.shape[2]
            origins = np.zeros(
                (n_chunks, len(stages), tpc, plan.n_seg, nv, 3), np.int32)
            for i, s in enumerate(stages):
                tf = plan.flags[s]
                full = tf.size // tpc
                cf = tf[: full * tpc].reshape(full, tpc).all(axis=1)
                flags[:full, i] = cf[:n_chunks]
                og = plan.origins[s][: full * tpc].reshape(
                    full, tpc, plan.n_seg, nv, 3)
                origins[:full, i] = og[:n_chunks]
            brick_key = plan.signature()
        else:
            static = None
            flags = np.zeros((n_chunks, 1), bool)
            origins = np.zeros((n_chunks, 1), np.int32)
            brick_key = None
        sig = (ray_d_p.shape[0], coarse_only, brick_key)
        fn = self._render_fns.get(sig)
        if fn is None:
            fn = self._render_fns[sig] = self._build_render(
                ray_d_p.shape[0], coarse_only, static)

        rgb, depth, opacity = fn(
            self.variables, scene, enc,
            jnp.asarray(ray_d_p), jnp.asarray(near_p), jnp.asarray(far_p),
            jnp.asarray(flags), jnp.asarray(origins), key,
        )
        if not fetch:
            # async dispatch: leave the outputs on device so the caller can
            # enqueue the NEXT view's work before paying the host fetch
            # (tunnel downloads run 13-30 MB/s; the ~10 MB of full-image
            # outputs cost real wall time that overlap hides)
            return {"rgb": rgb, "depth": depth, "opacity": opacity, "_n": n}
        return {
            "rgb": np.asarray(rgb)[:n],
            "depth": np.asarray(depth)[:n],
            "opacity": np.asarray(opacity)[:n],
        }

    # ------------------------------------------------------------------
    def _plan_bricks(self, scene, enc, ray_d, near, far, hw):
        """BrickPlan for tile-local volume gathers, or None.

        None (fall back to flat gathers) when: the knob is off, not on TPU,
        no correlation volumes, the image does not tile evenly, the chunk is
        not whole tiles, or the host planner cannot certify enough tiles
        (see ops/brick_plan.py).
        """
        cfg = self.cfg
        h, w = hw
        tile = cfg.brick_tile
        if (cfg.volume_brick != "auto" or jax.default_backend() != "tpu"
                or not enc.volumes or h % tile or w % tile
                or self.chunk % (tile * tile)):
            return None
        from ..ops.brick_plan import plan_volume_bricks

        stage_shapes = {k: tuple(v.shape[1:4]) for k, v in enc.volumes.items()}
        # the coarse SN this renderer will sample (render_chunk's rule):
        # the planner widens its slab surfaces to the sampler's real
        # +-0.5/(SN-1) jitter support so certification covers production
        n_coarse = (cfg.test_sample_coarse if cfg.extract_geometry
                    else cfg.coarse_sample)
        if n_coarse % cfg.brick_n_seg:
            return None
        return plan_volume_bricks(
            np.asarray(scene.source_poses), float(scene.near),
            float(scene.far), np.asarray(scene.ray_o),
            np.asarray(ray_d).reshape(h, w, 3),
            np.asarray(near).reshape(h, w), np.asarray(far).reshape(h, w),
            tile, stage_shapes, n_seg=cfg.brick_n_seg, point_num=n_coarse,
            # the mxu kernel reads the raw corner-(0,0,0) block, so base+1
            # must lie inside the brick — one extra voxel of high-side
            # margin beyond the gather kernel's needs (brick_gather.py)
            margin=3 if cfg.brick_kernel == "mxu" else 2,
        )

    # ------------------------------------------------------------------
    def render_depth_view(self, scene: SceneInputs, extras: Dict,
                          key: jax.Array) -> Dict[str, np.ndarray]:
        """Render a full depth map + rgb for one view (extract_geometry path).

        Reproduces the reference conventions (model.py:814-826): per-ray
        near/far divided by the camera-frame ray z (ray distance -> z-depth
        bounds), rendered ray distance converted back to z-depth and scaled
        to millimetres by scale_mat[0, 0].
        """
        return self.finalize_depth_view(
            self.render_depth_view_async(scene, extras, key))

    def render_depth_view_async(self, scene: SceneInputs, extras: Dict,
                                key: jax.Array) -> Dict:
        """Dispatch one view's encode + render WITHOUT fetching (VERDICT r4
        #6 overlap): returns a handle for :meth:`finalize_depth_view`.

        The device queue serializes programs, but dispatching view k+1
        before fetching view k lets view k's host tail (the ~10 MB tunnel
        download + numpy conversions + file writes in the extract loop)
        run while k+1 executes on device. Same math as render_depth_view.
        """
        enc = self.encode(scene)
        ray_d = np.asarray(extras["ray_d"])
        cam_rd = np.asarray(extras["cam_ray_d"])
        n = ray_d.shape[0]
        near = np.full(n, float(scene.near), np.float32) / cam_rd[:, 2]
        far = np.full(n, float(scene.far), np.float32) / cam_rd[:, 2]
        h, w = extras["hw"]

        plan = self._plan_bricks(scene, enc, ray_d, near, far, (h, w))
        inv = None
        if plan is not None:
            from ..ops.brick_plan import tile_order
            perm, inv = tile_order(h, w, self.cfg.brick_tile)
            ray_d, near, far = ray_d[perm], near[perm], far[perm]

        out = self.render_rays(scene, enc, ray_d, near, far, key,
                               coarse_only=self.cfg.test_coarse_only,
                               volume_brick=plan, fetch=False)
        return {"out": out, "inv": inv, "cam_rd": cam_rd, "hw": (h, w),
                "scale": extras["scale_mat"][0, 0]}

    def finalize_depth_view(self, handle: Dict) -> Dict[str, np.ndarray]:
        """Fetch + convert a render_depth_view_async handle (host side)."""
        out = handle["out"]
        n = out["_n"]
        fetched = {k: np.asarray(out[k])[:n]
                   for k in ("rgb", "depth", "opacity")}
        if handle["inv"] is not None:
            fetched = {k: v[handle["inv"]] for k, v in fetched.items()}
        h, w = handle["hw"]
        cam_rd = handle["cam_rd"]
        depth_mm = fetched["depth"] * cam_rd[:, 2] * handle["scale"]
        return {
            "depth": depth_mm.reshape(h, w),
            "rgb": fetched["rgb"].reshape(h, w, 3),
            "opacity": fetched["opacity"].reshape(h, w),
        }
