"""Orbax checkpointing with reference-equivalent retention semantics.

Replaces Lightning's ModelCheckpoint (reference main.py:197-203):
monitor `val/loss_depth_fine`, mode=min, save_top_k=15, plus
load-from-checkpoint for eval (reference main.py:186-188). Checkpoints are
orbax PyTree directories under `{logdir}/ckpt/step_{N}`; a small JSON index
tracks the monitored metric so retention/best-selection survives restarts.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, monitor: str = "val/loss_depth_fine",
                 mode: str = "min", save_top_k: int = 15):
        import orbax.checkpoint as ocp

        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.top_k = save_top_k
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = os.path.join(self.dir, "index.json")
        self._index: Dict[str, Dict] = {}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    # ------------------------------------------------------------------
    def _flush_index(self) -> None:
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"step_{step}")

    def _score(self, rec: Dict) -> float:
        v = rec.get("metric")
        if v is None:
            return float("inf") if self.mode == "min" else float("-inf")
        return v if self.mode == "min" else -v

    # ------------------------------------------------------------------
    def save(self, step: int, state: Any,
             metrics: Optional[Dict[str, float]] = None) -> str:
        """Save `state` (any pytree) and retain only the top-k by monitor."""
        path = self._path(step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, jax.device_get(state))
        self._ckptr.wait_until_finished()
        metric = None
        if metrics and self.monitor in metrics:
            metric = float(metrics[self.monitor])
        self._index[str(step)] = {"metric": metric,
                                  "metrics": {k: float(v) for k, v in (metrics or {}).items()}}
        # retention: keep top_k by score, but never drop the latest step
        steps = sorted(self._index, key=int)
        latest = steps[-1]
        ranked = sorted(steps, key=lambda s: self._score(self._index[s]))
        keep = set(ranked[: self.top_k]) | {latest}
        for s in steps:
            if s not in keep:
                p = self._path(int(s))
                if os.path.exists(p):
                    shutil.rmtree(p)
                del self._index[s]
        self._flush_index()
        return path

    # ------------------------------------------------------------------
    def best_step(self) -> Optional[int]:
        scored = [s for s in self._index if self._index[s].get("metric") is not None]
        if not scored:
            return int(max(self._index, key=int)) if self._index else None
        return int(min(scored, key=lambda s: self._score(self._index[s])))

    def latest_step(self) -> Optional[int]:
        present = [s for s in self._index if os.path.exists(self._path(int(s)))]
        return int(max(present, key=int)) if present else None

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        """Restore a checkpoint pytree; `target` supplies structure/dtypes."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        path = self._path(step)
        if target is not None:
            return self._ckptr.restore(path, target=jax.device_get(target))
        return self._ckptr.restore(path)


def save_params(path: str, params: Any) -> None:
    """One-shot pytree save (no retention) for tools and tests."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(params))
    ckptr.wait_until_finished()


def load_params(path: str, target: Any = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=jax.device_get(target))
    return ckptr.restore(os.path.abspath(path))


def load_eval_variables(path: str) -> Dict[str, Any]:
    """Load a checkpoint for inference, accepting either a bare params tree
    or a full TrainState dict (as written by the fit loop). Returns flax
    `variables` ({"params": ..., "batch_stats": ...})."""
    restored = load_params(path)
    if isinstance(restored, dict) and "params" in restored:
        out = {"params": restored["params"]}
        if restored.get("batch_stats"):
            out["batch_stats"] = restored["batch_stats"]
        return out
    return {"params": restored}
