"""Checkpointing: orbax train state + reference-compatible PLY export.

The reference saves two formats (`SURVEY.md §5`): PLY point clouds with
the full attribute schema (`gaussian_model.py:630-686`) and torch.save
tuples with optimizer state (`train.py:200-213`).  Here: PLY via
`scene.ply` (binary-compatible with reference checkpoints) and the full
TrainState (params + Adam moments + step) via orbax.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from ..models import gaussians as G
from ..scene import ply as ply_io

_PARAM_KEYS = ["xyz", "normal", "shs_dc", "shs_rest", "opacity", "scaling",
               "rotation"]
_PBR_KEYS = ["base_color", "roughness", "metallic", "incidents_dc",
             "incidents_rest", "visibility_dc", "visibility_rest"]


def save_ply(path: str, state: G.GaussianState, use_pbr: bool | None = None
             ) -> int:
    """Write alive splats to a reference-schema PLY.  Returns the count."""
    p = state.params
    alive = np.asarray(state.alive)
    if use_pbr is None:
        use_pbr = p.base_color.shape[-1] > 0
    keys = _PARAM_KEYS + (_PBR_KEYS if use_pbr else [])
    arrays = {k: np.asarray(getattr(p, k))[alive] for k in keys}
    ply_io.save_gaussian_ply(path, arrays, use_pbr=use_pbr)
    return int(alive.sum())


def load_ply(path: str, capacity: int | None = None,
             use_pbr: bool | None = None) -> G.GaussianState:
    """Load a (reference or ours) Gaussian PLY into a padded state."""
    import jax.numpy as jnp
    arrays = ply_io.load_gaussian_ply(path)
    P = arrays["xyz"].shape[0]
    if capacity is None:
        capacity = int(-(-P // 256) * 256)
    has_pbr = "roughness" in arrays
    if use_pbr is None:
        use_pbr = has_pbr

    def pad(x):
        out = np.zeros((capacity,) + x.shape[1:], np.float32)
        out[:P] = x
        return jnp.asarray(out)

    zero = lambda *s: jnp.zeros((capacity,) + s)
    kwargs = {k: pad(arrays[k]) for k in _PARAM_KEYS}
    if use_pbr and has_pbr:
        kwargs.update({k: pad(arrays[k]) for k in _PBR_KEYS})
    elif use_pbr:
        kwargs.update(dict(
            base_color=zero(3), roughness=zero(1), metallic=zero(1),
            incidents_dc=zero(1, 3), incidents_rest=zero(15, 3),
            visibility_dc=zero(1, 1), visibility_rest=zero(15, 1)))
    else:
        kwargs.update(dict(
            base_color=zero(0), roughness=zero(0), metallic=zero(0),
            incidents_dc=zero(0, 3), incidents_rest=zero(0, 3),
            visibility_dc=zero(0, 1), visibility_rest=zero(0, 1)))
    params = G.GaussianParams(**kwargs)
    return G.GaussianState(
        params=params,
        alive=jnp.asarray(np.arange(capacity) < P),
        xyz_grad_accum=jnp.zeros(capacity),
        normal_grad_accum=jnp.zeros(capacity),
        denom=jnp.zeros(capacity),
        max_radii2d=jnp.zeros(capacity, jnp.int32))


def _mask_empty(tree: Any) -> Any:
    """Replace zero-size leaves (non-PBR placeholder attrs) with a tiny
    sentinel — orbax refuses to serialize empty arrays."""
    def fix(x):
        if hasattr(x, "size") and x.size == 0:
            return np.zeros(1, np.float32)
        return x
    return jax.tree.map(fix, tree)


def save_train_state(path: str, train_state: Any) -> None:
    """Persist a full TrainState (params + optimizer moments + step)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _mask_empty(jax.device_get(train_state)), force=True)


def load_train_state(path: str, template: Any) -> Any:
    """Restore a TrainState saved by `save_train_state`.

    Args:
      template: a TrainState with the right structure/shapes (e.g. a
        freshly initialized one) used as the restore target.
    """
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        item=_mask_empty(jax.device_get(template)))
    # put the template's zero-size leaves back
    return jax.tree.map(
        lambda t, r: t if hasattr(t, "size") and t.size == 0 else r,
        jax.device_get(template), restored)


# --- elastic training snapshots -------------------------------------
# Failure/preemption recovery (SURVEY §5): the driver saves the FULL
# TrainState (params + Adam moments + step) at intervals and can resume
# from the latest one — the reference only offers torch.save tuples
# loaded by an explicit --checkpoint path (train.py:200-213); here
# `--resume` finds the newest snapshot automatically and training
# continues with the schedule (densify window, SH warmup) intact.

_SNAP_PREFIX = "snap_"


def save_train_snapshot(model_dir: str, step: int, train_state: Any,
                        keep: int = 2) -> str:
    """Write `<model_dir>/snapshots/snap_<step>`; prune to `keep` newest."""
    root = os.path.join(os.path.abspath(model_dir), "snapshots")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"{_SNAP_PREFIX}{step}")
    save_train_state(path, train_state)
    snaps = sorted(
        (int(d[len(_SNAP_PREFIX):]) for d in os.listdir(root)
         if d.startswith(_SNAP_PREFIX)), reverse=True)
    for old in snaps[keep:]:
        import shutil
        shutil.rmtree(os.path.join(root, f"{_SNAP_PREFIX}{old}"),
                      ignore_errors=True)
    return path


def latest_train_snapshot(model_dir: str) -> tuple[int, str] | None:
    """(step, path) of the newest snapshot under model_dir, or None."""
    root = os.path.join(os.path.abspath(model_dir), "snapshots")
    if not os.path.isdir(root):
        return None
    steps = [int(d[len(_SNAP_PREFIX):]) for d in os.listdir(root)
             if d.startswith(_SNAP_PREFIX)]
    if not steps:
        return None
    step = max(steps)
    return step, os.path.join(root, f"{_SNAP_PREFIX}{step}")
