"""Device-mesh construction helpers.

Axes:
  data — cameras per step (gradient all-reduce over this axis)
  tile — image-tile sharding inside one render (compositor rows)

On a v5e slice both axes ride ICI; across hosts the data axis should be
outermost so the all-reduce crosses DCN once per step.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, tile: int = 1,
              devices: list | None = None) -> Mesh:
    """Create a (data, tile) mesh over the first data*tile devices."""
    devices = devices if devices is not None else jax.devices()
    n = data * tile
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, tile)
    return Mesh(arr, axis_names=("data", "tile"))
