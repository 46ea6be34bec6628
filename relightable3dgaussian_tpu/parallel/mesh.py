"""Device-mesh construction helpers (single-host and multi-host).

Axes:
  data — cameras per step (gradient all-reduce over this axis)
  tile — image-tile / point sharding inside one render (compositor rows,
         instance routing)

On a v5e slice both axes ride ICI; across hosts the data axis must be
outermost so the per-step gradient all-reduce crosses DCN once while the
latency-sensitive instance all-to-all (`parallel.route`) stays inside a
host's ICI domain.  The reference has no distributed code at all
(SURVEY.md §2.7) — this layer is TPU-native design, not a port.
"""
from __future__ import annotations

import os

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


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize JAX's multi-host runtime (idempotent).

    On Cloud TPU pods the three arguments auto-detect from the metadata
    server; elsewhere (e.g. the CPU-simulated multi-process harness) pass
    them explicitly or via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID.  Returns this process's id.  Call BEFORE any other
    JAX API touches a backend.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is None or num_processes <= 1:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_index()


def make_mesh_multihost(data: int | None = None, tile: int = 1) -> Mesh:
    """DCN-aware (data, tile) mesh over ALL addressable processes.

    Layout: the data axis is factored as (hosts × per-host groups) and
    placed OUTERMOST, so slicing the device array host-major puts each
    host's devices in contiguous (data-subgroup, tile) blocks:

      * `psum`/`pmean` over "data" → hierarchical all-reduce, one DCN hop;
      * `all_to_all` over "tile" (instance routing) → pure ICI;
      * `all_gather` over "tile" (image reassembly) → pure ICI.

    `jax.experimental.mesh_utils.create_hybrid_device_mesh` handles the
    physical placement; we fall back to a plain mesh when there is a
    single process (CPU simulation, single host).
    """
    n = jax.device_count()
    if data is None:
        assert n % tile == 0, (n, tile)
        data = n // tile
    assert data * tile == n, (data, tile, n)

    nproc = jax.process_count()
    if nproc > 1 and data % nproc == 0:
        try:
            from jax.experimental import mesh_utils
            devs = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(data // nproc, tile),
                dcn_mesh_shape=(nproc, 1),
            )
            return Mesh(devs, axis_names=("data", "tile"))
        except ValueError:
            # No slice topology to group by (e.g. the CPU-simulated
            # multi-process harness, where every virtual device reports
            # slice 0) — build the host-major layout by hand: sort by
            # (process, id) and reshape (nproc, data/nproc, tile) so
            # each process's devices form contiguous data blocks and
            # the tile axis never crosses a process boundary.
            devs = sorted(jax.devices(),
                          key=lambda d: (d.process_index, d.id))
            arr = np.array(devs).reshape(data, tile)
            return Mesh(arr, axis_names=("data", "tile"))
    arr = np.array(jax.devices()[:n]).reshape(data, tile)
    return Mesh(arr, axis_names=("data", "tile"))
