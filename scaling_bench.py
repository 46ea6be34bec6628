"""Scaling harness: Mpix/s and rays/s across 1→N devices.

Measures the BASELINE.md scaling gate (≥85% efficiency 1 chip → N) in
one command.  Runs today on the virtual CPU mesh
(`--platform cpu --devices 1,2,4,8` forces
`xla_force_host_platform_device_count`) and unchanged on real hardware
(`--platform tpu` on a pod slice; add `--multihost` to call
`jax.distributed.initialize` first — see `parallel.mesh`).

Modes (renderer analogues of DP/SP/TP — SURVEY.md §2.7):
  dp    camera-batch data parallel, gradients pmean'd
  tile  tile-sharded compositor inside one render (SP/CP analogue)
  tp    Gaussian-sharded params + instance all-to-all re-shard + sharded
        compositor (`parallel.route`)
  rays  visibility ray tracing sharded over rays (embarrassingly
        parallel; the BVH-replacement dense tracer)

Each (mode, N) prints one JSON line with global throughput and
efficiency vs the same mode at N=1.  The reference has no distributed
code at all; these numbers have no CUDA analogue to compare against —
the gate is the 85% self-scaling target.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma list of device counts to sweep")
    ap.add_argument("--modes", default="dp,tile,tp,rays")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() before anything")
    ap.add_argument("--local_devices", type=int, default=None,
                    help="virtual CPU devices in THIS process (multihost "
                         "simulation: processes x local_devices = global; "
                         "default max(--devices))")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--splats", type=int, default=8192)
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    return ap.parse_args()


def _time_steps(fn, args, steps, warmup, block, rebind=None):
    """rebind(args, out) -> args threads donated buffers (train state)
    from one step into the next."""
    import jax
    for _ in range(warmup):
        out = fn(*args)
        if rebind:
            args = rebind(args, out)
    jax.block_until_ready(block(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
        if rebind:
            args = rebind(args, out)
    jax.block_until_ready(block(out))
    return (time.perf_counter() - t0) / steps, out


def _mesh(data, tile):
    """Plain mesh single-process; DCN-aware hybrid mesh when the run
    spans processes and uses every global device (exercises
    `parallel.mesh.make_mesh_multihost`'s host-major data placement)."""
    import jax
    from relightable3dgaussian_tpu.parallel.mesh import (
        make_mesh, make_mesh_multihost)
    if jax.process_count() > 1 and data * tile == jax.device_count():
        return make_mesh_multihost(data=data, tile=tile)
    return make_mesh(data=data, tile=tile)


def bench_dp_tile(mode, n, a):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from relightable3dgaussian_tpu.models import render as R
    from relightable3dgaussian_tpu.training import optimizer as O
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.parallel import train as ptrain
    from relightable3dgaussian_tpu.parallel.mesh import make_mesh
    from relightable3dgaussian_tpu.training import trainer as T
    from __graft_entry__ import _toy_scene

    data, tile = (n, 1) if mode == "dp" else (1, n)
    mesh = _mesh(data, tile)
    state, _, camera = _toy_scene(
        P=a.splats, capacity=2 * a.splats, W=a.width, H=a.height)
    cfg = RasterizeConfig(
        width=a.width, height=a.height, max_tiles_per_gaussian=32,
        max_per_tile=128, chunk=32,
        tile_axis="tile" if tile > 1 else None, tile_shards=tile)
    tstate, tx = T.init_train_state(state, O.OptimConfig())
    step = ptrain.make_sharded_train_step(
        tx, mesh, cfg, R.LossConfig(), sh_deg=0)
    B = data  # one camera per data member
    cams = {k: jnp.stack([v] * B) for k, v in camera.items()}
    gt = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (B, a.height, a.width, 3)).astype(np.float32))
    tstate = ptrain.replicate(tstate, mesh)
    args = (tstate, ptrain.shard_batch(cams, mesh),
            ptrain.shard_batch(gt, mesh), jnp.zeros(3))
    dt, out = _time_steps(lambda *x: step(*x), args, a.steps, a.warmup,
                          lambda o: o[0].gaussians.params.xyz,
                          rebind=lambda ar, o: (o[0],) + ar[1:])
    # global pixels processed per step: B cameras × H×W
    return B * a.width * a.height / dt / 1e6, "Mpix/s"


def bench_tp(n, a):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from relightable3dgaussian_tpu.models import render as R
    from relightable3dgaussian_tpu.training import optimizer as O
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.parallel import render as prender
    from relightable3dgaussian_tpu.parallel import train as ptrain
    from relightable3dgaussian_tpu.parallel.mesh import make_mesh
    from relightable3dgaussian_tpu.training import trainer as T
    from __graft_entry__ import _toy_scene

    mesh = _mesh(1, n)
    state, _, camera = _toy_scene(
        P=a.splats, capacity=2 * a.splats, W=a.width, H=a.height)
    cfg = RasterizeConfig(
        width=a.width, height=a.height, max_tiles_per_gaussian=32,
        max_per_tile=128, chunk=32)
    tstate, tx = T.init_train_state(state, O.OptimConfig())
    step = prender.make_tp_train_step(
        tx, mesh, cfg, R.LossConfig(), sh_deg=0, reshard="route")
    cams = {k: jnp.stack([v]) for k, v in camera.items()}
    gt = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, a.height, a.width, 3)).astype(np.float32))
    tstate = ptrain.replicate(tstate, mesh)
    args = (tstate, ptrain.shard_batch(cams, mesh),
            ptrain.shard_batch(gt, mesh), jnp.zeros(3))
    dt, out = _time_steps(lambda *x: step(*x), args, a.steps, a.warmup,
                          lambda o: o[0].gaussians.params.xyz,
                          rebind=lambda ar, o: (o[0],) + ar[1:])
    return a.width * a.height / dt / 1e6, "Mpix/s"


def bench_tp_pbr(n, a):
    """TP x PBR: NeILF render equation + 11-channel rasterization with
    params point-sharded and tiles sharded (`parallel.render.
    make_tp_pbr_train_step`); splat + env-SH + gamma updates."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models import render as R
    from relightable3dgaussian_tpu.training import optimizer as O
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.parallel import render as prender
    from relightable3dgaussian_tpu.parallel import train as ptrain
    from relightable3dgaussian_tpu.training import trainer_neilf as TN
    from __graft_entry__ import _toy_scene

    mesh = _mesh(1, n)
    base, _, camera = _toy_scene(
        P=a.splats, capacity=2 * a.splats, W=a.width, H=a.height)
    rng = np.random.default_rng(0)
    state0 = G.create_from_points(
        np.asarray(base.params.xyz)[: a.splats],
        rng.uniform(0, 1, (a.splats, 3)).astype(np.float32),
        capacity=2 * a.splats, use_pbr=True,
        init_scale=np.full(a.splats, 0.03, np.float32))
    cfg = RasterizeConfig(
        width=a.width, height=a.height, max_tiles_per_gaussian=32,
        max_per_tile=128, chunk=32)
    state, txs = TN.init_pbr_train_state(state0, O.OptimConfig())
    step = prender.make_tp_pbr_train_step(
        txs, mesh, cfg, R.LossConfig(), sh_deg=0, sample_num=8)
    cams = {k: jnp.stack([v]) for k, v in camera.items()}
    gt = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, a.height, a.width, 3)).astype(np.float32))
    state = ptrain.replicate(state, mesh)
    args = (state, ptrain.shard_batch(cams, mesh),
            ptrain.shard_batch(gt, mesh), jnp.zeros(3),
            jax.random.PRNGKey(0))
    dt, out = _time_steps(lambda *x: step(*x), args, a.steps, a.warmup,
                          lambda o: o[0].gaussians.params.xyz,
                          rebind=lambda ar, o: (o[0],) + ar[1:])
    return a.width * a.height / dt / 1e6, "Mpix/s"


def bench_rays(n, a):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.ops import raytrace as RT
    from relightable3dgaussian_tpu.parallel.mesh import make_mesh
    from __graft_entry__ import _toy_scene

    mesh = _mesh(n, 1)
    state, _, _ = _toy_scene(P=a.splats, capacity=a.splats)
    p = state.params
    sym6 = RT.inverse_covariance(G.get_scaling(p), G.get_rotation(p))
    rng = np.random.default_rng(2)
    R_ = a.rays - a.rays % n
    ro = jnp.asarray(rng.normal(size=(R_, 3)).astype(np.float32)) * 2.0
    rd = -ro / jnp.linalg.norm(ro, axis=-1, keepdims=True)

    def shard_fn(ro, rd, means, sym6, op, nrm, alive):
        out = RT.trace_visibility(ro, rd, means, sym6, op, nrm,
                                  alive=alive, chunk=min(a.splats, 8192))
        return out["visibility"]

    f = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P(), P(), P(), P()),
        out_specs=P("data"), check_vma=False))
    args = (ro, rd, p.xyz, sym6, G.get_opacity(p), G.get_normal(p),
            state.alive)
    dt, out = _time_steps(f, args, a.steps, a.warmup, lambda o: o)
    return R_ / dt / 1e6, "Mrays/s"


def main():
    a = parse_args()
    counts = [int(x) for x in a.devices.split(",")]
    if a.platform == "cpu":
        nloc = a.local_devices or max(counts)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={nloc}")
    import jax
    if a.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if a.multihost:
        from relightable3dgaussian_tpu.parallel.mesh import init_distributed
        init_distributed()
    have = jax.device_count()
    counts = [c for c in counts if c <= have]
    if not counts:
        print(json.dumps({"error": f"no usable device counts <= {have}"}))
        return 1

    results = []
    for mode in a.modes.split(","):
        base = None
        for n in counts:
            if mode in ("dp", "tile"):
                thr, unit = bench_dp_tile(mode, n, a)
            elif mode == "tp":
                thr, unit = bench_tp(n, a)
            elif mode == "tp_pbr":
                thr, unit = bench_tp_pbr(n, a)
            elif mode == "rays":
                thr, unit = bench_rays(n, a)
            else:
                raise SystemExit(f"unknown mode {mode}")
            if n == counts[0]:
                base = thr / n
            eff = thr / (n * base) if base else float("nan")
            rec = {"mode": mode, "devices": n, "throughput": round(thr, 3),
                   "unit": unit, "efficiency_vs_1": round(eff, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    worst = min(r["efficiency_vs_1"] for r in results)
    print(json.dumps({"summary": "scaling", "worst_efficiency": worst,
                      "target": 0.85, "pass": bool(worst >= 0.85)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
