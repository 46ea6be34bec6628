"""Time the relighting visibility precompute at reference scale
(VERDICT r2 item 7): 500k splats x 384 fibonacci dirs through the
cell-culled tracer (`ops/raytrace.py:build_cells/trace_visibility_cells`
— the TPU analogue of the reference LBVH trace, `bvh/src/trace.cu`).

Either synthesizes a 500k cloud (default) or loads a trained PLY
(--ply).  Prints total minutes + rays/s; strict drop accounting stays ON
so the number is for the LOSSLESS configuration.

    PYTHONPATH=/root/repo:/root/.axon_site python script/trace_timing.py
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=500_000)
    ap.add_argument("--capacity", type=int, default=2 ** 19)
    ap.add_argument("--sample_num", type=int, default=384)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--rays_per_cell_frac", type=int, default=10,
                    help="max_rays_per_cell = chunk_rays // this; lower "
                         "divisor = bigger (safer) budget")
    ap.add_argument("--ply", default=None,
                    help="time on a trained PLY instead of a synth cloud")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from relightable3dgaussian_tpu.models import compose
    from relightable3dgaussian_tpu.models import gaussians as G

    if args.ply:
        from relightable3dgaussian_tpu.training import checkpoint as ckpt
        state = ckpt.load_ply(args.ply, capacity=args.capacity,
                              use_pbr=True)
        print(f"loaded {int(state.num_alive)} splats from {args.ply}",
              flush=True)
    else:
        # trained-scene-like cloud: clustered blobs + a diffuse halo so
        # the cell loads are skewed (the hard case for the ray budgets)
        rng = np.random.default_rng(0)
        P = args.splats
        nblob = 48
        centers = rng.uniform(-1.2, 1.2, (nblob, 3))
        which = rng.integers(0, nblob, P)
        pts = centers[which] + rng.normal(0, 0.08, (P, 3))
        halo = rng.integers(0, P, P // 10)
        pts[halo] = rng.uniform(-1.6, 1.6, (len(halo), 3))
        state = G.create_from_points(
            pts.astype(np.float32),
            rng.uniform(0, 1, (P, 3)).astype(np.float32),
            capacity=args.capacity, use_pbr=True,
            init_scale=np.full(P, 0.01, np.float32))
        print(f"synth cloud: {P} splats, capacity {args.capacity}",
              flush=True)

    t0 = time.time()
    chunk_eff = max(1, min(args.chunk, 32_768 // args.sample_num))
    rb = (chunk_eff * args.sample_num) // args.rays_per_cell_frac
    vis = compose.precompute_visibility(
        state, sample_num=args.sample_num, chunk=args.chunk, strict=True,
        max_rays_per_cell=rb)
    vis.block_until_ready()
    dt = time.time() - t0
    # report both: capacity-based rays/s is what the chunked kernel
    # actually processed (padded slots trace too); alive-based is the
    # honest per-live-splat throughput when a --ply under-fills the
    # capacity.
    n_alive = int(np.asarray(state.alive).sum())
    n_rays_cap = int(state.params.capacity) * args.sample_num
    n_rays_alive = n_alive * args.sample_num
    print(f"precompute_visibility: {dt / 60:.2f} min "
          f"({n_rays_cap / dt / 1e6:.2f} Mrays/s over capacity "
          f"{int(state.params.capacity)}; "
          f"{n_rays_alive / dt / 1e6:.2f} Mrays/s over {n_alive} alive, "
          f"sample_num={args.sample_num}, strict lossless)", flush=True)
    print(f"mean visibility {float(vis.mean()):.4f}")


if __name__ == "__main__":
    main()
