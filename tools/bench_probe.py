"""Parameterized A/B probe for the train-step bench workload.

The bench scene (800², 100k frustum splats) with every perf-relevant
knob on the command line, so kernel experiments are one command instead
of a rewritten scratch script:

    python tools/bench_probe.py --sweep chunk=48,96,144
    python tools/bench_probe.py --m 20 --k 288 --chunk 96 --no-track
    python tools/bench_probe.py --trace /tmp/tr   # + xplane_summary.py

Each config prints one line: config, median pipelined step ms, Mpix/s.
Run solo on the TPU (axon single-process rule).
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--splats", type=int, default=100_000)
    ap.add_argument("--capacity", type=int, default=131_072)
    ap.add_argument("--m", type=int, default=20)
    ap.add_argument("--k", type=int, default=288)
    ap.add_argument("--chunk", type=int, default=96)
    ap.add_argument("--no-track", action="store_true",
                    help="track_contrib=False")
    ap.add_argument("--stream-cap", type=int, default=None,
                    help="stream-prefix row budget (default T*K)")
    ap.add_argument("--expansion", default="dense",
                    choices=["dense", "offset", "split"],
                    help="instance expansion mode (binning.bin_splats)")
    ap.add_argument("--split-ms", type=int, default=8,
                    help="split expansion: M_small")
    ap.add_argument("--split-pb", type=int, default=8192,
                    help="split expansion: P_big")
    ap.add_argument("--tb", type=int, default=None,
                    help="override composite_pallas.TB")
    ap.add_argument("--sweep", default=None,
                    help="name=v1,v2,... sweeps one of m/k/chunk/tb")
    ap.add_argument("--set", action="append", default=[],
                    help="composite_pallas flag NAME=int (repeatable)")
    ap.add_argument("--absweep", default=None,
                    help="A/B a composite_pallas flag: NAME=v1,v2,...")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler trace to this dir")
    ap.add_argument("--pbr", action="store_true",
                    help="probe the flagship NeILF PBR step (render "
                         "equation s=24 + 11-channel rasterize + full "
                         "PBR loss) instead of the base step")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models import render as R
    from relightable3dgaussian_tpu.ops import composite_pallas as cpal
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.scene.cameras import make_camera

    W = H = args.width
    P = args.splats
    rng = np.random.default_rng(0)
    z = rng.uniform(1.2, 4.0, P)
    half = np.tan(0.45) * z
    pts = np.stack([rng.uniform(-1, 1, P) * half,
                    rng.uniform(-1, 1, P) * half, 2.8 - z],
                   -1).astype(np.float32)
    state = G.create_from_points(
        pts, rng.uniform(0, 1, (P, 3)).astype(np.float32),
        capacity=args.capacity, init_scale=np.full(P, 0.012, np.float32))
    c = np.array([0.0, 0.0, 2.8])
    fw = -c / np.linalg.norm(c)
    up = np.array([0.0, 1.0, 0.0])
    r = np.cross(fw, up)
    dn = np.cross(fw, r)
    Rm = np.stack([r, dn, fw], 1)
    cam = make_camera(uid=0, R=Rm, t=-Rm.T @ c, fovx=0.9, fovy=0.9,
                      width=W, height=H)
    ci = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    loss_cfg = R.LossConfig(lambda_dssim=0.2)

    if args.pbr:
        from relightable3dgaussian_tpu.models import gaussians as G2
        from relightable3dgaussian_tpu.models import lights as Lt
        from relightable3dgaussian_tpu.models import neilf as NF
        pstate = G2.create_from_points(
            pts.astype(np.float32),
            rng.uniform(0, 1, (P, 3)).astype(np.float32),
            capacity=args.capacity, use_pbr=True,
            init_scale=np.full(P, 0.012, np.float32))
        env = Lt.create_direct_light(3)
        gamma = Lt.create_gamma()
        pkey = jax.random.PRNGKey(0)

    def run(m, k, chunk, tb, track, label=""):
        if tb is not None:
            cpal.TB = tb
        cfg = RasterizeConfig(
            width=W, height=H, max_tiles_per_gaussian=m, max_per_tile=k,
            chunk=chunk, track_contrib=track,
            stream_cap=args.stream_cap, expansion=args.expansion,
            split_m_small=args.split_ms, split_p_big=args.split_pb)

        if args.pbr:
            ploss_cfg = R.LossConfig()

            @jax.jit
            def fwd_bwd(params):
                def loss_fn(p, e, g):
                    res = NF.render(
                        p, pstate.alive, ci, jnp.zeros(3), cfg,
                        env_light=e, gamma=g, use_ldr_image=True,
                        sample_num=24, loss_cfg=ploss_cfg,
                        gt={"image": target}, active_sh_degree=3,
                        is_training=True, rng=pkey)
                    return res["loss"]
                return jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                    params, env, gamma)

            run_params = pstate.params
            res0 = R.render_view(pstate.params, pstate.alive, ci,
                                 jnp.zeros(3), cfg, active_sh_degree=3,
                                 compute_pseudo_normal=False)
        else:
            @jax.jit
            def fwd_bwd(params):
                def loss_fn(p):
                    res = R.render_view(p, state.alive, ci, jnp.zeros(3),
                                        cfg, active_sh_degree=3,
                                        compute_pseudo_normal=False)
                    loss, _ = R.calculate_loss(res, {"image": target},
                                               loss_cfg)
                    return loss
                return jax.value_and_grad(loss_fn)(params)

            run_params = state.params
            res0 = R.render_view(state.params, state.alive, ci,
                                 jnp.zeros(3), cfg, active_sh_degree=3,
                                 compute_pseudo_normal=False)
        stats = {kk: int(v) for kk, v in res0["stats"].items()}
        out = fwd_bwd(run_params)
        jax.block_until_ready(out)
        meds = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.steps):
                o = fwd_bwd(run_params)
            jax.block_until_ready(o)
            meds.append((time.perf_counter() - t0) / args.steps)
        dt = float(np.median(meds))
        drops = {kk: v for kk, v in stats.items()
                 if kk.startswith("dropped") and v}
        print(f"{label}m={m} k={k} chunk={chunk} tb={tb or cpal.TB} "
              f"track={track}: {dt * 1000:.1f} ms  "
              f"{W * H / dt / 1e6:.2f} Mpix/s"
              + (f"  DROPS {drops}" if drops else ""), flush=True)
        if args.trace:
            with jax.profiler.trace(args.trace):
                for _ in range(5):
                    o = fwd_bwd(run_params)
                jax.block_until_ready(o)
            print(f"trace -> {args.trace} (summarize with "
                  "tools/xplane_summary.py)", flush=True)

    def _flag_target(name):
        """FLAG → composite_pallas; 'losses.FLAG' → that ops module."""
        if "." in name:
            import importlib
            mod, _, attr = name.rpartition(".")
            return importlib.import_module(
                f"relightable3dgaussian_tpu.ops.{mod}"), attr
        return cpal, name

    def _coerce(m, attr, v):
        cur = getattr(m, attr)
        return bool(int(v)) if isinstance(cur, bool) else int(v)

    for s in args.set:
        name, _, v = s.partition("=")
        m, attr = _flag_target(name)
        setattr(m, attr, _coerce(m, attr, v))

    base = dict(m=args.m, k=args.k, chunk=args.chunk, tb=args.tb,
                track=not args.no_track)
    if args.sweep:
        name, _, vals = args.sweep.partition("=")
        for v in vals.split(","):
            cfgd = dict(base)
            cfgd[name] = int(v)
            run(**cfgd)
    elif args.absweep:
        name, _, vals = args.absweep.partition("=")
        m, attr = _flag_target(name)
        for v in vals.split(","):
            setattr(m, attr, _coerce(m, attr, v))
            run(**base, label=f"{name}={v} ")
    else:
        run(**base)


if __name__ == "__main__":
    main()
