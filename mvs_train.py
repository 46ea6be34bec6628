"""Train the MVS cascade on synthetic multi-view data.

The reference ships Vis-MVSNet with stripped pretrained weights; this
trains our cascade from scratch using the splatting renderer itself as a
multi-view data generator: random opaque splat scenes rendered from
nearby viewpoints with ground-truth (alpha-normalized) depth.  Loss =
L1 on depth at every cascade scale (the reference supervises each stage
the same way, `vismvsnet/core/model_cas.py::Loss`).

Usage: python mvs_train.py --steps 300 --out /path/params [--cpu]
"""
from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="./mvs_params")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--num_src", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--depth_min", type=float, default=1.0)
    ap.add_argument("--depth_max", type=float, default=4.0)
    ap.add_argument("--log_interval", type=int, default=25)
    ap.add_argument("--resume", action="store_true",
                    help="continue from params saved at --out (training "
                         "runs in restartable chunks: long CPU sessions "
                         "have died ~180 steps in with LLVM compile OOM "
                         "regardless of host free memory)")
    ap.add_argument("--start_step", type=int, default=0,
                    help="with --resume: scene-seed offset so restarted "
                         "chunks see fresh random scenes")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models import render as R
    from relightable3dgaussian_tpu.mvs import pipeline as mvs
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.scene.cameras import make_camera
    from relightable3dgaussian_tpu.training import checkpoint as ckpt

    S = args.size
    cfg = RasterizeConfig(width=S, height=S, max_tiles_per_gaussian=16,
                          max_per_tile=64, chunk=16)
    rng = np.random.default_rng(0)

    @jax.jit
    def _data_render(params, alive, camera):
        res = R.render_view(params, alive, camera, jnp.zeros(3), cfg,
                            active_sh_degree=0,
                            compute_pseudo_normal=False)
        return res["render"], res["opacity"], res["depth"]

    def random_views(seed):
        """One random splat scene rendered from 1 ref + num_src views,
        returning images, true depth (ref view), cameras."""
        r = np.random.default_rng(seed)
        P = 120
        pts = np.stack([
            r.uniform(-0.8, 0.8, P), r.uniform(-0.8, 0.8, P),
            r.uniform(-0.5, 0.5, P)], -1).astype(np.float32)
        cols = r.uniform(0, 1, (P, 3)).astype(np.float32)
        st = G.create_from_points(
            pts, cols, capacity=128,
            init_scale=np.full(P, 0.08, np.float32))
        stp = st.params.replace(
            opacity=jnp.full_like(st.params.opacity, 3.0))

        cams, imgs, depth0 = [], [], None
        for v in range(args.num_src + 1):
            off = np.array([0.25 * v - 0.25 * args.num_src / 2,
                            0.05 * v, 0.0])
            c = np.array([0.0, 0.0, 2.5]) + off
            fwd = np.array([0.0, 0, -1.0])
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(fwd, up)
            dn = np.cross(fwd, right)
            Rm = np.stack([right, dn, fwd], 1)
            cam = make_camera(uid=v, R=Rm, t=-Rm.T @ c, fovx=0.9,
                              fovy=0.9, width=S, height=S)
            camera = {k: jnp.asarray(x)
                      for k, x in cam.render_inputs().items()}
            render, opac, depth = _data_render(stp, st.alive, camera)
            imgs.append(np.asarray(render))
            if v == 0:
                op = np.asarray(opac)
                depth0 = np.asarray(depth) / np.maximum(op, 1e-6)
                mask0 = op > 0.5
            cams.append(cam)
        return imgs, depth0, mask0, cams

    model = mvs.MVSNet(mvs.CascadeConfig(depth_nums=(16, 8, 8), base=4))
    imgs, depth0, mask0, cams = random_views(0)
    K = cams[0].intrinsics
    rels = [c.w2c @ np.linalg.inv(cams[0].w2c) for c in cams[1:]]

    def pack(imgs, cams):
        rels = [c.w2c @ np.linalg.inv(cams[0].w2c) for c in cams[1:]]
        return (jnp.asarray(imgs[0]), jnp.asarray(np.stack(imgs[1:])),
                jnp.asarray(cams[0].intrinsics),
                jnp.asarray(np.stack([c.intrinsics for c in cams[1:]])),
                jnp.asarray(np.stack(rels).astype(np.float32)))

    params = model.init(jax.random.PRNGKey(0), *pack(imgs, cams),
                        args.depth_min, args.depth_max)
    import os
    if args.resume and os.path.exists(args.out):
        params = ckpt.load_train_state(args.out, params)
        print(f"resumed MVS params from {args.out}", flush=True)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, ref, srcs, Kr, Ks, rels, depth_gt, mask):
        def loss_fn(p):
            out = model.apply(p, ref, srcs, Kr, Ks, rels,
                              args.depth_min, args.depth_max)
            total = 0.0
            for s in (8, 4, 2):
                d = out[f"depth_{s}"]
                H2, W2 = d.shape
                gt = jax.image.resize(depth_gt, (H2, W2), "bilinear")
                m = jax.image.resize(
                    mask.astype(jnp.float32), (H2, W2), "bilinear")
                total = total + jnp.sum(jnp.abs(d - gt) * m) / \
                    jnp.maximum(jnp.sum(m), 1.0)
            return total
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    t0 = time.time()
    for it in range(1, args.steps + 1):
        imgs, depth0, mask0, cams = random_views(args.start_step + it)
        params, opt, loss = step(
            params, opt, *pack(imgs, cams),
            jnp.asarray(depth0), jnp.asarray(mask0))
        if it % args.log_interval == 0:
            print(f"it {it} depth-L1 {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if it % 100 == 0:
            ckpt.save_train_state(args.out, params)

    ckpt.save_train_state(args.out, params)
    print(f"saved MVS params -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
