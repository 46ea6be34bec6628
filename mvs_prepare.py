"""MVS depth/normal prior generation CLI.

Analogue of the reference `vismvsnet/test.py` + `prepare_nerf.py` /
`prepare_neilf.py`: runs the cascade MVS network over a scene's cameras
(source views chosen by SfM view-pair scoring when points exist, else by
camera-center proximity) and writes the depth/normal priors in the layout
the dataset readers consume (`<scene>/extra/{depths,normals}`), with
probability filtering.

Without pretrained weights this uses randomly initialized features —
train the network or load params with --params (orbax).  The pipeline and
formats are complete either way.
"""
from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("--out_dir", default=None,
                    help="default <source>/extra")
    ap.add_argument("--num_src", type=int, default=2)
    ap.add_argument("--depth_min", type=float, default=0.5)
    ap.add_argument("--depth_max", type=float, default=8.0)
    ap.add_argument("--prob_thresh", type=float, default=0.3)
    ap.add_argument("--params", default=None,
                    help="orbax checkpoint of trained MVS params")
    ap.add_argument("--depth_nums", default="64,32,16",
                    help="cascade hypothesis counts (must match training)")
    ap.add_argument("--base", type=int, default=8)
    ap.add_argument("--max_views", type=int, default=None)
    ap.add_argument("--gn_refine_iters", type=int, default=0,
                    help="Gauss-Newton depth refinement iterations")
    ap.add_argument("--cspn_iters", type=int, default=0,
                    help="CSPN propagation iterations (needs --params "
                         "trained with the same setting)")
    ap.add_argument("--min_consistent", type=int, default=0,
                    help="cross-view consistency filter: keep depths "
                         "confirmed by >= this many source views "
                         "(reference filter.py vis_filter)")
    ap.add_argument("--theta0", type=float, default=5.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from relightable3dgaussian_tpu.mvs import pipeline as mvs
    from relightable3dgaussian_tpu.scene import load_scene
    from relightable3dgaussian_tpu.training.evaluate import save_image

    scene = load_scene(args.source_path, max_cameras=args.max_views)
    cams = scene.train_cameras
    out_dir = args.out_dir or os.path.join(args.source_path, "extra")
    os.makedirs(os.path.join(out_dir, "depths"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "normals"), exist_ok=True)

    depth_nums = tuple(int(x) for x in args.depth_nums.split(","))
    model = mvs.MVSNet(mvs.CascadeConfig(
        depth_nums=depth_nums, base=args.base,
        gn_refine_iters=args.gn_refine_iters,
        cspn_iters=args.cspn_iters))
    c0 = cams[0]
    import jax.numpy as jnp
    init_args = (jnp.asarray(c0.image), jnp.asarray(
        np.stack([cams[1].image] * args.num_src)),
        jnp.asarray(c0.intrinsics),
        jnp.asarray(np.stack([c0.intrinsics] * args.num_src)),
        jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * args.num_src)),
        args.depth_min, args.depth_max)
    if args.params:
        from relightable3dgaussian_tpu.training import checkpoint as ckpt
        template = model.init(jax.random.PRNGKey(0), *init_args)
        params = ckpt.load_train_state(args.params, template)
    else:
        params = model.init(jax.random.PRNGKey(0), *init_args)
        print("WARNING: randomly initialized MVS network "
              "(no --params given) — priors are for pipeline testing",
              flush=True)

    centers = np.stack([c.camera_center for c in cams])

    # Source-view selection: COLMAP SfM view-pair scoring when a sparse
    # model with tracks exists (the colmap2mvsnet driver path,
    # `colmap2mvsnet.py:423-447`), camera-center proximity otherwise.
    scores = None
    for sub in ("sparse/0", "sparse"):
        sparse = os.path.join(args.source_path, sub)
        if os.path.isdir(sparse):
            from relightable3dgaussian_tpu.scene import colmap as colmap_io
            ids = sorted(colmap_io.read_extrinsics(sparse))[: len(cams)]
            scores = mvs.colmap_view_scores(
                sparse, ids, list(centers), theta0=args.theta0)
            if scores is not None:
                print(f"view selection: SfM pair scores from {sub}",
                      flush=True)
            break

    def pick_sources(i):
        if scores is not None and scores[i].max() > 0:
            return list(np.argsort(-scores[i])[: args.num_src])
        d = np.linalg.norm(centers - centers[i], axis=-1)
        return list(np.argsort(d)[1: args.num_src + 1])

    src_lists = [pick_sources(i) for i in range(len(cams))]

    # Pass 1: per-view depth estimation.
    results = []
    for i, cam in enumerate(cams):
        srcs = [cams[j] for j in src_lists[i]]
        res = mvs.estimate_depth(
            params, model, cam.image, [s.image for s in srcs],
            cam.intrinsics, [s.intrinsics for s in srcs],
            cam.w2c, [s.w2c for s in srcs],
            (args.depth_min, args.depth_max))
        results.append(res)

    # Pass 2: probability + cross-view reprojection-consistency filter
    # (reference `filter.py:82-125` prob_filter + vis_filter) and save.
    for i, cam in enumerate(cams):
        res = results[i]
        keep = res["prob"] > args.prob_thresh
        if args.min_consistent > 0:
            n_ok = np.zeros_like(res["depth"], np.int32)
            for j in src_lists[i]:
                rel = cams[j].w2c @ np.linalg.inv(cam.w2c)
                ok = mvs.reprojection_consistency(
                    jax.numpy.asarray(res["depth"]),
                    jax.numpy.asarray(results[j]["depth"]),
                    jax.numpy.asarray(cam.intrinsics),
                    jax.numpy.asarray(cams[j].intrinsics),
                    jax.numpy.asarray(rel))
                n_ok = n_ok + np.asarray(ok, np.int32)
            keep = keep & (n_ok >= args.min_consistent)
        depth = res["depth"] * keep
        name = cam.image_name or f"{i:05d}"
        np.save(os.path.join(out_dir, "depths", f"{name}.npy"),
                depth.astype(np.float32))
        np.save(os.path.join(out_dir, "normals", f"{name}.npy"),
                res["normal"].astype(np.float32))
        save_image(os.path.join(out_dir, "depths", f"{name}_vis.png"),
                   depth / max(float(depth.max()), 1e-6))
        print(f"{name}: depth range "
              f"[{float(depth.min()):.2f}, {float(depth.max()):.2f}] "
              f"kept {float(keep.mean()):.0%}", flush=True)


if __name__ == "__main__":
    main()
