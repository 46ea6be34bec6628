"""Composition + relighting CLI — analogue of the reference `relighting.py`.

Consumes the same JSON config layout (`configs/<scene>/transform.json`,
`trajectory.json`, `light_transform.json`, reference
`relighting.py:145-217`): loads per-object PLYs with 4x4 transforms,
merges them, bakes or ray-traces visibility, then renders the camera
trajectory under a rotating HDR environment light, saving the requested
capture channels (and optionally an mp4 when cv2 exists).
"""
from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-co", "--config", required=True,
                    help="config dir with transform.json / trajectory.json")
    ap.add_argument("-e", "--envmap_path", required=True)
    ap.add_argument("-bg", "--background_color", type=float, default=0.0)
    ap.add_argument("--bake", action="store_true",
                    help="bake visibility into SH instead of per-splat "
                         "ray-traced precompute")
    ap.add_argument("--sample_num", type=int, default=384)
    ap.add_argument("--output", default="./capture_trace")
    ap.add_argument("--capture_list",
                    default="base_color,metallic,normal,pbr,render,"
                            "roughness,visibility")
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from relightable3dgaussian_tpu.models import compose
    from relightable3dgaussian_tpu.models import lights as L
    from relightable3dgaussian_tpu.ops import transforms as tf
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.scene.cameras import make_camera
    from relightable3dgaussian_tpu.training import checkpoint as ckpt
    from relightable3dgaussian_tpu.training.evaluate import save_image

    with open(os.path.join(args.config, "transform.json")) as f:
        scene_dict = json.load(f)
    with open(os.path.join(args.config, "trajectory.json")) as f:
        traject = json.load(f)
    light_path = os.path.join(args.config, "light_transform.json")
    light_dict = None
    if os.path.exists(light_path):
        with open(light_path) as f:
            light_dict = json.load(f)

    # --- scene composition (`relighting.py:31-55`) ---
    merged = compose.load_composition(scene_dict)

    # --- visibility (`relighting.py:58-86`) ---
    vis = None
    if args.bake:
        merged = compose.finetune_visibility(merged, iterations=1000)
    else:
        print("precomputing ray-traced visibility...", flush=True)
        vis = compose.precompute_visibility(
            merged, sample_num=args.sample_num)

    env = L.load_envmap(args.envmap_path)

    H = traject["camera"]["height"]
    W = traject["camera"]["width"]
    fovx = traject["camera"]["fov"] * np.pi / 180.0
    fovy = tf.focal2fov(tf.fov2focal(fovx, W), H)
    cfg = RasterizeConfig(width=W, height=H)

    captures = [c.strip() for c in args.capture_list.split(",")]
    for c in captures:
        os.makedirs(os.path.join(args.output, c), exist_ok=True)
    bg = jnp.full(3, args.background_color)

    items = list(traject["trajectory"].items())
    if args.max_frames:
        items = items[: args.max_frames]
    for idx, cam_info in items:
        w2c = np.array(cam_info, np.float32).reshape(4, 4)
        cam = make_camera(uid=0, R=w2c[:3, :3].T, t=w2c[:3, 3],
                          fovx=fovx, fovy=fovy, width=W, height=H)
        camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
        lt = None
        if light_dict is not None:
            lt = jnp.asarray(np.array(
                light_dict["transform"][idx], np.float32).reshape(3, 3))
        res = compose.render_composite(
            merged, camera, bg, cfg, env,
            visibility_precomp=vis, sample_num=args.sample_num,
            light_transform=lt)
        for c in captures:
            if c not in res:
                continue
            img = np.asarray(res[c])
            if c == "normal":
                img = img * 0.5 + 0.5
            if c in ("base_color", "roughness", "metallic", "visibility",
                     "normal"):
                img = img + (1 - np.asarray(res["opacity"]))[..., None] \
                    * args.background_color
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, -1)
            save_image(os.path.join(args.output, c, f"frame_{idx}.png"),
                       img)
        print(f"frame {idx} done", flush=True)

    if args.video:
        try:
            import cv2
            for c in captures:
                path = os.path.join(args.output, f"{c}.mp4")
                fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                wr = cv2.VideoWriter(fourcc=fourcc, filename=path, fps=60,
                                     frameSize=(W, H))
                for idx, _ in items:
                    img = cv2.imread(
                        os.path.join(args.output, c, f"frame_{idx}.png"))
                    wr.write(img)
                wr.release()
        except ImportError:
            print("cv2 unavailable — skipping video export", flush=True)


if __name__ == "__main__":
    main()
