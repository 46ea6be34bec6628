"""Build a relighting capture config (BASELINE config 3) from a trained
PLY: transform.json + trajectory.json + light_transform.json in the
reference layout (`/root/reference/configs/nerf_syn/transform.json:1-30`,
consumed by `relighting.py:145-217`), plus a procedural Radiance .hdr
environment map (sky gradient + sun disc) for zero-egress environments.

    python script/make_relight_config.py --ply runs/r4_stage2/ply/point_cloud_3000.ply \
        --out runs/relight_cfg --frames 60
    python relighting.py -co runs/relight_cfg -e runs/relight_cfg/env.hdr \
        --sample_num 384 --output runs/relight_capture --video
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def write_radiance_hdr(path: str, img: np.ndarray) -> None:
    """Write [H, W, 3] float32 as flat (non-RLE) Radiance RGBE — the
    format `models.lights._read_radiance_hdr` reads back natively."""
    H, W, _ = img.shape
    m = img.max(-1)
    with np.errstate(divide="ignore"):
        e = np.where(m > 1e-32, np.floor(np.log2(np.maximum(m, 1e-32)))
                     + 1, 0).astype(np.int32)
    scale = np.where(m > 1e-32, 2.0 ** (8 - e), 0.0)
    rgbe = np.zeros((H, W, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(m > 1e-32, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        f.write(rgbe.tobytes())


def make_env(H: int = 64, W: int = 128) -> np.ndarray:
    """Lat-long sky: blue-ish gradient + warm sun disc + gray ground."""
    v = np.linspace(0, np.pi, H)[:, None]          # polar angle
    u = np.linspace(0, 2 * np.pi, W)[None, :]
    sky_t = np.clip(np.cos(v), 0, 1)               # 1 at zenith
    img = np.zeros((H, W, 3), np.float32)
    img[..., 0] = 0.25 + 0.15 * sky_t
    img[..., 1] = 0.35 + 0.25 * sky_t
    img[..., 2] = 0.55 + 0.45 * sky_t
    ground = (v > np.pi / 2).astype(np.float32) * np.ones((1, W))
    img = img * (1 - ground[..., None]) + ground[..., None] * 0.18
    # sun at 45 deg elevation
    sv, su = np.pi / 4, np.pi / 3
    d2 = (v - sv) ** 2 + np.minimum(np.abs(u - su),
                                    2 * np.pi - np.abs(u - su)) ** 2
    img += np.exp(-d2 / 0.01)[..., None] * np.array([30.0, 25.0, 18.0])
    return img.astype(np.float32)


def orbit_w2c(ang: float, elev: float, radius: float) -> np.ndarray:
    c = np.array([radius * np.cos(ang), radius * np.sin(elev),
                  radius * np.sin(ang)])
    fwd = -c / np.linalg.norm(c)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    dn = np.cross(fwd, right)
    R = np.stack([right, dn, fwd], axis=1)      # c2w rotation columns
    w2c = np.eye(4)
    w2c[:3, :3] = R.T
    w2c[:3, 3] = -R.T @ c
    return w2c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True, nargs="+",
                    help="object PLY path(s)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--fov", type=float, default=52.0, help="degrees")
    ap.add_argument("--radius", type=float, default=3.2)
    ap.add_argument("--elev", type=float, default=0.45)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    transform = {}
    for i, ply in enumerate(args.ply):
        transform[f"object_{i}"] = {
            "path": os.path.abspath(ply),
            "transform": np.eye(4).reshape(-1).tolist(),
        }
    with open(os.path.join(args.out, "transform.json"), "w") as f:
        json.dump(transform, f, indent=2)

    traj, light = {}, {}
    for i in range(args.frames):
        ang = 2 * np.pi * i / args.frames
        traj[str(i)] = orbit_w2c(ang, args.elev, args.radius
                                 ).reshape(-1).tolist()
        # rotating env light: one full turn around +y over the capture
        la = 2 * np.pi * i / args.frames
        Rl = np.array([[np.cos(la), 0, np.sin(la)],
                       [0, 1, 0],
                       [-np.sin(la), 0, np.cos(la)]])
        light[str(i)] = Rl.reshape(-1).tolist()
    with open(os.path.join(args.out, "trajectory.json"), "w") as f:
        json.dump({"camera": {"width": args.width, "height": args.height,
                              "fov": args.fov},
                   "trajectory": traj}, f)
    with open(os.path.join(args.out, "light_transform.json"), "w") as f:
        json.dump({"transform": light}, f)

    write_radiance_hdr(os.path.join(args.out, "env.hdr"), make_env())
    print(f"wrote {args.out}: {args.frames} frames, "
          f"{len(args.ply)} objects, env.hdr", flush=True)


if __name__ == "__main__":
    main()
