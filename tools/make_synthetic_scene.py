"""Generate a procedural multi-view dataset in Blender/NeRF-synthetic format.

Renders a structured ground-truth splat scene (textured sphere + satellite
blobs + ground disc) with THIS framework's own rasterizer, then writes
`transforms_train.json` / `transforms_test.json` + PNG views + an init
`points3d.ply` — exactly the layout `scene.dataset_readers.read_nerf_synthetic`
consumes (reference format: `dataset_readers.py:305-403`).

Zero-egress stand-in for the NeRF-synthetic scenes: the GT has genuine
high-frequency color detail (procedural stripes/checker) so densification
has structure to chase, and the init cloud is a noisy subsample so training
must both move points and grow P.

Usage (mini verify scene):
  python tools/make_synthetic_scene.py --out /tmp/mini_scene \
      --views 8 --test_views 2 --size 64 --gt_splats 160 --cpu

Dress-rehearsal scene (800², 64 views):
  python tools/make_synthetic_scene.py --out /tmp/rehearsal_scene \
      --views 64 --test_views 8 --size 800 --gt_splats 60000
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def build_gt_scene(n: int, seed: int = 0):
    """Procedural GT splat cloud: OPAQUE smooth surfaces with structured
    color detail.

    v2 (round 4): the first rehearsal scene left every GT splat at the
    trainer's init opacity 0.1 with scale ~ spacing — the renders were
    translucent dust speckle (per-pixel white noise) that no 3DGS
    optimizer, the reference included, can fit to high PSNR.  A
    representative NeRF-synthetic-like target needs opaque surfaces
    (opacity ~0.92), splats ~2x their spacing so neighbors overlap into
    a continuous surface, and color fields that vary smoothly at splat
    scale.  Returns (pts, cols, scale, opacity)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    n_sph = int(n * 0.55)
    n_blob = int(n * 0.25)
    n_gnd = n - n_sph - n_blob

    # textured sphere (radius .6) — smooth stripes x soft checker
    theta = np.arccos(rng.uniform(-1, 1, n_sph))
    phi = rng.uniform(0, 2 * np.pi, n_sph)
    sph = 0.6 * np.stack([np.sin(theta) * np.cos(phi),
                          np.sin(theta) * np.sin(phi),
                          np.cos(theta)], -1)
    stripes = 0.5 + 0.5 * np.sin(5.0 * theta)
    checker = 0.5 + 0.5 * np.tanh(2.0 * np.sin(4 * phi) * np.sin(5 * theta))
    sph_col = np.stack([stripes,
                        checker,
                        0.5 + 0.5 * np.cos(3 * phi)], -1)
    sph_scale = np.full(n_sph, 2.0 * 2.13 / np.sqrt(max(n_sph, 1)))
    sph_op = np.full(n_sph, 0.92)

    # satellite blobs: smooth solid-color balls (surface sampling, not
    # gaussian dust)
    centers = np.array([[0.9, 0.25, 0.0], [-0.8, 0.4, 0.5],
                        [0.1, 0.6, -0.9], [-0.4, -0.1, 0.95]])
    base = np.array([[0.9, 0.2, 0.15], [0.15, 0.75, 0.9],
                     [0.9, 0.8, 0.1], [0.5, 0.2, 0.85]])
    which = rng.integers(0, 4, n_blob)
    bdir = rng.normal(size=(n_blob, 3))
    bdir /= np.linalg.norm(bdir, axis=-1, keepdims=True)
    brad = 0.22 * rng.uniform(0.85, 1.0, (n_blob, 1))
    blob = centers[which] + bdir * brad
    blob_col = np.clip(base[which] + rng.normal(0, 0.03, (n_blob, 3)), 0, 1)
    blob_scale = np.full(n_blob, 2.0 * 1.56 / np.sqrt(max(n_blob, 1)))
    blob_op = np.full(n_blob, 0.9)

    # ground disc (y = -0.75) with smooth radial rings
    r = 1.6 * np.sqrt(rng.uniform(0, 1, n_gnd))
    a = rng.uniform(0, 2 * np.pi, n_gnd)
    gnd = np.stack([r * np.cos(a), np.full(n_gnd, -0.75), r * np.sin(a)], -1)
    rings = 0.35 + 0.45 * (0.5 + 0.5 * np.sin(7 * r))
    gnd_col = np.stack([rings, rings * 0.9, rings * 0.7], -1)
    gnd_scale = np.full(n_gnd, 2.0 * 2.84 / np.sqrt(max(n_gnd, 1)))
    gnd_op = np.full(n_gnd, 0.95)

    pts = np.concatenate([sph, blob, gnd]).astype(np.float32)
    cols = np.concatenate([sph_col, blob_col, gnd_col]).astype(np.float32)
    scale = np.concatenate([sph_scale, blob_scale, gnd_scale]
                           ).astype(np.float32)
    opacity = np.concatenate([sph_op, blob_op, gnd_op]).astype(np.float32)
    return pts, cols, scale, opacity


def build_gt_scene_v3(n: int, seed: int = 0):
    """v3 (round 5): the HARD rehearsal target — thin geometry,
    high-frequency albedo, and background clutter, the regimes where
    densify/prune and the per-tile depth budget actually get stressed
    (VERDICT r4 item 3).  Components:

      * sphere with a hard high-frequency checker (tanh-sharpened,
        ~24 cycles around) — sub-splat-scale color edges densification
        must chase;
      * a THIN torus ring (minor radius 0.035) and a fence of 14 thin
        rods (radius 0.018) — structures a few pixels wide at 800²;
      * ground disc with fine concentric rings (~25 cycles);
      * 6% clutter: small opaque blobs scattered through the volume —
        depth complexity for the K budget.

    Returns (pts, cols, scale, opacity)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    n_sph = int(n * 0.34)
    n_tor = int(n * 0.16)
    n_rod = int(n * 0.14)
    n_gnd = int(n * 0.30)
    n_clu = n - n_sph - n_tor - n_rod - n_gnd

    # sphere r=.55 with hard checker
    theta = np.arccos(rng.uniform(-1, 1, n_sph))
    phi = rng.uniform(0, 2 * np.pi, n_sph)
    sph = 0.55 * np.stack([np.sin(theta) * np.cos(phi),
                           np.sin(theta) * np.sin(phi),
                           np.cos(theta)], -1)
    hard = np.tanh(6.0 * np.sin(12 * phi) * np.sin(10 * theta))
    fine = 0.5 + 0.5 * np.sin(24 * phi + 8 * theta)
    sph_col = np.clip(np.stack([0.5 + 0.45 * hard,
                                fine,
                                0.5 - 0.45 * hard], -1), 0, 1)
    area_sph = 4 * np.pi * 0.55 ** 2
    sph_scale = np.full(n_sph, 2.0 * np.sqrt(area_sph / max(n_sph, 1)))
    sph_op = np.full(n_sph, 0.95)

    # thin torus: major 0.85, minor 0.035, tilted
    u = rng.uniform(0, 2 * np.pi, n_tor)
    v = rng.uniform(0, 2 * np.pi, n_tor)
    Rmaj, rmin = 0.85, 0.035
    tor = np.stack([(Rmaj + rmin * np.cos(v)) * np.cos(u),
                    rmin * np.sin(v),
                    (Rmaj + rmin * np.cos(v)) * np.sin(u)], -1)
    tilt = np.deg2rad(18.0)
    rot = np.array([[1, 0, 0],
                    [0, np.cos(tilt), -np.sin(tilt)],
                    [0, np.sin(tilt), np.cos(tilt)]])
    tor = tor @ rot.T + np.array([0.0, 0.1, 0.0])
    tor_col = np.stack([0.5 + 0.5 * np.sin(18 * u),
                        np.full(n_tor, 0.85),
                        0.5 + 0.5 * np.cos(18 * u)], -1)
    area_tor = (2 * np.pi * Rmaj) * (2 * np.pi * rmin)
    tor_scale = np.full(n_tor, 2.0 * np.sqrt(area_tor / max(n_tor, 1)))
    tor_op = np.full(n_tor, 0.95)

    # fence of thin rods on an arc behind the sphere
    nrods = 14
    which = rng.integers(0, nrods, n_rod)
    arc = np.deg2rad(-150.0 + 120.0 * which / (nrods - 1))
    rr = 1.25
    h = rng.uniform(-0.75, 0.55, n_rod)
    av = rng.uniform(0, 2 * np.pi, n_rod)
    rod_r = 0.018
    rod = np.stack([rr * np.cos(arc) + rod_r * np.cos(av),
                    h,
                    rr * np.sin(arc) + rod_r * np.sin(av)], -1)
    rod_col = np.stack([np.where(which % 2 == 0, 0.9, 0.15),
                        np.where(which % 3 == 0, 0.8, 0.25),
                        np.full(n_rod, 0.3)], -1)
    area_rod = nrods * (2 * np.pi * rod_r) * 1.3
    rod_scale = np.full(n_rod, 2.0 * np.sqrt(area_rod / max(n_rod, 1)))
    rod_op = np.full(n_rod, 0.96)

    # ground disc with fine rings
    r = 1.6 * np.sqrt(rng.uniform(0, 1, n_gnd))
    a = rng.uniform(0, 2 * np.pi, n_gnd)
    gnd = np.stack([r * np.cos(a), np.full(n_gnd, -0.78), r * np.sin(a)],
                   -1)
    rings = 0.5 + 0.45 * np.tanh(4.0 * np.sin(25 * r))
    spokes = 0.5 + 0.3 * np.sin(16 * a)
    gnd_col = np.stack([rings, rings * spokes, 0.9 - 0.6 * rings], -1)
    area_gnd = np.pi * 1.6 ** 2
    gnd_scale = np.full(n_gnd, 2.0 * np.sqrt(area_gnd / max(n_gnd, 1)))
    gnd_op = np.full(n_gnd, 0.96)

    # clutter blobs through the volume (depth complexity)
    nblob = 80
    bc = rng.uniform([-1.4, -0.6, -1.4], [1.4, 0.8, 1.4], (nblob, 3))
    keep = np.linalg.norm(bc, axis=-1) > 0.75  # keep off the sphere
    bc = bc[keep]
    nblob = len(bc)
    bwhich = rng.integers(0, max(nblob, 1), n_clu)
    bdir = rng.normal(size=(n_clu, 3))
    bdir /= np.linalg.norm(bdir, axis=-1, keepdims=True)
    brad = 0.06 * rng.uniform(0.8, 1.0, (n_clu, 1))
    clu = bc[bwhich] + bdir * brad
    bcol = rng.uniform(0.1, 0.95, (max(nblob, 1), 3))
    clu_col = np.clip(bcol[bwhich] + rng.normal(0, 0.02, (n_clu, 3)),
                      0, 1)
    area_clu = nblob * 4 * np.pi * 0.06 ** 2
    clu_scale = np.full(n_clu, 2.0 * np.sqrt(area_clu / max(n_clu, 1)))
    clu_op = np.full(n_clu, 0.93)

    pts = np.concatenate([sph, tor, rod, gnd, clu]).astype(np.float32)
    cols = np.concatenate([sph_col, tor_col, rod_col, gnd_col, clu_col]
                          ).astype(np.float32)
    scale = np.concatenate([sph_scale, tor_scale, rod_scale, gnd_scale,
                            clu_scale]).astype(np.float32)
    opacity = np.concatenate([sph_op, tor_op, rod_op, gnd_op, clu_op]
                             ).astype(np.float32)
    return pts, cols, scale, opacity


def orbit_pose(ang: float, elev: float, radius: float):
    """COLMAP-convention camera (columns right/down/forward) on an orbit."""
    import numpy as np
    c = np.array([radius * np.cos(ang),
                  radius * np.sin(elev),
                  radius * np.sin(ang)], np.float64)
    fwd = -c / np.linalg.norm(c)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    dn = np.cross(fwd, right)
    Rm = np.stack([right, dn, fwd], axis=1)
    return Rm, c


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--test_views", type=int, default=4)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--gt_splats", type=int, default=2000)
    ap.add_argument("--init_points", type=int, default=None,
                    help="points3d.ply size (default gt_splats//4)")
    ap.add_argument("--fov", type=float, default=0.9)
    ap.add_argument("--radius", type=float, default=3.2)
    ap.add_argument("--white_background", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variant", default="v2", choices=["v2", "v3"],
                    help="v2: smooth opaque surfaces; v3: thin geometry "
                         "+ high-frequency albedo + clutter")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models import render as R
    from relightable3dgaussian_tpu.ops import autobudget as ab
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.scene import ply as ply_io
    from relightable3dgaussian_tpu.scene.cameras import make_camera

    rng = np.random.default_rng(args.seed)
    W = H = args.size
    builder = build_gt_scene_v3 if args.variant == "v3" else build_gt_scene
    pts, cols, scale, opac = builder(args.gt_splats, args.seed)
    cap = 1 << (args.gt_splats - 1).bit_length()
    state = G.create_from_points(pts, cols, capacity=cap, init_scale=scale,
                                 init_opacity=opac)

    # camera set: golden-angle azimuths, jittered elevation band
    n_total = args.views + args.test_views
    poses = []
    for i in range(n_total):
        ang = 2 * np.pi * ((i * 0.6180339887) % 1.0)
        elev = 0.15 + 0.45 * ((i * 0.4142135624) % 1.0)
        poses.append(orbit_pose(ang, elev, args.radius))

    cams = []
    for i, (Rm, c) in enumerate(poses):
        cams.append(make_camera(uid=i, R=Rm, t=-Rm.T @ c,
                                fovx=args.fov, fovy=args.fov,
                                width=W, height=H))
    cam_inputs = [{k: jnp.asarray(v) for k, v in cm.render_inputs().items()}
                  for cm in cams]

    base_cfg = RasterizeConfig(width=W, height=H,
                               chunk=32 if W < 512 else 96,
                               track_contrib=False)
    cfg = ab.calibrate_from_params(state.params, state.alive,
                                   cam_inputs[:4], base_cfg)
    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)

    def render_fn(ci):
        out = R.render_view(
            state.params, state.alive, ci, bg, cfg, active_sh_degree=0,
            compute_pseudo_normal=False)
        return out["render"], out["opacity"]

    render = jax.jit(render_fn)

    os.makedirs(args.out, exist_ok=True)
    for split, idxs in (("train", range(args.views)),
                        ("test", range(args.views, n_total))):
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        frames = []
        for i in idxs:
            rgb, alpha = render(cam_inputs[i])
            img = np.clip(np.asarray(rgb), 0, 1)
            a = np.clip(np.asarray(alpha), 0, 1)
            # RGBA like the NeRF-synthetic sets: the reader turns the
            # alpha into gt_alpha_mask (mask-entropy loss) and
            # composites `rgb*a + bg*(1-a)` (`dataset_readers.py:126-128`)
            # — i.e. it expects UN-premultiplied color, while `render`
            # is the blend over bg: rgb*a + bg*(1-a).  Un-premultiply
            # against the ACTUAL render background (white runs would
            # otherwise come out over-bright wherever a < 1).
            bg_np = np.asarray(bg, np.float32)
            un = (img - bg_np * (1.0 - a[..., None])) \
                / np.maximum(a[..., None], 1e-4)
            rgba = np.concatenate([np.clip(un, 0, 1), a[..., None]], -1)
            name = f"r_{i}" if split == "train" else f"r_{i - args.views}"
            Image.fromarray((rgba * 255 + 0.5).astype(np.uint8)).save(
                os.path.join(args.out, split, name + ".png"))
            Rm, c = poses[i]
            c2w = np.eye(4)
            c2w[:3, :3] = Rm
            c2w[:3, 3] = c
            c2w[:3, 1:3] *= -1  # COLMAP → OpenGL (loader flips back)
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(args.out, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": args.fov, "frames": frames}, f)
        print(f"{split}: {len(frames)} views", flush=True)

    # init point cloud: noisy subsample of GT (training must refine + grow)
    n_init = args.init_points or max(args.gt_splats // 4, 64)
    sel = rng.integers(0, pts.shape[0], n_init)
    init_pts = pts[sel] + rng.normal(0, 0.07, (n_init, 3)).astype(np.float32)
    init_cols = np.full((n_init, 3), 0.5, np.float32)
    init_nrm = rng.normal(size=(n_init, 3)).astype(np.float32)
    init_nrm /= np.linalg.norm(init_nrm, axis=-1, keepdims=True)
    ply_io.write_points_ply(os.path.join(args.out, "points3d.ply"),
                            init_pts, init_cols, init_nrm)
    print(f"wrote {args.out}: {n_total} views @ {W}x{H}, "
          f"init pcd {n_init}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
