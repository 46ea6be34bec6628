"""Tile-count and contribution-depth stats; image effect of smaller K."""
import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops import binning, projection
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera

rng = np.random.default_rng(0)
W = H = 800
P = 100_000
z = rng.uniform(1.2, 4.0, P)
half = np.tan(0.45) * z
x = rng.uniform(-1, 1, P) * half
y = rng.uniform(-1, 1, P) * half
pts = np.stack([x, y, 2.8 - z], -1).astype(np.float32)
cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)
state = G.create_from_points(pts, cols, capacity=131_072,
                             init_scale=np.full(P, 0.012, np.float32))
c = np.array([0.0, 0.0, 2.8])
fwd_v = -c / np.linalg.norm(c)
up = np.array([0.0, 1.0, 0.0])
r = np.cross(fwd_v, up)
dn = np.cross(fwd_v, r)
Rm = np.stack([r, dn, fwd_v], 1)
cam = make_camera(uid=0, R=Rm, t=-Rm.T @ c, fovx=0.9, fovy=0.9,
                  width=W, height=H)
ci = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
bg = jnp.zeros(3)

imgs = {}
for K in (512, 384, 256):
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=32,
                          max_per_tile=K, chunk=128)

    @jax.jit
    def rend(params):
        return R.render_view(params, state.alive, ci, bg, cfg,
                             active_sh_degree=3,
                             compute_pseudo_normal=False)

    res = rend(state.params)
    jax.block_until_ready(res["render"])
    imgs[K] = np.asarray(res["render"])
    stats = {k: int(v) for k, v in res["stats"].items()}
    nc = np.asarray(res["n_contrib"])
    print(f"K={K}: stats={stats}  n_contrib max={nc.max()} "
          f"p99={np.percentile(nc, 99):.0f}", flush=True)
    if K == 512:
        # per-tile instance counts from binning directly
        attrs = G.render_attributes(state.params)
        proj = jax.jit(lambda m: projection.preprocess(
            m, attrs["scales"], attrs["rotations"], attrs["opacities"],
            state.alive, ci["w2c"], ci["full_proj"], ci["campos"], W, H,
            ci["focal"][0], ci["focal"][1], ci["tan_fov"][0],
            ci["tan_fov"][1], sh_coeffs=G.get_shs(state.params)))(
                attrs["means3d"])
        bins = jax.jit(lambda p: binning.bin_splats(p, cfg.grid, 32, K))(
            proj)
        cnt = np.asarray(bins.counts)
        print(f"   tile counts: max={cnt.max()} p99={np.percentile(cnt,99):.0f}"
              f" p90={np.percentile(cnt,90):.0f} mean={cnt.mean():.0f}",
              flush=True)

ref = imgs[512]
for K in (384, 256):
    d = np.abs(imgs[K] - ref)
    print(f"K={K}: img maxdiff={d.max():.3e} meandiff={d.mean():.3e}",
          flush=True)
print("done", flush=True)
