import time
import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops import binning, projection
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera

W = H = 800
P = 100_000
cap = 131_072
rng = np.random.default_rng(0)
dirs = rng.normal(size=(P, 3)); dirs /= np.linalg.norm(dirs, -1, keepdims=True)
pts = (dirs * rng.uniform(0.3, 0.9, (P, 1))).astype(np.float32)
state = G.create_from_points(pts, rng.uniform(0, 1, (P, 3)).astype(np.float32),
                             capacity=cap, init_scale=np.full(P, 0.01, np.float32))
cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=32,
                      max_per_tile=512, chunk=32)
c = np.array([0., 0., 2.8]); fw = -c/np.linalg.norm(c); up=np.array([0.,1.,0.])
r = np.cross(fw, up); dn = np.cross(fw, r); Rm = np.stack([r, dn, fw], 1)
cam = make_camera(uid=0, R=Rm, t=-Rm.T@c, fovx=0.9, fovy=0.9, width=W, height=H)
ci = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
attrs = G.render_attributes(state.params)
target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

def timeit(name, fn, *args, n=8):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {np.median(ts)*1000:8.1f} ms", flush=True)
    return out

@jax.jit
def do_pre(m):
    return projection.preprocess(m, attrs["scales"], attrs["rotations"],
        attrs["opacities"], state.alive, ci["w2c"], ci["full_proj"],
        ci["campos"], W, H, ci["focal"][0], ci["focal"][1], ci["tan_fov"][0],
        ci["tan_fov"][1], sh_coeffs=G.get_shs(state.params))
proj = timeit("preprocess (SH)", do_pre, attrs["means3d"])

@jax.jit
def do_bin(proj):
    return binning.bin_splats(proj, cfg.grid, 32, 512)
bins = timeit("binning (take fix)", do_bin, proj)

@jax.jit
def expand_only(proj):
    gx, gy = cfg.grid
    M = 32
    r = jnp.arange(M, dtype=jnp.int32)[None, :]
    rw = (proj.rect_max[:, 0] - proj.rect_min[:, 0])[:, None]
    tiles = proj.tiles_touched[:, None]
    safe_rw = jnp.maximum(rw, 1)
    tx = proj.rect_min[:, 0:1] + r % safe_rw
    ty = proj.rect_min[:, 1:2] + r // safe_rw
    inst_ok = proj.valid[:, None] & (r < tiles)
    tile_id = jnp.where(inst_ok, ty * gx + tx, gx * gy)
    return tile_id
timeit("  expand only", expand_only, proj)

@jax.jit
def fwd_bwd(params):
    def loss_fn(p):
        res = R.render_view(p, state.alive, camera=ci, bg_color=jnp.zeros(3),
                            config=cfg, active_sh_degree=3,
                            compute_pseudo_normal=False)
        loss, _ = R.calculate_loss(res, {"image": target}, R.LossConfig())
        return loss
    return jax.grad(loss_fn)(params)
timeit("FULL step fwd+bwd", fwd_bwd, state.params)
print("done", flush=True)
