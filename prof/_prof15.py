"""Micro-reproduce the in-step scatter: real binning indices + spread,
[T,K,D]-shaped updates, chained timing."""
import time
import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.ops import binning, projection
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera


def timeit_chain(name, fn, x0, *args, n=3, inner=20):
    x = fn(x0, *args)
    jax.block_until_ready(x)
    ts = []
    for _ in range(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(inner):
            x = fn(x, *args)
        jax.block_until_ready(x)
        ts.append((time.perf_counter() - t0) / inner)
    print(f"{name:56s} {np.median(ts)*1000:8.2f} ms", flush=True)


rng = np.random.default_rng(0)
W = H = 800
P = 100_000
cap = 131_072
z = rng.uniform(1.2, 4.0, P)
half = np.tan(0.45) * z
x = rng.uniform(-1, 1, P) * half
y = rng.uniform(-1, 1, P) * half
pts = np.stack([x, y, 2.8 - z], -1).astype(np.float32)
cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)
state = G.create_from_points(pts, cols, capacity=cap,
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
attrs = G.render_attributes(state.params)
cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=32,
                      max_per_tile=512, chunk=128)


@jax.jit
def do_pre(m):
    return projection.preprocess(
        m, attrs["scales"], attrs["rotations"], attrs["opacities"],
        state.alive, ci["w2c"], ci["full_proj"], ci["campos"], W, H,
        ci["focal"][0], ci["focal"][1], ci["tan_fov"][0], ci["tan_fov"][1],
        sh_coeffs=G.get_shs(state.params))


proj = do_pre(attrs["means3d"])
bins = jax.jit(lambda p: binning.bin_splats(p, cfg.grid, 32, 512))(proj)
jax.block_until_ready(bins)
idx_flat = bins.idx.reshape(-1)
mask_flat = bins.mask.reshape(-1)
N = idx_flat.shape[0]
D = 14
spread = jnp.arange(N, dtype=jnp.int32) % cap
idx_safe = jnp.where(mask_flat, idx_flat, spread)
mult = jnp.bincount(idx_safe, length=cap)
print("# max multiplicity idx_safe:", int(jnp.max(mult)),
      " idx_raw:", int(jnp.max(jnp.bincount(idx_flat, length=cap))),
      flush=True)

g3 = jnp.asarray(rng.uniform(size=(2500, 512, D)).astype(np.float32))


@jax.jit
def sc_reshaped(g, i):
    out = jnp.zeros((cap, D), jnp.float32).at[i].add(g.reshape(-1, D))
    return g + out[0, 0]


@jax.jit
def sc_flat(g, i):
    out = jnp.zeros((cap, D), jnp.float32).at[i].add(g)
    return g + out[0, 0]


g2 = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))
idx_rand = jnp.asarray(rng.integers(0, cap, N).astype(np.int32))

timeit_chain("scatter [T,K,D]-reshaped, idx_safe", sc_reshaped, g3, idx_safe)
timeit_chain("scatter flat, idx_safe", sc_flat, g2, idx_safe)
timeit_chain("scatter flat, idx_raw (zero-flood)", sc_flat, g2, idx_flat)
timeit_chain("scatter flat, idx_random", sc_flat, g2, idx_rand)

# sorted ascending indices (best case?)
idx_sorted = jnp.sort(idx_safe)
timeit_chain("scatter flat, idx_safe sorted", sc_flat, g2, idx_sorted)
print("done", flush=True)
