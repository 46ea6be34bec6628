"""Targeted experiments: scatter collision hypothesis, windowed gather,
packed-key sort, compaction."""
import time
import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops import binning, projection
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {np.median(ts)*1000:8.2f} ms", flush=True)
    return out


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
jax.block_until_ready(proj)


@jax.jit
def do_bin(proj):
    return binning.bin_splats(proj, cfg.grid, 32, 512)


bins = timeit("bin_splats (current)", do_bin, proj)
idx_real = bins.idx.reshape(-1)  # realistic scatter index distribution
print("# real idx: zeros frac",
      float(jnp.mean((idx_real == 0).astype(jnp.float32))), flush=True)

N = idx_real.shape[0]
D = 14
gdata = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))
idx_rand = jnp.asarray(rng.integers(0, cap, N).astype(np.int32))
# padding spread: replace padded slots (mask False) with spread indices
spread = (jnp.arange(N, dtype=jnp.int32) % cap)
idx_spread = jnp.where(bins.mask.reshape(-1), idx_real, spread)


def scat(i, g):
    z = jnp.zeros((cap, D), jnp.float32)
    return z.at[i].add(g)


f = jax.jit(scat)
timeit("scatter-add idx=random", f, idx_rand, gdata)
timeit("scatter-add idx=real (zeros-flood)", f, idx_real, gdata)
timeit("scatter-add idx=real spread-padding", f, idx_spread, gdata)


# sort+segment alternative
def scat_sorted(i, g):
    order = jnp.argsort(i)
    gs = jnp.take(g, order, axis=0)
    isrt = jnp.take(i, order)
    return jax.ops.segment_sum(gs, isrt, num_segments=cap)


timeit("scatter via argsort+segment_sum", jax.jit(scat_sorted),
       idx_spread, gdata)

# windowed gather vs scalar gather for dense lists
id_sorted = jnp.asarray(rng.integers(0, cap, P * 32).astype(np.int32))
starts = jnp.sort(jnp.asarray(rng.integers(0, P * 32 - 512, 2500)
                              .astype(np.int32)))


def g_scalar(ids, st):
    pos = st[:, None] + jnp.arange(512, dtype=jnp.int32)[None, :]
    return jnp.take(ids, jnp.clip(pos, 0, ids.shape[0] - 1), axis=0)


def g_window(ids, st):
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(ids, (s,), (512,)))(st)


timeit("dense-list gather: scalar take", jax.jit(g_scalar),
       id_sorted, starts)
timeit("dense-list gather: vmap dyn-slice", jax.jit(g_window),
       id_sorted, starts)

# sort variants over P*M
M = 32
tile_flat = jnp.asarray(rng.integers(0, 2501, P * M).astype(np.int32))
depth_flat = jnp.asarray(rng.uniform(0.1, 10, P * M).astype(np.float32))
id_flat = jnp.asarray(rng.integers(0, cap, P * M).astype(np.int32))


def sort3(t, d, i):
    return jax.lax.sort((t, d, i), dimension=0, num_keys=2,
                        is_stable=False)


def sort_packed(t, d, i):
    # pack tile(12b) << 20 | depth-bits(20b) into one i32 key
    db = jax.lax.bitcast_convert_type(d, jnp.int32) >> 11  # keep 20 msbs
    key = (t << 20) | (db & 0xFFFFF)
    return jax.lax.sort((key, i), dimension=0, num_keys=1, is_stable=False)


timeit("sort 3-array (tile,depth,id)", jax.jit(sort3),
       tile_flat, depth_flat, id_flat)
timeit("sort packed-u32 (key,id)", jax.jit(sort_packed),
       tile_flat, depth_flat, id_flat)

# compaction: scatter 764k valid instances into 1.5M buffer then sort
NC = 1_572_864
valid = jnp.asarray(rng.uniform(size=P * M) < 0.18)


def compact_sort(t, d, i, v):
    db = jax.lax.bitcast_convert_type(d, jnp.int32) >> 11
    key = (t << 20) | (db & 0xFFFFF)
    offs = jnp.cumsum(v.astype(jnp.int32)) - 1
    dest = jnp.where(v, offs, NC - 1)
    kbuf = jnp.full((NC,), jnp.int32(0x7FFFFFFF))
    ibuf = jnp.zeros((NC,), jnp.int32)
    kbuf = kbuf.at[dest].set(jnp.where(v, key, 0x7FFFFFFF))
    ibuf = ibuf.at[dest].set(i)
    return jax.lax.sort((kbuf, ibuf), dimension=0, num_keys=1,
                        is_stable=False)


timeit("compact(scatter)+sort 1.5M", jax.jit(compact_sort),
       tile_flat, depth_flat, id_flat, valid)
print("done", flush=True)
