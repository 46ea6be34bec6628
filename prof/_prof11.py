"""Gradient-reduction strategies for gather_rows transpose, real idx dist.

Hypothesis: the 17 ms scatter-add is dominated by ~728k padding slots all
colliding on row 0.  Candidates:
  A. scatter-add, padding -> row 0 (current)
  B. scatter-add, padding -> index P with mode=drop
  C. sort(ids, iota) + perm-gather + sorted segment_sum
  D. sort(ids, iota) + perm-gather + windowed dynamic-slice + sum over M
  E. unique-slot scatter .at[].set into [P*M] + reshape-sum  (needs src ids)
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.ops import binning, projection
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera


def timeit(name, fn, *args, n=3, inner=20):
    """Pipelined timing: enqueue `inner` calls, block once (the axon relay
    adds ~30-50 ms dispatch latency per blocked call otherwise)."""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / inner)
    print(f"{name:56s} {np.median(ts)*1000:8.2f} ms", flush=True)
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
bins = jax.jit(lambda p: binning.bin_splats(p, cfg.grid, 32, 512))(proj)
jax.block_until_ready(bins)
idx_flat = bins.idx.reshape(-1)
mask_flat = bins.mask.reshape(-1)
N = idx_flat.shape[0]
D = 14
print(f"# N={N} valid={int(jnp.sum(mask_flat))} "
      f"pad={int(jnp.sum(~mask_flat))}", flush=True)
gdata = jnp.asarray(rng.uniform(size=(N, D)).astype(np.float32))
gdata = jnp.where(mask_flat[:, None], gdata, 0.0)


def a_scatter(i, g):
    return jnp.zeros((cap, D), jnp.float32).at[i].add(g)


def b_scatter_drop(i, m, g):
    i2 = jnp.where(m, i, cap)
    return jnp.zeros((cap, D), jnp.float32).at[i2].add(
        g, mode="drop", unique_indices=False)


def c_segment(i, m, g):
    i2 = jnp.where(m, i, cap)
    iota = jnp.arange(N, dtype=jnp.int32)
    ids_sorted, perm = jax.lax.sort((i2, iota), dimension=0, num_keys=1,
                                    is_stable=False)
    gs = jnp.take(g, perm, axis=0)
    return jax.ops.segment_sum(gs, ids_sorted, num_segments=cap,
                               indices_are_sorted=True)


def d_windowed(i, m, g):
    M = 32
    i2 = jnp.where(m, i, cap)
    iota = jnp.arange(N, dtype=jnp.int32)
    ids_sorted, perm = jax.lax.sort((i2, iota), dimension=0, num_keys=1,
                                    is_stable=False)
    gs = jnp.take(g, perm, axis=0)            # [N, D] grouped by gaussian
    starts = jnp.searchsorted(
        ids_sorted, jnp.arange(cap, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = jnp.searchsorted(
        ids_sorted, jnp.arange(cap, dtype=jnp.int32), side="right"
    ).astype(jnp.int32) - starts
    gp = jnp.pad(gs, ((0, M), (0, 0)))
    win = jax.vmap(
        lambda s: jax.lax.dynamic_slice(gp, (s, 0), (M, D)))(starts)
    sel = jnp.arange(M, dtype=jnp.int32)[None, :] < counts[:, None]
    return jnp.sum(jnp.where(sel[..., None], win, 0.0), axis=1)


fa = jax.jit(a_scatter)
fb = jax.jit(b_scatter_drop)
fc = jax.jit(c_segment)
fd = jax.jit(d_windowed)

ra = timeit("A scatter-add pad->0 (current)", fa, idx_flat, gdata)
rb = timeit("B scatter-add pad->drop", fb, idx_flat, mask_flat, gdata)
rc = timeit("C sort+perm-gather+segment_sum", fc, idx_flat, mask_flat, gdata)
rd = timeit("D sort+perm-gather+windowed-sum", fd, idx_flat, mask_flat, gdata)

print("# allclose B vs A:", bool(jnp.allclose(ra, rb, atol=1e-4)))
print("# allclose C vs A:", bool(jnp.allclose(ra, rc, atol=1e-4)))
print("# allclose D vs A:", bool(jnp.allclose(ra, rd, atol=1e-4)))

# bf16 variants of the winner candidates
gb16 = gdata.astype(jnp.bfloat16)


def b_bf16(i, m, g):
    i2 = jnp.where(m, i, cap)
    return jnp.zeros((cap, D), jnp.float32).at[i2].add(
        g.astype(jnp.float32), mode="drop")


timeit("B' scatter-drop from bf16 rows", jax.jit(b_bf16),
       idx_flat, mask_flat, gb16)

# forward gather in bf16
packed = jnp.asarray(rng.uniform(size=(cap, D)).astype(np.float32))
timeit("fwd gather take f32", jax.jit(lambda p, i: jnp.take(p, i, axis=0)),
       packed, bins.idx)
timeit("fwd gather take bf16",
       jax.jit(lambda p, i: jnp.take(p.astype(jnp.bfloat16), i, axis=0)),
       packed, bins.idx)
print("done", flush=True)
